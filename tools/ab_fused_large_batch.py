"""Same-session A/B of the fused Pallas Kuf→banded-whiten chain at LARGE batch.

Round 2 recorded the fusion as neutral-to-slightly-negative at the headline
batch 4096 (PERFORMANCE.md "Fused Kuf→banded-whiten"); VERDICT r4 task #9
asks for the same A/B in the large-batch regime (16384 / 65536), where the
HBM round trips of the (512, n) Kuf blocks weigh differently.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_fused_large_batch.py

Prints one JSON line per (batch, fused) cell; paste into PERFORMANCE.md.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from vggp_tpu import config, train
from vggp_tpu.features import CellIntegralFeature
from vggp_tpu.models import svgp

M_AXIS = 512


def rate(batch: int, fused: bool, n_timed: int = 60) -> float:
    config.FUSED_WHITEN_KUF = fused
    spec = svgp.SVGPSpec(
        kinds=("matern12", "matern12"),
        features=(CellIntegralFeature.from_lims(M_AXIS, 0.0, 1.0),
                  CellIntegralFeature.from_lims(M_AXIS, 0.0, 1.0)),
        num_data=1_000_000, variational="kron")
    params = spec.init_params(jnp.float32)
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.random((batch, 2)), jnp.float32)
    yb = jnp.asarray(np.sin(6 * np.asarray(xb[:, 0])) * np.cos(5 * np.asarray(xb[:, 1]))
                     + 0.1 * rng.standard_normal(batch), jnp.float32)
    opt = optax.adam(1e-2)
    raw = train.unconstrain(params)
    st = opt.init(raw)

    def one(carry, _):
        r, s = carry
        val, grads = jax.value_and_grad(
            lambda q: svgp.loss(spec, train.constrain(q), xb, yb))(r)
        r, s = train.guarded_update(opt, r, s, val, grads)
        return (r, s), val

    @jax.jit
    def run(r, s):
        (r, s), vals = jax.lax.scan(one, (r, s), None, length=n_timed)
        return vals

    vals = run(raw, st)
    assert np.isfinite(float(vals[-1])), f"warmup loss not finite: {vals[-1]}"
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        v = run(raw, st)
        float(v[-1])
        best = max(best, n_timed / (time.perf_counter() - t0))
    return best


if __name__ == "__main__":
    saved = config.FUSED_WHITEN_KUF
    try:
        for batch in (16384, 65536):
            for fused in (False, True):
                r = rate(batch, fused)
                print(json.dumps({"batch": batch, "fused": fused,
                                  "steps_per_sec": round(r, 2),
                                  "mpts_per_sec": round(r * batch / 1e6, 2)}),
                      flush=True)
    finally:
        config.FUSED_WHITEN_KUF = saved
