"""A/B: lax.scan unroll factor on the headline 512² ELBO step.

The roofline audit (results/bench/r5_roofline.json) places the step at
0.26% MFU and ~5% of HBM peak — on-device serial latency of many small
kernels dominates. Unrolling the optimizer scan gives XLA a longer
straight-line region to schedule: adjacent steps are serially dependent
through the params, but the scheduler can still overlap late step-i work
(optimizer update pieces) with early step-i+1 work and removes per-
iteration loop overhead. Writes results/bench/r5_scan_unroll_ab.json.
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from vggp_tpu import train
from vggp_tpu.features import CellIntegralFeature
from vggp_tpu.models import svgp

M_AXIS = 512
BATCH = 4096
N_TIMED = 200


def main():
    print("backend:", jax.default_backend())
    g1 = CellIntegralFeature.from_lims(M_AXIS, 0.0, 1.0)
    g2 = CellIntegralFeature.from_lims(M_AXIS, 0.0, 1.0)
    spec = svgp.SVGPSpec(kinds=("matern12", "matern12"), features=(g1, g2),
                         num_data=1_000_000, variational="kron")
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.random((BATCH, 2)), jnp.float32)
    yb = jnp.asarray(
        np.sin(6 * np.asarray(xb[:, 0])) * np.cos(5 * np.asarray(xb[:, 1]))
        + 0.1 * rng.standard_normal(BATCH), jnp.float32)
    opt = optax.adam(1e-2)
    raw = train.unconstrain(spec.init_params(jnp.float32))
    st = opt.init(raw)

    def one_step(carry, _):
        r, s = carry
        val, grads = jax.value_and_grad(
            lambda q: svgp.loss(spec, train.constrain(q), xb, yb))(r)
        r, s = train.guarded_update(opt, r, s, val, grads)
        return (r, s), val

    rec = {}
    for unroll in (1, 2, 4):
        @jax.jit
        def run(r, s, unroll=unroll):
            (r, s), vals = jax.lax.scan(one_step, (r, s), None,
                                        length=N_TIMED, unroll=unroll)
            return vals

        vals = run(raw, st)
        assert np.isfinite(float(vals[-1]))
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            vals = run(raw, st)
            float(vals[-1])
            best = max(best, N_TIMED / (time.perf_counter() - t0))
        rec[f"unroll{unroll}"] = round(best, 1)
        print(f"unroll={unroll}: {best:.1f} steps/s")

    os.makedirs("results/bench", exist_ok=True)
    with open("results/bench/r5_scan_unroll_ab.json", "w") as fh:
        json.dump(rec, fh, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
