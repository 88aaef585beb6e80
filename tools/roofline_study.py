"""Roofline audit of the headline 512² ELBO step (VERDICT r4 weak #1).

Places the step on the v5e roofline with XLA's own cost model (FLOPs AND
bytes accessed, plus hand-accounted Pallas custom-call costs — bench.py's
`_pallas_step_cost`), then runs the experiment that identifies the binding
constraint when neither peak is near: K independent model replicas trained
in ONE program via `jax.vmap` over the step. If a single step were
HBM- or FLOP-bound, K-replica wall time would scale ~K×; if it is
latency/occupancy-bound (many small kernels + remote dispatch), K replicas
pipeline into the idle units and aggregate steps/s grows far beyond 1×.

The K-replica mode is also a real workload, not just a probe: nb61's CV
sweeps fit 12 settings sequentially (cells 32/39), and `train.fit_restarts`
already exposes vmapped multi-start fitting — this measures the same
mechanism at the bench shape.

Writes results/bench/r5_roofline.json.
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
N_TIMED = 100


def build():
    g1 = CellIntegralFeature.from_lims(M_AXIS, 0.0, 1.0)
    g2 = CellIntegralFeature.from_lims(M_AXIS, 0.0, 1.0)
    spec = svgp.SVGPSpec(kinds=("matern12", "matern12"), features=(g1, g2),
                         num_data=1_000_000, variational="kron")
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.random((BATCH, 2)), jnp.float32)
    yb = jnp.asarray(
        np.sin(6 * np.asarray(xb[:, 0])) * np.cos(5 * np.asarray(xb[:, 1]))
        + 0.1 * rng.standard_normal(BATCH), jnp.float32)
    return spec, xb, yb


def time_run(run, *args):
    vals = run(*args)                      # compile + warm
    assert np.isfinite(float(np.ravel(vals)[-1]))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        vals = run(*args)
        float(np.ravel(vals)[-1])
        best = max(best, N_TIMED / (time.perf_counter() - t0))
    return best, run


def cost_of(run, *args):
    try:
        cost = run.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return (float(cost.get("flops", 0.0)) / N_TIMED,
                float(cost.get("bytes accessed", 0.0)) / N_TIMED)
    except Exception:
        return 0.0, 0.0


def main():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _pallas_step_cost

    from vggp_tpu import config

    # Under vmap every lax.cond lowers to a select that EXECUTES BOTH
    # branches — the banded whiten apply's dense fallback then runs every
    # replica step alongside the banded path (and safe_cholesky's guards
    # likewise), so K-replica timings with the default config measure a
    # DIFFERENT program than K single steps. --no-banded A/Bs that.
    suffix = ""
    if "--no-banded" in sys.argv:
        config.BANDED_WHITEN_APPLY = False
        suffix = "_nobanded"

    print("backend:", jax.default_backend(), "banded:",
          config.BANDED_WHITEN_APPLY)
    spec, xb, yb = build()
    opt = optax.adam(1e-2)
    rec = {"m_axis": M_AXIS, "batch": BATCH, "n_timed": N_TIMED}

    def one_step(carry, _):
        r, st = carry
        val, grads = jax.value_and_grad(
            lambda q: svgp.loss(spec, train.constrain(q), xb, yb))(r)
        r, st = train.guarded_update(opt, r, st, val, grads)
        return (r, st), val

    @jax.jit
    def run1(r, st):
        (r, st), vals = jax.lax.scan(one_step, (r, st), None, length=N_TIMED)
        return vals

    params = spec.init_params(jnp.float32)
    raw = train.unconstrain(params)
    st = opt.init(raw)
    sps1, _ = time_run(run1, raw, st)
    p_flops, p_bytes = _pallas_step_cost()
    fl1, by1 = cost_of(run1, raw, st)
    rec["single"] = {
        "steps_per_sec": round(sps1, 1),
        "flops_per_step": round(fl1 + p_flops),
        "bytes_per_step": round(by1 + p_bytes),
        "achieved_tflops": round((fl1 + p_flops) * sps1 / 1e12, 4),
        "mfu_pct_vs_197tflops": round(100 * (fl1 + p_flops) * sps1 / 197e12, 4),
        "achieved_hbm_gbps": round((by1 + p_bytes) * sps1 / 1e9, 2),
        "pct_hbm_peak_819gbps": round(100 * (by1 + p_bytes) * sps1 / 819e9, 3),
    }
    print("single:", json.dumps(rec["single"]))

    # K-replica vmapped training: same data, K different inits — one program
    rec["replicas"] = {}
    for K in (2, 4, 8):
        # identical inits are fine for timing (the compute is init-invariant)
        raws = jax.tree.map(lambda x: jnp.broadcast_to(x, (K,) + x.shape), raw)
        sts = jax.vmap(opt.init)(raws)

        @jax.jit
        def runk(rs, ss):
            def scan_one(r, s):
                (r, s), vals = jax.lax.scan(one_step, (r, s), None,
                                            length=N_TIMED)
                return vals

            return jax.vmap(scan_one)(rs, ss)

        spsk, _ = time_run(runk, raws, sts)
        flk, byk = cost_of(runk, raws, sts)
        rec["replicas"][f"K{K}"] = {
            "steps_per_sec_per_model": round(spsk, 1),
            "aggregate_steps_per_sec": round(spsk * K, 1),
            "scaling_vs_single": round(spsk * K / max(sps1, 1e-9), 3),
            "achieved_hbm_gbps": round((byk + K * p_bytes) * spsk / 1e9, 2),
            "achieved_tflops": round((flk + K * p_flops) * spsk / 1e12, 4),
        }
        print(f"K={K}:", json.dumps(rec["replicas"][f"K{K}"]))

    os.makedirs("results/bench", exist_ok=True)
    with open(f"results/bench/r5_roofline{suffix}.json", "w") as fh:
        json.dump(rec, fh, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
