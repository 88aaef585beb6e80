"""Scaling study: ELBO optimizer steps/s across inducing-grid size × batch.

Same workload and methodology as ``bench.py`` (whitened Kronecker SVGP with
B0 cell-integral features, one jit-compiled ``lax.scan`` of 200 full
value-and-grad + Adam steps, best-of-3 timed windows, completion forced with
a real transfer — per-dispatch timing lies over the remote-TPU tunnel), swept
over the m×m inducing grid and minibatch size. The reference's largest
measured configuration is a 20×20 grid at 25.1 it/s (BASELINE.md, nb61 cell
54); every row here is 40×–2600× more inducing cells.

Writes ``results/scaling/metrics.json`` and prints one JSON line per config.

Run from the repo root: ``python tools/scaling_study.py [--quick]``.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_2D_GRIDDED_IT_S = 25.1  # BASELINE.md, nb61 cell 54 (20×20 grid)
N_TIMED = 200


def measure(m_axis: int, batch: int, ndim: int = 2) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from vggp_tpu import train
    from vggp_tpu.features import CellIntegralFeature
    from vggp_tpu.models import svgp

    g = CellIntegralFeature.from_lims(m_axis, 0.0, 1.0)
    spec = svgp.SVGPSpec(kinds=("matern12",) * ndim, features=(g,) * ndim,
                         num_data=1_000_000, variational="kron")
    params = spec.init_params(jnp.float32)
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.random((batch, ndim)), jnp.float32)
    yb = jnp.asarray(
        np.sin(6 * np.asarray(xb[:, 0])) * np.cos(5 * np.asarray(xb[:, 1]))
        + 0.1 * rng.standard_normal(batch), jnp.float32)

    opt = optax.adam(1e-2)
    raw = train.unconstrain(params)

    def one_step(carry, _):
        r, st = carry
        val, grads = jax.value_and_grad(
            lambda q: svgp.loss(spec, train.constrain(q), xb, yb))(r)
        r, st = train.guarded_update(opt, r, st, val, grads)
        return (r, st), val

    @jax.jit
    def run(r, st):
        (r, st), vals = jax.lax.scan(one_step, (r, st), None, length=N_TIMED)
        return vals

    t0 = time.perf_counter()
    vals = run(raw, opt.init(raw))          # compile + warmup
    assert np.isfinite(float(vals[-1])), f"warmup loss not finite: {vals[-1]}"
    compile_s = time.perf_counter() - t0
    steps_per_sec = 0.0
    for _ in range(3):                      # best-of-3: queue stalls only slow
        t0 = time.perf_counter()
        vals = run(raw, opt.init(raw))
        float(vals[-1])                     # force completion via transfer
        steps_per_sec = max(steps_per_sec, N_TIMED / (time.perf_counter() - t0))
    return {
        "m_axis": m_axis, "ndim": ndim, "m_total": m_axis ** ndim,
        "batch": batch,
        "steps_per_sec": round(steps_per_sec, 2),
        "vs_reference_20x20": round(steps_per_sec / REFERENCE_2D_GRIDDED_IT_S, 2),
        "points_per_sec": round(steps_per_sec * batch, 0),
        "compile_plus_warmup_s": round(compile_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small grid sizes only (CI smoke)")
    ap.add_argument("--outdir", default="results/scaling")
    args = ap.parse_args()

    import jax

    if args.quick:
        grid = [(64, 1024, 2), (128, 1024, 2)]
    else:
        grid = [(m, b, 2) for m in (128, 256, 512, 1024) for b in (1024, 4096)]
        # 3-D lon×lat×time rows (the spacetime-experiment family): 64³ has
        # the same m_total as 512², so the pair isolates the ndim cost.
        grid += [(32, 4096, 3), (64, 4096, 3)]

    rows = []
    for m_axis, batch, ndim in grid:
        row = measure(m_axis, batch, ndim=ndim)
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0]),
           "methodology": "jitted lax.scan of 200 ELBO value-and-grad+Adam "
                          "steps, best-of-3 windows, completion forced by "
                          "transfer (see bench.py)",
           "reference_best_it_s": REFERENCE_2D_GRIDDED_IT_S,
           "rows": rows}
    os.makedirs(args.outdir, exist_ok=True)
    with open(os.path.join(args.outdir, "metrics.json"), "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
