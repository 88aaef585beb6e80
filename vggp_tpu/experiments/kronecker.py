"""Notebooks 3 & 5 equivalent: 2D Kronecker model zoo on a synthetic
multiscale field, with 2D gridded-prediction validation.

Run: ``python -m vggp_tpu.experiments.kronecker [--iters N] [--outdir D]``
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from vggp_tpu import train
from vggp_tpu.experiments import misc, plotting, zoo
from vggp_tpu.features import CellIntegralFeature
from vggp_tpu.models import exact, sgpr
from vggp_tpu.utils import gen_2d, trapz_grid_2d


def run(
    n_side: int = 25,
    noise: float = 0.05,
    n_iters: int = 500,
    learning_rate: float = 0.05,
    n_grid: int = 10,
    seed: int = 0,
    outdir: str | None = None,
    include_exact: bool = True,
) -> Dict:
    # nb3's multiscale test function
    f = lambda a, b: np.sin(8 * a) * np.cos(8 * b) + 0.5 * np.sin(2 * (a + b))
    X, y = gen_2d(f, (0, 1), (0, 1), n_side)
    rng = np.random.default_rng(seed)
    y = y + noise * rng.standard_normal(y.shape)
    Xj, yj = jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32)

    grids = (CellIntegralFeature.from_lims(n_grid, 0.0, 1.0),
             CellIntegralFeature.from_lims(n_grid, 0.0, 1.0))
    # dense truth field on a fine grid -> per-cell trapezoid integrals
    fine = 400
    xs_f = np.linspace(0, 1, fine)
    dense = f(xs_f[:, None], xs_f[None, :])  # [x1, x2]
    truth = trapz_grid_2d(dense, xs_f, xs_f, n_grid)  # [cell1, cell2]

    results: Dict = {"models": {}, "truth": truth}

    def record(name, loss_hist, wall, qv):
        results["models"][name] = {
            "final_loss": float(np.asarray(loss_hist)[-1]),
            "steps_per_sec": n_iters / wall,
            "qv_grid": np.asarray(qv.mean).reshape(n_grid, n_grid),
            "qv_var": np.asarray(qv.variance()).reshape(n_grid, n_grid),
            "qv_max_err": float(
                np.abs(np.asarray(qv.mean).reshape(n_grid, n_grid) - truth).max()
            ),
            "metrics": misc.evaluation_metric_row(truth, qv, y),
        }

    if include_exact:
        spec_e = zoo.exact_spec(2)
        p0 = train.non_informative_init(spec_e.init_params(), Xj, yj)
        t0 = time.time()
        p_fit, hist = train.fit(lambda q: exact.loss(spec_e, q, Xj, yj), p0,
                                n_iters, learning_rate)
        record("exactgp", hist["loss"], time.time() - t0,
               jax.jit(lambda p: exact.q_v(spec_e, p, Xj, yj, grids, full_cov=False))(p_fit))

    for name, spec in zoo.sgpr_specs_2d().items():
        p0 = train.non_informative_init(spec.init_params(), Xj, yj)
        t0 = time.time()
        p_fit, hist = train.fit(lambda q: sgpr.loss(spec, q, Xj, yj), p0,
                                n_iters, learning_rate)
        record(name, hist["loss"], time.time() - t0,
               jax.jit(lambda p, s=spec: sgpr.q_v(s, p, Xj, yj, grids, full_cov=False))(p_fit))

    if outdir:
        os.makedirs(outdir, exist_ok=True)
        table = {
            name: dict(zip(["mse", "mae", "rmse", "r2", "nlpd", "msll"], r["metrics"]),
                       steps_per_sec=round(r["steps_per_sec"], 1),
                       qv_max_err=r["qv_max_err"])
            for name, r in results["models"].items()
        }
        with open(os.path.join(outdir, "metrics.json"), "w") as fh:
            json.dump(table, fh, indent=2)
        heat = {"truth": truth}
        heat.update({n: r["qv_grid"] for n, r in results["models"].items()})
        plotting.plot_grid_heatmaps(heat, title="gridded predictions q(v)",
                                    path=os.path.join(outdir, "qv_means.png"))
        plotting.plot_grid_heatmaps(
            {n: r["qv_var"] for n, r in results["models"].items()},
            title="q(v) variances", path=os.path.join(outdir, "qv_vars.png"))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--outdir", default="results/kronecker")
    ap.add_argument("--no-exact", action="store_true")
    args = ap.parse_args()
    res = run(n_iters=args.iters, outdir=args.outdir, include_exact=not args.no_exact)
    for name, r in res["models"].items():
        m = dict(zip(["mse", "mae", "rmse", "r2", "nlpd", "msll"], r["metrics"]))
        print(f"{name:<10} loss={r['final_loss']:+.2f} it/s={r['steps_per_sec']:.0f} "
              f"qv_err={r['qv_max_err']:.4f} r2={m['r2']:.3f} nlpd={m['nlpd']:+.2f}")


if __name__ == "__main__":
    main()
