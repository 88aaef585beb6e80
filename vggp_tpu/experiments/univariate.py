"""Notebooks 1 & 4 equivalent: 1D model zoo on synthetic sin+cos data, with
gridded-prediction validation against quadrature truth.

Run: ``python -m vggp_tpu.experiments.univariate [--iters N] [--outdir D]``
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
from vggp_tpu.utils import gen_1d, integrate_1d


def run(
    n_obs: int = 15,
    noise: float = 0.05,
    n_iters: int = 1000,
    learning_rate: float = 0.05,
    n_grid: int = 10,
    seed: int = 0,
    outdir: str | None = None,
) -> Dict:
    f = lambda x: np.sin(2 * x) + np.cos(5 * x)
    X, y_clean = gen_1d(f, 0.0, 1.0, n_obs)
    rng = np.random.default_rng(seed)
    y = y_clean + noise * rng.standard_normal(n_obs)
    Xj, yj = jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32)
    xs = jnp.linspace(0.0, 1.0, 200)

    grid = CellIntegralFeature.from_lims(n_grid, 0.0, 1.0)
    truth, _ = integrate_1d(f, grid.mesh)

    results: Dict = {"models": {}}

    # exact GP
    spec_e = zoo.exact_spec(1)
    p0 = train.non_informative_init(spec_e.init_params(), Xj, yj)
    t0 = time.time()
    p_fit, hist = train.fit(lambda q: exact.loss(spec_e, q, Xj, yj), p0, n_iters, learning_rate)
    wall = time.time() - t0
    post = jax.jit(lambda p: exact.posterior(spec_e, p, Xj, yj, xs, full_cov=False))(p_fit)
    qv = jax.jit(lambda p: exact.q_v(spec_e, p, Xj, yj, (grid,), full_cov=False))(p_fit)
    results["models"]["exactgp"] = {
        "final_loss": float(np.asarray(hist["loss"])[-1]),
        "steps_per_sec": n_iters / wall,
        "qv_max_err": float(np.abs(np.asarray(qv.mean) - truth).max()),
        "metrics": misc.evaluation_metric_row(truth, qv, y),
        "calibration": misc.calibration_row(truth, qv),
        "posterior": (np.asarray(post.mean), np.asarray(post.stddev())),
        "history": hist,
    }

    # sparse zoo
    for name, spec in zoo.sgpr_specs_1d(n_cells=n_grid).items():
        p0 = train.non_informative_init(spec.init_params(), Xj, yj)
        t0 = time.time()
        p_fit, hist = train.fit(lambda q: sgpr.loss(spec, q, Xj, yj), p0, n_iters, learning_rate)
        wall = time.time() - t0
        post = jax.jit(lambda p, s=spec: sgpr.posterior(s, p, Xj, yj, xs, full_cov=False))(p_fit)
        qv = jax.jit(lambda p, s=spec: sgpr.q_v(s, p, Xj, yj, (grid,), full_cov=False))(p_fit)
        results["models"][name] = {
            "final_loss": float(np.asarray(hist["loss"])[-1]),
            "steps_per_sec": n_iters / wall,
            "qv_max_err": float(np.abs(np.asarray(qv.mean) - truth).max()),
            "metrics": misc.evaluation_metric_row(truth, qv, y),
            "calibration": misc.calibration_row(truth, qv),
            "posterior": (np.asarray(post.mean), np.asarray(post.stddev())),
            "history": hist,
        }

    results["truth_integrals"] = truth
    results["data"] = (X, y)

    if outdir:
        os.makedirs(outdir, exist_ok=True)
        table = {
            name: dict(zip(["mse", "mae", "rmse", "r2", "nlpd", "msll"], r["metrics"]),
                       steps_per_sec=round(r["steps_per_sec"], 1),
                       qv_max_err=r["qv_max_err"],
                       **r["calibration"])
            for name, r in results["models"].items()
        }
        with open(os.path.join(outdir, "metrics.json"), "w") as fh:
            json.dump(table, fh, indent=2)
        for name, r in results["models"].items():
            mu, sd = r["posterior"]
            plotting.plot_posterior_1d(
                X, y, np.asarray(xs), mu, sd, truth_fn=f, title=name,
                path=os.path.join(outdir, f"posterior_{name}.png"))
    return results


def run_orders(
    n_obs: int = 40,
    noise: float = 0.05,
    n_iters: int = 1000,
    learning_rate: float = 0.05,
    n_grid: int = 10,
    seed: int = 0,
    outdir: str | None = None,
) -> Dict:
    """The full kernel×feature matrix: 4 sparse families × Matérn 1/2, 3/2,
    5/2 (ASVGP spline degree and VFF Kuu rank track the order — both beyond
    the reference's Matérn-1/2-only versions)."""
    f = lambda x: np.sin(2 * x) + np.cos(5 * x)
    X, y_clean = gen_1d(f, 0.0, 1.0, n_obs)
    rng = np.random.default_rng(seed)
    y = y_clean + noise * rng.standard_normal(n_obs)
    Xj, yj = jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32)
    grid = CellIntegralFeature.from_lims(n_grid, 0.0, 1.0)
    truth, _ = integrate_1d(f, grid.mesh)
    out: Dict = {}
    for kind in ("matern12", "matern32", "matern52"):
        out[kind] = {}
        for name, spec in zoo.sgpr_specs_1d_orders(kind, n_cells=n_grid).items():
            p0 = train.non_informative_init(spec.init_params(), Xj, yj)
            t0 = time.time()
            p_fit, hist = train.fit(lambda q, s=spec: sgpr.loss(s, q, Xj, yj),
                                    p0, n_iters, learning_rate)
            wall = time.time() - t0
            qv = jax.jit(lambda p, s=spec: sgpr.q_v(s, p, Xj, yj, (grid,),
                                                    full_cov=False))(p_fit)
            out[kind][name] = dict(
                zip(["mse", "mae", "rmse", "r2", "nlpd", "msll"],
                    misc.evaluation_metric_row(truth, qv, y)),
                steps_per_sec=round(n_iters / wall, 1),
                final_loss=float(np.asarray(hist["loss"])[-1]),
            )
    if outdir:
        os.makedirs(outdir, exist_ok=True)
        with open(os.path.join(outdir, "orders_metrics.json"), "w") as fh:
            json.dump(out, fh, indent=2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--outdir", default="results/univariate")
    ap.add_argument("--orders", action="store_true",
                    help="also run the kernel-order × feature-family matrix")
    args = ap.parse_args()
    res = run(n_iters=args.iters, outdir=args.outdir)
    for name, r in res["models"].items():
        m = dict(zip(["mse", "mae", "rmse", "r2", "nlpd", "msll"], r["metrics"]))
        print(f"{name:<10} loss={r['final_loss']:+.3f} it/s={r['steps_per_sec']:.0f} "
              f"qv_err={r['qv_max_err']:.4f} rmse={m['rmse']:.4f} r2={m['r2']:.3f} "
              f"nlpd={m['nlpd']:+.2f}")
    if args.orders:
        orders = run_orders(n_iters=args.iters, outdir=args.outdir)
        for kind, models in orders.items():
            for name, m in models.items():
                print(f"{kind:<9} {name:<10} it/s={m['steps_per_sec']:.0f} "
                      f"rmse={m['rmse']:.4f} r2={m['r2']:.3f} nlpd={m['nlpd']:+.2f}")


if __name__ == "__main__":
    main()
