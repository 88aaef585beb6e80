"""Apples-to-apples parity: reference-style torch f64 (CPU) vs vggp_tpu (TPU f32).

Both columns get IDENTICAL inputs — the same SyntheticGulfStream train/test
windows (stable crc32 seeds), the same Simpson-gridded truth, the same
non-informative inits, the same Adam(0.01) × 1000-iteration protocol (nb61
cells 24-60) — and are scored with the same [mse, mae, rmse, r², nlpd, msll]
metric row on the 20×20 gridded q(v) data product.

The torch column is :mod:`vggp_tpu.experiments.torch_oracle` — an
independent float64 implementation of the reference's models (the reference's
own gpytorch stack is not installable in this image; the oracle matches its
math model-for-model and its training protocol, minus documented reference
bugs, see torch_oracle docstring).

Run: ``python -m vggp_tpu.experiments.parity [--iters N] [--outdir D]``
Writes ``results/parity/table.json`` + ``table.md``.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict

import numpy as np

METRIC_NAMES = ["mse", "mae", "rmse", "r2", "nlpd", "msll"]
ZOO = ["exactgp", "svgp", "vffgp", "asvgp", "griddedgp"]


def _metric_row(truth, mean, var, y_train):
    from vggp_tpu.models.common import Gaussian
    from vggp_tpu.experiments import misc
    import jax.numpy as jnp

    g = Gaussian(mean=jnp.asarray(np.asarray(mean, np.float64)),
                 var=jnp.asarray(np.asarray(var, np.float64)))
    return misc.evaluation_metric_row(truth, g, np.asarray(y_train))


def run(n_iters: int = 1000, lr: float = 0.01, sparsity: int = 3,
        outdir: str | None = None, svgp_m: int = 100, n_omegas: int = 5,
        exact_subsample: int = 4) -> Dict:
    """``exact_subsample``: the dense exact GP is fit on every k-th
    observation in BOTH columns — the torch oracle's O(n³) training pass
    costs ~24 s/iter at the full n=4400 window (hours per fit; the
    reference's own notebooks only ever ran the exact model on smaller
    windows). The sparse zoo uses the full window."""
    import jax
    import jax.numpy as jnp

    from vggp_tpu import train
    from vggp_tpu.experiments import torch_oracle, zoo
    from vggp_tpu.experiments.configs import EXP_1_TEST, EXP_1_TRAIN
    from vggp_tpu.experiments.loaders import load_gulf_stream_data
    from vggp_tpu.features import CellIntegralFeature
    from vggp_tpu.models import exact, freesvgp, sgpr

    out: Dict = {"config": {"n_iters": n_iters, "lr": lr, "sparsity": sparsity,
                            "svgp_m": svgp_m, "n_omegas": n_omegas,
                            "exact_subsample": exact_subsample}, "splits": {}}

    for split, exp_dict in (("train", EXP_1_TRAIN), ("test", EXP_1_TEST)):
        # grid resolution is keyed to THIS split's config (gulfstream.py:70
        # semantics) — keying it to EXP_1_TRAIN would silently score the test
        # window on the train grid if the configs ever diverge
        n_splines = exp_dict["N_SPLINES"]
        grid_mesh = np.linspace(0.0, 1.0, n_splines + 1)
        grids = (CellIntegralFeature.from_lims(n_splines, 0.0, 1.0),
                 CellIntegralFeature.from_lims(n_splines, 0.0, 1.0))
        ds = load_gulf_stream_data("data/dc_obs", "data/dc_ref", exp_dict)
        X, y = ds.obs_train_data(sparsity)
        X, y = np.asarray(X, np.float64), np.asarray(y, np.float64).reshape(-1)
        truth = ds.grid_ref_data_simpson(n_splines)
        rows: Dict = {}

        def model_data(name):
            if name == "exactgp":
                return X[::exact_subsample], y[::exact_subsample]
            return X, y

        # ---- reference-style torch f64 column -------------------------------
        for name in ZOO:
            Xm, ym = model_data(name)
            t0 = time.time()
            (mean, var), losses, hyps = torch_oracle.fit(
                name, Xm, ym, grid_mesh, n_splines, n_iters=n_iters, lr=lr,
                m_svgp=svgp_m, n_omegas=n_omegas)
            wall = time.time() - t0
            rows.setdefault(name, {})["reference_f64_cpu"] = {
                "metrics": dict(zip(METRIC_NAMES, _metric_row(truth, mean, var, ym))),
                "steps_per_sec": round(n_iters / wall, 2),
                "final_loss": losses[-1],
                "hyps": hyps,
            }
            print(f"[torch] {split}/{name}: {n_iters / wall:.1f} it/s "
                  f"rmse={rows[name]['reference_f64_cpu']['metrics']['rmse']:.5f}",
                  flush=True)

        # ---- vggp_tpu column ------------------------------------------------
        # (zoo's per-axis-PointFeature "svgp" SGPR is not the parity model —
        # the reference's SVGP has FREE 2-D inducing points, so the branch
        # below uses FreeSVGPSpec; drop the zoo entry to keep specs honest)
        specs = {"exactgp": (zoo.exact_spec(2), exact)}
        specs.update({k: (v, sgpr) for k, v in zoo.sgpr_specs_2d(
            n_inducing=10, n_frequencies=n_omegas, n_knots=n_splines,
            n_cells=n_splines).items() if k != "svgp"})
        for name in ZOO:
            Xm, ym = model_data(name)
            Xj = jnp.asarray(Xm, jnp.float32)
            yj = jnp.asarray(ym, jnp.float32)
            # fit TWICE: the first call pays the jit compile (the torch
            # column has no compile analogue), the second measures the
            # steady-state rate; completion is forced by reading the loss
            # history before the clock stops (async dispatch otherwise
            # ends the timer early — CLAUDE.md bench rules). q(v)
            # prediction stays outside the timed window (the torch wall
            # includes its single prediction pass — ≤0.1% of the 1000
            # training passes it spans).
            if name == "svgp":
                spec = freesvgp.FreeSVGPSpec(kinds=("matern12", "matern12"), m=svgp_m)
                p0 = train.non_informative_init(
                    spec.init_params(jnp.float32, seed=0), Xj, yj)
                fit = lambda: train.fit(
                    lambda q: freesvgp.loss(spec, q, Xj, yj), p0, n_iters, lr)
                qv_fn = jax.jit(lambda p: freesvgp.q_v(
                    spec, p, Xj, yj, grids, full_cov=False))
            else:
                spec, mod = specs[name]
                p0 = train.non_informative_init(spec.init_params(), Xj, yj)
                fit = lambda s=spec, m=mod: train.fit(
                    lambda q: m.loss(s, q, Xj, yj), p0, n_iters, lr)
                qv_fn = jax.jit(lambda p, s=spec, m=mod: m.q_v(
                    s, p, Xj, yj, grids, full_cov=False))
            p_fit, hist = fit()                              # compile + warmup
            float(np.asarray(hist["loss"])[-1])
            t0 = time.time()
            p_fit, hist = fit()
            final_loss = float(np.asarray(hist["loss"])[-1])  # force completion
            wall = time.time() - t0
            qv = qv_fn(p_fit)
            rows[name]["vggp_tpu_f32"] = {
                "metrics": dict(zip(METRIC_NAMES,
                                    _metric_row(truth, qv.mean, qv.var, ym))),
                "steps_per_sec": round(n_iters / wall, 2),
                "final_loss": final_loss,
            }
            print(f"[vggp ] {split}/{name}: {n_iters / wall:.1f} it/s "
                  f"rmse={rows[name]['vggp_tpu_f32']['metrics']['rmse']:.5f}",
                  flush=True)
        out["splits"][split] = {"n_obs": int(X.shape[0]), "models": rows}

    if outdir:
        os.makedirs(outdir, exist_ok=True)
        with open(os.path.join(outdir, "table.json"), "w") as fh:
            json.dump(out, fh, indent=1)
        with open(os.path.join(outdir, "table.md"), "w") as fh:
            fh.write(_markdown(out))
    return out


def _markdown(out: Dict) -> str:
    lines = ["# Parity: reference-style torch f64 (CPU) vs vggp_tpu f32 (TPU)",
             "", f"config: {json.dumps(out['config'])}", ""]
    for split, rec in out["splits"].items():
        lines += [f"## {split} window (n = {rec['n_obs']})", "",
                  "| model | impl | rmse | r2 | nlpd | msll | it/s |",
                  "|---|---|---|---|---|---|---|"]
        for name, impls in rec["models"].items():
            for impl, r in impls.items():
                m = r["metrics"]
                lines.append(
                    f"| {name} | {impl} | {m['rmse']:.6f} | {m['r2']:.4f} | "
                    f"{m['nlpd']:+.3f} | {m['msll']:+.3f} | {r['steps_per_sec']} |")
        lines.append("")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--outdir", default="results/parity")
    args = ap.parse_args()
    run(n_iters=args.iters, outdir=args.outdir)


if __name__ == "__main__":
    main()
