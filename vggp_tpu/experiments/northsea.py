"""Notebook 7 equivalent: North Sea SLA gridded products.

Loads a month of real CMEMS AltiKa sea-level anomalies over the North Sea
(51-61°N, -3-10°E) when the archive is present, otherwise a synthetic
stand-in with the same along-track geometry; fits the ASVGP and GriddedGP
models and extracts 20×20 gridded q(v) products.

Run: ``python -m vggp_tpu.experiments.northsea [--iters N]``
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
from vggp_tpu.data.gulfstream import SyntheticGulfStream
from vggp_tpu.experiments import plotting
from vggp_tpu.features import B1SplineFeature, CellIntegralFeature
from vggp_tpu.models import sgpr
from vggp_tpu.utils import min_max_scaling

NORTH_SEA_LAT = (51.0, 61.0)
NORTH_SEA_LON = (-3.0, 10.0)


def _load_obs(root_folder: str | None):
    """(lon, lat, sla): real AltiKa 2013-04 month if available, else synthetic."""
    if root_folder and os.path.isdir(root_folder):
        from vggp_tpu.data.missions import MissionData

        md = MissionData(root_folder, "al", ["2013"], ["04"],
                         latitude_range=NORTH_SEA_LAT, longitude_range=NORTH_SEA_LON)
        if len(md):
            return md.observations("sla_filtered")
    extent = (*NORTH_SEA_LON, *NORTH_SEA_LAT)
    syn = SyntheticGulfStream(satellite_name="envisat", seed=7, extent=extent,
                              trajectory_gradient=2, track_sparsity=0.4)
    lon, lat, val = syn._obs()
    return lon, lat, val


def run(
    root_folder: str | None = None,
    n_grid: int = 20,
    n_iters: int = 500,
    learning_rate: float = 0.01,
    max_obs: int = 20000,
    outdir: str | None = None,
) -> Dict:
    lon, lat, sla = _load_obs(root_folder)
    if len(sla) > max_obs:
        idx = np.random.default_rng(0).choice(len(sla), max_obs, replace=False)
        lon, lat, sla = lon[idx], lat[idx], sla[idx]

    x1, lo1, hi1 = min_max_scaling(jnp.asarray(lon, jnp.float32))
    x2, lo2, hi2 = min_max_scaling(jnp.asarray(lat, jnp.float32))
    X = jnp.stack([x1, x2], axis=1)
    y = jnp.asarray(sla, jnp.float32)

    grids = (CellIntegralFeature.from_lims(n_grid, 0.0, 1.0),
             CellIntegralFeature.from_lims(n_grid, 0.0, 1.0))
    specs = {
        "asvgp": sgpr.SGPRSpec(
            kinds=("matern12", "matern12"),
            features=(B1SplineFeature(np.linspace(0, 1, n_grid + 1)),
                      B1SplineFeature(np.linspace(0, 1, n_grid + 1)))),
        "griddedgp": sgpr.SGPRSpec(
            kinds=("matern12", "matern12"),
            features=(CellIntegralFeature.from_lims(n_grid, 0.0, 1.0),
                      CellIntegralFeature.from_lims(n_grid, 0.0, 1.0))),
    }

    results: Dict = {"n_obs": int(len(sla)), "models": {}}
    for name, spec in specs.items():
        p0 = train.non_informative_init(spec.init_params(), X, y)
        t0 = time.time()
        p_fit, hist = train.fit(lambda q: sgpr.loss(spec, q, X, y), p0,
                                n_iters, learning_rate)
        wall = time.time() - t0
        qv = jax.jit(lambda p, s=spec: sgpr.q_v(s, p, X, y, grids, full_cov=False))(p_fit)
        results["models"][name] = {
            "final_loss": float(np.asarray(hist["loss"])[-1]),
            "steps_per_sec": n_iters / wall,
            "qv_mean": np.asarray(qv.mean).reshape(n_grid, n_grid),
            "qv_var": np.asarray(qv.var).reshape(n_grid, n_grid),
        }

    if outdir:
        os.makedirs(outdir, exist_ok=True)
        plotting.plot_grid_heatmaps(
            {n: r["qv_mean"] for n, r in results["models"].items()},
            title="North Sea gridded SLA q(v) means",
            path=os.path.join(outdir, "qv_means.png"))
        plotting.plot_grid_heatmaps(
            {n: r["qv_var"] for n, r in results["models"].items()},
            title="North Sea q(v) variances",
            path=os.path.join(outdir, "qv_vars.png"))
        with open(os.path.join(outdir, "summary.json"), "w") as fh:
            json.dump({n: {"final_loss": r["final_loss"],
                           "steps_per_sec": round(r["steps_per_sec"], 2)}
                       for n, r in results["models"].items()}, fh, indent=2)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--root", default=None, help="CMEMS mission archive root")
    ap.add_argument("--outdir", default="results/northsea")
    args = ap.parse_args()
    res = run(root_folder=args.root, n_iters=args.iters, outdir=args.outdir)
    print(f"n_obs={res['n_obs']}")
    for name, r in res["models"].items():
        print(f"{name:<10} loss={r['final_loss']:+.2f} it/s={r['steps_per_sec']:.1f}")


if __name__ == "__main__":
    main()
