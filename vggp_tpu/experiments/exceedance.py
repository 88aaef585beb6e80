"""Uncertainty propagation through nonlinear JOINT functionals via pathwise
posterior sampling — the capability the pointwise-moments-only reference
fundamentally lacks.

Climate products need more than per-location error bars: "what is the
distribution of the AREA where SSH exceeds τ?" and "how high could the
field's MAXIMUM plausibly be?" are functionals of the whole latent surface
at once. Marginal moments cannot answer them — treating locations as
independent shrinks the variance of spatial averages (the indicators decoher
under averaging) and inflates the maximum (4096 independent chances to be
high). Coherent function draws from Matheron's rule (``vggp_tpu.sampling``)
answer both correctly, and the per-point sample moments double as an
on-device validation of the sampler against the analytic posterior.

Truth: a smooth two-scale field (nb3's multiscale-pattern idea); n noisy
point observations; 2-D Kronecker SVGP (cell-integral features) fit by
minibatch Adam; functionals evaluated on a dense evaluation lattice.

Run: ``python -m vggp_tpu.experiments.exceedance [--iters N] [--outdir D]``
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

from vggp_tpu import sampling, train
from vggp_tpu.experiments import plotting
from vggp_tpu.features import CellIntegralFeature
from vggp_tpu.models import svgp


def field(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Two-scale smooth truth (large gyre + shorter-scale meanders)."""
    return (np.sin(3.0 * x) * np.cos(2.0 * y)
            + 0.5 * np.sin(7.0 * x + 1.0) * np.cos(5.0 * y + 0.5))


def generate_obs(n: int, noise: float, seed: int):
    rng = np.random.default_rng(seed)
    X = rng.random((n, 2))
    y = field(X[:, 0], X[:, 1]) + noise * rng.standard_normal(n)
    return X, y


def run(
    m_side: int = 32,
    n_eval: int = 64,
    n_obs: int = 5000,
    noise: float = 0.05,
    n_iters: int = 8000,
    batch_size: int = 1024,
    learning_rate: float = 0.05,
    n_samples: int = 256,
    n_features: int = 2048,
    seed: int = 0,
    outdir: str | None = None,
) -> Dict:
    X, y = generate_obs(n_obs, noise, seed)
    Xj, yj = jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32)

    feats = tuple(CellIntegralFeature.from_lims(m_side, 0.0, 1.0) for _ in range(2))
    spec = svgp.SVGPSpec(kinds=("matern32", "matern32"), features=feats,
                         num_data=n_obs, variational="kron")
    p0 = train.non_informative_init(spec.init_params(jnp.float32), Xj, yj)
    t0 = time.time()
    p_fit, hist = train.fit_minibatch(
        lambda q, xb, yb: svgp.loss(spec, q, xb, yb), p0, Xj, yj,
        n_iters=n_iters, batch_size=batch_size, learning_rate=learning_rate,
        seed=seed)
    wall = time.time() - t0

    # dense evaluation lattice + truth functionals
    g = (np.arange(n_eval) + 0.5) / n_eval
    GX, GY = np.meshgrid(g, g, indexing="ij")
    Xg = jnp.asarray(np.stack([GX.ravel(), GY.ravel()], -1), jnp.float32)
    truth = field(GX, GY).ravel()
    tau = float(np.quantile(truth, 0.8))
    area_truth = float(np.mean(truth > tau))
    max_truth = float(truth.max())

    post = jax.jit(lambda p: svgp.posterior(spec, p, Xg, full_cov=False))(p_fit)
    mean = np.asarray(post.mean)
    std = np.sqrt(np.asarray(post.var))

    samp = np.asarray(jax.jit(
        lambda p, k: sampling.pathwise_posterior(
            spec, p, k, Xg, n_samples=n_samples, n_features=n_features)
    )(p_fit, jax.random.PRNGKey(seed + 1)))          # (S, n_eval²)

    # on-device sampler validation: per-point sample moments vs analytic
    mean_err = float(np.abs(samp.mean(0) - mean).max())
    var_rel = np.abs(samp.var(0) - std**2) / np.maximum(std**2, 1e-6)

    # joint functionals: coherent pathwise vs (wrong) independent marginals
    rng = np.random.default_rng(seed + 2)
    indep = mean[None, :] + std[None, :] * rng.standard_normal((n_samples, mean.size))
    area_path = (samp > tau).mean(axis=1)
    area_indep = (indep > tau).mean(axis=1)
    max_path = samp.max(axis=1)
    max_indep = indep.max(axis=1)

    def dist(v):
        return {"mean": float(np.mean(v)), "std": float(np.std(v)),
                "q05": float(np.quantile(v, 0.05)), "q95": float(np.quantile(v, 0.95))}

    # ---- product-level: coherent draws of the gridded product itself ----
    # The library's headline output is q(v) (cell averages of the latent
    # field); pathwise_q_v gives JOINT draws of those functionals with the
    # prior-path integrals taken in closed form — so exceedance areas and
    # extremes of the GRIDDED PRODUCT get full distributions too.
    n_cells = 32
    pg = tuple(CellIntegralFeature.from_lims(n_cells, 0.0, 1.0) for _ in range(2))
    cell_area = (1.0 / n_cells) ** 2
    qv = jax.jit(lambda p: svgp.q_v(spec, p, pg, full_cov=False))(p_fit)
    v_mean = np.asarray(qv.mean) / cell_area
    v_std = np.sqrt(np.asarray(qv.var)) / cell_area
    vs = np.asarray(jax.jit(
        lambda p, k: sampling.pathwise_q_v(
            spec, p, k, pg, n_samples=n_samples, n_features=n_features)
    )(p_fit, jax.random.PRNGKey(seed + 3))) / cell_area       # (S, c²) means

    # truth cell means by per-cell Gauss–Legendre (q=8 nodes/axis: exact to
    # machine precision for this smooth field)
    nodes, wts = np.polynomial.legendre.leggauss(8)
    edges = np.linspace(0.0, 1.0, n_cells + 1)
    half = 0.5 * (edges[1:] - edges[:-1])
    mid = 0.5 * (edges[1:] + edges[:-1])
    xq = mid[:, None] + half[:, None] * nodes[None, :]        # (c, 8)
    wq = half[:, None] * wts[None, :]                          # (c, 8)
    Fq = field(xq[:, :, None, None], xq[None, None, :, :])     # (c,8,c,8)
    truth_v = np.einsum("ip,jr,ipjr->ij", wq, wq, Fq) / cell_area
    tau_v = float(np.quantile(truth_v.ravel(), 0.8))
    indep_v = v_mean[None, :] + v_std[None, :] * np.random.default_rng(
        seed + 4).standard_normal((n_samples, v_mean.size))

    results: Dict = {
        "final_loss": float(np.asarray(hist["loss"])[-1]),
        "steps_per_sec": n_iters / wall,
        "sampler_mean_err": mean_err,
        "sampler_var_med_rel_err": float(np.median(var_rel)),
        "tau": tau,
        "area_truth": area_truth,
        "area_pathwise": dist(area_path),
        "area_independent": dist(area_indep),
        "max_truth": max_truth,
        "max_pathwise": dist(max_path),
        "max_independent": dist(max_indep),
        "n_obs": n_obs, "m_total": m_side**2,
        "n_samples": n_samples, "n_features": n_features,
        "product": {
            "n_cells": n_cells,
            "tau": tau_v,
            "qv_mean_rmse": float(np.sqrt(np.mean(
                (v_mean - truth_v.ravel()) ** 2))),
            "sampler_mean_err": float(np.abs(vs.mean(0) - v_mean).max()),
            "area_truth": float(np.mean(truth_v.ravel() > tau_v)),
            "area_pathwise": dist((vs > tau_v).mean(axis=1)),
            "area_independent": dist((indep_v > tau_v).mean(axis=1)),
            "max_truth": float(truth_v.max()),
            "max_pathwise": dist(vs.max(axis=1)),
            "max_independent": dist(indep_v.max(axis=1)),
        },
    }

    if outdir:
        os.makedirs(outdir, exist_ok=True)
        with open(os.path.join(outdir, "metrics.json"), "w") as fh:
            json.dump(results, fh, indent=2)
        exc_prob = (samp > tau).mean(axis=0).reshape(n_eval, n_eval)
        plotting.plot_grid_heatmaps(
            {"truth field": truth.reshape(n_eval, n_eval),
             "posterior mean": mean.reshape(n_eval, n_eval),
             f"P[f > {tau:.2f}] (pathwise)": exc_prob},
            title="exceedance probability from coherent posterior samples",
            path=os.path.join(outdir, "exceedance.png"))
    return results


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--iters", type=int, default=8000)
    ap.add_argument("--m-side", type=int, default=32)
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--outdir", default="results/exceedance")
    args = ap.parse_args()
    res = run(m_side=args.m_side, n_iters=args.iters, n_samples=args.samples,
              outdir=args.outdir)
    print(json.dumps(res, default=float))


if __name__ == "__main__":
    main()
