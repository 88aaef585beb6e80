"""Matrix-free scale study: CG gridded means + pathwise uncertainty at sizes
no dense pipeline can represent.

- 1D m = 262 144 cells (a dense B = I + AAᵀ would be 275 GB)
- 2D 1024×1024 = 1 048 576 inducing cells
- 512² pathwise q(v) draws (two CG solves per sample) for the uncertainty
  field at a size whose dense q_v covariance path is the practical limit

Writes results/scaling/cg.json. Timings are one jitted call each (CG is a
lax.while_loop — a scan-of-solves would multiply minutes), forced by a
device→host transfer; compile excluded via one warmup.
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from vggp_tpu.features import CellIntegralFeature
from vggp_tpu.models import iterative, sgpr


def timed(fn, *args):
    out = jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    return out, time.perf_counter() - t0


def var_accuracy_study(rng, X2, y2, grid2, p2):
    """Variance ACCURACY at a dense-feasible 64² grid (VERDICT r4 #3).

    Dense ``sgpr.q_v`` var is the oracle; the S-vs-error curve A/Bs the raw
    estimator against antithetic+control-variate (VR) under TWO data
    configurations: ``uniform`` (4096 points everywhere — every cell data-
    dense, the adversarial case for the prior control variate) and
    ``tracks`` (8 diagonal tracks — the actual altimetry product setting,
    most cells data-free, where the exact-diag(Kvv) CV removes the shared
    prior-path noise). On-device f32.

    Reading the numbers: an antithetic pair has mirrored deviations, so S
    draws carry S/2 independent squared deviations — at EQUAL S the VR
    variance is ~√2 noisier in data-dense cells, but each pair shares one
    Kuu solve (~1.8× faster per draw: the 512² rows), the MEAN is exact,
    and in data-sparse cells the CV recovers far more than √2.
    """
    out = {}
    feats4 = (CellIntegralFeature.from_lims(64, 0.0, 1.0),
              CellIntegralFeature.from_lims(64, 0.0, 1.0))
    spec4 = sgpr.SGPRSpec(kinds=("matern12", "matern12"), features=feats4)

    # track-like obs: 8 diagonal passes, 512 samples each
    tt = np.linspace(0.0, 1.0, 512)
    xs_tr, ys_tr = [], []
    for i in range(8):
        off = (i + 0.5) / 8.0
        xs_tr.append(np.stack([tt, (tt + off) % 1.0], 1))
    X_tr = jnp.asarray(np.concatenate(xs_tr), jnp.float32)
    y_tr = jnp.asarray(np.sin(5 * np.asarray(X_tr[:, 0]))
                       * np.cos(4 * np.asarray(X_tr[:, 1]))
                       + 0.05 * rng.standard_normal(X_tr.shape[0]), jnp.float32)

    for name, Xc, yc in (("uniform", X2, y2), ("tracks", X_tr, y_tr)):
        dense_g = jax.block_until_ready(jax.jit(
            lambda p: sgpr.q_v(spec4, p, Xc, yc, grid2, full_cov=False))(p2))
        dvar = np.asarray(dense_g.var, np.float64)
        dmean = np.asarray(dense_g.mean, np.float64)
        curve = {}
        for S in (8, 16, 32, 64, 128):
            row = {}
            for mode, anti in (("raw", False), ("vr", True)):
                fS = jax.jit(lambda p, k, S=S, anti=anti: iterative.q_v_pathwise(
                    spec4, p, Xc, yc, grid2, k, n_samples=S, n_features=2048,
                    maxiter=600, kuu_maxiter=1200, antithetic=anti,
                    control_variate=anti))
                g = jax.block_until_ready(fS(p2, jax.random.PRNGKey(11)))
                var_err = np.abs(np.asarray(g.var, np.float64) - dvar) / dvar
                mean_err = np.abs(np.asarray(g.mean, np.float64) - dmean)
                row[mode] = {
                    "var_rel_err_mean": float(np.mean(var_err)),
                    "var_rel_err_max": float(np.max(var_err)),
                    "mean_abs_err_max": float(np.max(mean_err)),
                }
            curve[f"S{S}"] = row
            print(f"64² {name} S={S}: var rel err raw "
                  f"{row['raw']['var_rel_err_mean']:.4f} -> vr "
                  f"{row['vr']['var_rel_err_mean']:.4f}")
        # bias-floor check: the raw S-curve flattens above the sqrt(2/S) MC
        # theory — if S=128 error drops with 4x the RFF features, the floor
        # is prior-path fidelity (n_features), not the estimator
        fB = jax.jit(lambda p, k: iterative.q_v_pathwise(
            spec4, p, Xc, yc, grid2, k, n_samples=128, n_features=8192,
            maxiter=600, kuu_maxiter=1200))
        gB = jax.block_until_ready(fB(p2, jax.random.PRNGKey(11)))
        bias_err = float(np.mean(
            np.abs(np.asarray(gB.var, np.float64) - dvar) / dvar))
        print(f"64² {name} S=128 nF=8192 raw: var rel err {bias_err:.4f}")
        out[f"pathwise_var_accuracy_64x64_{name}"] = {
            "m": 64 * 64, "oracle": "dense sgpr.q_v var (on-device f32)",
            "n_features": 2048, "n_obs": int(Xc.shape[0]),
            "var_rel_err_vs_dense": curve["S64"]["vr"]["var_rel_err_mean"],
            "s_curve": curve,
            "s128_nf8192_raw_var_rel_err_mean": bias_err,
        }
        assert curve["S64"]["vr"]["var_rel_err_mean"] < 0.5
    return out


def main():
    import sys

    print("backend:", jax.default_backend())
    results = {}
    rng = np.random.default_rng(0)

    if "--only-var" in sys.argv:
        # rerun just the variance-accuracy section, merging into cg.json
        n2 = 4096
        X2 = jnp.asarray(rng.random((n2, 2)), jnp.float32)
        y2 = jnp.asarray(np.sin(5 * np.asarray(X2[:, 0]))
                         * np.cos(4 * np.asarray(X2[:, 1]))
                         + 0.05 * rng.standard_normal(n2), jnp.float32)
        p2 = {"axes": ({"variance": jnp.asarray(1.0, jnp.float32),
                        "lengthscale": jnp.asarray(0.15, jnp.float32)},
                       {"variance": jnp.asarray(1.0, jnp.float32),
                        "lengthscale": jnp.asarray(0.15, jnp.float32)}),
              "noise": jnp.asarray(0.05, jnp.float32)}
        grid2 = (CellIntegralFeature.from_lims(16, 0.0, 1.0),
                 CellIntegralFeature.from_lims(16, 0.0, 1.0))
        merged = {}
        if os.path.exists("results/scaling/cg.json"):
            merged = json.load(open("results/scaling/cg.json"))
        merged.update(var_accuracy_study(rng, X2, y2, grid2, p2))
        os.makedirs("results/scaling", exist_ok=True)
        with open("results/scaling/cg.json", "w") as fh:
            json.dump(merged, fh, indent=2)
        print(json.dumps(merged))
        return

    # --- 1D, m = 2^18 cells -------------------------------------------------
    n = 2048
    x = jnp.asarray(np.sort(rng.uniform(size=n)), jnp.float32)
    y = jnp.asarray(np.sin(9 * np.asarray(x)) + 0.05 * rng.standard_normal(n),
                    jnp.float32)
    m1 = 262_144
    spec1 = sgpr.SGPRSpec(kinds=("matern12",),
                          features=(CellIntegralFeature.from_lims(m1, 0.0, 1.0),))
    p1 = {"axes": ({"variance": jnp.asarray(1.0, jnp.float32),
                    "lengthscale": jnp.asarray(0.2, jnp.float32)},),
          "noise": jnp.asarray(0.05, jnp.float32)}
    grid1 = (CellIntegralFeature.from_lims(24, 0.0, 1.0),)
    f1 = jax.jit(lambda p: iterative.q_v_mean_cg(spec1, p, x, y, grid1,
                                                 maxiter=800))
    mean1, dt1 = timed(f1, p1)
    truth1 = np.array([(np.cos(9 * a) - np.cos(9 * b)) / 9.0
                       for a, b in zip(grid1[0].mesh[:-1], grid1[0].mesh[1:])])
    corr1 = float(np.corrcoef(np.asarray(mean1), truth1)[0, 1])
    results["cg_1d_m262144"] = {"m": m1, "n": n, "seconds": dt1,
                                "corr_vs_truth": corr1}
    print(f"1D m={m1}: q_v mean in {dt1:.2f}s, corr {corr1:.4f}")
    assert corr1 > 0.99

    # --- 2D, 1024 x 1024 = 1.05M inducing cells -----------------------------
    n2 = 4096
    X2 = jnp.asarray(rng.random((n2, 2)), jnp.float32)
    y2 = jnp.asarray(np.sin(5 * np.asarray(X2[:, 0]))
                     * np.cos(4 * np.asarray(X2[:, 1]))
                     + 0.05 * rng.standard_normal(n2), jnp.float32)
    feats2 = (CellIntegralFeature.from_lims(1024, 0.0, 1.0),
              CellIntegralFeature.from_lims(1024, 0.0, 1.0))
    spec2 = sgpr.SGPRSpec(kinds=("matern12", "matern12"), features=feats2)
    p2 = {"axes": ({"variance": jnp.asarray(1.0, jnp.float32),
                    "lengthscale": jnp.asarray(0.15, jnp.float32)},
                   {"variance": jnp.asarray(1.0, jnp.float32),
                    "lengthscale": jnp.asarray(0.15, jnp.float32)}),
          "noise": jnp.asarray(0.05, jnp.float32)}
    grid2 = (CellIntegralFeature.from_lims(16, 0.0, 1.0),
             CellIntegralFeature.from_lims(16, 0.0, 1.0))
    f2 = jax.jit(lambda p: iterative.q_v_mean_cg(spec2, p, X2, y2, grid2,
                                                 maxiter=600))
    mean2, dt2 = timed(f2, p2)
    i1 = np.array([(np.cos(5 * a) - np.cos(5 * b)) / 5.0
                   for a, b in zip(grid2[0].mesh[:-1], grid2[0].mesh[1:])])
    i2 = np.array([(np.sin(4 * b) - np.sin(4 * a)) / 4.0
                   for a, b in zip(grid2[1].mesh[:-1], grid2[1].mesh[1:])])
    truth2 = np.kron(i1, i2)
    corr2 = float(np.corrcoef(np.asarray(mean2), truth2)[0, 1])
    results["cg_2d_1024x1024"] = {"m": 1024 * 1024, "n": n2, "seconds": dt2,
                                  "corr_vs_truth": corr2}
    print(f"2D 1024²={1024*1024}: q_v mean in {dt2:.2f}s, corr {corr2:.4f}")
    assert corr2 > 0.98

    # --- pathwise uncertainty at 512² (S = 32, two CG solves per draw) ------
    feats3 = (CellIntegralFeature.from_lims(512, 0.0, 1.0),
              CellIntegralFeature.from_lims(512, 0.0, 1.0))
    spec3 = sgpr.SGPRSpec(kinds=("matern12", "matern12"), features=feats3)
    f3 = jax.jit(lambda p, k: iterative.q_v_pathwise(
        spec3, p, X2, y2, grid2, k, n_samples=32, n_features=1024,
        maxiter=400, kuu_maxiter=800))
    g3, dt3 = timed(f3, p2, jax.random.PRNGKey(5))
    var3 = np.asarray(g3.var)
    ok3 = bool(np.all(np.isfinite(var3)) and np.min(var3) > 0)
    results["pathwise_2d_512x512_s32"] = {
        "m": 512 * 512, "n_samples": 32, "seconds": dt3,
        "var_finite_positive": ok3,
        "mean_corr_vs_truth": float(np.corrcoef(np.asarray(g3.mean),
                                                truth2)[0, 1]),
    }
    print(f"pathwise 512² S=32: {dt3:.2f}s, var ok {ok3}")
    assert ok3

    # variance-reduced 512² run (antithetic pairs + exact-diag(Kvv) control
    # variate): the mean is exact-by-construction, and each pair shares one
    # Kuu solve, so S=32 VR costs LESS than S=32 raw
    f3v = jax.jit(lambda p, k: iterative.q_v_pathwise(
        spec3, p, X2, y2, grid2, k, n_samples=32, n_features=1024,
        maxiter=400, kuu_maxiter=800, antithetic=True, control_variate=True))
    g3v, dt3v = timed(f3v, p2, jax.random.PRNGKey(5))
    var3v = np.asarray(g3v.var)
    results["pathwise_2d_512x512_s32_vr"] = {
        "m": 512 * 512, "n_samples": 32, "seconds": dt3v,
        "var_finite_positive": bool(np.all(np.isfinite(var3v))
                                    and np.min(var3v) > 0),
        "mean_corr_vs_truth": float(np.corrcoef(np.asarray(g3v.mean),
                                                truth2)[0, 1]),
    }
    print(f"pathwise 512² S=32 VR: {dt3v:.2f}s, "
          f"corr {results['pathwise_2d_512x512_s32_vr']['mean_corr_vs_truth']:.5f}")

    results.update(var_accuracy_study(rng, X2, y2, grid2, p2))

    os.makedirs("results/scaling", exist_ok=True)
    with open("results/scaling/cg.json", "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
