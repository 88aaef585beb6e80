"""Shared tiny family cases for on-device numerics smoke checks.

bench.py's smoke() evaluates these on the real TPU with traced arguments and
compares against CPU-float64 goldens (tools/gen_family_goldens.py). The
coregion / sum / additive / streaming paths are exactly the ones CPU f64
tests cannot protect on TPU (default-bf16 matmuls, f32 exp error —
CLAUDE.md), so they get device-side goldens like the kernel rows.

Keep these builders DETERMINISTIC and in one place: the golden generator and
the device check must see identical inputs, specs, and params.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from vggp_tpu.features import CellIntegralFeature, OutputFeature
from vggp_tpu.models import additive, sgpr, svgp
from vggp_tpu.models import sum as msum


def family_inputs(dtype):
    """Deterministic inputs for the family smoke rows, in the given dtype."""
    rng = np.random.default_rng(42)
    n = 96
    x = np.sort(rng.uniform(0.0, 1.0, n))
    task = rng.integers(0, 2, n)
    f0 = np.sin(5.0 * x)
    y = np.where(task == 0, f0, 0.7 * f0 + 0.2) + 0.05 * rng.standard_normal(n)
    X_mo = jnp.asarray(np.stack([x, task.astype(np.float64)], 1), dtype)
    y_mo = jnp.asarray(y, dtype)

    X2 = jnp.asarray(rng.random((80, 2)), dtype)
    y2 = jnp.asarray(np.sin(4 * np.asarray(X2[:, 0])) * np.asarray(X2[:, 1])
                     + 0.05 * rng.standard_normal(80), dtype)
    return X_mo, y_mo, X2, y2


def family_specs():
    feat = CellIntegralFeature.from_lims(12, 0.0, 1.0)
    out = OutputFeature(n_outputs=2)
    spec_mo = sgpr.SGPRSpec(kinds=("matern12", "coregion"),
                            features=(feat, out))
    feats2 = (CellIntegralFeature.from_lims(10, 0.0, 1.0),
              CellIntegralFeature.from_lims(9, 0.0, 1.0))
    spec_sum = msum.SumSGPRSpec(components=(
        sgpr.SGPRSpec(kinds=("matern32", "matern32"), features=feats2),
        sgpr.SGPRSpec(kinds=("matern12", "matern12"), features=feats2),
    ))
    spec_add = additive.AdditiveSGPRSpec(kinds=("matern32", "matern32"),
                                         features=feats2)
    feat_s = CellIntegralFeature.from_lims(12, 0.0, 1.0)
    spec_st = svgp.SVGPSpec(kinds=("matern32",), features=(feat_s,),
                            num_data=96, variational="full")
    return spec_mo, spec_sum, spec_add, spec_st, feat, out, feats2


def family_params(spec_mo, dtype):
    p_mo = spec_mo.init_params(dtype)
    axes = list(p_mo["axes"])
    axes[0] = dict(axes[0], variance=jnp.asarray(0.9, dtype),
                   lengthscale=jnp.asarray(0.22, dtype))
    p_mo["axes"] = tuple(axes)
    p_mo["noise"] = jnp.asarray(0.02, dtype)

    hyp32 = {"variance": jnp.asarray(0.8, dtype),
             "lengthscale": jnp.asarray(0.35, dtype)}
    hyp12 = {"variance": jnp.asarray(0.4, dtype),
             "lengthscale": jnp.asarray(0.12, dtype)}
    p_sum = {"components": ({"axes": (dict(hyp32), dict(hyp32))},
                            {"axes": (dict(hyp12), dict(hyp12))}),
             "noise": jnp.asarray(0.03, dtype)}
    p_add = {"axes": (dict(hyp32), dict(hyp32)),
             "noise": jnp.asarray(0.03, dtype)}
    p_st = {"axes": ({"variance": jnp.asarray(1.1, dtype),
                      "lengthscale": jnp.asarray(0.27, dtype)},),
            "noise": jnp.asarray(0.04, dtype)}
    return p_mo, p_sum, p_add, p_st


def cg_case(dtype):
    """Matrix-free CG q_v mean at m = 16384 cells (models.iterative through
    the complex-free ops.realfft Toeplitz matvec on the axon backend) — the
    scalability path that previously had zero on-device evidence (VERDICT
    r3 #1). Returns (compute, args); compute(p, x, y) → Σ|E_q[v]| over a
    20-cell product grid."""
    from vggp_tpu.models import iterative

    rng = np.random.default_rng(14)
    x = jnp.asarray(np.sort(rng.uniform(size=256)), dtype)
    y = jnp.asarray(np.sin(7 * np.asarray(x))
                    + 0.05 * rng.standard_normal(256), dtype)
    feat = CellIntegralFeature.from_lims(16384, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(feat,))
    p = {"axes": ({"variance": jnp.asarray(1.0, dtype),
                   "lengthscale": jnp.asarray(0.25, dtype)},),
         "noise": jnp.asarray(0.05, dtype)}
    grid = (CellIntegralFeature.from_lims(20, 0.0, 1.0),)

    def compute(p, x, y):
        mean = iterative.q_v_mean_cg(spec, p, x, y, grid, maxiter=600)
        return jnp.sum(jnp.abs(mean))

    return compute, (p, x, y)


def hyperpost_case(dtype):
    """Marginalized-head case (Laplace + short HMC) for the on-device smoke.

    The f32 TPU Hessian of a converged collapsed bound is exactly where
    hyperpost numerics bite (measured indefinite with eig −9.8; the
    saddle-free |H| floor exists for it — hyperpost.laplace docstring), so
    the marginalized heads get device-side coverage. NOTE: eigh eigenvector
    SIGNS are backend-dependent, so the Laplace/HMC draws differ draw-by-
    draw across backends even at equal dtype — the observables below are
    S-averaged mixture moments, stable only to MC error. bench.smoke()
    therefore asserts them within a LOOSE statistical tolerance (15%),
    which still catches the real failure modes (NaN chains, exploded
    1/floor variances, sign-flipped curvature).

    Returns (compute, args); compute(p, x, y, key) → dict of scalars.
    """
    import jax

    from vggp_tpu import hyperpost

    rng = np.random.default_rng(23)
    x = jnp.asarray(np.sort(rng.uniform(size=64)), dtype)
    y = jnp.asarray(np.sin(5 * np.asarray(x))
                    + 0.05 * rng.standard_normal(64), dtype)
    feat = CellIntegralFeature.from_lims(10, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(feat,))
    p = {"axes": ({"variance": jnp.asarray(0.9, dtype),
                   "lengthscale": jnp.asarray(0.3, dtype)},),
         "noise": jnp.asarray(0.04, dtype)}
    grid = (feat,)

    def compute(p, x, y, key):
        def loss_fn(q):
            return sgpr.loss(spec, q, x, y)

        st = hyperpost.laplace(loss_fn, p)
        k1, k2 = jax.random.split(key)
        marg = hyperpost.predict_marginalized(
            lambda q: sgpr.q_v(spec, q, x, y, grid, full_cov=False),
            st, k1, n_samples=64)
        res = hyperpost.hmc_sample_params(loss_fn, st, k2, n_samples=64,
                                          n_chains=2, n_warmup=32)
        hmc_marg = hyperpost.predict_marginalized_draws(
            lambda q: sgpr.q_v(spec, q, x, y, grid, full_cov=False),
            res.draws)
        return {
            "laplace_marg_qv_mean_sum": jnp.sum(marg.mean),
            "laplace_marg_qv_var_sum": jnp.sum(marg.var),
            "hmc_accept_rate": res.accept_rate,
            "hmc_marg_qv_mean_sum": jnp.sum(hmc_marg.mean),
            "hmc_marg_qv_var_sum": jnp.sum(hmc_marg.var),
        }

    import jax

    return compute, (p, x, y, jax.random.PRNGKey(17))


def family_values(dtype):
    """Scalar observables per family — what the goldens pin.

    Everything is a plain function of (traced) params and data so a jit of
    this function on device cannot be constant-folded on the host.
    """
    from vggp_tpu import streaming

    X_mo, y_mo, X2, y2 = family_inputs(dtype)
    spec_mo, spec_sum, spec_add, spec_st, feat, out, feats2 = family_specs()
    p_mo, p_sum, p_add, p_st = family_params(spec_mo, dtype)

    def compute(p_mo, p_sum, p_add, p_st, X_mo, y_mo, X2, y2):
        vals = {}
        vals["coregion_elbo"] = sgpr.elbo(spec_mo, p_mo, X_mo, y_mo)
        qv_mo = sgpr.q_v(spec_mo, p_mo, X_mo, y_mo, (feat, out), full_cov=False)
        vals["coregion_qv_mean_sum"] = jnp.sum(qv_mo.mean)
        vals["coregion_qv_var_sum"] = jnp.sum(qv_mo.var)

        vals["sum_elbo"] = msum.elbo(spec_sum, p_sum, X2, y2)
        g_sum = msum.posterior(spec_sum, p_sum, X2, y2, X2[:16], full_cov=False)
        vals["sum_post_mean_sum"] = jnp.sum(g_sum.mean)
        vals["sum_post_var_sum"] = jnp.sum(g_sum.var)

        vals["additive_elbo"] = additive.elbo(spec_add, p_add, X2, y2)
        qv_ad = additive.q_v(spec_add, p_add, X2, y2, feats2, full_cov=False)
        vals["additive_qv_mean_sum"] = jnp.sum(qv_ad.mean)
        vals["additive_qv_var_sum"] = jnp.sum(qv_ad.var)

        x_s = X_mo[:, 0]
        st0 = streaming.init_state(spec_st, dtype)
        st1 = streaming.assimilate(spec_st, p_st, st0, x_s[:48], y_mo[:48])
        st2 = streaming.assimilate(spec_st, p_st, st1, x_s[48:], y_mo[48:])
        p_q = streaming.to_params(spec_st, p_st, st2)
        xq = jnp.asarray(np.linspace(0.05, 0.95, 8), dtype)
        g_st = svgp.posterior(spec_st, p_q, xq, full_cov=False)
        vals["streaming_post_mean_sum"] = jnp.sum(g_st.mean)
        vals["streaming_post_var_sum"] = jnp.sum(g_st.var)
        return vals

    return compute, (p_mo, p_sum, p_add, p_st, X_mo, y_mo, X2, y2)
