"""Verification drive: real GP fits + gridded prediction on the TPU device."""
import numpy as np
import jax
import jax.numpy as jnp

from vggp_tpu import train
from vggp_tpu.features import (B1SplineFeature, CellIntegralFeature,
                               FourierFeature, PointFeature)
from vggp_tpu.models import exact, sgpr, svgp
from vggp_tpu.utils.datagen import gen_1d, gen_2d
from vggp_tpu.utils.integrators import integrate_1d

print("backend:", jax.default_backend())
f = lambda x: np.sin(5.0 * x) + np.cos(2.0 * x)
X, y = gen_1d(f, 0.0, 1.0, 15)
X, y = jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32)
y = y + 0.05 * jnp.asarray(np.random.default_rng(0).standard_normal(15), jnp.float32)
grid = CellIntegralFeature.from_lims(10, 0.0, 1.0)
truth, _ = integrate_1d(f, np.asarray(grid.mesh))

# exact GP
spec_e = exact.ExactGPSpec(kinds=("matern12",))
p0 = train.non_informative_init(spec_e.init_params(jnp.float32), X, y)
p_e, hist = train.fit(lambda p: exact.loss(spec_e, p, X, y), p0, 500, 0.05)
assert np.all(np.isfinite(np.asarray(hist["loss"]))), "exact: NaN loss"
qv = exact.q_v(spec_e, p_e, X, y, (grid,))
err_e = float(np.abs(np.asarray(qv.mean) - truth).max())
assert float(np.min(np.asarray(qv.variance()))) > 0
print(f"exact    q_v err {err_e:.4f}")
assert err_e < 0.03

# Laplace hyperparameter posterior + marginalized prediction on the device
from vggp_tpu import hyperpost
from vggp_tpu.experiments import misc

loss_e = lambda p: exact.loss(spec_e, p, X, y)
xs_h = jnp.linspace(0.05, 0.95, 9, dtype=jnp.float32)
marg = jax.jit(lambda p: hyperpost.predict_marginalized(
    lambda q: exact.posterior(spec_e, q, X, y, xs_h, full_cov=False),
    hyperpost.laplace(loss_e, p), jax.random.PRNGKey(11), n_samples=64))(p_e)
plug = exact.posterior(spec_e, p_e, X, y, xs_h, full_cov=False)
assert np.all(np.isfinite(np.asarray(marg.mean)))
v_m, v_p = np.asarray(marg.variance()), np.asarray(plug.variance())
assert np.all(v_m >= 0.9 * v_p), "marginalized variance shrank below plug-in"
cal = misc.calibration_row(np.asarray([f(float(t)) for t in xs_h]), marg)
assert 0.0 <= cal["coverage95"] <= 1.0 and np.isfinite(cal["crps"])
print(f"laplace hypers: mean extra var {float(np.mean(v_m - v_p)):.2e}, "
      f"crps {cal['crps']:.4f}, coverage95 {cal['coverage95']:.2f}")

feats = {
    "svgp": PointFeature(m=12),
    "vff": FourierFeature(n_frequencies=6, a=-0.3, b=1.3),
    "asvgp": B1SplineFeature(mesh=np.linspace(-0.1, 1.1, 16)),
    "gridded": CellIntegralFeature.from_lims(10, 0.0, 1.0),
}
for name, F in feats.items():
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(F,))
    p0 = train.non_informative_init(spec.init_params(jnp.float32), X, y)
    p_f, hist = train.fit(lambda p: sgpr.loss(spec, p, X, y), p0, 500, 0.05)
    assert np.all(np.isfinite(np.asarray(hist["loss"]))), f"{name}: NaN loss"
    qv = sgpr.q_v(spec, p_f, X, y, (grid,))
    err = float(np.abs(np.asarray(qv.mean) - truth).max())
    assert float(np.min(np.asarray(qv.variance()))) > 0, name
    print(f"{name:8s} q_v err {err:.4f}")
    assert err < 0.03, (name, err)

# 2D Kronecker minibatch SVGP (the flagship path) + pathwise sampling
g2 = lambda s, t: np.sin(4 * s) * np.cos(3 * t)
X2, y2 = gen_2d(g2, (0.0, 1.0), (0.0, 1.0), 40)
X2, y2 = jnp.asarray(X2, jnp.float32), jnp.asarray(y2, jnp.float32)
y2 = y2 + 0.05 * jnp.asarray(np.random.default_rng(1).standard_normal(y2.shape[0]), jnp.float32)
spec2 = svgp.SVGPSpec(kinds=("matern12", "matern12"),
                      features=(CellIntegralFeature.from_lims(32, 0.0, 1.0),
                                CellIntegralFeature.from_lims(32, 0.0, 1.0)),
                      num_data=X2.shape[0], variational="kron")
p0 = train.non_informative_init(spec2.init_params(jnp.float32), X2, y2)
p2, hist2 = train.fit_minibatch(
    lambda p, xb, yb: svgp.loss(spec2, p, xb, yb), p0, X2, y2,
    n_iters=600, batch_size=256, learning_rate=0.05, seed=0)
losses2 = np.asarray(hist2["loss"])
assert np.all(np.isfinite(losses2)) and losses2[-1] < losses2[0]
grids2 = (CellIntegralFeature.from_lims(12, 0.0, 1.0),
          CellIntegralFeature.from_lims(12, 0.0, 1.0))
qv2 = svgp.q_v(spec2, p2, grids2, full_cov=False)
assert np.all(np.isfinite(np.asarray(qv2.mean)))
assert float(np.min(np.asarray(qv2.var))) > 0
i1, _ = integrate_1d(lambda s: np.sin(4 * s), np.asarray(grids2[0].mesh))
i2, _ = integrate_1d(lambda t: np.cos(3 * t), np.asarray(grids2[1].mesh))
truth2 = np.kron(i1, i2)
err2 = float(np.abs(np.asarray(qv2.mean) - truth2).max())
print(f"2D kron  q_v err {err2:.4f} (cell scale {np.abs(truth2).max():.4f})")
assert err2 < 0.01

# gridded-GRADIENT products (q_dv) + on-device stability of kdiff0.
# Goldens MUST be host numpy float64: evaluating 1 − k(r) through the TPU's
# f32 exp (~1e-6 abs error) is 5%-wrong at r/ℓ ≈ 4e-3 — the exact failure
# mode the stable forms exist to avoid.
from vggp_tpu import kernels as _kern

def _kdiff0_np64(kind, r, var, ell):
    z = abs(r) / ell
    if kind == "matern12":
        return var * -np.expm1(-z)
    if kind == "matern32":
        z *= np.sqrt(3.0)
        return var * (1.0 - (1.0 + z) * np.exp(-z))
    if kind == "matern52":
        z *= np.sqrt(5.0)
        return var * (1.0 - (1.0 + z + z * z / 3.0) * np.exp(-z))
    return var * -np.expm1(-0.5 * z * z)

for _kind in ("matern12", "matern32", "matern52", "rbf"):
    got = float(jax.jit(lambda r: _kern.kdiff0(
        _kind, r, jnp.float32(1.3), jnp.float32(0.27)))(jnp.float32(1e-3)))
    ref = float(_kdiff0_np64(_kind, np.float64(1e-3), 1.3, 0.27))
    assert abs(got - ref) / ref < 1e-3, (_kind, got, ref)
print("kdiff0 stable forms ok on-device")

qdv0 = jax.jit(lambda p: svgp.q_dv(spec2, p, grids2, axis=0, full_cov=False))(p2)
qdv1 = jax.jit(lambda p: svgp.q_dv(spec2, p, grids2, axis=1, full_cov=False))(p2)
# f = sin4s·cos3t: ∫cell ∂₀f = Δ(sin4s)·∫cos3t; ∫cell ∂₁f = ∫sin4s·Δ(cos3t)
truth_d0 = np.kron(np.diff(np.sin(4 * np.asarray(grids2[0].mesh))), np.asarray(i2))
truth_d1 = np.kron(np.asarray(i1), np.diff(np.cos(3 * np.asarray(grids2[1].mesh))))
assert np.all(np.isfinite(np.asarray(qdv0.mean))) and float(np.min(np.asarray(qdv0.var))) > 0
assert np.all(np.isfinite(np.asarray(qdv1.mean))) and float(np.min(np.asarray(qdv1.var))) > 0
derr0 = float(np.abs(np.asarray(qdv0.mean) - truth_d0).max())
derr1 = float(np.abs(np.asarray(qdv1.mean) - truth_d1).max())
print(f"q_dv axis0 err {derr0:.4f} (scale {np.abs(truth_d0).max():.4f}); "
      f"axis1 err {derr1:.4f} (scale {np.abs(truth_d1).max():.4f})")
assert derr0 < 0.5 * np.abs(truth_d0).max()
assert derr1 < 0.5 * np.abs(truth_d1).max()
# calibration: truth within 4σ everywhere (gradient products expose the
# posterior's own uncertainty — a broken variance path fails this loudly)
z0 = np.abs(np.asarray(qdv0.mean) - truth_d0) / np.sqrt(np.asarray(qdv0.var))
assert float(z0.max()) < 6.0, f"q_dv z-score blowup: {z0.max():.1f}"

# pointwise gradient posterior on a differentiable kernel (1D matern52 fit —
# twice differentiable, so the joint check below can include a ∂² row;
# matern32 gradient paths are driven by the freesvgp/additive fits below)
spec_g = sgpr.SGPRSpec(kinds=("matern52",),
                       features=(CellIntegralFeature.from_lims(10, 0.0, 1.0),))
p0g = train.non_informative_init(spec_g.init_params(jnp.float32), X, y)
p_g, hist_g = train.fit(lambda p: sgpr.loss(spec_g, p, X, y), p0g, 400, 0.05)
assert np.all(np.isfinite(np.asarray(hist_g["loss"])))
xg = jnp.linspace(0.05, 0.95, 24)
qg = jax.jit(lambda p: sgpr.posterior_grad(spec_g, p, X, y, xg, axis=0))(p_g)
fprime = 5.0 * np.cos(5.0 * np.asarray(xg)) - 2.0 * np.sin(2.0 * np.asarray(xg))
assert np.all(np.isfinite(np.asarray(qg.mean))) and float(np.min(np.asarray(qg.variance()))) > 0
corr = float(np.corrcoef(np.asarray(qg.mean), fprime)[0, 1])
zg = np.abs(np.asarray(qg.mean) - fprime) / np.asarray(qg.stddev())
print(f"posterior_grad corr {corr:.3f}, max |z| {zg.max():.2f}")
assert corr > 0.9 and float(zg.max()) < 6.0

# joint (f, ∇f) pathwise draws: each sample's gradient row must equal the
# finite difference of its own value row (per-sample identity, no MC slack)
from vggp_tpu import sampling as _sampling
# FD here is a smoke-level identity only: the f32 Matheron correction
# carries ~1e-4 absolute noise that decorrelates across x ± h, so the FD
# quotient floor is ~1e-4/h regardless of truncation (measured: gap 0.097
# at h=3e-3, 0.39 at 2e-4 — SMALLER h is WORSE). The tight per-sample
# identity is pinned in f64 on CPU (tests/test_gradients.py). h = 3e-3
# balances that floor against t₃-tail truncation; bound is gradient-scale
# relative with ~3× headroom over the measured 3%.
h_fd = 3e-3
x_fd = jnp.asarray([0.4 - h_fd, 0.4, 0.4 + h_fd], jnp.float32)
jd = jax.jit(lambda p: _sampling.pathwise_posterior_collapsed_with_grads(
    spec_g, p, jax.random.PRNGKey(9), X, y, x_fd, grad_axes=(0, (2,)),
    n_samples=4, n_features=256))(p_g)
jf, jg = np.asarray(jd[:, 0, :]), np.asarray(jd[:, 1, :])
jg2 = np.asarray(jd[:, 2, :])
fd_g = (jf[:, 2] - jf[:, 0]) / (2 * h_fd)
jerr = float(np.abs(fd_g - jg[:, 1]).max())
gscale = max(1.0, float(np.abs(jg[:, 1]).max()))
fd_g2 = (jg[:, 2] - jg[:, 0]) / (2 * h_fd)   # ∂² row vs FD of the ∂ row
jerr2 = float(np.abs(fd_g2 - jg2[:, 1]).max())
g2scale = max(1.0, float(np.abs(jg2[:, 1]).max()))
print(f"joint pathwise grads: per-sample FD gap {jerr:.4f} (scale {gscale:.2f}); "
      f"second-deriv gap {jerr2:.4f} (scale {g2scale:.2f})")
assert jerr < 0.1 * gscale, "pathwise gradient rows inconsistent with value rows"
assert jerr2 < 0.1 * g2scale, "pathwise second-derivative rows inconsistent"

# free-inducing-point + additive families: fit, gridded product, gradient
# heads — all on-device (matern32 so the pointwise gradient path runs too)
from vggp_tpu.models import additive, freesvgp

spec_fr = freesvgp.FreeSVGPSpec(kinds=("matern32", "matern32"), m=16)
p0fr = train.non_informative_init(
    spec_fr.init_params(jnp.float32, seed=2), X2, y2)
p_fr, h_fr = train.fit(lambda p: freesvgp.loss(spec_fr, p, X2, y2), p0fr, 200, 0.05)
assert np.all(np.isfinite(np.asarray(h_fr["loss"]))), "freesvgp: NaN loss"
qv_fr = jax.jit(lambda p: freesvgp.q_v(spec_fr, p, X2, y2, grids2))(p_fr)
qdv_fr = jax.jit(lambda p: freesvgp.q_dv(spec_fr, p, X2, y2, grids2, axis=0))(p_fr)
pg_fr = jax.jit(lambda p: freesvgp.posterior_grad(spec_fr, p, X2, y2, X2[:16], 1))(p_fr)
for g_ in (qv_fr, qdv_fr, pg_fr):
    assert np.all(np.isfinite(np.asarray(g_.mean)))
    assert float(np.min(np.asarray(g_.variance()))) >= 0
print("freesvgp fit + q_v/q_dv/posterior_grad ok")

feats_ad = (CellIntegralFeature.from_lims(12, 0.0, 1.0),
            CellIntegralFeature.from_lims(12, 0.0, 1.0))
spec_ad = additive.AdditiveSGPRSpec(kinds=("matern32", "matern32"), features=feats_ad)
p0ad = train.non_informative_init(spec_ad.init_params(jnp.float32), X2, y2)
p_ad, h_ad = train.fit(lambda p: additive.loss(spec_ad, p, X2, y2), p0ad, 200, 0.05)
assert np.all(np.isfinite(np.asarray(h_ad["loss"]))), "additive: NaN loss"
qdv_ad = jax.jit(lambda p: additive.q_dv(spec_ad, p, X2, y2, grids2, axis=1))(p_ad)
pg_ad = jax.jit(lambda p: additive.posterior_grad(spec_ad, p, X2, y2, X2[:16], 0))(p_ad)
for g_ in (qdv_ad, pg_ad):
    assert np.all(np.isfinite(np.asarray(g_.mean)))
    assert float(np.min(np.asarray(g_.variance()))) >= 0
print("additive fit + q_dv/posterior_grad ok")

# pathwise sampling on-device (new projection functionals ride this path too)
from vggp_tpu import sampling
samp = sampling.pathwise_posterior(spec2, p2, jax.random.PRNGKey(0),
                                   X2[:64], n_samples=8, n_features=256)
assert np.all(np.isfinite(np.asarray(samp))), "pathwise sampling not finite"
post = svgp.posterior(spec2, p2, X2[:64], full_cov=False)
serr = float(np.abs(np.asarray(samp).mean(0) - np.asarray(post.mean)).max())
print(f"pathwise sample-mean vs posterior-mean err {serr:.3f} (S=8 → loose)")
assert serr < 1.0

# pathwise sampling of the remaining families + the gridded product itself
spec_c = sgpr.SGPRSpec(kinds=("matern12", "matern12"),
                       features=(CellIntegralFeature.from_lims(12, 0.0, 1.0),
                                 CellIntegralFeature.from_lims(12, 0.0, 1.0)))
p0c = train.non_informative_init(spec_c.init_params(jnp.float32), X2, y2)
pc, hc = train.fit(lambda p: sgpr.loss(spec_c, p, X2, y2), p0c, 300, 0.05)
sc = sampling.pathwise(spec_c, pc, jax.random.PRNGKey(1), X2[:32],
                       data=(X2, y2), n_samples=8, n_features=256)
assert np.all(np.isfinite(np.asarray(sc))), "collapsed pathwise not finite"
sv = sampling.pathwise_q_v(spec_c, pc, jax.random.PRNGKey(2), grids2,
                           n_samples=8, n_features=256, data=(X2, y2))
assert np.all(np.isfinite(np.asarray(sv))), "q_v pathwise not finite"
verr = float(np.abs(np.asarray(sv).mean(0) - np.asarray(
    sgpr.q_v(spec_c, pc, X2, y2, grids2, full_cov=False).mean)).max())
print(f"pathwise q_v sample-mean err {verr:.3f} (S=8 → loose)")
assert verr < 1.0
spec_e = exact.ExactGPSpec(kinds=("matern32",))
pe, _ = train.fit(lambda p: exact.loss(spec_e, p, X, y),
                  spec_e.init_params(jnp.float32), 200, 0.05)
se = sampling.pathwise(spec_e, pe, jax.random.PRNGKey(3),
                       jnp.linspace(0.0, 1.0, 16), data=(X, y),
                       n_samples=8, n_features=256)
assert np.all(np.isfinite(np.asarray(se))), "exact pathwise not finite"

# observation-space sampling: push latent draws through each observation model
from vggp_tpu import likelihoods
for lname, lp in [("gaussian", {"noise": jnp.asarray(0.01)}),
                  ("bernoulli", None), ("poisson", None),
                  ("student_t", {"noise": jnp.asarray(0.01)})]:
    ys = likelihoods.sample_observations(lname, jax.random.PRNGKey(7), sc, lp)
    assert ys.shape == sc.shape and np.all(np.isfinite(np.asarray(ys))), lname
print("observation-space sampling ok (4 likelihoods)")

# natural-gradient steps on a non-conjugate (Poisson) model — elbo_muS path
rngp = np.random.default_rng(5)
Xp = jnp.asarray(np.sort(rngp.random(200)), jnp.float32)
lam_p = np.exp(1.0 + np.sin(2 * np.pi * np.asarray(Xp)))
yp = jnp.asarray(rngp.poisson(lam_p).astype(np.float32))
gp = CellIntegralFeature.from_lims(12, 0.0, 1.0)
spec_p = svgp.SVGPSpec(kinds=("matern32",), features=(gp,), num_data=200,
                       likelihood="poisson", variational="full")
p0p = train.non_informative_init(spec_p.init_params(jnp.float32), Xp, yp)
p_ng, h_ng = train.fit_natgrad(spec_p, p0p, Xp, yp, n_iters=40, gamma=0.2,
                               hyper_lr=0.02)
ng_losses = np.asarray(h_ng["loss"])
assert np.all(np.isfinite(ng_losses)), "natgrad Poisson loss not finite"
assert ng_losses[-1] < ng_losses[0], "natgrad Poisson did not improve"
lam_ng, _ = jax.jit(lambda p: svgp.predict_y(spec_p, p, Xp))(p_ng)
rel_ng = float(np.median(np.abs(np.asarray(lam_ng) - lam_p) / lam_p))
print(f"natgrad Poisson: loss {ng_losses[0]:.1f}->{ng_losses[-1]:.1f}, "
      f"median rel intensity err {rel_ng:.3f}")
assert rel_ng < 0.5

# streaming assimilation: chunked online state == batch SGPR posterior (f32)
from vggp_tpu import streaming
rngs = np.random.default_rng(6)
Xs = jnp.asarray(np.sort(rngs.random(240)), jnp.float32)
ys = jnp.asarray(np.sin(6 * np.asarray(Xs)) +
                 0.05 * rngs.standard_normal(240), jnp.float32)
gs = CellIntegralFeature.from_lims(12, 0.0, 1.0)
spec_s = svgp.SVGPSpec(kinds=("matern32",), features=(gs,), num_data=240)
cspec_s = sgpr.SGPRSpec(kinds=("matern32",), features=(gs,))
p_s = train.non_informative_init(cspec_s.init_params(jnp.float32), Xs, ys)
p_s, _ = train.fit(lambda p: sgpr.loss(cspec_s, p, Xs, ys), p_s, 300, 0.05)
p_sv = dict(spec_s.init_params(jnp.float32))
p_sv["axes"], p_sv["noise"] = p_s["axes"], p_s["noise"]
assim = jax.jit(lambda s, xb, yb: streaming.assimilate(spec_s, p_sv, s, xb, yb))
st = streaming.init_state(spec_s, jnp.float32)
st = assim(st, Xs[:100], ys[:100])
st = assim(st, Xs[100:].reshape(-1), ys[100:])
p_q = jax.jit(lambda s: streaming.to_params(spec_s, p_sv, s))(st)
xq16 = jnp.linspace(0.0, 1.0, 16)
post_s = jax.jit(lambda p: svgp.posterior(spec_s, p, xq16, full_cov=False))(p_q)
post_b = jax.jit(lambda p: sgpr.posterior(cspec_s, p, Xs, ys, xq16,
                                          full_cov=False))(p_s)
sgap = float(np.abs(np.asarray(post_s.mean) - np.asarray(post_b.mean)).max())
print(f"streaming vs batch posterior-mean gap {sgap:.2e}")
assert sgap < 1e-3, "streamed state drifted from the batch optimum"
qv_s = jax.jit(lambda p: svgp.q_v(spec_s, p, (grid,), full_cov=False))(p_q)
assert np.all(np.isfinite(np.asarray(qv_s.mean)))
assert float(np.min(np.asarray(qv_s.var))) > 0

# reanchor the stream state to shifted hyperparameters (online hyper drift)
p_sv2 = dict(p_sv)
p_sv2["axes"] = tuple(dict(ax, lengthscale=ax["lengthscale"] * 1.3)
                      for ax in p_sv["axes"])
st2 = jax.jit(lambda s: streaming.reanchor(spec_s, p_sv, p_sv2, s))(st)
p_q2 = jax.jit(lambda s: streaming.to_params(spec_s, p_sv2, s))(st2)
post_r = jax.jit(lambda p: svgp.posterior(spec_s, p, xq16, full_cov=False))(p_q2)
assert np.all(np.isfinite(np.asarray(post_r.mean)))
assert float(np.min(np.asarray(post_r.var))) > 0
rgap = float(np.abs(np.asarray(post_r.mean) - np.asarray(post_s.mean)).max())
print(f"reanchor (l x1.3) posterior-mean shift {rgap:.2e}")
assert rgap < 0.5, "reanchored posterior diverged"

# non-conjugate streaming: CVI sites on the Poisson count data from above
st_p = streaming.init_state(spec_p, jnp.float32)
ng_assim = jax.jit(lambda s, xb, yb: streaming.assimilate_natgrad(
    spec_p, p_ng, s, xb, yb, gamma=0.5, n_inner=6))
st_p = ng_assim(st_p, Xp[:100], yp[:100])
st_p = ng_assim(st_p, Xp[100:], yp[100:])
p_qp = jax.jit(lambda s: streaming.to_params(spec_p, p_ng, s))(st_p)
lam_st, _ = jax.jit(lambda p: svgp.predict_y(spec_p, p, Xp))(p_qp)
rel_st = float(np.median(np.abs(np.asarray(lam_st) - lam_p) / lam_p))
print(f"streamed Poisson (CVI sites): median rel intensity err {rel_st:.3f}")
assert np.isfinite(rel_st) and rel_st < 0.5

# --- multi-output (ICM coregion axis): joint fit + per-output q_v ----------
from vggp_tpu import kernels
from vggp_tpu.features import OutputFeature

rng_mo = np.random.default_rng(11)
n_mo = 160
x_mo = np.sort(rng_mo.uniform(0.0, 1.0, n_mo)).astype(np.float32)
task_mo = rng_mo.integers(0, 2, n_mo)
f_mo = np.sin(5.0 * x_mo)
y_mo = np.where(task_mo == 0, f_mo, 0.7 * f_mo + 0.2) \
    + 0.05 * rng_mo.standard_normal(n_mo)
X_mo = jnp.asarray(np.stack([x_mo, task_mo.astype(np.float32)], axis=1))
Y_mo = jnp.asarray(y_mo.astype(np.float32))
mesh_mo = np.linspace(0.0, 1.0, 13)
feat_mo = CellIntegralFeature(mesh=mesh_mo)
out_mo = OutputFeature(n_outputs=2)
spec_mo = sgpr.SGPRSpec(kinds=("matern12", "coregion"),
                           features=(feat_mo, out_mo))
p_mo = train.non_informative_init(spec_mo.init_params(), X_mo, Y_mo)
p_mo, hist_mo = train.fit(lambda q: sgpr.loss(spec_mo, q, X_mo, Y_mo),
                          p_mo, 400, 0.05)
assert np.all(np.isfinite(np.asarray(hist_mo["loss"]))), "ICM fit NaN"
st_mo = jax.jit(lambda p: sgpr.precompute(spec_mo, p, X_mo, Y_mo))(p_mo)
qv_mo = jax.jit(lambda p, s: sgpr.q_v_from_state(
    spec_mo, p, s, (feat_mo, out_mo)))(p_mo, st_mo)
a_mo, b_mo = mesh_mo[:-1], mesh_mo[1:]
i0_mo = (np.cos(5 * a_mo) - np.cos(5 * b_mo)) / 5.0
truth_mo = np.stack([i0_mo, 0.7 * i0_mo + 0.2 * (b_mo - a_mo)], 1).reshape(-1)
moerr = float(np.abs(np.asarray(qv_mo.mean) - truth_mo).max())
Bm = np.asarray(kernels.coregion_b(p_mo["axes"][1]))
mocorr = float(Bm[0, 1] / np.sqrt(Bm[0, 0] * Bm[1, 1]))
print(f"ICM 2-output q_v err {moerr:.4f} (scale {np.abs(truth_mo).max():.3f}), "
      f"learned corr {mocorr:+.2f}")
assert moerr < 0.03 and mocorr > 0.8
assert float(np.min(np.asarray(qv_mo.variance()))) > 0

# --- sum-of-kernels (multi-scale) fit + component attribution --------------
from vggp_tpu.models import sum as msum

rng_ms = np.random.default_rng(12)
n_ms = 200
x_ms = np.sort(rng_ms.uniform(0.0, 1.0, n_ms)).astype(np.float32)
y_ms = (np.sin(2 * x_ms) + 0.3 * np.sin(25 * x_ms)
        + 0.03 * rng_ms.standard_normal(n_ms)).astype(np.float32)
X_ms, Y_ms = jnp.asarray(x_ms), jnp.asarray(y_ms)
cs_ms = sgpr.SGPRSpec(kinds=("matern32",),
                      features=(CellIntegralFeature(mesh=np.linspace(0, 1, 9)),))
cf_ms = sgpr.SGPRSpec(kinds=("matern32",),
                      features=(CellIntegralFeature(mesh=np.linspace(0, 1, 41)),))
spec_ms = msum.SumSGPRSpec(components=(cs_ms, cf_ms))
p_ms = spec_ms.init_params()
p_ms["components"][0]["axes"][0]["lengthscale"] = jnp.asarray(0.5, jnp.float32)
p_ms["components"][1]["axes"][0]["lengthscale"] = jnp.asarray(0.04, jnp.float32)
p_ms["components"][1]["axes"][0]["variance"] = jnp.asarray(0.1, jnp.float32)
p_ms["noise"] = jnp.asarray(0.01, jnp.float32)
mask_ms = dict(jax.tree.map(lambda _: True, p_ms))
mask_ms["components"] = tuple(
    {"axes": tuple(dict(ax, lengthscale=False) for ax in comp["axes"])}
    for comp in mask_ms["components"])
p_ms, hist_ms = train.fit(lambda q: msum.loss(spec_ms, q, X_ms, Y_ms),
                          p_ms, 400, 0.03, trainable=lambda _: mask_ms)
assert np.all(np.isfinite(np.asarray(hist_ms["loss"]))), "sum fit NaN"
st_ms = jax.jit(lambda p: msum.precompute(spec_ms, p, X_ms, Y_ms))(p_ms)
xs_ms = jnp.asarray(np.linspace(0.05, 0.95, 50, dtype=np.float32))
g_ms = jax.jit(lambda p, s: msum.posterior_from_state(spec_ms, p, s, xs_ms))(p_ms, st_ms)
g1_ms = jax.jit(lambda p, s: msum.component_posterior(spec_ms, p, s, xs_ms, 0))(p_ms, st_ms)
g2_ms = jax.jit(lambda p, s: msum.component_posterior(spec_ms, p, s, xs_ms, 1))(p_ms, st_ms)
tot_t = np.sin(2 * np.asarray(xs_ms)) + 0.3 * np.sin(25 * np.asarray(xs_ms))
ms_rmse = float(np.sqrt(np.mean((np.asarray(g_ms.mean) - tot_t) ** 2)))
ms_slow = float(np.sqrt(np.mean(
    (np.asarray(g1_ms.mean) - np.sin(2 * np.asarray(xs_ms))) ** 2)))
ms_sum_gap = float(np.abs(np.asarray(g1_ms.mean) + np.asarray(g2_ms.mean)
                          - np.asarray(g_ms.mean)).max())
print(f"sum-of-kernels: total rmse {ms_rmse:.4f}, slow-comp rmse {ms_slow:.4f}, "
      f"decomposition gap {ms_sum_gap:.2e}")
assert ms_rmse < 0.1 and ms_slow < 0.3 and ms_sum_gap < 1e-4
assert float(np.min(np.asarray(g_ms.variance()))) > 0

# --- round-3 surfaces: RBF gridded fit, Fourier Kvu past the domain, -------
# --- object-API facades (GP / SVGP / Streaming) -----------------------------

# RBF cell-integral gridded fit on-device (hybrid GL/erfc Toeplitz row): the
# Gaussian cell Gram has the fastest eigendecay of all kinds — exactly the
# class that NaN'd matern32 before its analytic row.
spec_rbf = sgpr.SGPRSpec(kinds=("rbf",),
                         features=(CellIntegralFeature.from_lims(64, 0.0, 1.0),))
p0_rbf = train.non_informative_init(spec_rbf.init_params(jnp.float32), X, y)
p_rbf, hist_rbf = train.fit(lambda p: sgpr.loss(spec_rbf, p, X, y), p0_rbf, 300, 0.05)
assert np.all(np.isfinite(np.asarray(hist_rbf["loss"]))), "rbf gridded: NaN loss"
qv_rbf = sgpr.q_v(spec_rbf, p_rbf, X, y, (grid,))
err_rbf = float(np.abs(np.asarray(qv_rbf.mean) - truth).max())
print(f"rbf-gridded q_v err {err_rbf:.4f}")
assert err_rbf < 0.03 and float(np.min(np.asarray(qv_rbf.variance()))) > 0

# Fourier Kvu on a grid extending past [a, b]: the closed-form Markov
# continuation integrals must track on-device trapezoid quadrature of the
# same (already-verified) Kuf basis at f32 scale.
ff_c = FourierFeature(n_frequencies=6, a=0.1, b=0.9)
grid_wide = CellIntegralFeature.from_lims(12, 0.0, 1.0)
for kind_c in ("matern12", "matern32", "matern52"):
    p_c = {"variance": jnp.asarray(1.3, jnp.float32),
           "lengthscale": jnp.asarray(0.27, jnp.float32)}
    kvu_cf = np.asarray(jax.jit(
        lambda q: ff_c.Kvu(kind_c, q, grid_wide))(p_c))
    kvu_qd = np.asarray(ff_c.kvu_quadrature(kind_c, p_c, grid_wide, n_quad=2001))
    gap_c = np.abs(kvu_cf - kvu_qd).max() / np.abs(kvu_qd).max()
    print(f"fourier Kvu continuation [{kind_c}] vs quad: {gap_c:.2e}")
    assert gap_c < 5e-5, (kind_c, gap_c)

# object-API facades: the migration surface, driven end-to-end on-device
from vggp_tpu.api import GP, SVGP

m_gp = GP.vff(8, (0.1, 0.9), kinds="matern32").fit(X, y, n_iters=300,
                                                   learning_rate=0.05)
qv_gp = m_gp.q_v(grid_wide)
assert np.all(np.isfinite(np.asarray(qv_gp.mean)))
assert float(np.min(np.asarray(qv_gp.var))) > 0
truth_wide, _ = integrate_1d(f, np.asarray(grid_wide.mesh))
# the narrowed Fourier domain [0.1, 0.9] under data on [0, 1] is a
# deliberate continuation stress: m = 8 frequencies underresolve near the
# boundary, so the right check is CALIBRATION (|z| ≤ 4 against q_v's own
# stddev — verified against the CPU f64 oracle: q_v == ∫posterior to 1e-4
# and Kvu == quadrature to 5e-9; the ~0.1 error is honest model error)
z_gp = np.abs(np.asarray(qv_gp.mean) - truth_wide) / np.asarray(qv_gp.stddev())
print(f"GP.vff facade q_v max |z| {float(z_gp.max()):.2f}")
assert float(z_gp.max()) < 4.0

rng_fa = np.random.default_rng(21)
Xf = rng_fa.uniform(0.0, 1.0, (400, 2)).astype(np.float32)
yf = (np.sin(4 * Xf[:, 0]) * np.cos(3 * Xf[:, 1])
      + 0.05 * rng_fa.standard_normal(400)).astype(np.float32)
m_sv = SVGP.gridded((16, 16), (0.0, 1.0), num_data=400)
m_sv.fit(Xf, yf, n_iters=300, batch_size=128, learning_rate=0.03)
assert np.all(np.isfinite(np.asarray(m_sv.history["loss"]))), "SVGP facade NaN"
qv_sv = m_sv.q_v()
assert qv_sv.mean.shape == (256,) and float(np.min(np.asarray(qv_sv.var))) > 0
po_sv = m_sv.predict(jnp.asarray(Xf[:64]))
rmse_sv = float(np.sqrt(np.mean((np.asarray(po_sv.mean) - yf[:64]) ** 2)))
print(f"SVGP facade 2D fit rmse {rmse_sv:.4f}")
assert rmse_sv < 0.15

m_st = SVGP.gridded(16, (0.0, 1.0), num_data=int(X.shape[0]))
m_st.non_informative_initialise(X, y)
stream = m_st.streaming()
stream.assimilate(X[:8], y[:8]).assimilate(X[8:], y[8:])
assert stream.n_seen == int(X.shape[0])
qv_st = stream.q_v(grid)
err_st = float(np.abs(np.asarray(qv_st.mean) - truth).max())
print(f"Streaming facade q_v err {err_st:.4f}")
assert err_st < 0.1 and float(np.min(np.asarray(qv_st.var))) > 0

# --- round-4 surfaces: complex-free FFT Toeplitz matvec + on-device CG, ----
# --- SVGP warm serving state, facade iterative/marginalized heads -----------

# (re, im)-pair radix-2 FFT matvec on the axon backend (which has NO complex
# ops — jnp.fft.rfft raises UNIMPLEMENTED there). Golden is host numpy f64.
from vggp_tpu.ops import toeplitz as _toep

row_np = 1.3 * np.exp(-np.arange(384) / 37.0)
v_np = np.random.default_rng(13).standard_normal((384, 3))
T_np = np.empty((384, 384))
for i_ in range(384):
    T_np[i_] = row_np[np.abs(np.arange(384) - i_)]
want_tv = T_np @ v_np
got_tv = np.asarray(jax.jit(_toep.sym_toeplitz_matvec)(
    jnp.asarray(row_np, jnp.float32), jnp.asarray(v_np, jnp.float32)))
tv_err = float(np.abs(got_tv - want_tv).max() / np.abs(want_tv).max())
print(f"real-FFT toeplitz matvec on {jax.default_backend()}: rel err {tv_err:.2e}")
assert tv_err < 1e-5, "complex-free Toeplitz matvec wrong on device"

# matrix-free CG on the device: m = 16384 cells (dense would factor 16384²),
# q_v mean must track the analytic cell integrals of the generating field.
from vggp_tpu.models import iterative as _iter

rng_cg = np.random.default_rng(14)
x_cg = jnp.asarray(np.sort(rng_cg.uniform(size=256)), jnp.float32)
y_cg = jnp.asarray(np.sin(7 * np.asarray(x_cg))
                   + 0.05 * rng_cg.standard_normal(256), jnp.float32)
feat_cg = CellIntegralFeature.from_lims(16384, 0.0, 1.0)
spec_cg = sgpr.SGPRSpec(kinds=("matern12",), features=(feat_cg,))
p_cg = {"axes": ({"variance": jnp.asarray(1.0, jnp.float32),
                  "lengthscale": jnp.asarray(0.25, jnp.float32)},),
        "noise": jnp.asarray(0.05, jnp.float32)}
grid_cg = (CellIntegralFeature.from_lims(20, 0.0, 1.0),)
w_cg = jax.jit(lambda p: _iter.solve_w(spec_cg, p, x_cg, y_cg,
                                       maxiter=600))(p_cg)
qvm_cg = np.asarray(jax.jit(
    lambda p, w: _iter.q_v_mean_from_w(spec_cg, p, grid_cg, w))(p_cg, w_cg))
assert np.all(np.isfinite(qvm_cg)), "CG q_v mean not finite on device"
cell_truth_cg = np.array([(np.cos(7 * a) - np.cos(7 * b)) / 7.0
                          for a, b in zip(grid_cg[0].mesh[:-1], grid_cg[0].mesh[1:])])
cg_corr = float(np.corrcoef(qvm_cg, cell_truth_cg)[0, 1])
# cross-check vs the dense pipeline at a dense-feasible size, same device
feat_cgs = CellIntegralFeature.from_lims(512, 0.0, 1.0)
spec_cgs = sgpr.SGPRSpec(kinds=("matern12",), features=(feat_cgs,))
qv_dense_s = jax.jit(lambda p: sgpr.q_v(spec_cgs, p, x_cg, y_cg, grid_cg,
                                        full_cov=False).mean)(p_cg)
qv_cg_s = jax.jit(lambda p: _iter.q_v_mean_cg(spec_cgs, p, x_cg, y_cg,
                                              grid_cg, maxiter=600))(p_cg)
cg_gap = float(np.abs(np.asarray(qv_cg_s) - np.asarray(qv_dense_s)).max()
               / np.abs(np.asarray(qv_dense_s)).max())
print(f"iterative CG on-device: m=16384 corr {cg_corr:.4f}; "
      f"m=512 CG-vs-dense rel gap {cg_gap:.2e}")
assert cg_corr > 0.99, "CG posterior mean decorrelated from truth"
assert cg_gap < 5e-3, "CG mean diverged from the dense pipeline on device"

# matrix-free pathwise q_v UNCERTAINTY (two CG solves per draw): moments
# must track the dense q_v at a dense-feasible size, on device, in f32
qv_dense_m = jax.jit(lambda p: sgpr.q_v(spec_cgs, p, x_cg, y_cg, grid_cg,
                                        full_cov=False))(p_cg)
qv_pw = jax.jit(lambda p, k: _iter.q_v_pathwise(
    spec_cgs, p, x_cg, y_cg, grid_cg, k, n_samples=256, n_features=2048,
    maxiter=600, kuu_maxiter=1500))(p_cg, jax.random.PRNGKey(17))
pw_mean_gap = float(np.abs(np.asarray(qv_pw.mean)
                           - np.asarray(qv_dense_m.mean)).max())
vr = np.asarray(qv_pw.var) / np.asarray(qv_dense_m.var)
print(f"pathwise-CG q_v: mean gap {pw_mean_gap:.2e}, var ratio "
      f"[{vr.min():.2f}, {vr.max():.2f}] (S=256)")
assert pw_mean_gap < 6.0 * float(np.sqrt(np.asarray(qv_dense_m.var).max() / 256))
assert 0.6 < vr.min() and vr.max() < 1.6, "pathwise variance off dense q_v"

# SVGP warm serving: precompute state, warm heads == cold heads on-device
st_w = jax.jit(lambda p: svgp.precompute(spec2, p))(p2)
qv_warm = jax.jit(lambda p, s: svgp.q_v_from_state(
    spec2, p, s, grids2, full_cov=False))(p2, st_w)
wgap = float(np.abs(np.asarray(qv_warm.mean) - np.asarray(qv2.mean)).max())
po_cold = jax.jit(lambda p: svgp.posterior(spec2, p, X2[:32],
                                           full_cov=False))(p2)
po_warm = jax.jit(lambda p, s: svgp.posterior_from_state(
    spec2, p, s, X2[:32], full_cov=False))(p2, st_w)
pgap = float(np.abs(np.asarray(po_warm.mean) - np.asarray(po_cold.mean)).max())
vgap = float(np.abs(np.asarray(po_warm.var) - np.asarray(po_cold.var)).max())
print(f"svgp warm serving: q_v gap {wgap:.2e}, posterior mean/var gaps "
      f"{pgap:.2e}/{vgap:.2e}")
assert wgap < 1e-4 and pgap < 1e-4 and vgap < 1e-4, "warm path drifted"

# facade: free-Z constructor + iterative and marginalized heads on-device
m_fz = GP.free_z(16, ((0.0, 1.0), (0.0, 1.0)), kinds="matern32", seed=3)
m_fz.fit(X2, y2, n_iters=150, learning_rate=0.05)
assert np.all(np.isfinite(np.asarray(m_fz.history["loss"]))), "free_z NaN"
qv_fz = m_fz.q_v(grid_axes=grids2)
assert np.all(np.isfinite(np.asarray(qv_fz.mean)))
m_it = GP.gridded(256, (0.0, 1.0)).fit(X, y, n_iters=200, learning_rate=0.05)
qvm_it = np.asarray(m_it.q_v_mean_iterative((grid,)))
qvm_dn = np.asarray(m_it.q_v((grid,)).mean)
it_gap = float(np.abs(qvm_it - qvm_dn).max())
marg_g = m_it.predict_marginalized(xs_h, n_samples=32, seed=5)
assert np.all(np.isfinite(np.asarray(marg_g.mean)))
print(f"facade: free_z ok; iterative q_v gap {it_gap:.2e}; marginalized ok")
assert it_gap < 5e-3

# round-5: multi-output (coregion) matrix-free heads on-device — CG q_v
# mean + chol(B)-mixed pathwise uncertainty vs the dense pipeline, with
# per-output noise through the weighted G system
from vggp_tpu.features import OutputFeature
from vggp_tpu.models import iterative as _iter

rng_mo = np.random.default_rng(31)
x_mo = np.sort(rng_mo.uniform(0.0, 1.0, 160))
task_mo = rng_mo.integers(0, 2, 160)
f_mo = np.sin(5.0 * x_mo)
y_np = np.where(task_mo == 0, f_mo, 0.6 * f_mo + 0.3) \
    + 0.05 * rng_mo.standard_normal(160)
X_mo = jnp.asarray(np.stack([x_mo, task_mo.astype(np.float64)], 1), jnp.float32)
y_mo = jnp.asarray(y_np, jnp.float32)
spec_mo = sgpr.SGPRSpec(
    kinds=("matern12", "coregion"),
    features=(CellIntegralFeature.from_lims(20, 0.0, 1.0),
              OutputFeature(n_outputs=2)),
    per_output_noise=True)
p_mo = spec_mo.init_params(jnp.float32)
p_mo["noise"] = jnp.asarray([0.03, 0.08], jnp.float32)
grids_mo = (CellIntegralFeature.from_lims(6, 0.0, 1.0),
            OutputFeature(n_outputs=2))
qv_mo_dense = jax.jit(lambda p: sgpr.q_v(
    spec_mo, p, X_mo, y_mo, grids_mo, full_cov=False))(p_mo)
qv_mo_cg = jax.jit(lambda p: _iter.q_v_mean_cg(
    spec_mo, p, X_mo, y_mo, grids_mo, maxiter=2000))(p_mo)
mo_gap = float(np.abs(np.asarray(qv_mo_cg)
                      - np.asarray(qv_mo_dense.mean)).max())
qv_mo_pw = jax.jit(lambda p, k: _iter.q_v_pathwise(
    spec_mo, p, X_mo, y_mo, grids_mo, k, n_samples=128, n_features=1024,
    antithetic=True))(p_mo, jax.random.PRNGKey(9))
mo_pw_gap = float(np.abs(np.asarray(qv_mo_pw.mean)
                         - np.asarray(qv_mo_dense.mean)).max())
mo_vr = np.asarray(qv_mo_pw.var) / np.asarray(qv_mo_dense.var)
print(f"coregion CG: mean gap {mo_gap:.2e}; pathwise mean gap "
      f"{mo_pw_gap:.2e}, var ratio [{mo_vr.min():.2f}, {mo_vr.max():.2f}]")
assert mo_gap < 5e-3, "coregion CG mean off dense"
assert mo_pw_gap < 5e-3, "coregion pathwise mean off dense (antithetic=exact)"
assert 0.5 < mo_vr.min() and mo_vr.max() < 2.0, "coregion pathwise var off"

# round-5: gridded-GRADIENT product uncertainty at CG scale (the velocity
# product's σ channel): face-difference Matheron draws vs the dense q_dv
spec_g = sgpr.SGPRSpec(
    kinds=("matern12", "matern12"),
    features=(CellIntegralFeature.from_lims(24, 0.0, 1.0),
              CellIntegralFeature.from_lims(24, 0.0, 1.0)))
p_g = spec_g.init_params(jnp.float32)
grids_g = (CellIntegralFeature.from_lims(8, 0.0, 1.0),
           CellIntegralFeature.from_lims(8, 0.0, 1.0))
qdv_dense = jax.jit(lambda p: sgpr.q_dv(
    spec_g, p, X2, y2, grids_g, axis=0, full_cov=False))(p_g)
qdv_pw = jax.jit(lambda p, k: _iter.q_dv_pathwise(
    spec_g, p, X2, y2, grids_g, 0, k, n_samples=128, n_features=1024,
    antithetic=True))(p_g, jax.random.PRNGKey(11))
gdv_gap = float(np.abs(np.asarray(qdv_pw.mean)
                       - np.asarray(qdv_dense.mean)).max())
gdv_scale = float(np.abs(np.asarray(qdv_dense.mean)).max())
gdv_vr = np.asarray(qdv_pw.var) / np.asarray(qdv_dense.var)
print(f"q_dv pathwise-CG: mean gap {gdv_gap:.2e} (scale {gdv_scale:.2e}), "
      f"var ratio [{gdv_vr.min():.2f}, {gdv_vr.max():.2f}]")
assert gdv_gap < 2e-2 * max(gdv_scale, 1e-6), "q_dv pathwise mean off dense"
assert 0.5 < gdv_vr.min() and gdv_vr.max() < 2.0, "q_dv pathwise var off"

print("DRIVE OK")


