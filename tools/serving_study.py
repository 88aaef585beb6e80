"""Serving-path study: gridded-product extraction + prediction throughput.

Training speed is bench.py's headline; this measures the OTHER half of a
production deployment — how fast a trained 512×512 gridded Kronecker SVGP
emits data products on one chip:

- ``q_v``  : the gridded SSH product (mean + per-cell variance), 512² cells
- ``q_dv`` : the gridded-gradient product (geostrophic velocity ingredient)
- ``posterior`` : pointwise mean/var at large query batches (points/s)
- ``posterior_grad`` : pointwise gradient field at large query batches

Methodology (CLAUDE.md): never time per-dispatch over the remote tunnel —
every number is a jitted ``lax.scan`` over K applications with a
parameter perturbation carried between iterations (defeats CSE), forced by a
real device→host transfer, compile excluded. Writes
``results/scaling/serving.json``.
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vggp_tpu.features import CellIntegralFeature
from vggp_tpu.models import svgp

M_AXIS = 512
N_QUERY = 65536
K_PRODUCT = 30     # scan length for grid-product extraction
K_QUERY = 30


def build(m_axis=M_AXIS, seed=0):
    grid = CellIntegralFeature.from_lims(m_axis, 0.0, 1.0)
    spec = svgp.SVGPSpec(kinds=("matern12", "matern12"), features=(grid, grid),
                         num_data=1_000_000, variational="kron")
    params = spec.init_params(jnp.float32)
    rng = np.random.default_rng(seed)
    params["q"]["mu"] = jnp.asarray(
        rng.standard_normal((m_axis, m_axis)) * 0.1, jnp.float32)
    for ax in params["axes"]:
        ax["lengthscale"] = jnp.asarray(0.2, jnp.float32)
    return spec, params, grid


def timed_scan(fn, params, k):
    """Mean seconds per fn(params) via a jitted scan; lengthscale is nudged
    (relatively, by ~1e-6) each iteration so XLA cannot hoist the body."""

    def body(carry, _):
        p = jax.tree_util.tree_map(lambda x: x, params)
        axes = []
        for ax in p["axes"]:
            ax = dict(ax)
            ax["lengthscale"] = ax["lengthscale"] * carry
            axes.append(ax)
        p["axes"] = tuple(axes)
        out = fn(p)
        acc = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(out))
        return carry * (1.0 + 1e-7), acc

    @jax.jit
    def run():
        _, accs = lax.scan(body, jnp.float32(1.0), None, length=k)
        return jnp.sum(accs)

    out = float(run())  # compile + warm
    assert np.isfinite(out), "serving scan produced non-finite output"
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(run())
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def main():
    print("backend:", jax.default_backend())
    spec, params, grid = build()
    g_prod = (grid, grid)  # product grid == inducing grid (512² cells)

    results = {"m": M_AXIS * M_AXIS, "grid_cells": M_AXIS * M_AXIS,
               "n_query": N_QUERY}

    t_qv = timed_scan(lambda p: svgp.q_v(spec, p, g_prod, full_cov=False),
                      params, K_PRODUCT)
    results["qv_ms"] = t_qv * 1e3
    print(f"q_v   512² mean+var: {t_qv * 1e3:.2f} ms "
          f"({M_AXIS * M_AXIS / t_qv / 1e6:.1f} M cells/s)")

    t_qdv = timed_scan(lambda p: svgp.q_dv(spec, p, g_prod, axis=0,
                                           full_cov=False),
                       params, K_PRODUCT)
    results["qdv_ms"] = t_qdv * 1e3
    print(f"q_dv  512² mean+var: {t_qdv * 1e3:.2f} ms")

    xq = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (N_QUERY, 2)),
                     jnp.float32)
    t_post = timed_scan(lambda p: svgp.posterior(spec, p, xq, full_cov=False),
                        params, K_QUERY)
    results["posterior_ms"] = t_post * 1e3
    results["posterior_points_per_s"] = N_QUERY / t_post
    print(f"posterior mean+var @ {N_QUERY} pts: {t_post * 1e3:.2f} ms "
          f"({N_QUERY / t_post / 1e6:.1f} M pts/s)")

    spec32, params32, grid32 = build()
    spec32 = svgp.SVGPSpec(kinds=("matern32", "matern32"),
                           features=spec32.features, num_data=spec32.num_data,
                           variational="kron")
    t_grad = timed_scan(lambda p: svgp.posterior_grad(spec32, p, xq, axis=0),
                        params32, K_QUERY)
    results["posterior_grad_ms"] = t_grad * 1e3
    results["posterior_grad_points_per_s"] = N_QUERY / t_grad
    print(f"posterior_grad @ {N_QUERY} pts: {t_grad * 1e3:.2f} ms "
          f"({N_QUERY / t_grad / 1e6:.1f} M pts/s)")

    # ---- warm serving (VERDICT r3 weak #5): precompute the Kuu factors +
    # variational chol ONCE (svgp.precompute), then time the *_from_state
    # heads. q_v_warm perturbs μ each iteration (the streaming-update serving
    # pattern: state fixed, mean refreshed) — the μ-independent variance
    # pipeline hoists out of the scan, which is exactly the reuse the warm
    # path exists to buy. posterior_warm perturbs the QUERY points (the
    # request-serving pattern): per-request Kuf + whitening stays in the
    # loop, only the factorizations are amortized.
    state = jax.jit(lambda p: svgp.precompute(spec, p))(params)

    def timed_scan_warm(fn, k):
        def body(carry, _):
            out = fn(carry)
            acc = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(out))
            return carry * (1.0 + 1e-7), acc

        @jax.jit
        def run():
            _, accs = lax.scan(body, jnp.float32(1.0), None, length=k)
            return jnp.sum(accs)

        out = float(run())
        assert np.isfinite(out), "warm serving scan produced non-finite output"
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run())
            best = min(best, (time.perf_counter() - t0) / k)
        return best

    def with_mu(scale):
        p = dict(params)
        q = dict(p["q"])
        q["mu"] = q["mu"] * scale
        p["q"] = q
        return p

    t_qv_w = timed_scan_warm(
        lambda c: svgp.q_v_from_state(spec, with_mu(c), state, g_prod,
                                      full_cov=False), K_PRODUCT)
    results["qv_warm_ms"] = t_qv_w * 1e3
    print(f"q_v   512² WARM (state cached, μ refreshed): {t_qv_w * 1e3:.2f} ms "
          f"({t_qv / t_qv_w:.1f}x cold)")

    t_qdv_w = timed_scan_warm(
        lambda c: svgp.q_dv_from_state(spec, with_mu(c), state, g_prod,
                                       axis=0, full_cov=False), K_PRODUCT)
    results["qdv_warm_ms"] = t_qdv_w * 1e3
    print(f"q_dv  512² WARM: {t_qdv_w * 1e3:.2f} ms ({t_qdv / t_qdv_w:.1f}x cold)")

    t_post_w = timed_scan_warm(
        lambda c: svgp.posterior_from_state(spec, params, state, xq * c,
                                            full_cov=False), K_QUERY)
    results["posterior_warm_ms"] = t_post_w * 1e3
    results["posterior_warm_points_per_s"] = N_QUERY / t_post_w
    print(f"posterior WARM @ {N_QUERY} new pts: {t_post_w * 1e3:.2f} ms "
          f"({N_QUERY / t_post_w / 1e6:.1f} M pts/s, {t_post / t_post_w:.1f}x cold)")

    # matern32 axes dense-factorize their Kuu (no closed-form KMS congruence),
    # so this is the configuration where the cached state has real work to
    # amortize — the matern12 numbers above mostly measure the KMS fast path.
    spec32b = svgp.SVGPSpec(kinds=("matern32", "matern32"),
                            features=spec.features, num_data=spec.num_data,
                            variational="kron")
    t_qv32 = timed_scan(lambda p: svgp.q_v(spec32b, p, g_prod, full_cov=False),
                        params, K_PRODUCT)
    state32 = jax.jit(lambda p: svgp.precompute(spec32b, p))(params)

    def with_mu32(scale):
        p = dict(params)
        q = dict(p["q"])
        q["mu"] = q["mu"] * scale
        p["q"] = q
        return p

    t_qv32_w = timed_scan_warm(
        lambda c: svgp.q_v_from_state(spec32b, with_mu32(c), state32, g_prod,
                                      full_cov=False), K_PRODUCT)
    results["qv_m32_ms"] = t_qv32 * 1e3
    results["qv_m32_warm_ms"] = t_qv32_w * 1e3
    print(f"q_v   512² matern32 cold {t_qv32 * 1e3:.2f} ms -> WARM "
          f"{t_qv32_w * 1e3:.2f} ms ({t_qv32 / t_qv32_w:.1f}x)")

    os.makedirs("results/scaling", exist_ok=True)
    with open("results/scaling/serving.json", "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
