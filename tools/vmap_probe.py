"""Localize the K-replica vmap slowdown (results/bench/r5_roofline*.json).

K-model vmapped training measured 3× LOWER aggregate throughput at K=2 than
a single model — the opposite of what a latency-bound step predicts. This
probe times the step's constituent op classes unbatched vs vmapped (K=2/8)
on the attached device to find which batched lowering is responsible:

- 512×512 Cholesky                       (Kuu factorization per axis)
- 512×512 triangular solve onto 512×4096 (whitening apply)
- 512×4096 matmul                        (moments/einsum class)
- the fused Pallas cell-Kuf+∂Kuf build   (custom call under vmap)

Each measurement is a jitted lax.scan over N_TIMED applications with a
carried perturbation (nothing hoists), forced through a real transfer,
best-of-3 — the PERFORMANCE.md methodology. Writes
results/bench/r5_vmap_probe.json.
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

N_TIMED = 200
M = 512
N = 4096


def bench_scan(body, init):
    @jax.jit
    def run(x):
        def one(carry, _):
            return body(carry), None

        out, _ = jax.lax.scan(one, x, None, length=N_TIMED)
        return out

    out = jax.block_until_ready(run(init))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(init))
        best = min(best, (time.perf_counter() - t0) / N_TIMED)
    return best * 1e6  # µs per application


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    a = rng.standard_normal((M, M)).astype(np.float32)
    spd = jnp.asarray(a @ a.T + M * np.eye(M, dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((M, N)).astype(np.float32))
    rec = {}

    for K in (1, 2, 8):
        def batched(x):
            return jnp.broadcast_to(x, (K,) + x.shape) if K > 1 else x

        def vm(f):
            return jax.vmap(f) if K > 1 else f

        row = {}
        # Cholesky (refreshed diag so the scan cannot hoist)
        row["chol_us"] = bench_scan(
            vm(lambda A: jnp.linalg.cholesky(A + 1e-3 * jnp.eye(M))
               + 1e-6 * A[:1, :1]),
            batched(spd))
        # triangular solve L x = B (carry B so each iter depends on the last)
        L = jnp.linalg.cholesky(spd)
        Ls = batched(L)

        def tri(Bc):
            if K > 1:
                out = jax.vmap(lambda Li, Bi: jax.scipy.linalg.solve_triangular(
                    Li, Bi, lower=True))(Ls, Bc)
            else:
                out = jax.scipy.linalg.solve_triangular(Ls, Bc, lower=True)
            return 0.5 * out + 0.5 * Bc

        row["trisolve_us"] = bench_scan(tri, batched(b))

        # plain matmul (M, M) @ (M, N)
        def mm(Bc):
            if K > 1:
                out = jnp.einsum("kij,kjn->kin", Ls, Bc)
            else:
                out = Ls @ Bc
            return 0.5 * out + 0.5 * Bc

        row["matmul_us"] = bench_scan(mm, batched(b))

        # Pallas fused Kuf+dKuf custom call under vmap
        from vggp_tpu.features import CellIntegralFeature

        g = CellIntegralFeature.from_lims(M, 0.0, 1.0)
        mesh = jnp.asarray(g.mesh, jnp.float32)
        x = jnp.asarray(rng.random(N), jnp.float32)
        var = jnp.asarray(1.0, jnp.float32)

        def kuf(ell):
            from vggp_tpu.ops.pallas_kernels import cell_kuf_with_dl

            if K > 1:
                k, dk = jax.vmap(lambda e: cell_kuf_with_dl(mesh, x, var, e))(ell)
            else:
                k, dk = cell_kuf_with_dl(mesh, x, var, ell)
            return ell + 1e-9 * jnp.sum(k[..., 0, 0] + dk[..., 0, 0])

        try:
            row["pallas_kuf_us"] = bench_scan(
                kuf, batched(jnp.asarray(0.25, jnp.float32)))
        except Exception as e:  # vmap of the custom call may be unsupported
            row["pallas_kuf_us"] = f"error: {type(e).__name__}: {e}"[:200]
        rec[f"K{K}"] = row
        print(f"K={K}:", json.dumps(row))

    # per-element scaling summary: batched_time / (K * unbatched_time)
    for K in (2, 8):
        rec[f"K{K}_overhead"] = {
            k: (round(rec[f"K{K}"][k] / (K * rec["K1"][k]), 2)
                if isinstance(rec[f"K{K}"][k], float) else None)
            for k in ("chol_us", "trisolve_us", "matmul_us", "pallas_kuf_us")
            if isinstance(rec["K1"][k], float)
        }
    os.makedirs("results/bench", exist_ok=True)
    with open("results/bench/r5_vmap_probe.json", "w") as fh:
        json.dump(rec, fh, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
