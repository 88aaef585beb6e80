"""Stage-level localization of the K-replica vmap slowdown.

r5_vmap_probe.json showed the constituent op CLASSES batch fine (sub-linear
per element), yet the composed K=2 step runs ~6× slower per model
(r5_roofline.json). This probe times the step's STAGES unbatched vs
vmap(K=2/8) on-device: ELBO forward only, value_and_grad, and the optimizer
update alone — scanned with a carried parameter perturbation so nothing
hoists. Writes results/bench/r5_vmap_step_probe.json.
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from vggp_tpu import train
from vggp_tpu.features import CellIntegralFeature
from vggp_tpu.models import svgp

M_AXIS = 512
BATCH = 4096
N_TIMED = 100


def main():
    print("backend:", jax.default_backend())
    g1 = CellIntegralFeature.from_lims(M_AXIS, 0.0, 1.0)
    g2 = CellIntegralFeature.from_lims(M_AXIS, 0.0, 1.0)
    spec = svgp.SVGPSpec(kinds=("matern12", "matern12"), features=(g1, g2),
                         num_data=1_000_000, variational="kron")
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.random((BATCH, 2)), jnp.float32)
    yb = jnp.asarray(np.sin(6 * np.asarray(xb[:, 0]))
                     + 0.1 * rng.standard_normal(BATCH), jnp.float32)
    opt = optax.adam(1e-2)
    raw = train.unconstrain(spec.init_params(jnp.float32))
    st0 = opt.init(raw)

    def perturb(r, i):
        # tiny param drift so scanned iterations cannot hoist
        return jax.tree.map(lambda x: x + 1e-9 * i, r)

    def loss_of(r):
        return svgp.loss(spec, train.constrain(r), xb, yb)

    def stage_fwd(r, _st, i):
        return perturb(r, i), _st, loss_of(r)

    def stage_vag(r, _st, i):
        val, grads = jax.value_and_grad(loss_of)(r)
        return perturb(r, i), _st, val + 0.0 * jax.tree.leaves(grads)[0].ravel()[0]

    def stage_update(r, st, i):
        # fixed synthetic grads (the params themselves) — isolates optimizer
        val = jnp.float32(0.0)
        r2, st = train.guarded_update(opt, r, st, val, r)
        return perturb(r2, i), st, val

    rec = {}
    for name, stage in (("forward", stage_fwd), ("value_and_grad", stage_vag),
                        ("update", stage_update)):
        row = {}
        for K in (1, 2, 8):
            if K == 1:
                rs, ss = raw, st0
            else:
                rs = jax.tree.map(
                    lambda x: jnp.broadcast_to(x, (K,) + x.shape), raw)
                ss = jax.vmap(opt.init)(rs)

            @jax.jit
            def run(r, s, K=K, stage=stage):
                def one(carry, i):
                    r, s = carry
                    if K == 1:
                        r, s, val = stage(r, s, i)
                    else:
                        r, s, val = jax.vmap(stage, in_axes=(0, 0, None))(r, s, i)
                    return (r, s), val

                (_, _), vals = jax.lax.scan(
                    one, (r, s), jnp.arange(N_TIMED, dtype=jnp.float32))
                return vals

            vals = run(rs, ss)
            assert np.all(np.isfinite(np.ravel(vals)))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(run(rs, ss))
                best = min(best, (time.perf_counter() - t0) / N_TIMED)
            row[f"K{K}_us"] = round(best * 1e6, 1)
        row["K2_slowdown_per_model"] = round(row["K2_us"] / row["K1_us"], 2)
        row["K8_slowdown_per_model"] = round(row["K8_us"] / row["K1_us"], 2)
        rec[name] = row
        print(name, json.dumps(row))

    # composition A/B of the FULL step (vag + guarded_update): scan-of-vmap
    # (batch the step body inside one scan) vs vmap-of-scan (batch whole
    # scanned loops — what fit_restarts historically did)
    def full_step(r, s):
        val, grads = jax.value_and_grad(loss_of)(r)
        r, s = train.guarded_update(opt, r, s, val, grads)
        return r, s, val

    for K in (2, 8):
        rs = jax.tree.map(lambda x: jnp.broadcast_to(x, (K,) + x.shape), raw)
        ss = jax.vmap(opt.init)(rs)

        @jax.jit
        def run_sv(r, s):
            def one(carry, _):
                r, s = carry
                r, s, val = jax.vmap(full_step)(r, s)
                return (r, s), val

            (_, _), vals = jax.lax.scan(one, (r, s), None, length=N_TIMED)
            return vals

        @jax.jit
        def run_vs(r, s):
            def scan_one(r1, s1):
                def one(carry, _):
                    r1, s1 = carry
                    r1, s1, val = full_step(r1, s1)
                    return (r1, s1), val

                (_, _), vals = jax.lax.scan(one, (r1, s1), None,
                                            length=N_TIMED)
                return vals

            return jax.vmap(scan_one)(r, s)

        row = {}
        for name, run in (("scan_of_vmap", run_sv), ("vmap_of_scan", run_vs)):
            vals = run(rs, ss)
            assert np.all(np.isfinite(np.ravel(vals)))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(run(rs, ss))
                best = min(best, (time.perf_counter() - t0) / N_TIMED)
            row[f"{name}_us"] = round(best * 1e6, 1)
        rec[f"fullstep_K{K}"] = row
        print(f"fullstep K={K}:", json.dumps(row))

    os.makedirs("results/bench", exist_ok=True)
    with open("results/bench/r5_vmap_step_probe.json", "w") as fh:
        json.dump(rec, fh, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
