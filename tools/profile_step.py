"""Step-cost profiler for the headline 512²/4096 gridded Kronecker SVGP.

Times scanned sub-computations of the training step on the attached device
(run from the repo root: ``python tools/profile_step.py``). Methodology notes
in PERFORMANCE.md apply: every measurement is a jit-compiled ``lax.scan``
forced through a real transfer (per-dispatch timings lie on the remote-TPU
tunnel), best-of-3 windows, same-session A/B comparisons only.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
import optax

from vggp_tpu import train, config
from vggp_tpu.features import CellIntegralFeature
from vggp_tpu.models import svgp, common

M = 512
BATCH = 4096
N_TIMED = 200

g1 = CellIntegralFeature.from_lims(M, 0.0, 1.0)
g2 = CellIntegralFeature.from_lims(M, 0.0, 1.0)
spec = svgp.SVGPSpec(kinds=("matern12", "matern12"), features=(g1, g2),
                     num_data=1_000_000, variational="kron")
params = spec.init_params(jnp.float32)
rng = np.random.default_rng(0)
xb = jnp.asarray(rng.random((BATCH, 2)), jnp.float32)
yb = jnp.asarray(np.sin(6 * np.asarray(xb[:, 0])) * np.cos(5 * np.asarray(xb[:, 1]))
                 + 0.1 * rng.standard_normal(BATCH), jnp.float32)
opt = optax.adam(1e-2)
raw = train.unconstrain(params)
st = opt.init(raw)


def timed(name, make_scan):
    fn = jax.jit(make_scan)
    out = fn()  # compile
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn()
        # force through a real transfer
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))
        best = min(best, (time.perf_counter() - t0) / N_TIMED)
    print(f"{name:45s} {best*1e3:8.4f} ms/step")
    return best


# 1. full step
def full_step():
    def one(carry, _):
        r, s = carry
        val, grads = jax.value_and_grad(
            lambda q: svgp.loss(spec, train.constrain(q), xb, yb))(r)
        r, s = train.guarded_update(opt, r, s, val, grads)
        return (r, s), val
    (_, _), vals = jax.lax.scan(one, (raw, st), None, length=N_TIMED)
    return vals


# 2. forward-only ELBO
def fwd_only():
    def one(carry, _):
        r = carry
        val = svgp.loss(spec, train.constrain(r), xb, yb)
        return r, val
    _, vals = jax.lax.scan(one, raw, None, length=N_TIMED)
    return vals


# 3. value_and_grad without the Adam update (isolate optimizer cost)
def grad_no_adam():
    def one(carry, _):
        r = carry
        val, grads = jax.value_and_grad(
            lambda q: svgp.loss(spec, train.constrain(q), xb, yb))(r)
        # keep grads live via a cheap reduction
        s = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
        return r, val + 0.0 * s
    _, vals = jax.lax.scan(one, raw, None, length=N_TIMED)
    return vals


# 4. Kuf+dKuf Pallas only (fwd), both axes
def kuf_only():
    from vggp_tpu.ops.pallas_kernels import cell_kuf_with_dl
    def one(carry, _):
        r = carry
        p = train.constrain(r)
        acc = 0.0
        for i, feat in enumerate(spec.features):
            ax = p["axes"][i]
            k, dk = cell_kuf_with_dl(jnp.asarray(feat.mesh, jnp.float32), xb[:, i],
                                     ax["variance"], ax["lengthscale"])
            acc = acc + jnp.sum(k) + jnp.sum(dk)
        return r, acc
    _, vals = jax.lax.scan(one, raw, None, length=N_TIMED)
    return vals


# 4b. Kuf only (no dl), both axes
def kuf_nodl():
    from vggp_tpu.ops.pallas_kernels import cell_kuf
    def one(carry, _):
        r = carry
        p = train.constrain(r)
        acc = 0.0
        for i, feat in enumerate(spec.features):
            ax = p["axes"][i]
            k = cell_kuf(jnp.asarray(feat.mesh, jnp.float32), xb[:, i],
                         ax["variance"], ax["lengthscale"])
            acc = acc + jnp.sum(k)
        return r, acc
    _, vals = jax.lax.scan(one, raw, None, length=N_TIMED)
    return vals


# 5. whitened blocks forward (kuf + finv + banded apply + tangent build)
def blocks_fwd():
    def one(carry, _):
        r = carry
        p = train.constrain(r)
        blocks = common.axis_whitened_kuf_scalar(spec, p, xb)
        return r, sum(jnp.sum(b) for b in blocks)
    _, vals = jax.lax.scan(one, raw, None, length=N_TIMED)
    return vals


# 6. blocks fwd+bwd (grad wrt raw params through the scalar VJP)
def blocks_grad():
    def one(carry, _):
        r = carry
        def lf(q):
            p = train.constrain(q)
            blocks = common.axis_whitened_kuf_scalar(spec, p, xb)
            return sum(jnp.sum(b * b) for b in blocks)
        val, grads = jax.value_and_grad(lf)(r)
        s = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
        return r, val + 0.0 * s
    _, vals = jax.lax.scan(one, raw, None, length=N_TIMED)
    return vals


# 7. moments from fixed blocks (fwd+bwd wrt q params)
p0 = train.constrain(raw)
blocks_fixed = jax.jit(lambda r: common.axis_whitened_kuf_scalar(
    spec, train.constrain(r), xb))(raw)
blocks_fixed = jax.tree_util.tree_map(jax.lax.stop_gradient, blocks_fixed)


def moments_grad():
    def one(carry, _):
        r = carry
        def lf(q):
            p = train.constrain(q)
            mean, var_red, var_add = svgp._qf_mean_var(spec, p, blocks_fixed)
            return jnp.sum(mean) + jnp.sum(var_red) + jnp.sum(var_add)
        val, grads = jax.value_and_grad(lf)(r)
        s = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
        return r, val + 0.0 * s
    _, vals = jax.lax.scan(one, raw, None, length=N_TIMED)
    return vals


print(f"backend={jax.default_backend()} config: MATMUL={config.MATMUL_PRECISION} "
      f"GRAD={config.GRAD_MATMUL_PRECISION} banded={config.BANDED_WHITEN_APPLY}")
t_full = timed("full step (v&g + adam)", full_step)
t_grad = timed("value_and_grad only", grad_no_adam)
t_fwd = timed("forward ELBO only", fwd_only)
t_kuf = timed("Pallas Kuf+dKuf (2 axes, fwd)", kuf_only)
t_kufn = timed("Pallas Kuf only (2 axes, fwd)", kuf_nodl)
t_blk = timed("whitened blocks fwd (kuf+finv+apply+tan)", blocks_fwd)
t_blkg = timed("whitened blocks fwd+bwd", blocks_grad)
t_mom = timed("moments fwd+bwd (fixed blocks)", moments_grad)
print(f"\nadam overhead       : {(t_full-t_grad)*1e3:7.4f} ms")
print(f"backward overhead   : {(t_grad-t_fwd)*1e3:7.4f} ms")
print(f"finv+apply+tangent  : {(t_blk-t_kuf)*1e3:7.4f} ms (over kuf+dkuf)")
