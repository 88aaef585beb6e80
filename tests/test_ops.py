import numpy as np
import jax.numpy as jnp

from vggp_tpu import ops


def test_sym_toeplitz_dense():
    row = jnp.asarray([4.0, 2.0, 1.0, 0.5])
    t = np.asarray(ops.sym_toeplitz_dense(row))
    import scipy.linalg

    np.testing.assert_allclose(t, scipy.linalg.toeplitz(np.asarray(row)))


def test_sym_toeplitz_matvec(rng):
    row = jnp.asarray(np.exp(-np.arange(33) * 0.3))
    v = rng.normal(size=(33, 4))
    dense = np.asarray(ops.sym_toeplitz_dense(row))
    out = np.asarray(ops.sym_toeplitz_matvec(row, jnp.asarray(v)))
    np.testing.assert_allclose(out, dense @ v, rtol=1e-9, atol=1e-9)
    out1 = np.asarray(ops.sym_toeplitz_matvec(row, jnp.asarray(v[:, 0])))
    np.testing.assert_allclose(out1, dense @ v[:, 0], rtol=1e-9, atol=1e-9)


def test_kron_matvec(rng):
    a = rng.normal(size=(3, 3))
    b = rng.normal(size=(4, 4))
    c = rng.normal(size=(2, 2))
    x = rng.normal(size=3 * 4 * 2)
    dense = np.kron(np.kron(a, b), c)
    out = np.asarray(ops.kron_matvec([jnp.asarray(m) for m in (a, b, c)], jnp.asarray(x)))
    np.testing.assert_allclose(out, dense @ x, rtol=1e-10)


def test_khatri_rao_rows(rng):
    a = rng.normal(size=(3, 5))
    b = rng.normal(size=(4, 5))
    out = np.asarray(ops.khatri_rao_rows(jnp.asarray(a), jnp.asarray(b)))
    ref = np.stack([np.kron(a[:, j], b[:, j]) for j in range(5)], axis=1)
    np.testing.assert_allclose(out, ref, rtol=1e-12)


def test_kron_diag(rng):
    a = rng.normal(size=3)
    b = rng.normal(size=4)
    out = np.asarray(ops.kron_diag([jnp.asarray(a), jnp.asarray(b)]))
    np.testing.assert_allclose(out, np.kron(a, b), rtol=1e-12)


def test_diag_rank1(rng):
    alpha = np.abs(rng.normal(size=6)) + 0.5
    beta = rng.normal(size=6)
    dense = np.diag(alpha) + np.outer(beta, beta)
    b = rng.normal(size=(6, 3))
    x = np.asarray(ops.diag_rank1_solve(jnp.asarray(alpha), jnp.asarray(beta), jnp.asarray(b)))
    np.testing.assert_allclose(dense @ x, b, rtol=1e-9, atol=1e-10)
    x1 = np.asarray(ops.diag_rank1_solve(jnp.asarray(alpha), jnp.asarray(beta), jnp.asarray(b[:, 0])))
    np.testing.assert_allclose(dense @ x1, b[:, 0], rtol=1e-9, atol=1e-10)
    ld = float(ops.diag_rank1_logdet(jnp.asarray(alpha), jnp.asarray(beta)))
    np.testing.assert_allclose(ld, np.linalg.slogdet(dense)[1], rtol=1e-10)
    mv = np.asarray(ops.diag_rank1_matvec(jnp.asarray(alpha), jnp.asarray(beta), jnp.asarray(b)))
    np.testing.assert_allclose(mv, dense @ b, rtol=1e-10)


def test_diag_lowrank_rank_r(rng):
    from vggp_tpu.ops import diag_lowrank as dl

    alpha = np.abs(rng.normal(size=7)) + 0.5
    W = rng.normal(size=(7, 3))
    dense = np.diag(alpha) + W @ W.T
    np.testing.assert_allclose(
        np.asarray(dl.diag_lowrank_dense(jnp.asarray(alpha), jnp.asarray(W))), dense)
    b = rng.normal(size=(7, 4))
    x = np.asarray(dl.diag_lowrank_solve(jnp.asarray(alpha), jnp.asarray(W), jnp.asarray(b)))
    np.testing.assert_allclose(dense @ x, b, rtol=1e-9, atol=1e-10)
    x1 = np.asarray(dl.diag_lowrank_solve(jnp.asarray(alpha), jnp.asarray(W), jnp.asarray(b[:, 0])))
    np.testing.assert_allclose(dense @ x1, b[:, 0], rtol=1e-9, atol=1e-10)
    ld = float(dl.diag_lowrank_logdet(jnp.asarray(alpha), jnp.asarray(W)))
    np.testing.assert_allclose(ld, np.linalg.slogdet(dense)[1], rtol=1e-10)
    mv = np.asarray(dl.diag_lowrank_matvec(jnp.asarray(alpha), jnp.asarray(W), jnp.asarray(b)))
    np.testing.assert_allclose(mv, dense @ b, rtol=1e-10)
    # rank-1 consistency with the Sherman–Morrison specialization
    w1 = W[:, :1]
    np.testing.assert_allclose(
        np.asarray(dl.diag_lowrank_solve(jnp.asarray(alpha), jnp.asarray(w1), jnp.asarray(b))),
        np.asarray(dl.diag_rank1_solve(jnp.asarray(alpha), jnp.asarray(w1[:, 0]), jnp.asarray(b))),
        rtol=1e-9)


def test_safe_cholesky_and_solves(rng):
    a = rng.normal(size=(8, 8))
    A = a @ a.T + 8 * np.eye(8)
    L = np.asarray(ops.safe_cholesky(jnp.asarray(A), jitter=0.0))
    np.testing.assert_allclose(L @ L.T, A, rtol=1e-6, atol=1e-8)
    b = rng.normal(size=8)
    x = np.asarray(ops.solve_psd(jnp.asarray(L), jnp.asarray(b)))
    np.testing.assert_allclose(A @ x, b, rtol=1e-8, atol=1e-9)
    ld = float(ops.logdet_from_chol(jnp.asarray(L)))
    np.testing.assert_allclose(ld, np.linalg.slogdet(A)[1], rtol=1e-8)
