"""PSD-safe Cholesky and triangular-solve helpers.

The reference papers over PSD fragility with symmetrize + 1e-6 jitter
fallbacks (``gridded_kronecker_structure.py:187-191,436-438,913-915``).
Here the numerics policy is explicit: symmetrize once, add a jitter scaled to
the mean diagonal, and propagate Cholesky factors instead of forming explicit
inverses anywhere downstream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_JITTER = 1e-6
# float32 jitter floor. Structured Kuu entries are now built with
# series-compensated transcendentals (ops.stablemath; ~3e-6 relative error
# on TPU), so the jitter only needs to cover that construction error plus
# f32 Cholesky roundoff. Oversized jitter is a *bias*, not just insurance:
# at 1e-4 relative it sat at ~10% of the smallest Kuu eigenvalue in the 1D
# gridded experiment and measurably degraded the converged ELBO (+3.9 vs
# −3.1) and the learned noise.
F32_MIN_JITTER = 1e-6


@jax.custom_vjp
def _whiten_matmul(finv: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """finv @ b with 6-pass f32 forward and 3-pass backward.

    The forward product feeds catastrophic cancellations (k_ff − ‖a‖²) and
    must be f32-exact (see PSDFactor.whiten); its cotangent products are
    gradients — SGD-tolerant — so they ride the cheaper ambient precision.
    A plain ``precision=`` argument would pin the transpose dots to 6-pass
    too, which costs ~0.13 ms/step at the 512²/4096 bench sizes.
    """
    from vggp_tpu import config

    return jnp.matmul(finv, b, precision=config.WHITEN_MATMUL_PRECISION)


def _whiten_matmul_fwd(finv, b):
    return _whiten_matmul(finv, b), (finv, b)


def _whiten_matmul_bwd(res, g):
    from vggp_tpu import config

    finv, b = res
    prec = config.MATMUL_PRECISION
    dfinv = jnp.matmul(g, b.T, precision=prec)
    db = jnp.matmul(finv.T, g, precision=prec)
    return dfinv, db


_whiten_matmul.defvjp(_whiten_matmul_fwd, _whiten_matmul_bwd)


def safe_cholesky(a: jnp.ndarray, jitter: float = DEFAULT_JITTER) -> jnp.ndarray:
    """Lower Cholesky of ``(a + aᵀ)/2 + jitter·mean(diag)·I``.

    The jitter is purely relative to the mean diagonal (scale-free); float64
    uses ``jitter`` as given, float32 floors it at :data:`F32_MIN_JITTER`.
    """
    a = 0.5 * (a + a.T)
    n = a.shape[-1]
    rel = jitter if a.dtype == jnp.float64 else max(jitter, F32_MIN_JITTER)
    scale = jnp.mean(jnp.diagonal(a)) * rel
    return jnp.linalg.cholesky(a + scale * jnp.eye(n, dtype=a.dtype))


def tri_solve(chol: jnp.ndarray, b: jnp.ndarray, lower: bool = True, trans: bool = False) -> jnp.ndarray:
    """Solve ``L x = b`` (or ``Lᵀ x = b`` with ``trans``) for triangular L."""
    return jax.scipy.linalg.solve_triangular(chol, b, lower=lower, trans=1 if trans else 0)


def solve_psd(chol: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``A x = b`` given lower Cholesky factor of A."""
    return tri_solve(chol, tri_solve(chol, b), trans=True)


def logdet_from_chol(chol: jnp.ndarray) -> jnp.ndarray:
    """log|A| from its lower Cholesky factor."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))


# --------------------------------------------------------------------------- #
# clamped-eigh PSD factors — the robust path for structured Kuu blocks
# --------------------------------------------------------------------------- #

# Relative eigenvalue floor per dtype. Gridded / VFF / spline Kuu blocks run
# condition numbers that grow exponentially in lengthscale/cell-size; past
# ~1e6 a float32 Cholesky on TPU silently produces NaN (observed: GriddedGP
# ELBO fit NaNs at ℓ/δ ≈ 40 on v5e). Eigenvalue clamping caps the condition
# number instead of failing — equivalent to jitter applied only in the
# deficient eigendirections.
EIG_FLOOR_F32 = 1e-6
EIG_FLOOR_F64 = 1e-12


class PSDFactor:
    """Factor of a PSD matrix A ≈ F Fᵀ, with a whitening solve.

    Two flavors (``tri`` is static pytree aux data):

    - Cholesky (``tri=True``): F = L lower-triangular; ``whiten`` is a
      triangular solve. Cheap, differentiable, the default on the training
      hot path.
    - clamped-eigh (``tri=False``): F = Q Λ^{1/2} with eigenvalues floored at
      a relative threshold, ``Finv = Λ^{-1/2} Qᵀ`` stored explicitly;
      ``whiten`` is an MXU matmul and is NaN-free for any symmetric input.
      Used on non-differentiated prediction paths where Kuu conditioning is
      extreme. (Not for training: grad-of-eigh carries 1/(λi−λj) terms that
      blow up on the clustered spectra these Kuu blocks have.)
    """

    __slots__ = ("F", "Finv", "tri")

    def __init__(self, F, Finv=None, tri=True):
        self.F = F          # (m, m), A = F @ F.T
        self.Finv = Finv    # (m, m) explicit F⁻¹, only for tri=False
        self.tri = tri

    def whiten(self, b: jnp.ndarray) -> jnp.ndarray:
        """F⁻¹ b — the whitening solve.

        TPU's blocked triangular solve is sequential in the RHS-independent
        direction and dominates the whole ELBO step when b is wide (measured:
        ~7 ms of a 12 ms 512²-grid step). When b has more columns than F has
        rows, invert L once (a narrow m-RHS solve, CSE'd across uses inside
        one program) and apply it as a single MXU matmul instead.

        The matmul runs at ``config.WHITEN_MATMUL_PRECISION`` regardless of
        the ambient precision: F⁻¹'s rows cancel internally against Kuf
        columns, and the product feeds ``k_ff − ‖a‖²``-style subtractions —
        bf16x3 here corrupts the Titsias trace term ~60% (measured vs a
        float64 oracle at the 512² bench sizes) while 6-pass f32 matches
        the oracle to ~1e-6 relative.
        """
        if self.tri:
            m = self.F.shape[0]
            cols = 1 if b.ndim == 1 else b.shape[-1]
            if cols > m:
                finv = jax.scipy.linalg.solve_triangular(
                    self.F, jnp.eye(m, dtype=self.F.dtype), lower=True
                )
                return _whiten_matmul(finv, b)
            return jax.scipy.linalg.solve_triangular(self.F, b, lower=True)
        return _whiten_matmul(self.Finv, b)

    @property
    def logdet(self) -> jnp.ndarray:
        """log|A| = 2 log|F|."""
        if self.tri:
            return 2.0 * jnp.sum(jnp.log(jnp.diagonal(self.F)))
        # F = QΛ^{1/2}: |A| = |Λ|; diag of Finv @ F is I so use F columns
        return 2.0 * jnp.sum(jnp.log(jnp.linalg.norm(self.F, axis=0)))


jax.tree_util.register_pytree_node(
    PSDFactor,
    lambda f: ((f.F, f.Finv), f.tri),
    lambda tri, c: PSDFactor(c[0], c[1], tri),
)


def psd_factor(a: jnp.ndarray, method: str = "chol", jitter: float = DEFAULT_JITTER) -> PSDFactor:
    """PSD factor of ``(a + aᵀ)/2`` by the chosen method."""
    if method == "chol":
        return PSDFactor(safe_cholesky(a, jitter), tri=True)
    if method == "eigh":
        return psd_factor_eigh(a)
    raise ValueError(f"unknown factor method {method!r}")


def psd_factor_eigh(a: jnp.ndarray, rel_floor: float | None = None) -> PSDFactor:
    """Clamped-eigh PSD factor of ``(a + aᵀ)/2``.

    Eigenvalues are floored at ``rel_floor * max(λ)`` (dtype-dependent
    default), capping the condition number; no failure mode exists.
    """
    a = 0.5 * (a + a.T)
    if rel_floor is None:
        rel_floor = EIG_FLOOR_F64 if a.dtype == jnp.float64 else EIG_FLOOR_F32
    w, q = jnp.linalg.eigh(a)
    w = jnp.maximum(w, rel_floor * jnp.max(w))
    sw = jnp.sqrt(w)
    return PSDFactor(F=q * sw[None, :], Finv=(q / sw[None, :]).T, tri=False)
