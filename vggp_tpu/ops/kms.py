"""Closed-form inverse Cholesky of the Matérn-1/2 cell-integral Kuu.

The uniform-mesh B0 cell-integral Gram for the Matérn-1/2 (OU) kernel
(reference closed forms: ``univariate_structure.py:789-825``) is

    Kuu[i,j] = c (1-ρ)² ρ^{|i-j|-1}   (i ≠ j),      ρ = e^{-δ/ℓ}, c = σ²ℓ²
    Kuu[i,i] = 2c (ρ + δ/ℓ - 1)

i.e. geometric off-diagonals — so with T = KMS(ρ) (the AR(1) / Kac–Murdock–
Szegő matrix T_ij = ρ^{|i-j|}) the jittered Gram decomposes EXACTLY as

    Kuu + jI = γ T + η_eff I,   γ = c(1-ρ)²/ρ,
    η_eff = diag - γ + j = -2c(sinh(δ/ℓ) - δ/ℓ) + j.

T has a closed-form Cholesky factor L (L[i,0]=ρ^i, L[i,j]=ρ^{i-j}s for
i ≥ j ≥ 1, s = √(1-ρ²)) whose inverse is BIDIAGONAL, and the congruence

    Kuu + jI = L (γI + η_eff W) Lᵀ,    W = L⁻¹L⁻ᵀ  (tridiagonal)

reduces the factorization to the Cholesky G of the TRIDIAGONAL matrix
C = γI + η_eff W, whose leading principal minors D_k satisfy a
constant-coefficient three-term recurrence — solvable in closed form via
its characteristic roots. The true Cholesky factor of the jittered Kuu is
then F = L·G (product of lower-triangulars with positive diagonals =
unique Cholesky), and

    F⁻¹ = G⁻¹ L⁻¹

is built explicitly from the bidiagonal-inverse product formula in
O(m²) ELEMENTWISE work — no sequential O(m³) Cholesky, no triangular
solve. At the 512²-grid training shapes the dense chol + triangular
inverse pair costs ~23 % of the whole ELBO step (PERFORMANCE.md round-2
breakdown); this replaces both with vectorized exp/log arithmetic.

All small-difference quantities route through :mod:`ops.stablemath`
(TPU transcendentals are ~1e-6-absolute; the η coefficient is O((δ/ℓ)³)
against O((δ/ℓ)²) terms and vanishes entirely without the sinh series).
"""

from __future__ import annotations

import jax.numpy as jnp

from vggp_tpu.ops.stablemath import expm1mx, expm1s, sinhmx


def _tridiag_coefficients(delta, variance, lengthscale, rel_jitter):
    """Scalar coefficients of C = γI + η_eff·W (one bundle for the whole
    module: the factorization, the analytic-F rebuild, and the band-ratio
    gate all read from here).

    Every small-difference quantity routes through the stablemath series.
    The two algebraically equal forms of (a − 2b) are each cancellation-free
    in one δ/ℓ regime (see the module doc); (a + 2b) has a single form
    stable everywhere.
    """
    u = delta / lengthscale
    small = u < 1.0
    # ρ: series below 1 (TPU exp's ~1e-6 ABSOLUTE error matters when ρ ≈ 1),
    # plain exp above (the series form 1 + expm1s(−u) loses ALL relative
    # precision once e^{−u} < eps — measured 2.6e-2 on the whitening identity
    # at δ/ℓ = 20 in f32; exp's relative error is ~1e-6 at every u).
    rho = jnp.where(small, 1.0 + expm1s(-u), jnp.exp(-jnp.maximum(u, 1.0)))
    omr = -expm1s(-u)                      # 1 - ρ, no cancellation
    s2 = -expm1s(-2.0 * u)                 # 1 - ρ²
    s = jnp.sqrt(s2)
    c = variance * lengthscale * lengthscale

    diag0 = 2.0 * c * expm1mx(-u)          # Kuu diagonal
    us = jnp.minimum(u, 1.0)               # bound unselected-branch arguments:
    es = expm1s(us)                        # sinh/expm1 of u ≳ 88 overflow f32
    eta_s = -2.0 * c * sinhmx(us) + rel_jitter * diag0   # η_eff, u < 1 only
    # η_eff·ρ for u ≥ 1 via the identity (sinh u − u)e^{−u}
    #   = −expm1(−2u)/2 − u·e^{−u}  — bounded (≤ 1/2) for every u, where the
    # separate factors overflow (η ~ −c·eᵘ) / underflow (ρ = e^{−u}) and
    # their product NaNs as inf·0 past u ≈ 88.
    ul = jnp.maximum(u, 1.0)
    smrho_l = -0.5 * expm1s(-2.0 * ul) - ul * jnp.exp(-ul)
    eta_rho = jnp.where(
        small,
        eta_s * rho,
        -2.0 * c * smrho_l + rel_jitter * diag0 * rho,
    )

    gamma_s = c * es * es * jnp.exp(-us)   # γ = c(1-ρ)²/ρ = c·expm1(u)²·ρ
    a_minus_2b = jnp.where(
        small,
        gamma_s + eta_s * (1.0 + rho) / omr,
        diag0 * (1.0 + rel_jitter) * (1.0 + rho) / omr - 2.0 * c * omr,
    )
    # (a + 2b) = diag0(1+rel)(1-ρ)/(1+ρ) + 2c(1-ρ)²/(1+ρ)
    a_plus_2b = (diag0 * (1.0 + rel_jitter) * omr + 2.0 * c * omr * omr) / (1.0 + rho)
    a = 0.5 * (a_minus_2b + a_plus_2b)     # interior diagonal of C
    b = -eta_rho / s2                      # interior off-diagonal
    b0 = -eta_rho / s                      # C[0,1] (the KMS corner)
    a0 = diag0 * (1.0 + rel_jitter)        # C[0,0] = γ + η_eff  (exact identity)
    sq = jnp.sqrt(a_minus_2b * a_plus_2b)  # √(a² − 4b²)
    lam1 = 0.5 * (a + sq)
    return dict(u=u, rho=rho, s=s, a=a, b=b, b0=b0, a0=a0, sq=sq, lam1=lam1)


def m12_cell_inv_chol(m: int, delta, variance, lengthscale, rel_jitter):
    """Explicit F⁻¹ with F = chol(Kuu + jitter·I), closed form, O(m²).

    ``jitter = rel_jitter · mean(diag(Kuu))`` — matching the relative-jitter
    convention of ``models.common`` (the cell Kuu diagonal is constant, so
    the mean IS the diagonal entry).

    Returns the (m, m) lower-triangular inverse Cholesky factor in the
    dtype of ``lengthscale``. Exact (to rounding) for every ℓ, σ², δ —
    oracle-tested against dense f64 chol + solve in tests/test_kms.py.
    """
    dtype = jnp.result_type(lengthscale)
    co = _tridiag_coefficients(delta, variance, lengthscale, rel_jitter)
    u, rho, s = co["u"], co["rho"], co["s"]
    a, b, b0, a0, sq, lam1 = (co["a"], co["b"], co["b0"], co["a0"],
                              co["sq"], co["lam1"])

    # Leading principal minors D_k of C: D_0 = 1, D_1 = a0,
    # D_2 = a·D_1 − b0², D_k = a·D_{k-1} − b²·D_{k-2} (k ≥ 3) — constant
    # coefficients, so E_j := D_{j+1} = A·λ₁ʲ + B·λ₂ʲ in closed form.
    lam2 = (b * b) / lam1                  # product identity λ₁λ₂ = b²
    d1 = a0
    d2 = a * d1 - b0 * b0
    coefA = (d2 - lam2 * d1) / sq
    coefB = (lam1 * d1 - d2) / sq
    r = lam2 / lam1
    ones = jnp.ones((m,), dtype)
    r_pow = jnp.cumprod(jnp.concatenate([ones[:1], ones[1:] * r]))   # r^k
    fvec = coefA + coefB * r_pow           # D_{k+1} / λ₁ᵏ — O(1) positives

    # Bidiagonal-inverse product formula (telescoped through the minors):
    #   (G⁻¹)_ij = (−sign b)^{i−j} · (∏ |b| over (j..i−1))
    #              · D_{j−1} / √(D_{i−1} D_i)                (i ≥ j)
    # assembled in CENTERED, LOG-FREE form. Two rounding traps drive the
    # shape of this code:
    #  (1) raw minors grow like λ₁ᵏ (|log D_m| ~ 10⁴ at m = 512) — normalize
    #      by λ₁ᵏ analytically so only the O(1) ratios D̂_k = D_k/λ₁ᵏ⁻¹ and
    #      one geometric factor q^{i−j} (q = b/λ₁) remain;
    #  (2) TPU exp/log carry ~1e-6 absolute error, which an exp(Σ logs)
    #      assembly amplifies by |log| — measured 6.6 relative on the
    #      Titsias term at ℓ = 2. So the geometric factor comes from a
    #      CUMPROD (exact multiplies, error ~ eps·(i−j), i.e. proportional
    #      to how small the entry is), laid out scatter-free via the
    #      Toeplitz pad/reshape trick, and the ratios are plain divisions:
    #   (G⁻¹)_ij = sgn · q^{i−j} · D̂[j] / √(λ₁ D̂[i] D̂[i+1]),
    #   with the j = 0 column using b0/λ₁ for its first geometric step.
    from vggp_tpu.ops.toeplitz import sym_toeplitz_dense

    q = jnp.abs(b) / lam1                  # signs live in the sgn matrix below
    qb0 = jnp.abs(b0) / lam1
    q_pow = jnp.cumprod(jnp.concatenate([ones[:1], ones[1:] * q]))   # q^k
    dhat = jnp.concatenate([ones[:1], fvec / lam1])                  # D̂_0..D̂_m

    i0 = jnp.arange(m)[:, None]
    j0 = jnp.arange(m)[None, :]
    inv_den = 1.0 / jnp.sqrt(lam1 * dhat[i0] * dhat[i0 + 1])         # (m, 1) bcast
    band = sym_toeplitz_dense(q_pow)                                 # q^|i−j|
    # column 0 (i > 0): replace one factor of q by qb0 — q^{i} → qb0·q^{i−1}
    col0 = qb0 * jnp.concatenate([ones[:1], q_pow[:-1]])
    mag = jnp.where(j0 == 0, jnp.where(i0 > 0, col0[:, None], 1.0), band)
    neg_sign_b = jnp.where(b >= 0, -1.0, 1.0).astype(dtype)
    sgn = jnp.where((i0 - j0) % 2 == 1, neg_sign_b, 1.0)
    ginv = jnp.where(i0 >= j0, sgn * mag * dhat[j0] * inv_den, 0.0)

    # F⁻¹ = G⁻¹ L⁻¹ with L⁻¹ bidiagonal: diag (1, 1/s, …), subdiag −ρ/s.
    ld = jnp.concatenate([jnp.ones((1,), dtype), jnp.full((m - 1,), 1.0, dtype) / s])
    finv = ginv * ld[None, :]
    finv = finv.at[:, :-1].add(ginv[:, 1:] * (-rho / s))

    # Consistency refinement (the step that makes this safe on REAL TPU
    # hardware): the quadratic forms downstream (‖F⁻¹Kuf‖² in the Titsias
    # term) amplify UNSTRUCTURED factor error by ~√cond(Kuu) ≈ 1e3 at the
    # 1e-6 relative jitter. Dense chol survives through backward stability —
    # its inverse is exactly consistent with a nearby SPD matrix — while the
    # raw closed form's per-entry TPU rounding (~1e-6, from per-element
    # divide/rsqrt wobble) is uncorrelated and measured 1e-3 on colsum(a²).
    # One Newton–Schulz step against the ANALYTIC factor F = L·G (also
    # closed-form elementwise, so its FFᵀ ≈ Kuu error is smooth/structured)
    # restores exactly that consistency:  X ← X + X(I − F X), error² decay.
    # Cost: two (m, m) matmuls ≈ µs — nothing against the chol+trisolve pair
    # this module replaces.
    # ρᵏ via exp(−k·u), NOT cumprod(ρ): TPU exp gives ρ a ~1e-6 relative
    # error which a cumprod amplifies k-fold (measured 8e-4 at k = 512 —
    # and ρᵏ entries stay O(1) when ρ ≈ 1, so it lands on entries that
    # matter). Exponentiating the full argument keeps every element's
    # relative error at the single-exp level, exactly like the dense Kuu
    # builder's e^{−(k+1)δ/ℓ} form.
    rho_pow = jnp.exp(-jnp.arange(m, dtype=dtype) * u)
    col_s = jnp.concatenate([jnp.ones((1,), dtype), jnp.full((m - 1,), 1.0, dtype) * s])
    lt = jnp.where(i0 >= j0, sym_toeplitz_dense(rho_pow) * col_s[None, :], 0.0)
    dvec = jnp.sqrt(lam1 * dhat[1:] / dhat[:-1])          # G diagonal d_1..d_m
    if m >= 2:
        esub = jnp.where(jnp.arange(m - 1) == 0, b0, b) / dvec[:-1]  # G subdiag
        f_mat = lt * dvec[None, :]
        f_mat = f_mat.at[:, :-1].add(lt[:, 1:] * esub[None, :])
    else:
        f_mat = lt * dvec[None, :]
    eye = jnp.eye(m, dtype=dtype)
    resid = eye - jnp.matmul(f_mat, finv, precision="highest")
    finv = finv + jnp.matmul(finv, resid, precision="highest")
    return jnp.tril(finv)


def m12_geometric_ratio(delta, lengthscale, rel_jitter):
    """The per-step geometric decay ratio q = |b|/λ₁ of the F⁻¹ entries.

    Recomputes the handful of scalar coefficients of
    :func:`m12_cell_inv_chol` (variance cancels). In the kernel-dominated
    regime q ≤ ~0.27 for every ℓ; q approaches 1 only when the relative
    jitter dominates the off-diagonal structure (ℓ ≳ 1/(rel·δ)·δ — a GP
    that is constant over the whole domain). Used to gate the banded apply.
    """
    co = _tridiag_coefficients(delta, jnp.ones_like(lengthscale), lengthscale,
                               rel_jitter)
    return jnp.abs(co["b"]) / co["lam1"]


BAND_BLOCK = 128


def banded_whiten_apply(finv, kuf, q, precision):
    """a = F⁻¹·Kuf exploiting the geometric decay of the structured factor.

    F⁻¹'s entries fall like q^{i−j} with q ≤ ~0.27 away from the
    jitter-dominated corner, so the factor is EXACTLY banded at float
    precision — the (m, m)×(m, n) apply becomes a block-bidiagonal batch
    of (BAND_BLOCK, BAND_BLOCK)×(BAND_BLOCK, n) matmuls: 4× fewer MXU
    passes at the 512-cell bench shape with MXU-shaped 128-tiles, same
    6-pass accuracy. The block layout guarantees bandwidth ≥ BAND_BLOCK+1,
    so truncation discards entries ≤ q^(BAND_BLOCK+1): ≈ 1e-74 at the
    typical q, and still 9e-16 at the q = 0.7 gate below which the
    ``lax.cond`` keeps the banded path (dense fallback above — the
    jitter-dominated corner where the decay genuinely slows — and for
    shapes that don't block evenly). Re-derive the gate if BAND_BLOCK
    changes: need q^(BAND_BLOCK+1) ≪ f32 eps.
    """
    import jax
    from jax import lax

    m = finv.shape[0]
    if m % BAND_BLOCK != 0 or m // BAND_BLOCK < 2:
        return jnp.matmul(finv, kuf, precision=precision)
    nb = m // BAND_BLOCK

    def banded(args):
        fi, B = args
        f4 = fi.reshape(nb, BAND_BLOCK, nb, BAND_BLOCK)
        rr = jnp.arange(nb)
        diag_blocks = f4[rr, :, rr, :]                    # (nb, 64, 64)
        sub_blocks = f4[rr[1:], :, rr[:-1], :]            # (nb-1, 64, 64)
        kb = B.reshape(nb, BAND_BLOCK, -1)
        out = jnp.einsum("rij,rjn->rin", diag_blocks, kb, precision=precision)
        lower = jnp.einsum("rij,rjn->rin", sub_blocks, kb[:-1],
                           precision=precision)
        out = out.at[1:].add(lower)
        return out.reshape(m, -1)

    def dense(args):
        fi, B = args
        return jnp.matmul(fi, B, precision=precision)

    return lax.cond(q < 0.7, banded, dense, (finv, kuf))


# --------------------------------------------------------------------------- #
# KMS tridiagonal-inverse pieces for the matrix-free (CG) path
# --------------------------------------------------------------------------- #


def kms_gamma_rho(delta, variance, lengthscale, u_cap: float = 30.0,
                  u_floor: float = 0.0):
    """(γ, ρ, 1−ρ²) of the exact decomposition Kuu = γ·KMS(ρ) + η·I.

    Same stable forms as :func:`_tridiag_coefficients` (ρ via the expm1
    series near 1; γ = c(1−ρ)²/ρ cancellation-free through ``expm1s``).
    ``u = δ/ℓ`` is capped (γ grows like c·eᵘ and overflows f32 past u ≈ 88;
    by the cap the Gram is numerically diagonal) AND floored: applying the
    tridiagonal KMS⁻¹ to a smooth vector cancels to ~u²·|v|, so below
    u ≈ √eps the apply is pure rounding noise amplified by 1/γ — measured
    to destroy the Woodbury preconditioner outright in f32 at u ≲ 6e-4.
    The only consumer is a PRECONDITIONER: a floored u builds the exact
    factors of a coarser-grid surrogate Gram — still SPD, still a valid
    (gracefully weaker) preconditioner, never garbage. Pass
    ``u_floor = 5·√eps(dtype)`` (measured f32 boundary: healthy at
    u = 2.4e-3, garbage at 6.1e-4).
    """
    u = jnp.clip(delta / lengthscale, u_floor, u_cap)
    rho = jnp.where(u < 1.0, 1.0 + expm1s(-jnp.minimum(u, 1.0)),
                    jnp.exp(-jnp.maximum(u, 1.0)))
    omr = -expm1s(-u)                       # 1 − ρ
    s2 = -expm1s(-2.0 * u)                  # 1 − ρ²
    c = variance * lengthscale * lengthscale
    gamma = c * omr * omr / rho
    return gamma, rho, s2


def kms_tinv_matvec(rho, s2, v: jnp.ndarray) -> jnp.ndarray:
    """KMS(ρ)⁻¹ @ v via the closed tridiagonal inverse — O(m), no solve.

    T⁻¹ = (1/(1−ρ²)) · tridiag(−ρ | 1+ρ², with corner diagonals 1).
    ``v`` is (m,) or (m, k), applied along axis 0.
    """
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    w = (1.0 + rho * rho) * v
    w = w.at[0].add(-(rho * rho) * v[0])
    w = w.at[-1].add(-(rho * rho) * v[-1])
    w = w.at[1:].add(-rho * v[:-1])
    w = w.at[:-1].add(-rho * v[1:])
    out = w / s2
    return out[:, 0] if squeeze else out
