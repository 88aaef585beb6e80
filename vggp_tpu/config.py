"""Library-wide toggles."""

from __future__ import annotations

import jax

# Matmul precision for model math wrapped in ``models.common.highest_precision``
# (ELBO, predictions). TPU options: "highest" (6-pass f32 emulation), "high"
# (3-pass bf16), "default" (single bf16 pass — unsafe for GP variance
# cancellations). Measured on v5e at the 512² bench: "high" is 2.65× the step
# rate of "highest", and with the whitening matmul pinned at "highest" (below)
# the decomposed ELBO terms match a float64 oracle to ~1e-4 relative — the
# only term bf16x3 corrupted was the Titsias trace clamp, through cancellation
# amplified inside F⁻¹·Kuf (var_red off 0.35% → clamp off 60%). The decorator
# reads this at trace time, so set it before the first jit of the functions
# it should affect.
MATMUL_PRECISION: str = "high"

# Precision for the whitening apply F⁻¹·B inside ops.chol.PSDFactor.whiten —
# the one matmul whose result is consumed through catastrophic cancellation
# (k_ff − ‖a‖² with near-equality): keep at 6-pass f32. Costs ~2/5 of the
# forward big matmuls; everything else rides MATMUL_PRECISION.
WHITEN_MATMUL_PRECISION: str = "highest"

# Whitened-block gradients via precomputed scalar tangents: when every
# feature on an axis is a fixed basis (no learnable Z), the whitened block
# a = F⁻¹Kuf depends on exactly two trained scalars (ℓ, σ²), so its backward
# can be two dot-reductions against precomputed tangents instead of
# reverse-mode through Cholesky → triangular-inverse → (m,n,m) matmuls
# (``models.common.whitened_kuf_scalar``). Toggle for A/B benchmarking.
SCALAR_WHITEN_VJP: bool = True

# Precision for gradient-only matmuls (cotangents/tangents that never touch
# the forward value): 1-pass bf16. SGD tolerates ~4e-3-relative gradient
# noise; validated to convergence for the moments backward and the scalar
# whitening ℓ-tangent (PERFORMANCE.md). Set to "high" to make every
# gradient exactly match the ambient-precision autodiff.
GRAD_MATMUL_PRECISION: str = "default"

# Block-banded whitening apply: the structured F⁻¹ (ops.kms) decays
# geometrically (ratio q ≤ ~0.27 away from the jitter-dominated corner), so
# the (m, m)×(m, n) apply is exactly a block-bidiagonal batch of (128, 128)
# matmuls — 4× fewer 6-pass MXU passes at m = 512. A lax.cond falls back to
# the dense apply when the analytically computed ratio exceeds 0.7
# (truncation ≤ q^129: 9e-16 even at the gate).
BANDED_WHITEN_APPLY: bool = True

# Kronecker q(f)-moments backward at single-pass bf16 (models.svgp
# _kron_moments custom VJP): the ~6 cotangent matmuls of the mean/var block
# are gradient-only signal — SGD-tolerant like the 3-pass whitening
# cotangents — while the forward (what the recorded ELBO sees) keeps the
# ambient precision. Toggle for A/B benchmarking.
FAST_MOMENTS_BWD: bool = True

# Closed-form structured inverse-Cholesky (ops.kms): the Matérn-1/2
# cell-integral Kuu decomposes as γ·KMS(ρ) + η·I, whose exact Cholesky
# factor inverse is computable in O(m²) elementwise ops — replacing the
# dense chol + triangular-inverse pair (~23 % of the 512² ELBO step,
# PERFORMANCE.md). Also ~4 orders of magnitude MORE accurate in f32 than
# dense chol at long lengthscales (measured vs f64: 5e-7 vs 1e-2 relative).
STRUCTURED_FINV: bool = True

# Fuse the cell-Kuf construction into the block-bidiagonal whitening apply
# (ops.pallas_kernels.fused_banded_whiten_kuf): the (m, n) Kuf and ∂Kuf/∂ℓ
# tiles are built in VMEM and contracted against the structured F⁻¹ blocks
# on the MXU without ever materializing in HBM — removes a write + two
# reads of two (m, n) arrays per axis per training step. Batch-dependent
# (same-session A/Bs at the 512² workload, v5e): NEUTRAL-to-slightly-
# slower at batch 4096 (1190 vs 1221 steps/s — XLA's schedule already
# hides that HBM traffic behind MXU work), but the (512, n) block round
# trips dominate at large batch: +5% at 16384 (389 vs 370 steps/s) and
# +10% at 65536 (97.1 vs 88.0). "auto" enables the fusion at
# n ≥ FUSED_WHITEN_MIN_POINTS; True/False force it for A/Bs. Numerically
# validated on-device every bench run (SMOKE.json fused_whiten_{a,t}_err).
FUSED_WHITEN_KUF: bool | str = "auto"
FUSED_WHITEN_MIN_POINTS: int = 16384


def fused_whiten_enabled(n: int) -> bool:
    mode = FUSED_WHITEN_KUF
    if mode == "auto":
        return n >= FUSED_WHITEN_MIN_POINTS
    return bool(mode)

# KMS preconditioners for the matrix-free CG path (models.iterative): when
# every axis is a uniform matern12 cell feature, Kuu = γ·KMS(ρ) + η·I
# exactly and KMS⁻¹ is a closed tridiagonal, giving
# (a) a near-exact ⊗(γ⁻¹KMS⁻¹) preconditioner for the sampler's Kuu solves
#     (cond(Kuu) ~ (ℓ/δ)², where Jacobi is useless — measured 18× on the
#     512² pathwise field, 29.4 s → 1.6 s on-chip), and
# (b) a Woodbury preconditioner M = σ²·⊗(γᵢKMSᵢ) + KufKufᵀ for the G-solve
#     (one (n, n) factorization + O(m) tridiagonal matvecs per apply).
# (b) is DUAL-gated at runtime: the tridiagonal apply cancels to rounding
# noise below u = δ/ℓ ≈ √eps (u-floor), and in the MILD regime (ℓ/δ small)
# plain Jacobi already converges while CG with a strong preconditioner and
# bf16x3 matvec noise measurably regresses (on-chip 1024²: corr 0.9997
# Jacobi vs 0.984 Woodbury) — so (b) engages only past CG_KMS_MIN_STIFFNESS
# = max-axis ℓ/δ, the regime where Jacobi genuinely fails (f64 oracle: 30
# Woodbury iterations reach 1e-8 at ℓ/δ = 1024 where Jacobi-30 is 100×
# off). The (n, n) build is gated off above CG_KMS_MAX_POINTS.
CG_KMS_PRECOND: bool = True
CG_KMS_MAX_POINTS: int = 8192
CG_KMS_MIN_STIFFNESS: float = 512.0

# Toeplitz circulant matvec FFT backend (ops.toeplitz.sym_toeplitz_matvec):
# "auto" uses jnp.fft.rfft on CPU/GPU and the complex-free (re, im)-pair
# radix-2 FFT (ops.realfft) on any "tpu" backend — the axon remote-TPU
# plugin identifies as plain "tpu" (default_backend/platform/device all say
# so) yet implements no complex64 ops (even rfft raises UNIMPLEMENTED), so
# platform sniffing cannot tell it from a real TPU; the pair FFT is correct
# on both. True forces the real-pair path everywhere (A/B + CPU testing);
# False forces rfft.
REAL_FFT_TOEPLITZ: bool | str = "auto"

# Route large structured-covariance constructions through the Pallas TPU
# kernels (vggp_tpu.ops.pallas_kernels). Off-TPU the jnp reference
# implementations are used regardless (interpret-mode Pallas is for tests).
USE_PALLAS: bool = True

# Below these sizes the (128, 128) tile padding costs more than the fused
# kernel saves; the jnp implementation is used instead.
PALLAS_MIN_CELLS: int = 64
PALLAS_MIN_POINTS: int = 128


def pallas_kuf_enabled(m: int, n: int) -> bool:
    return (
        USE_PALLAS
        and m >= PALLAS_MIN_CELLS
        and n >= PALLAS_MIN_POINTS
        and jax.default_backend() == "tpu"
    )
