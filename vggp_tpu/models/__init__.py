"""GP model families.

- :mod:`vggp_tpu.models.exact`  — exact GP regression (1D and separable 2D),
  with a gridded q(v) head.
- :mod:`vggp_tpu.models.sgpr`   — collapsed-ELBO sparse GP (Titsias) over any
  inducing-feature family, 1D and Kronecker 2D. This covers the reference's
  SVGP / VFF / ASVGP / GriddedGP model zoo via feature choice.
- :mod:`vggp_tpu.models.additive` — additive-structure sparse GP (the family
  the reference left as an empty placeholder).
- :mod:`vggp_tpu.models.svgp`   — whitened, uncollapsed, minibatchable SVGP
  with full or Kronecker-factored variational covariance: the scalable path
  the reference lacks (SURVEY.md §3a note), sized for 512×512 inducing grids.
- :mod:`vggp_tpu.models.freesvgp` — collapsed sparse GP with free
  d-dimensional inducing points (Hadamard-product Kuu), the model behind the
  reference's nb61 Z-sweep (``gridded_kronecker_structure.py:222-264``).
- :mod:`vggp_tpu.models.iterative` — matrix-free CG posterior means for
  structured Kuu far past the dense range (Toeplitz/banded matvecs).
- :mod:`vggp_tpu.models.sum` — sum-of-separable-kernels sparse GP
  (multi-scale fields, full LMC multi-output), block-diagonal Kuu over
  per-component inducing features.

All models are functional: a frozen ``*Spec`` dataclass holds static
configuration (kernel kinds, feature objects, jitter); pure functions take
``(spec, params, data)``. Specs are closed over by jitted functions — only
parameter pytrees and data arrays are traced.
"""

from vggp_tpu.models.exact import ExactGPSpec
from vggp_tpu.models.sgpr import SGPRSpec
from vggp_tpu.models.svgp import SVGPSpec
from vggp_tpu.models.additive import AdditiveSGPRSpec
from vggp_tpu.models.freesvgp import FreeSVGPSpec
from vggp_tpu.models.sum import SumSGPRSpec
from vggp_tpu.models import exact, sgpr, svgp, additive, freesvgp, iterative, sum  # noqa: F401,A004

__all__ = ["ExactGPSpec", "SGPRSpec", "SVGPSpec", "AdditiveSGPRSpec",
           "FreeSVGPSpec", "SumSGPRSpec", "exact", "sgpr", "svgp", "additive",
           "freesvgp", "iterative", "sum"]
