"""vggp_tpu — TPU-native variational gridded Gaussian processes.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of
``maxnorman569/Variational-Gridded-Gaussian-Processes`` (sparse variational GP
regression with inter-domain "gridded" inducing features for 1D and
Kronecker-structured 2D inputs, applied to satellite altimetry data).

Layer map (mirrors SURVEY.md §7):

- :mod:`vggp_tpu.kernels`   — stationary kernels + spectral densities (pure fns)
- :mod:`vggp_tpu.ops`       — structured linear operators (Toeplitz, Kronecker,
  diag+low-rank, banded) with matvec/solve/logdet and Pallas kernels for hot ops
- :mod:`vggp_tpu.features`  — inducing-feature families: Points (SVGP), Fourier
  (VFF), B1-spline RKHS (ASVGP), B0 cell integrals (GriddedGP); each returns
  per-axis (Kuu operator, Kuf fn, Kvu fn)
- :mod:`vggp_tpu.models`    — ExactGP, SGPR (collapsed ELBO, 1D & Kronecker 2D),
  SVGP (whitened, minibatched, Kronecker variational), gridded q(v) heads
- :mod:`vggp_tpu.train`     — optax loops, param transforms, init heuristics,
  checkpointing, metrics history
- :mod:`vggp_tpu.parallel`  — jax.sharding mesh wiring: DP over minibatch, grid
  axis sharding for very large inducing grids
- :mod:`vggp_tpu.utils`     — data loaders/generators, scalers, metrics,
  integrators, experiment helpers
- :mod:`vggp_tpu.sampling`  — pathwise posterior draws (Matheron + spectral
  prior paths) for every model family, incl. coherent gridded-product draws
- :mod:`vggp_tpu.streaming` — exact online assimilation of the whitened
  posterior (natural-parameter RLS; CVI sites for non-conjugate streams)
- :mod:`vggp_tpu.hyperpost` — Laplace hyperparameter posterior, marginalized
  predictions (vmapped over draws), Laplace log-evidence for model comparison
- :mod:`vggp_tpu.basis`     — standalone basis-function API (reference
  ``src/basis/`` parity layer)
"""

__version__ = "0.1.0"

from vggp_tpu import kernels, ops, features, models, train, utils, parallel, data  # noqa: F401,E402
from vggp_tpu import basis, hyperpost, likelihoods, sampling, streaming  # noqa: F401,E402
from vggp_tpu import api  # noqa: F401,E402
from vggp_tpu.api import GP, SVGP, Streaming  # noqa: F401,E402
