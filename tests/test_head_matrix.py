"""Cross-family API-matrix contract: every model family exposes the same
public head set (VERDICT r2 item #2). The reference scatters these across a
class-per-combination zoo (``gridded_kronecker_structure.py:396-438`` etc.);
here one parametrized test pins the matrix so a family can't silently lose
(or never grow) a head."""

import pytest

from vggp_tpu.models import additive, exact, freesvgp, sgpr, svgp
from vggp_tpu.models import sum as msum

HEADS = (
    "loss",                  # -elbo / -mll training objective
    "posterior",             # q(f*) at test inputs
    "posterior_predictive",  # + observation noise
    "prior",                 # p(f*) at test inputs
    "q_u",                   # (optimal / variational) q(u)
    "p_v_u",                 # p(v | u = E_q[u])
    "q_v",                   # gridded cell-integral product
    "q_dv",                  # gridded-gradient product
    "posterior_grad",        # pointwise-gradient posterior
)

# Documented math exclusions (the ONLY allowed holes):
#   exact — no inducing variables u exist, so q_u / p_v_u are undefined.
EXCLUSIONS = {
    exact: {"q_u", "p_v_u"},
}

FAMILIES = (exact, sgpr, svgp, freesvgp, additive, msum)


@pytest.mark.parametrize("module", FAMILIES, ids=lambda m: m.__name__.split(".")[-1])
@pytest.mark.parametrize("head", HEADS)
def test_family_exposes_head(module, head):
    if head in EXCLUSIONS.get(module, ()):
        pytest.skip(f"{module.__name__}: {head} undefined by the math")
    assert callable(getattr(module, head, None)), (
        f"{module.__name__} is missing public head {head!r}"
    )
