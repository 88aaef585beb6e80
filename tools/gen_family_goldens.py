"""Generate CPU-float64 goldens for the bench.py family smoke rows.

The coregion/sum/additive/streaming paths are exactly the ones CLAUDE.md
documents as invisible to CPU f64 tests (default-bf16 matmuls, TPU exp
error), so bench.smoke() checks them ON DEVICE against the constants this
script prints. The cases themselves live in vggp_tpu/utils/smoke_cases.py
(one source of truth for generator and device check). Re-run after any
numerics change to these families:

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/gen_family_goldens.py

and paste the emitted block into bench.py.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from vggp_tpu.utils.smoke_cases import (cg_case, family_values,  # noqa: E402
                                        hyperpost_case)


if __name__ == "__main__":
    for dtype, name in ((jnp.float32, "_GOLD_FAMILIES_F32"),
                        (jnp.float64, "_GOLD_FAMILIES_F64")):
        compute, args = family_values(dtype)
        vals = jax.jit(compute)(*args)
        cg_compute, cg_args = cg_case(dtype)
        vals["cg_qv_abs_sum"] = jax.jit(cg_compute)(*cg_args)
        print(name + " = {")
        for k, v in vals.items():
            print(f"    \"{k}\": {float(v)!r},")
        print("}")
    # hyperpost row: f32 goldens feed bench._GOLD_HP_F32 (order: laplace
    # mean/var, hmc mean/var); f64 printed for the docstring reference
    for dtype, name in ((jnp.float32, "_GOLD_HP_F32 (+ accept rate)"),
                        (jnp.float64, "hp f64 reference")):
        hp_compute, hp_args = hyperpost_case(dtype)
        hp = jax.jit(hp_compute)(*hp_args)
        print(name + ":", {k: float(v) for k, v in hp.items()})
