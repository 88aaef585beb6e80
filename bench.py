"""Headline benchmark: ELBO optimizer steps/sec, 512×512 gridded Kronecker SVGP.

Workload (the BASELINE.json north star): whitened, minibatched SVGP with B0
cell-integral inducing features on a 512×512 grid (m = 262 144 inducing
cells, Kronecker-factored variational covariance), batch 4096, single chip.
Each step = full value-and-grad of the ELBO + Adam update, jit-compiled;
steady-state rate (compile excluded).

``vs_baseline`` compares against the reference's best *measured* 2D gridded
ELBO step rate — 25.1 it/s on a 20×20 grid (m = 400), laptop CPU float64,
`61_envisat_gulfstream_experiment.ipynb` cell 54 (see BASELINE.md). The
reference cannot represent a 512×512 grid at all (it materializes the
m×m Kuu and m×n Kuf; 262144² floats ≈ 275 GB), so this is the closest
apples-to-anything number: vs_baseline > 1 means we take ELBO steps on a
655×-larger inducing grid faster than the reference steps on its largest.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

M_AXIS = 512
BATCH = 4096
NUM_DATA = 1_000_000
REFERENCE_2D_GRIDDED_IT_S = 25.1  # BASELINE.md, nb61 cell 54 (20×20 grid)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from vggp_tpu import train
    from vggp_tpu.features import CellIntegralFeature
    from vggp_tpu.models import svgp

    g1 = CellIntegralFeature.from_lims(M_AXIS, 0.0, 1.0)
    g2 = CellIntegralFeature.from_lims(M_AXIS, 0.0, 1.0)
    spec = svgp.SVGPSpec(
        kinds=("matern12", "matern12"),
        features=(g1, g2),
        num_data=NUM_DATA,
        variational="kron",
    )
    params = spec.init_params(jnp.float32)

    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.random((BATCH, 2)), jnp.float32)
    yb = jnp.asarray(
        np.sin(6 * np.asarray(xb[:, 0])) * np.cos(5 * np.asarray(xb[:, 1]))
        + 0.1 * rng.standard_normal(BATCH),
        jnp.float32,
    )

    opt = optax.adam(1e-2)
    raw = train.unconstrain(params)
    opt_state = opt.init(raw)

    # One jit-compiled scan over optimizer steps — exactly how train.fit
    # executes — so the measurement reflects device throughput, not the
    # per-dispatch RPC latency of the remote-TPU tunnel.
    n_timed = 200

    def one_step(carry, _):
        r, st = carry
        val, grads = jax.value_and_grad(
            lambda q: svgp.loss(spec, train.constrain(q), xb, yb)
        )(r)
        r, st = train.guarded_update(opt, r, st, val, grads)
        return (r, st), val

    @jax.jit
    def run(r, st):
        (r, st), vals = jax.lax.scan(one_step, (r, st), None, length=n_timed)
        return vals

    vals = run(raw, opt_state)  # compile + warmup
    assert np.isfinite(float(vals[-1])), f"warmup loss not finite: {vals[-1]}"
    t0 = time.perf_counter()
    vals = run(raw, opt_state)
    float(vals[-1])  # force completion through a real transfer
    dt = time.perf_counter() - t0

    steps_per_sec = n_timed / dt
    print(
        json.dumps(
            {
                "metric": "elbo_steps_per_sec_512x512_gridded_kron_svgp_batch4096",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / REFERENCE_2D_GRIDDED_IT_S, 3),
            }
        )
    )


if __name__ == "__main__":
    # The remote-TPU tunnel occasionally throws transient INTERNAL errors on
    # transfer; one retry keeps the driver's benchmark record intact.
    try:
        main()
    except Exception as e:  # pragma: no cover
        import sys, traceback

        if "INTERNAL" not in str(e):
            raise  # deterministic failure — don't mask it with a retry
        traceback.print_exc()
        print("bench: retrying once after transient tunnel error", file=sys.stderr)
        main()
