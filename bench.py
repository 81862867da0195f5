"""Benchmark: CME SpMV throughput vs HBM roofline on the Goutsias operator.

Prints ONE JSON line:
  {"metric": "spmv_roofline_pct", "value": <pct>, "unit": "%", "vs_baseline": <pct/70>}

The metric is the fraction of the HBM-bandwidth roofline achieved by the
gather-form CME SpMV (the solver's hottest kernel) on a ~1.8M-state
Goutsias operator, in the solver's default float64.  BASELINE.md sets the
round target at >= 70% of roofline, so vs_baseline = pct / 70.

The reference Fortran publishes no numbers and cannot be compiled here
(no gfortran in the image; see BASELINE.md), so the roofline fraction — a
hardware-absolute measure — is the headline metric.  Details (sizes, f32
variant, absolute nnz/s) go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

#: approximate HBM bandwidth per chip (TPU v5e ~ 819 GB/s)
HBM_GBPS = {"v5e": 819e9, "v5": 819e9, "cpu": 100e9}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_goutsias_operator(target_states: int):
    import jax.numpy as jnp

    from krylovfspssa_tpu.models.library import goutsias_model
    from krylovfspssa_tpu.ops.operator import build_operator
    from krylovfspssa_tpu.statespace.encoding import StateEncoder
    from krylovfspssa_tpu.statespace.table import StateTable

    model = goutsias_model()
    # physically-motivated box: monomer/dimer counts dominate; DNA copies <= 2
    bounds = np.array([64, 64, 16, 3, 3, 3])
    while np.prod(bounds) < target_states:
        bounds[0] *= 2
    while np.prod(bounds) > 2 * target_states and bounds[0] > 8:
        bounds[0] //= 2
    grids = np.meshgrid(*[np.arange(b) for b in bounds], indexing="ij")
    states = np.stack([g.ravel() for g in grids], axis=1).astype(np.int32)
    states = states[:target_states]
    log(f"building operator: {states.shape[0]} states, box {bounds.tolist()}")

    enc = StateEncoder.for_model(model.n_species, 10_000)
    cap = 1 << int(np.ceil(np.log2(states.shape[0])))
    table = StateTable.from_states(states, enc, capacity=cap)
    op = build_operator(
        table.states,
        table.sorted_keys,
        table.sorted_to_row,
        jnp.asarray(table.n, jnp.int32),
        model.propensities,
        jnp.asarray(model.stoichiometry),
        enc,
    )
    return model, table, op


def bench_spmv(op, n: int, iters: int = 50, repeats: int = 3):
    import jax
    import jax.numpy as jnp

    from krylovfspssa_tpu.ops.spmv import spmv

    cap = op.diag.shape[0]
    R = op.pred_idx.shape[1]

    @jax.jit
    def run(x):
        def body(i, x):
            y = spmv(op, x)
            # renormalize so values stay finite and iterations stay dependent
            return y / jnp.sqrt(jnp.sum(y * y) + 1e-300)

        return jax.lax.fori_loop(0, iters, body, x)

    x0 = jnp.asarray(np.random.default_rng(0).random(cap))
    run(x0).block_until_ready()  # compile + warm up
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        run(x0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    per_spmv = best / iters
    nnz = n * (R + 1)
    return per_spmv, nnz


def roofline_bytes(n: int, R: int, value_bytes: int) -> int:
    """Unavoidable HBM traffic per SpMV: stream pred_idx (4B) + pred_prop +
    gathered x entry per edge, plus diag + x + y per row."""
    return n * (R * (4 + 2 * value_bytes) + 3 * value_bytes)


def main():
    target = int(os.environ.get("BENCH_STATES", 1 << 20))
    platform = "cpu"
    t_start = time.time()
    try:
        import jax

        platform = jax.devices()[0].platform
        log(f"devices: {jax.devices()} (first-op init may take minutes on axon)")
        import jax.numpy as jnp  # noqa: F401

        model, table, op = build_goutsias_operator(target)
        n, R = table.n, model.n_reactions

        per_spmv, nnz = bench_spmv(op, n)
        bw = HBM_GBPS.get("v5e" if platform in ("tpu", "axon") else "cpu")
        t_roof = roofline_bytes(n, R, 8) / bw
        pct = 100.0 * t_roof / per_spmv
        gnnz = nnz / per_spmv / 1e9

        log(
            f"f64 SpMV: {per_spmv*1e3:.3f} ms/iter, {gnnz:.2f} Gnnz/s, "
            f"roofline {t_roof*1e3:.3f} ms -> {pct:.1f}% "
            f"(n={n}, nnz={nnz}, platform={platform})"
        )

        # f32 variant for reference
        import jax.numpy as jnp

        op32 = op._replace(
            diag=op.diag.astype(jnp.float32),
            pred_prop=op.pred_prop.astype(jnp.float32),
            props=op.props.astype(jnp.float32),
        )
        per32, _ = bench_spmv(op32, n)
        t_roof32 = roofline_bytes(n, R, 4) / bw
        log(
            f"f32 SpMV: {per32*1e3:.3f} ms/iter, {nnz/per32/1e9:.2f} Gnnz/s, "
            f"{100.0*t_roof32/per32:.1f}% roofline"
        )
        log(f"total bench wall: {time.time()-t_start:.1f}s")

        print(
            json.dumps(
                {
                    "metric": "spmv_roofline_pct",
                    "value": round(pct, 2),
                    "unit": "%",
                    "vs_baseline": round(pct / 70.0, 4),
                }
            )
        )
    except Exception as e:  # noqa: BLE001
        log(f"bench failed: {type(e).__name__}: {e}")
        print(
            json.dumps(
                {
                    "metric": "spmv_roofline_pct",
                    "value": 0.0,
                    "unit": "%",
                    "vs_baseline": 0.0,
                }
            )
        )
        raise


if __name__ == "__main__":
    main()
