"""Support-adapted representation prototype (DESIGN_SUPPORT.md §3).

Measures the gather-ELL table matvec on the t≈97 Goutsias flagship
support (flagship_r04_ckpt.npz, ~40k states) under two row orderings:

  * append  — discovery order (reference ADD_STATE parity, the solver's
              default);
  * sorted  — rows permuted into packed-key (lexicographic lattice)
              order, a one-permutation bandwidth reduction for the
              pred_idx gathers.

Also reports, for scale, the masked-box stencil on the bounding box of
the same support — the memory-footprint comparison behind the round-4
decision to carry the flagship on the table backend.

Run on the TPU (exclusively!):  python bench_support_repr.py
Writes SUPPORT_REPR.json.
"""

from __future__ import annotations

import json
import time

import numpy as np


def time_matvec(fn, x, iters=200):
    """Chained device-side loop (bench.py methodology): eager per-call
    dispatch through the remote tunnel serializes ~27 ms round-trips and
    produced a 77 ms/matvec artifact on the first measurement pass."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(v):
        def body(i, v):
            y = fn(v)
            nrm = jnp.sqrt(jnp.sum(y * y) + 1e-300).astype(v.dtype)
            return y / nrm

        return jax.lax.fori_loop(0, iters, body, v)

    jax.block_until_ready(run(x))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(run(x))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from krylovfspssa_tpu.models.library import goutsias_model
    from krylovfspssa_tpu.ops.operator import build_operator
    from krylovfspssa_tpu.ops.spmv import spmv
    from krylovfspssa_tpu.statespace.encoding import StateEncoder
    from krylovfspssa_tpu.statespace.table import StateTable

    model = goutsias_model()
    enc = StateEncoder.for_model(6, 10_000)
    z = np.load("flagship_r04_ckpt.npz", allow_pickle=True)
    states = np.asarray(z["states"])
    w = np.asarray(z["w"])
    n = states.shape[0]
    stoich = np.asarray(model.stoichiometry, np.int64)

    out = {"n_states": int(n), "device": str(jax.devices()[0])}

    rng = np.random.default_rng(0)
    orders = {
        "append": np.arange(n),
        "sorted": None,  # fill below from the encoder keys
    }
    keys = enc.encode_np(states)
    if enc.n_words == 1:
        orders["sorted"] = np.argsort(keys, kind="stable")
    else:
        orders["sorted"] = np.lexsort(
            tuple(keys[:, wdx] for wdx in range(enc.n_words - 1, -1, -1))
        )

    build = jax.jit(
        lambda s, k, r, nn: build_operator(
            s, k, r, nn, model.propensities, jnp.asarray(stoich), enc,
            jnp.float64,
        )
    )
    mv = jax.jit(spmv)

    y_ref = None
    for name, perm in orders.items():
        t = StateTable.from_states(states[perm], enc, 4096, None)
        op = build(
            t.states, t.sorted_keys, t.sorted_to_row,
            jnp.asarray(t.n, jnp.int32),
        )
        x = np.zeros(t.capacity)
        rows = t.lookup_states(states)
        x[rows] = w
        xj = jnp.asarray(x)
        per = time_matvec(lambda v: mv(op, v), xj)
        y = np.asarray(mv(op, xj))
        tot = np.zeros(n)
        tot = y[rows]
        if y_ref is None:
            y_ref = tot
        else:
            # orderings must agree on the math
            err = float(np.max(np.abs(tot - y_ref)))
            out["max_order_disagreement"] = err
        nnz = (model.n_reactions + 1) * n
        out[name] = {
            "ms_per_matvec": round(per * 1e3, 4),
            "gnnz_per_s": round(nnz / per / 1e9, 3),
            "capacity": int(t.capacity),
        }
        print(name, out[name], flush=True)

    # footprint comparison vs the bounding box of this support
    from krylovfspssa_tpu.boxspace.box import BoxSpace

    box = BoxSpace.for_model(model.stoichiometry, states)
    for s in range(6):
        while box.extents[s] < states[:, s].max() + 1:
            box = box.grow(s)
    out["box_bounding_volume"] = int(box.volume)
    out["box_over_coverage"] = round(box.volume / n, 1)
    out["basis_bytes_table_f64_m100"] = int(102 * out["append"]["capacity"] * 8)
    out["basis_bytes_box_f64_m100"] = int(102 * box.volume * 8)

    with open("SUPPORT_REPR.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
