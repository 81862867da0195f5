"""Pencil-operator matvec vs gather-ELL on the live flagship support.

Measures, on the real TPU, the ops/pencil.py row-gather + lane-shift
matvec against the production ops/spmv.py batched-gather form at the
Goutsias flagship's checkpointed support (the snapshot copied to
/tmp/pencil_snapshot.npz; falls back to flagship_r04_ckpt.npz).

Run with the TPU exclusively idle:  python bench_pencil.py
Writes PENCIL_BENCH.json.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def time_matvec(fn, x, target_s=2.0):
    import jax
    import jax.numpy as jnp

    def make_run(iters):
        @jax.jit
        def run(v):
            def body(i, v):
                y = fn(v)
                nrm = jnp.sqrt(jnp.sum(y * y) + 1e-300).astype(v.dtype)
                return y / nrm

            return jax.lax.fori_loop(0, iters, body, v)

        return run

    probe = make_run(3)
    jax.block_until_ready(probe(x))
    t0 = time.perf_counter()
    jax.block_until_ready(probe(x))
    per = (time.perf_counter() - t0) / 3
    iters = int(max(10, min(400, target_s / max(per, 1e-6))))
    run = make_run(iters)
    jax.block_until_ready(run(x))
    t0 = time.perf_counter()
    jax.block_until_ready(run(x))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from krylovfspssa_tpu.models.library import goutsias_model
    from krylovfspssa_tpu.ops.operator import build_operator
    from krylovfspssa_tpu.ops.pencil import (
        build_pencil_layout,
        build_pencil_operator,
        pencil_matvec,
    )
    from krylovfspssa_tpu.ops.spmv import spmv
    from krylovfspssa_tpu.statespace.encoding import StateEncoder
    from krylovfspssa_tpu.statespace.table import StateTable

    snap = (
        "/tmp/pencil_snapshot.npz"
        if os.path.exists("/tmp/pencil_snapshot.npz")
        else "flagship_r04_ckpt.npz"
    )
    z = np.load(snap, allow_pickle=True)
    states = np.asarray(z["states"])
    w = np.asarray(z["w"])
    n = states.shape[0]
    model = goutsias_model()
    stoich = np.asarray(model.stoichiometry, np.int64)
    nnz = (model.n_reactions + 1) * n
    out = {"n_states": int(n), "snapshot": snap,
           "device": str(jax.devices()[0])}

    # ---- pencil ----------------------------------------------------
    t0 = time.perf_counter()
    layout = build_pencil_layout(states)
    out["layout_build_s"] = round(time.perf_counter() - t0, 3)
    out["lane_species"] = layout.lane_species
    out["n_rows"] = int(layout.n_rows)
    out["cell_overcoverage"] = round(layout.n_cells / n, 3)

    def props_np(s):
        return np.asarray(model.propensities(jnp.asarray(s)))

    t0 = time.perf_counter()
    pop = build_pencil_operator(
        layout, states, props_np, stoich, species_cap=(1 << 14) - 1
    )
    pop = jax.block_until_ready(pop)
    out["pencil_op_build_s"] = round(time.perf_counter() - t0, 3)

    xp_np = np.zeros(layout.n_cells)
    xp_np[layout.slot_of_state] = w

    for dt, dname in ((jnp.float64, "f64"), (jnp.float32, "f32")):
        popd = pop._replace(
            diag=pop.diag.astype(dt), pred_prop=pop.pred_prop.astype(dt)
        )
        xj = jnp.asarray(xp_np, dt)
        per = time_matvec(lambda v: pencil_matvec(popd, v), xj)
        rec = {
            "ms_per_matvec": round(per * 1e3, 4),
            "gnnz_per_s": round(nnz / per / 1e9, 3),
        }
        out[f"pencil_{dname}"] = rec
        print("pencil", dname, rec, flush=True)

    # ---- gather-ELL baseline --------------------------------------
    enc = StateEncoder.for_model(6, 10_000)
    t = StateTable.from_states(states, enc, 4096, None)
    build = jax.jit(
        lambda s, k, r, nn: build_operator(
            s, k, r, nn, model.propensities, jnp.asarray(stoich), enc,
            jnp.float64,
        )
    )
    t0 = time.perf_counter()
    op = jax.block_until_ready(build(
        t.states, t.sorted_keys, t.sorted_to_row,
        jnp.asarray(t.n, jnp.int32),
    ))
    out["ell_op_build_s"] = round(time.perf_counter() - t0, 3)
    x_np = np.zeros(t.capacity)
    rows = np.asarray(t.lookup_states(states))
    x_np[rows] = w
    mv = jax.jit(spmv)
    per = time_matvec(lambda v: mv(op, v), jnp.asarray(x_np))
    out["ell_f64"] = {
        "ms_per_matvec": round(per * 1e3, 4),
        "gnnz_per_s": round(nnz / per / 1e9, 3),
    }
    print("ell f64", out["ell_f64"], flush=True)

    # correctness cross-check on the live vector
    y_p = np.asarray(pencil_matvec(pop, jnp.asarray(xp_np)))[
        layout.slot_of_state
    ]
    y_e = np.asarray(mv(op, jnp.asarray(x_np)))[rows]
    denom = max(np.max(np.abs(y_e)), 1e-300)
    out["max_rel_err_pencil_vs_ell"] = float(
        np.max(np.abs(y_p - y_e)) / denom
    )
    out["speedup_f64"] = round(
        out["ell_f64"]["ms_per_matvec"]
        / out["pencil_f64"]["ms_per_matvec"], 2,
    )

    with open("PENCIL_BENCH.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
