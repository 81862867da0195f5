"""Gather-ELL matvec optimization experiments (VERDICT r4 item 5).

The reference-format table matvec (StateSpace.f90:13-17 + FMATVEC,
KrylovSolver.f90:588-606) is the flagship's actual kernel.  Round-5
finding: the production (cap, R) batched gather costs ~158 ms at the
279k-state flagship support in f64 — ~30 ns PER ELEMENT, i.e. XLA
serializes the scalar gathers on TPU (the earlier 0.212 ms reading in
SUPPORT_REPR.json did not reproduce and is superseded by this harness).
That serial gather is the flagship's 12 s/step.  Candidate designs
measured here on the live support (flagship_r04_ckpt.npz):

  * ell_row    — production spmv: (cap, R) pred tables, one batched
                 gather + row reduction (ops/spmv.py);
  * ell_col    — transposed (R, cap) layout: R independent (cap,)
                 gathers, each near-monotonic in sorted order;
  * delta      — "delta-stencil": in sorted-key order most predecessor
                 rows sit at a per-reaction constant offset (the lattice
                 stride); entries matching the mode offset become a
                 SHIFTED multiply-add (pure streaming, no gather), the
                 rest (boundary states) go to a padded COO correction
                 applied with one small gather + scatter-add.

each x {append, sorted} row order, x {f64, f32} vector dtype.

Run on the TPU (exclusively!):  python bench_table_matvec.py
Writes TABLE_MATVEC.json.
"""

from __future__ import annotations

import json
import time

import numpy as np


def time_matvec(fn, x, target_s=2.0):
    """Chained device-side loop (bench.py methodology) with the iteration
    count auto-calibrated: the variants here span 0.05 ms .. 160 ms."""
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
    jax.block_until_ready(probe(x))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(probe(x))
    per = (time.perf_counter() - t0) / 3
    iters = int(max(10, min(400, target_s / max(per, 1e-6))))
    run = make_run(iters)
    jax.block_until_ready(run(x))
    t0 = time.perf_counter()
    jax.block_until_ready(run(x))
    return (time.perf_counter() - t0) / iters


def make_ell_col(op, sorted_hint=False):
    """Transposed-layout matvec: R independent (cap,) gathers.

    With ``sorted_hint`` the gathers are issued through ``jnp.take`` with
    ``indices_are_sorted=True`` — valid in sorted-key row order, where
    key(pred) = key(x) - const makes each reaction's pred positions
    monotone non-decreasing; tests whether XLA:TPU has a faster lowering
    for monotone gathers."""
    import jax.numpy as jnp

    idx_np = np.asarray(op.pred_idx).T.copy()  # (R, cap)
    if sorted_hint:
        # -1 (missing pred) breaks monotonicity when clamped to 0;
        # forward-fill with the running max instead (prop is 0 there, so
        # the gathered value is discarded)
        idx_np = np.maximum.accumulate(np.maximum(idx_np, 0), axis=1)
    idx_t = jnp.asarray(idx_np)
    prop_t = jnp.asarray(np.asarray(op.pred_prop).T.copy())
    diag = op.diag
    R = idx_t.shape[0]

    def mv(x):
        y = -diag * x
        for k in range(R):
            if sorted_hint:
                g = jnp.take(x, idx_t[k], indices_are_sorted=True,
                             unique_indices=False)
            else:
                g = x[jnp.maximum(idx_t[k], 0)]
            y = y + prop_t[k] * g
        return y

    return mv


def make_delta(op, verbose=True):
    """Delta-stencil decomposition of the gather-ELL operator.

    For each reaction k, host-side: delta = pred_idx[:, k] - row; the
    mode of delta over valid entries is the lattice stride of -nu_k in
    the current row order.  Mode-matching entries are applied as
    prop * shift(x, mode) (two contiguous slices — streams at HBM
    bandwidth, no gather); the rest become one padded COO list
    (row, src, prop) applied via gather + index_add.
    """
    import jax.numpy as jnp

    pred_idx = np.asarray(op.pred_idx)
    pred_prop = np.asarray(op.pred_prop)
    cap, R = pred_idx.shape
    rows = np.arange(cap)

    modes = []
    shift_props = []
    corr_rows, corr_src, corr_prop = [], [], []
    n_match = n_valid = 0
    for k in range(R):
        valid = pred_idx[:, k] >= 0
        if not valid.any():
            modes.append(0)
            shift_props.append(np.zeros(cap))
            continue
        delta = pred_idx[valid, k] - rows[valid]
        vals, counts = np.unique(delta, return_counts=True)
        mode = int(vals[np.argmax(counts)])
        match = valid & (pred_idx[:, k] == rows + mode)
        sp = np.where(match, pred_prop[:, k], 0.0)
        modes.append(mode)
        shift_props.append(sp)
        rest = valid & ~match
        corr_rows.append(rows[rest])
        corr_src.append(pred_idx[rest, k])
        corr_prop.append(pred_prop[rest, k])
        n_match += int(match.sum())
        n_valid += int(valid.sum())

    corr_rows = np.concatenate(corr_rows) if corr_rows else np.zeros(0, int)
    corr_src = np.concatenate(corr_src) if corr_src else np.zeros(0, int)
    corr_prop = np.concatenate(corr_prop) if corr_prop else np.zeros(0)
    ncorr = len(corr_rows)
    # pad corrections to a bucketed size; padding rows carry prop 0 into
    # row 0, a no-op under scatter-add
    pad = max(1024, 1 << int(np.ceil(np.log2(max(ncorr, 1)))))
    cr = np.zeros(pad, np.int32)
    cs = np.zeros(pad, np.int32)
    cp = np.zeros(pad)
    cr[:ncorr] = corr_rows
    cs[:ncorr] = corr_src
    cp[:ncorr] = corr_prop

    stats = {
        "match_frac": round(n_match / max(n_valid, 1), 4),
        "ncorr": int(ncorr),
        "corr_pad": int(pad),
        "modes": [int(m) for m in modes],
    }
    if verbose:
        print("delta-stencil:", stats, flush=True)

    diag = op.diag
    shift_props_j = [jnp.asarray(sp) for sp in shift_props]
    cr_j = jnp.asarray(cr)
    cs_j = jnp.asarray(cs)
    cp_j = jnp.asarray(cp)

    def mv(x):
        z = jnp.zeros((), x.dtype)
        y = (-diag * x).astype(x.dtype)
        for k in range(R):
            m = modes[k]
            if not np.any(shift_props[k]):
                continue
            if m == 0:
                shifted = x
            elif m > 0:
                # x[i + m]: shift left, zero-fill tail
                shifted = jnp.concatenate(
                    [x[m:], jnp.full(m, z, x.dtype)]
                )
            else:
                shifted = jnp.concatenate(
                    [jnp.full(-m, z, x.dtype), x[:m]]
                )
            y = y + shift_props_j[k].astype(x.dtype) * shifted
        # corrections: one small gather + scatter-add
        contrib = cp_j.astype(x.dtype) * x[cs_j]
        y = y.at[cr_j].add(contrib)
        return y

    mv._stats = stats
    return mv


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
    nnz = (model.n_reactions + 1) * n

    out = {"n_states": int(n), "device": str(jax.devices()[0])}

    keys = enc.encode_np(states)
    if enc.n_words == 1:
        sort_perm = np.argsort(keys, kind="stable")
    else:
        sort_perm = np.lexsort(
            tuple(keys[:, wdx] for wdx in range(enc.n_words - 1, -1, -1))
        )
    orders = {"append": np.arange(n), "sorted": sort_perm}

    mv_row = jax.jit(spmv)
    y_ref = {}
    for oname, perm in orders.items():
        t = StateTable.from_states(states[perm], enc, 4096, None)
        x_np = np.zeros(t.capacity)
        rows = np.asarray(t.lookup_states(states))
        x_np[rows] = w
        for dt, dname in ((jnp.float64, "f64"), (jnp.float32, "f32")):
            build = jax.jit(
                lambda s, k, r, nn, dt=dt: build_operator(
                    s, k, r, nn, model.propensities, jnp.asarray(stoich),
                    enc, dt,
                )
            )
            op = jax.block_until_ready(build(
                t.states, t.sorted_keys, t.sorted_to_row,
                jnp.asarray(t.n, jnp.int32),
            ))
            variants = {
                "ell_row": lambda v, op=op: mv_row(op, v),
                "ell_col": make_ell_col(op),
                "delta": make_delta(op, verbose=(dname == "f64")),
            }
            if oname == "sorted":
                # monotone-gather hint only valid in sorted order
                variants["ell_col_sortedhint"] = make_ell_col(
                    op, sorted_hint=True
                )
            if dname == "f64":
                out[f"{oname}_delta_stats"] = variants["delta"]._stats

            for vname, fn in variants.items():
                xj = jnp.asarray(x_np, dt)
                per = time_matvec(fn, xj)
                y = np.asarray(fn(xj), np.float64)[rows]
                if "ref" not in y_ref:
                    y_ref["ref"] = y  # append/ell_row/f64 ground truth
                ref = y_ref["ref"]
                rel = float(
                    np.max(np.abs(y - ref))
                    / max(np.max(np.abs(ref)), 1e-300)
                )
                rec = {
                    "ms_per_matvec": round(per * 1e3, 4),
                    "gnnz_per_s": round(nnz / per / 1e9, 3),
                    "max_rel_err_vs_ref": rel,
                }
                out[f"{oname}_{vname}_{dname}"] = rec
                print(oname, vname, dname, rec, flush=True)

    with open("TABLE_MATVEC.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
