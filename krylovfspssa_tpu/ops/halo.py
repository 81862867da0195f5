"""Explicit halo-exchange stencil SpMV over a 1-D device mesh.

The row-partitioned stencil matvec's only communication is the shard
boundary: reaction offsets reach at most ``H = max_k |offset_k|`` cells
across it.  Instead of leaning on GSPMD's generic handling of ``jnp.roll``
(a full-array collective rewrite), this module ``shard_map``s the matvec
and exchanges exactly the two H-cell boundary slices with
``jax.lax.ppermute`` over ICI — the "halo exchange for SpMV" component of
SURVEY.md §2 (parallelism item 2).  The local compute is expressed
interior-first so XLA can overlap the permutes with the interior stencil
work.

Correctness contract: identical results to the single-device stencil
(ops/stencil.py).  Out-of-box sources are zeroed by the shifted factor
tables (validity baked in), and a valid source never wraps the global
flat range, so boundary shards can pad their outer halo with zeros.

The local kernel is the factored destination form, so this path requires
a separable model (models/factorize.py) — every bundled expression model
qualifies; non-separable models use the GSPMD path in parallel/sharded.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..boxspace.box import BoxSpace
from ..models.model import Model
from .stencil import _FIELD_LANES, _factored_reaction_tables

LANES = _FIELD_LANES


def _compile_probe(pl_local, local_rows):
    """Execute the Pallas local kernel once on zeros to force the (remote)
    Mosaic compile at BUILD time.  A kernel that traces fine can still be
    rejected by the hardware lowering (both round-4 v6 failures were
    compile-time-only), and inside shard_map that failure would surface
    mid-solve; probing here lets the caller fall back a kernel generation
    instead.  Returns the kernel, or None if the compile/run failed."""
    lead, excess = pl_local._lead, pl_local._excess
    try:
        z = jnp.zeros((local_rows, LANES), jnp.float32)
        pl_local(
            z,
            jnp.zeros((lead, LANES), jnp.float32),
            jnp.zeros((excess, LANES), jnp.float32),
            jnp.zeros((local_rows, LANES), jnp.int8),
            z,
            jnp.zeros((1, 1), jnp.int32),
        )
        return pl_local
    except Exception as e:  # noqa: BLE001 — any lowering failure
        import sys

        print(
            f"halo local kernel compile probe failed "
            f"({type(e).__name__}: {str(e)[:200]}); falling back",
            file=sys.stderr,
            flush=True,
        )
        return None


def _local_field(box, tabs_by_species, const, dtype, row0, local_rows):
    """(local_rows*128,) rank-1 field slice starting at global row ``row0``
    (a traced int32).  Same math as stencil._lane_field, with the row
    coordinate offset by the shard origin."""
    pat_species, row_species = [], []
    for s in tabs_by_species:
        sh = int(box.shift_of_species[s])
        if sh >= 7:
            row_species.append(s)
        else:
            pat_species.append(s)

    P_rows = 1
    for s in pat_species:
        sh = int(box.shift_of_species[s])
        b = int(box.bits_of_species[s])
        P_rows = max(P_rows, 1 << max(0, sh + b - 7))
    # shard origins are multiples of local_rows; pattern stays phase-0 as
    # long as the period divides the local row count (asserted by caller)
    assert local_rows % P_rows == 0

    pgrid = np.arange(P_rows)[:, None] * LANES + np.arange(LANES)[None, :]
    pat = np.full((P_rows, LANES), const, dtype=np.float64)
    for s in pat_species:
        sh = int(box.shift_of_species[s])
        b = int(box.bits_of_species[s])
        pat *= np.asarray(tabs_by_species[s])[(pgrid >> sh) & ((1 << b) - 1)]
    field2d = jnp.broadcast_to(
        jnp.asarray(pat, dtype)[None], (local_rows // P_rows, P_rows, LANES)
    ).reshape(local_rows, LANES)

    if row_species:
        ridx = (
            jax.lax.broadcasted_iota(jnp.int32, (local_rows, 1), 0)[:, 0]
            + row0
        )
        rowfac = None
        for s in row_species:
            sh = int(box.shift_of_species[s])
            b = int(box.bits_of_species[s])
            t = jnp.asarray(tabs_by_species[s], dtype)
            f = t[(ridx >> (sh - 7)) & ((1 << b) - 1)]
            rowfac = f if rowfac is None else rowfac * f
        field2d = field2d * rowfac[:, None]
    return field2d.reshape(local_rows * LANES)


def make_halo_stencil_matvec(
    model: Model, box: BoxSpace, mesh, dtype=jnp.float64,
    use_pallas: str = "auto", pallas_interpret: bool = False,
):
    """Build matvec(mask, x) (global flat arrays, row-sharded) with
    explicit ppermute halo exchange; returns None if the model is not
    separable or the geometry does not divide over the mesh.

    In float32 on TPU (``use_pallas`` "auto"/"always") the LOCAL compute
    is the hand-tiled v5 Pallas kernel (streamed diagonal, deep pattern
    fold) with the shard-edge grid blocks sourcing their halo rows from
    the exchanged neighbour buffers — multi-chip runs keep the
    single-chip kernel's speed on the hot loop (VERDICT r2 item 5).
    The XLA rank-1-field stencil remains the f64 / fallback local
    compute.  ``pallas_interpret`` forces the Pallas local kernel in
    interpreter mode (CPU-mesh tests)."""
    tables = _factored_reaction_tables(model, box)
    if tables is None:
        return None
    vol = box.volume
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    if vol % (n_dev * LANES) != 0:
        return None
    local = vol // n_dev
    local_rows = local // LANES
    offsets = [int(o) for o in box.offsets]
    H = max(abs(o) for o in offsets)
    if H >= local:
        return None  # halo would span a whole shard; use the GSPMD path
    # pattern periods must divide the shard row count (phase-0 shards)
    for s in range(box.n_species):
        sh = int(box.shift_of_species[s])
        b = int(box.bits_of_species[s])
        if sh < 7 and local_rows % (1 << max(0, sh + b - 7)) != 0:
            return None

    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    # ---- Pallas local kernel (f32 TPU fast path) ------------------------
    pl_local = None
    if dtype == jnp.float32 and use_pallas != "never":
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        if pallas_interpret or use_pallas == "always" or on_tpu:
            from .pallas_stencil import (
                make_pallas_local_matvec_v5,
                make_pallas_local_matvec_v6,
            )

            # v6-local (SMEM scalar table, round 5) is preferred; on real
            # TPU a build-time compile probe guards against Mosaic
            # lowering regressions and falls back to v5-local (the round-4
            # VMEM-splat v6 failed only at remote compile time, which a
            # factory None cannot express)
            pl_local, pl_gen = None, None
            if use_pallas != "v5":
                pl_local = make_pallas_local_matvec_v6(
                    model, box, n_dev, interpret=pallas_interpret
                )
                if pl_local is not None and not pallas_interpret:
                    pl_local = _compile_probe(pl_local, local // LANES)
                pl_gen = "v6" if pl_local is not None else None
            if pl_local is None:
                pl_local = make_pallas_local_matvec_v5(
                    model, box, n_dev, interpret=pallas_interpret
                )
                if pl_local is not None and not pallas_interpret:
                    pl_local = _compile_probe(pl_local, local // LANES)
                pl_gen = "v5" if pl_local is not None else None
    if pl_local is not None:
        from .stencil import make_diag_fn

        diag_fn = make_diag_fn(model, box, jnp.float64)
        D = jax.jit(
            lambda: diag_fn(jnp.ones((vol,), bool)).astype(jnp.float32)
        )().reshape(vol // LANES, LANES)
        D_sh = jax.device_put(D, NamedSharding(mesh, P(axis, None)))
        lead, excess = pl_local._lead, pl_local._excess

        def local_matvec_pl(mask_l, x_l, d_l):
            idx = jax.lax.axis_index(axis)
            # supp(x) ⊆ mask is the solver invariant, but this matvec is
            # also a public API (drop inflow, tests) — mask locally, it is
            # one fused elementwise pass over the shard
            xm = jnp.where(mask_l, x_l, 0).astype(jnp.float32)
            from_left = jax.lax.ppermute(
                xm[local - lead * LANES :], axis, fwd
            )
            from_right = jax.lax.ppermute(xm[: excess * LANES], axis, bwd)
            from_left = jnp.where(idx > 0, from_left, 0)
            from_right = jnp.where(idx < n_dev - 1, from_right, 0)
            row0 = jnp.full((1, 1), idx * local_rows, jnp.int32)
            y = pl_local(
                xm.reshape(local_rows, LANES),
                from_left.reshape(lead, LANES),
                from_right.reshape(excess, LANES),
                mask_l.astype(jnp.int8).reshape(local_rows, LANES),
                d_l,
                row0,
            )
            return y.reshape(local)

        spec = P(axis)
        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # annotation, which the default vma check rejects
        mv = jax.shard_map(
            local_matvec_pl,
            mesh=mesh,
            in_specs=(spec, spec, P(axis, None)),
            out_specs=spec,
            check_vma=False,
        )

        def matvec(mask, x):
            return mv(mask, x, D_sh)

        matvec._pallas_local = True
        matvec._local_kernel = pl_gen
        return matvec

    def local_matvec(mask_l, x_l):
        idx = jax.lax.axis_index(axis)
        row0 = (idx * local_rows).astype(jnp.int32)
        xm = jnp.where(mask_l, x_l, 0).astype(dtype)

        # ---- halo exchange: boundary H-slices to the neighbours --------
        # (issued first; the interior stencil below is independent of the
        # permuted values, giving XLA room to overlap comm and compute)
        from_left = jax.lax.ppermute(xm[local - H :], axis, fwd)
        from_right = jax.lax.ppermute(xm[:H], axis, bwd)
        from_left = jnp.where(idx > 0, from_left, 0)
        from_right = jnp.where(idx < n_dev - 1, from_right, 0)

        # ---- local fields (validity baked into shifted tables) ---------
        ufields = [
            _local_field(box, u_tabs, const, dtype, row0, local_rows)
            for const, u_tabs, _ in tables
        ]
        diag = sum(
            _local_field(box, t_tabs, const, dtype, row0, local_rows)
            for const, _, t_tabs in tables
        )

        xpad = jnp.concatenate([from_left, xm, from_right])
        y = -diag * xm
        for k, off in enumerate(offsets):
            # source slice of x for destination cells [0, local):
            # global source = z - off -> padded index H + i - off
            y = y + ufields[k] * jax.lax.dynamic_slice(
                xpad, (H - off,), (local,)
            )
        return jnp.where(mask_l, y, 0)

    spec = P(axis)
    mv = jax.shard_map(
        local_matvec,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=spec,
    )

    def matvec(mask, x):
        return mv(mask, x)

    return matvec


def halo_sharded_matvec_jit(model, box, mesh, dtype=jnp.float64):
    """jit-wrapped halo matvec with row shardings pinned (or None)."""
    mv = make_halo_stencil_matvec(model, box, mesh, dtype)
    if mv is None:
        return None
    row = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.jit(mv, in_shardings=(row, row), out_shardings=row)
