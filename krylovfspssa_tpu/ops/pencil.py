"""Pencil-structured CME operator: the support-adapted TPU-native SpMV.

Problem this solves: the reference-format gather-ELL matvec
(StateSpace.f90:13-17 + FMATVEC, KrylovSolver.f90:588-606; ops/spmv.py)
issues one arbitrary gather per (state, reaction).  XLA:TPU serializes
arbitrary gathers to ~30 ns per element, so at the Goutsias flagship's
~600k states the matvec costs ~160 ms — 1000x the matrix-free stencil
kernel — and there is no vectorized per-element gather primitive to
reach for (Mosaic included).  The masked-box stencil avoids gathers
entirely but over-covers thin-slab supports ~120x (SUPPORT_REPR.json).

The pencil layout is the middle point: pick one "lane species" L (the
largest extent); group states by their remaining coordinates (the
"base"); each base's L-range occupies one or more 128-lane rows
("pencils"), padded to the lane width.  Measured on the live flagship
support: 2.7-3.1x cell over-coverage (vs 120x for the box), with the
matvec needing only

  * one WHOLE-ROW gather per (row, reaction) — ~n/128 row indices, not
    n*R element indices — plus
  * a STATIC lane shift (two contiguous slices) per reaction, plus
  * streamed per-cell propensity fields,

i.e. the stencil kernel family generalized to ragged supports.  All
row indices are precomputed host-side at (re)build; the device matvec
is pure XLA (row gathers of 512-byte slices + elementwise).

Membership semantics are exact FSP (principal submatrix A_J): padding
cells are not members; pred fields are zeroed where the predecessor
cell is absent, and the output is masked to member cells — identical
math to ops/operator.py, verified against it in tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

LANES = 128


class PencilLayout(NamedTuple):
    """Host-side layout descriptor (numpy; rebuilt per state-set change)."""

    lane_species: int
    #: (nbases, d-1) int32 sorted unique base coordinates
    bases: np.ndarray
    #: (nbases,) int32 first row of each base
    base_row_start: np.ndarray
    #: (nbases,) int32 number of 128-lane rows of each base
    base_nrows: np.ndarray
    #: (rows,) int32 base index of each row
    row_base: np.ndarray
    #: (rows,) int32 lane-block index of each row within its base
    row_block: np.ndarray
    #: (n,) int32 flat cell slot of each table row (row*128 + lane)
    slot_of_state: np.ndarray
    #: (rows, LANES) bool member-cell mask
    mask: np.ndarray
    n_rows: int
    n_states: int

    @property
    def n_cells(self) -> int:
        return self.n_rows * LANES


def build_pencil_layout(
    states: np.ndarray, lane_species: int | None = None
) -> PencilLayout:
    """Group the state set into lane-aligned pencils.

    Args:
      states: (n, d) int32 active states (no padding rows).
      lane_species: coordinate laid along lanes; default = the species
        with the largest extent (fewest rows, densest lanes).
    """
    states = np.asarray(states)
    n, d = states.shape
    if lane_species is None:
        lane_species = int(np.argmax(states.max(axis=0)))
    others = [s for s in range(d) if s != lane_species]
    base_coords = states[:, others]
    M = states[:, lane_species].astype(np.int64)

    bases, inv = np.unique(base_coords, axis=0, return_inverse=True)
    nb = len(bases)
    mmax = np.zeros(nb, dtype=np.int64)
    np.maximum.at(mmax, inv, M)
    base_nrows = ((mmax + LANES) // LANES).astype(np.int32)
    base_row_start = np.zeros(nb, dtype=np.int32)
    np.cumsum(base_nrows[:-1], out=base_row_start[1:])
    n_rows = int(base_nrows.sum())

    row_base = np.repeat(
        np.arange(nb, dtype=np.int32), base_nrows
    )
    row_block = (
        np.arange(n_rows, dtype=np.int32)
        - base_row_start[row_base]
    ).astype(np.int32)

    slot = (
        (base_row_start[inv].astype(np.int64) + (M // LANES)) * LANES
        + (M % LANES)
    ).astype(np.int64)
    mask = np.zeros(n_rows * LANES, dtype=bool)
    mask[slot] = True

    return PencilLayout(
        lane_species=int(lane_species),
        bases=bases.astype(np.int32),
        base_row_start=base_row_start,
        base_nrows=base_nrows,
        row_base=row_base,
        row_block=row_block,
        slot_of_state=slot.astype(np.int64),
        mask=mask.reshape(n_rows, LANES),
        n_rows=n_rows,
        n_states=n,
    )


def _lookup_bases(layout: PencilLayout, queries: np.ndarray) -> np.ndarray:
    """(m, d-1) base coords -> base index or -1 (host, vectorized)."""
    nb, dm1 = layout.bases.shape
    # structured view for lexicographic searchsorted
    key = np.zeros(nb, dtype=np.dtype([(f"c{j}", np.int32) for j in range(dm1)]))
    q = np.zeros(len(queries), dtype=key.dtype)
    for j in range(dm1):
        key[f"c{j}"] = layout.bases[:, j]
        q[f"c{j}"] = queries[:, j]
    pos = np.searchsorted(key, q)
    pos = np.clip(pos, 0, nb - 1)
    hit = key[pos] == q
    return np.where(hit, pos, -1).astype(np.int64)


class PencilOperator:
    """Device arrays of the pencil-form projected CME generator.

    Per-cell fields are FLAT (cells,) so the solver's vector machinery
    (masked step, inline drop, norms) treats a pencil solve exactly
    like a table solve; the matvec reshapes to (rows, LANES) itself:

        y2d = -diag * x2d
        for k:  y2d += pred_prop[k] * lane_shift(x2d[src_a[k]],
                                                 x2d[src_b[k]], shift[k])
        y2d *= mask

    Registered as a custom pytree with ``shifts`` (the lane-species
    stoichiometry per reaction) as STATIC aux data: the lane shifts are
    structural — each value compiles a different slice — so they must
    stay python ints under jit, not tracers.

    Fields: diag (cells,) total outflow at member cells / 0 at padding;
    mask (cells,) int8 member mask; pred_prop (R, cells) a_k(pred cell)
    or 0 where the predecessor is absent/illegal; src_a / src_b
    (R, rows) int32 source rows for the high/low lanes (-1 -> zeros);
    n: active member-state count (traced scalar ok).
    """

    def __init__(self, diag, mask, pred_prop, src_a, src_b, shifts, n):
        self.diag = diag
        self.mask = mask
        self.pred_prop = pred_prop
        self.src_a = src_a
        self.src_b = src_b
        self.shifts = tuple(int(s) for s in shifts)
        self.n = n

    def tree_flatten(self):
        return (
            (self.diag, self.mask, self.pred_prop, self.src_a,
             self.src_b, self.n),
            self.shifts,
        )

    @classmethod
    def tree_unflatten(cls, shifts, children):
        diag, mask, pred_prop, src_a, src_b, n = children
        obj = cls.__new__(cls)
        obj.diag = diag
        obj.mask = mask
        obj.pred_prop = pred_prop
        obj.src_a = src_a
        obj.src_b = src_b
        obj.shifts = shifts
        obj.n = n
        return obj

    def _replace(self, **kw):
        fields = dict(
            diag=self.diag, mask=self.mask, pred_prop=self.pred_prop,
            src_a=self.src_a, src_b=self.src_b, shifts=self.shifts,
            n=self.n,
        )
        fields.update(kw)
        return PencilOperator(**fields)


import jax as _jax  # noqa: E402  (registration needs jax at import)

_jax.tree_util.register_pytree_node_class(PencilOperator)


def build_pencil_operator(
    layout: PencilLayout,
    states: np.ndarray,
    props_np,
    stoichiometry: np.ndarray,
    species_cap: int,
    dtype=jnp.float64,
) -> PencilOperator:
    """Assemble the pencil operator (host numpy; arrays land on device).

    Args:
      layout: from build_pencil_layout (same state set).
      states: (n, d) the member states.
      props_np: batched numpy/jax propensity evaluator (m, d) -> (m, R).
      stoichiometry: (R, d).
      species_cap: per-species count cap (encoder parity).
    """
    stoich = np.asarray(stoichiometry, dtype=np.int64)
    R, d = stoich.shape
    ls = layout.lane_species
    others = [s for s in range(d) if s != ls]
    rows, nb = layout.n_rows, len(layout.bases)

    # coordinates of every cell (member or padding): needed to evaluate
    # pred propensities at output cells
    cell_base = layout.row_base  # (rows,)
    lane = np.arange(LANES, dtype=np.int64)
    cell_M = (
        layout.row_block.astype(np.int64)[:, None] * LANES + lane[None, :]
    )  # (rows, LANES)

    cell_state = np.zeros((rows, LANES, d), dtype=np.int64)
    cell_state[:, :, others] = layout.bases[cell_base][:, None, :]
    cell_state[:, :, ls] = cell_M

    member = layout.mask  # (rows, LANES)

    # ---- diagonal: total outflow of member cells --------------------
    flat = cell_state.reshape(rows * LANES, d)
    props_all = np.asarray(props_np(flat)).reshape(rows, LANES, R)
    diag = np.where(member, props_all.sum(axis=-1), 0.0)

    # ---- per reaction: source rows, lane shift, pred-prop field ----
    src_a = np.full((R, rows), -1, dtype=np.int32)
    src_b = np.full((R, rows), -1, dtype=np.int32)
    pred_prop = np.zeros((R, rows, LANES), dtype=np.float64)
    shifts = []

    for k in range(R):
        s = int(stoich[k, ls])  # lane shift of this reaction
        if abs(s) >= LANES:
            raise ValueError(
                f"lane-species stoichiometry {s} exceeds the lane width"
            )
        shifts.append(s)
        dbase = stoich[k, others]
        pred_bases = layout.bases[cell_base].astype(np.int64) - dbase
        b2 = _lookup_bases(layout, pred_bases)  # (rows,)

        # pred lane index = l - s; for s >= 0 sources are blocks
        # (blk-1, blk) read at offset LANES - s; for s < 0 blocks
        # (blk, blk+1) at offset -s
        blk = layout.row_block.astype(np.int64)
        if s >= 0:
            blocks = (blk - 1, blk)
        else:
            blocks = (blk, blk + 1)
        for which, bb in enumerate(blocks):
            valid = (b2 >= 0) & (bb >= 0) & (
                bb < layout.base_nrows[np.clip(b2, 0, nb - 1)]
            )
            r = np.where(
                valid,
                layout.base_row_start[np.clip(b2, 0, nb - 1)] + bb,
                -1,
            ).astype(np.int32)
            (src_a if which == 0 else src_b)[k] = r

        # pred propensity a_k(cell - nu_k), zeroed unless the pred cell
        # is a MEMBER (exact principal-submatrix semantics)
        pred_state = cell_state - stoich[k][None, None, :]
        legal = np.all(
            (pred_state >= 0) & (pred_state <= species_cap), axis=-1
        )
        # membership of pred: base exists, block exists, lane bit set
        pm = layout.mask.reshape(-1)
        pred_M = cell_M - s
        pred_blk = pred_M // LANES
        pred_lane = pred_M % LANES
        bok = (b2 >= 0)[:, None] & (pred_blk >= 0) & (
            pred_blk < layout.base_nrows[np.clip(b2, 0, nb - 1)][:, None]
        )
        pred_row = (
            layout.base_row_start[np.clip(b2, 0, nb - 1)][:, None]
            + np.clip(pred_blk, 0, None)
        )
        pred_slot = np.clip(pred_row, 0, rows - 1) * LANES + pred_lane
        is_member = bok & pm[np.clip(pred_slot, 0, rows * LANES - 1)]
        use = legal & is_member & member
        pk = np.zeros((rows, LANES))
        if use.any():
            ps = pred_state[use]
            pk[use] = np.asarray(props_np(ps))[:, k]
        pred_prop[k] = pk

    f = dtype
    cells = rows * LANES
    return PencilOperator(
        diag=jnp.asarray(diag.reshape(cells), f),
        mask=jnp.asarray(member.reshape(cells), jnp.int8),
        pred_prop=jnp.asarray(pred_prop.reshape(R, cells), f),
        src_a=jnp.asarray(src_a),
        src_b=jnp.asarray(src_b),
        shifts=tuple(shifts),
        n=jnp.asarray(layout.n_states, jnp.int32),
    )


def pencil_matvec(op: PencilOperator, x: jnp.ndarray) -> jnp.ndarray:
    """y = A_J @ x on the pencil layout; x flat (rows*LANES,)."""
    rows = op.src_a.shape[1]
    x2 = x.reshape(rows, LANES)
    y = -op.diag.reshape(rows, LANES) * x2
    zero_row = jnp.zeros((1, LANES), x2.dtype)
    # padded x with a zeros row at index `rows` so src == -1 gathers 0
    xp = jnp.concatenate([x2, zero_row], axis=0)
    R = op.pred_prop.shape[0]
    for k in range(R):
        s = op.shifts[k]
        ia = jnp.where(op.src_a[k] >= 0, op.src_a[k], rows)
        ib = jnp.where(op.src_b[k] >= 0, op.src_b[k], rows)
        ga = xp[ia]  # (rows, LANES) whole-row gather
        gb = xp[ib]
        if s == 0:
            shifted = gb
        elif s > 0:
            z = jnp.concatenate([ga, gb], axis=1)
            shifted = z[:, LANES - s : 2 * LANES - s]
        else:
            z = jnp.concatenate([ga, gb], axis=1)
            shifted = z[:, -s : LANES - s]
        y = y + op.pred_prop[k].reshape(rows, LANES) * shifted
    y = jnp.where(op.mask.reshape(rows, LANES) != 0, y, 0)
    return y.reshape(rows * LANES)


def make_pencil_operator_builder(
    model, stoichiometry, lane_species: int, species_cap: int,
    dtype=jnp.float64,
):
    """Jitted DEVICE builder of the pencil operator fields.

    The host supplies only the small index tables (bases, row maps,
    source rows, member mask — a few MB); the heavy per-cell work
    (propensity evaluation over all cells x reactions, predecessor
    membership via the same row-gather + lane-shift as the matvec,
    diagonal) runs in ONE jitted call per rows-bucket.  This keeps
    per-epoch rebuild cost device-side — eager per-op dispatch through
    a remote tunnel would cost hundreds of round-trips.
    """
    import jax

    stoich = jnp.asarray(np.asarray(stoichiometry), jnp.int32)
    R, d = stoich.shape
    others = [s for s in range(d) if s != lane_species]
    shifts = tuple(int(np.asarray(stoichiometry)[k, lane_species])
                   for k in range(R))

    def build(bases, row_base, row_block, src_a, src_b, mask, n):
        """bases (nb, d-1) i32; row_base/row_block (rows,) i32;
        src_a/src_b (R, rows) i32; mask (cells,) bool; n scalar i32."""
        rows = row_base.shape[0]
        cells = rows * LANES
        lane = jnp.arange(LANES, dtype=jnp.int32)
        padded = row_base < 0
        safe_base = jnp.maximum(row_base, 0)
        cell_state = jnp.zeros((rows, LANES, d), jnp.int32)
        cell_state = cell_state.at[:, :, jnp.asarray(others)].set(
            bases[safe_base][:, None, :]
        )
        cell_state = cell_state.at[:, :, lane_species].set(
            row_block[:, None] * LANES + lane[None, :]
        )
        m2 = mask.reshape(rows, LANES)

        flat = cell_state.reshape(cells, d)
        props_all = model.propensities(flat).reshape(rows, LANES, R)
        diag = jnp.where(m2, props_all.sum(axis=-1), 0.0)
        diag = jnp.where(padded[:, None], 0.0, diag)

        mask_f = mask.astype(dtype)
        mask2 = mask_f.reshape(rows, LANES)
        zero_row = jnp.zeros((1, LANES), dtype)
        mp = jnp.concatenate([mask2, zero_row], axis=0)

        preds = []
        for k in range(R):
            s = shifts[k]
            pred_state = cell_state - stoich[k][None, None, :]
            legal = jnp.all(
                (pred_state >= 0) & (pred_state <= species_cap), axis=-1
            )
            pk = model.propensities(
                pred_state.reshape(cells, d)
            ).reshape(rows, LANES, R)[:, :, k]
            # pred membership by the same row-gather + lane-shift
            ia = jnp.where(src_a[k] >= 0, src_a[k], rows)
            ib = jnp.where(src_b[k] >= 0, src_b[k], rows)
            ga, gb = mp[ia], mp[ib]
            if s == 0:
                member_sh = gb
            elif s > 0:
                z = jnp.concatenate([ga, gb], axis=1)
                member_sh = z[:, LANES - s : 2 * LANES - s]
            else:
                z = jnp.concatenate([ga, gb], axis=1)
                member_sh = z[:, -s : LANES - s]
            pk = jnp.where(legal & (member_sh > 0) & m2, pk, 0.0)
            preds.append(pk.reshape(cells))
        pred_prop = jnp.stack(preds, axis=0).astype(dtype)

        return PencilOperator(
            diag=diag.reshape(cells).astype(dtype),
            mask=mask.astype(jnp.int8),
            pred_prop=pred_prop,
            src_a=src_a,
            src_b=src_b,
            shifts=shifts,
            n=n,
        )

    return jax.jit(build)


def host_index_tables(layout: PencilLayout, stoichiometry: np.ndarray):
    """Host-side source-row tables for the device builder (cheap: one
    base searchsorted per reaction over ~n/128 rows)."""
    stoich = np.asarray(stoichiometry, dtype=np.int64)
    R, d = stoich.shape
    ls = layout.lane_species
    others = [s for s in range(d) if s != ls]
    nb = len(layout.bases)
    rows = layout.n_rows
    src_a = np.full((R, rows), -1, dtype=np.int32)
    src_b = np.full((R, rows), -1, dtype=np.int32)
    blk = layout.row_block.astype(np.int64)
    base_of_row = layout.bases[layout.row_base].astype(np.int64)
    for k in range(R):
        s = int(stoich[k, ls])
        if abs(s) >= LANES:
            raise ValueError(
                f"lane-species stoichiometry {s} exceeds the lane width"
            )
        b2 = _lookup_bases(layout, base_of_row - stoich[k, others])
        blocks = (blk - 1, blk) if s >= 0 else (blk, blk + 1)
        for which, bb in enumerate(blocks):
            valid = (b2 >= 0) & (bb >= 0) & (
                bb < layout.base_nrows[np.clip(b2, 0, nb - 1)]
            )
            r = np.where(
                valid,
                layout.base_row_start[np.clip(b2, 0, nb - 1)] + bb,
                -1,
            ).astype(np.int32)
            (src_a if which == 0 else src_b)[k] = r
    return src_a, src_b
