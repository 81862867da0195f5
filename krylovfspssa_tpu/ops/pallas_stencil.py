"""Hand-tiled Pallas TPU kernel for the masked-box stencil SpMV.

The XLA stencil (ops/stencil.py) materializes one full-volume intermediate
per reaction (R ``jnp.roll`` copies + propensity recompute traffic), which
measures ~15% of the stored-CSR roofline on a v5e chip.  This kernel brings
the matvec to its true memory bound: the flat vector is viewed as
``(rows, 128)`` lanes; each grid step DMAs one output block plus its halo
into VMEM **once**, then every reaction's contribution is a static
(row, lane) shift *within VMEM* — zero extra HBM traffic — with the
propensity a_k(x - nu_k) recomputed from the cell coordinates in registers
(shift/mask decode of the flat index, VPU-only expression evaluation).

Reaction shift geometry: a flat source offset ``s = -offset_k`` splits as
``s = 128 q + r`` (0 <= r < 128), so the shifted read of block rows
[0, B) is ``concat(win[c+q : c+q+B, r:], win[c+q+1 : c+q+B+1, :r])`` with
``c = -q_min`` — two static row-slices and a static lane split.

The kernel is float32 (TPU has no native f64 vectors; the f64 path keeps
the XLA stencil).  Reference semantics replicated: FMATVEC
(/root/reference/src/fsp/KrylovSolver.f90:577-607) with the diagonal
summed over all reactions and out-of-box targets dropped (FSP truncation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..boxspace.box import BoxSpace
from ..models.model import Model

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lane_roll(a, r: int):
    """out[:, l] = a[:, (l + r) % LANES] — a left lane rotation by r."""
    try:
        # int32 shift: tpu.dynamic_rotate rejects the default i64 literal
        return pltpu.roll(a, jnp.int32(LANES - r), 1)
    except Exception:  # interpret mode / non-TPU lowering
        return jnp.roll(a, LANES - r, axis=1)


def pallas_applicable(box: BoxSpace, block_rows: int = 512) -> bool:
    """The kernel needs vol % 128 == 0 and a halo that fits VMEM."""
    if box.volume % LANES != 0:
        return False
    rows = box.volume // LANES
    if rows < 8:
        return False
    offs = [int(o) for o in np.asarray(box.offsets)]
    span = (max(0, *offs) - min(0, *offs)) // LANES + 2
    B = min(block_rows, rows)
    wr = B + span
    # window + block + mask well under the ~16 MB VMEM budget
    return wr * LANES * 4 < 8 * 1024 * 1024


def make_pallas_stencil_matvec(
    model: Model,
    box: BoxSpace,
    block_rows: int = 512,
    interpret: bool = False,
    _debug_const_prop: bool = False,
    _debug_no_shift: bool = False,
):
    """Build matvec(mask, x) -> y (float32) for the current box geometry.

    Same contract as ops.stencil.make_stencil_matvec: ``mask`` is the flat
    bool FSP membership mask, ``x`` a flat vector supported on it.
    """
    if model.custom_propensity is not None:
        fns = None
    else:
        fns = model._ensure_compiled()
    names = list(model.species_names)
    pnames = list(model.parameter_names)
    params = [float(v) for v in np.asarray(model.parameters)]
    stoich = np.asarray(box.stoichiometry, dtype=np.int64)
    R = stoich.shape[0]
    d = box.n_species

    vol = box.volume
    assert vol % LANES == 0, "box volume must be a multiple of 128"
    rows_tot = vol // LANES
    shifts = [int(s) for s in box.shift_of_species]
    bits = [int(b) for b in box.bits_of_species]
    exts = [1 << b for b in bits]

    # source shift per reaction: x[z + s_k] with s_k = -offset_k
    s_off = [-int(o) for o in np.asarray(box.offsets)]
    q = [s // LANES for s in s_off]
    r = [s - LANES * qq for s, qq in zip(s_off, q)]
    qmin = min(q + [0])
    qmax = max(q + [0])

    B = min(block_rows, rows_tot)
    while rows_tot % B:
        B //= 2
    B = max(B, 8)
    n_blocks = rows_tot // B
    c0 = -qmin
    WR = _round_up(B + (qmax - qmin) + 1, 8)
    PAD = _round_up(max(-qmin, qmax + 1) + 8, 8)

    def _propensity(k: int, coords_f32: list):
        """a_k at the given per-species f32 coordinate arrays."""
        if _debug_const_prop:  # perf isolation: no expression evaluation
            return coords_f32[0] * 0.0 + (1.0 + k * 0.25)
        if fns is not None:
            env = {name: coords_f32[s] for s, name in enumerate(names)}
            env.update({name: params[j] for j, name in enumerate(pnames)})
            return jnp.asarray(fns[k](env), jnp.float32)
        states = jnp.stack(coords_f32, axis=-1)
        # params as plain Python floats: jnp arrays would be captured
        # tracer constants, which pallas_call forbids
        return jnp.asarray(
            model.custom_propensity(states, k, params), jnp.float32
        )

    def kernel(xp_ref, mask_ref, y_ref, win, sem):
        i = pl.program_id(0).astype(jnp.int32)
        w0 = i * jnp.int32(B) + jnp.int32(PAD + qmin)
        dma = pltpu.make_async_copy(
            xp_ref.at[pl.ds(w0, WR), :], win, sem
        )
        dma.start()

        # cell coordinates of the output block (registers, no memory)
        row = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 1)
        z = (i * jnp.int32(B) + row) * jnp.int32(LANES) + lane
        coords = [
            ((z >> jnp.int32(shifts[s])) & jnp.int32(exts[s] - 1))
            for s in range(d)
        ]
        coords_f = [c.astype(jnp.float32) for c in coords]

        # diagonal = total outflow (StateSpace.f90:207-212)
        diag = _propensity(0, coords_f)
        for k in range(1, R):
            diag = diag + _propensity(k, coords_f)

        dma.wait()
        center = win[c0 : c0 + B, :]
        acc = -diag * center

        for k in range(R):
            # source-state coordinates and box-validity
            src = [
                coords[s] - jnp.int32(int(stoich[k, s])) for s in range(d)
            ]
            valid = (src[0] >= 0) & (src[0] < jnp.int32(exts[0]))
            for s in range(1, d):
                valid = valid & (src[s] >= 0) & (src[s] < jnp.int32(exts[s]))
            a_k = _propensity(k, [c.astype(jnp.float32) for c in src])

            base = c0 + q[k]
            if _debug_no_shift or r[k] == 0:
                shifted = win[base : base + B, :]
            else:
                hi = win[base : base + B, r[k] :]
                lo = win[base + 1 : base + B + 1, : r[k]]
                shifted = jnp.concatenate([hi, lo], axis=1)
            acc = acc + jnp.where(valid, a_k * shifted, 0.0)

        y_ref[:, :] = jnp.where(mask_ref[:, :] != 0, acc, 0.0)

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM),
            pl.BlockSpec(
                (B, LANES), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, LANES), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows_tot, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WR, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )

    def matvec(mask, x):
        xm = jnp.where(mask, x, 0).astype(jnp.float32).reshape(rows_tot, LANES)
        xp = jnp.pad(xm, ((PAD, PAD), (0, 0)))
        m8 = mask.astype(jnp.int8).reshape(rows_tot, LANES)
        y = call(xp, m8)
        return y.reshape(vol)

    return matvec


#: pattern-period cap (rows).  Species whose bit field ends at or below
#: bit 7 + log2(PCAP) are baked into precomputed periodic lane patterns.
PCAP = 128


def _choose_block(rows: int, qmin_al: int, qmax: int, block_rows: int):
    """Largest power-of-two block B <= block_rows satisfying the zero-copy
    kernel's constraints (B | rows, >= 2 blocks, halo lead/excess within
    one block, first window within the array).  Returns
    (B, WR, lead, excess) or None."""
    b = 1 << (min(block_rows, rows // 2).bit_length() - 1)
    while b >= 8:
        if rows % b == 0:
            wr = _round_up(b + (qmax - qmin_al) + 1, 8)
            lead = -qmin_al
            excess = wr - b + qmin_al
            if lead <= b and excess <= b and wr - lead <= rows:
                return b, wr, lead, excess
        b //= 2
    return None


def make_pallas_stencil_matvec_v3(
    model: Model,
    box: BoxSpace,
    block_rows: int = 1024,
    interpret: bool = False,
):
    """Third-generation stencil kernel: factor-table rank-1 propensities.

    Exploits the per-species factorization a_k(x) = C_k * prod_s f_{k,s}(x_s)
    (models/factorize.py — every bundled expression model is separable) to
    eliminate per-cell propensity evaluation AND per-cell validity
    arithmetic:

    * the matvec runs in *destination form*
      ``y[z] = sum_k U_k(z) * x(z - nu_k) - D(z) * x(z)`` where
      ``U_k(z) = C_k * prod_s u_{k,s}(coord_s(z))`` with the shifted factor
      tables ``u`` zeroed outside the box (FSP validity baked in,
      reference ADJ=0 semantics — StateSpace.f90:235);
    * factors of species whose coordinate bits end at/below bit
      7 + log2(PCAP) are *precomputed* into periodic (P_k, 128) lane
      patterns (P_k = the field's row period) — zero per-cell cost; the
      patterns of reactions with no high-bit factors are pre-summed for
      the diagonal;
    * only high-bit species (coordinate a function of the block row alone)
      are evaluated in-kernel, on (B, 1) row vectors, via the factored
      sub-AST — shared across reactions through a trace-time cache.

    Returns None when the model is not separable or the geometry does not
    qualify (caller falls back to the v2 kernel).
    """
    from ..models.factorize import (
        factorize_model,
        factor_table,
        shifted_factor_table,
    )
    from ..models.expressions import _eval_node

    facts = factorize_model(model)
    if facts is None:
        return None

    stoich = np.asarray(box.stoichiometry, dtype=np.int64)
    R = stoich.shape[0]
    d = box.n_species
    vol = box.volume
    if vol % LANES != 0:
        return None
    rows_tot = vol // LANES
    shifts = [int(sh) for sh in box.shift_of_species]
    bits = [int(b) for b in box.bits_of_species]
    exts = [1 << b for b in bits]

    s_off = [-int(o) for o in np.asarray(box.offsets)]
    q = [so // LANES for so in s_off]
    r = [so - LANES * qq for so, qq in zip(s_off, q)]
    qmin = min(q + [0])
    qmax = max(q + [0])

    B = min(block_rows, rows_tot)
    while rows_tot % B:
        B //= 2
    B = max(B, 8)
    n_blocks = rows_tot // B
    qmin_al = (qmin // 8) * 8
    c0 = -qmin_al
    WR = _round_up(B + (qmax - qmin_al) + 1, 8)
    PAD = _round_up(max(-qmin_al, qmax + 1) + 8, 8)

    logp = int(np.log2(PCAP))

    # ---- species placement per reaction --------------------------------
    def _placement(k):
        relevant = set(facts[k].factors) | {
            int(s) for s in np.nonzero(stoich[k])[0]
        }
        pat, row = [], []
        for s in sorted(relevant):
            if shifts[s] + bits[s] <= 7 + logp:
                pat.append(s)
            elif shifts[s] >= 7:
                row.append(s)
            else:
                return None  # straddles the pattern cap: not expressible
        return pat, row

    placements = [_placement(k) for k in range(R)]
    if any(p is None for p in placements):
        return None

    P_k = []
    for k, (pat, _row) in enumerate(placements):
        p = 1
        for s in pat:
            p = max(p, 1 << max(0, shifts[s] + bits[s] - 7))
        P_k.append(p)
    Pmax = max(P_k)
    if Pmax > B:
        return None

    # ---- precomputed lane patterns (f64 build, f32 ship) ----------------
    # cell low bits: z14 = p*128 + lane for pattern row-phase p
    pgrid = np.arange(Pmax)[:, None] * LANES + np.arange(LANES)[None, :]

    def _pat_coord(s):
        return (pgrid >> shifts[s]) & (exts[s] - 1)

    patU = np.zeros((R, Pmax, LANES), dtype=np.float64)
    patD = np.zeros((R, Pmax, LANES), dtype=np.float64)
    for k, (pat, _row) in enumerate(placements):
        u = np.full((Pmax, LANES), facts[k].const, dtype=np.float64)
        t = np.full((Pmax, LANES), facts[k].const, dtype=np.float64)
        for s in pat:
            cs = _pat_coord(s)
            u *= shifted_factor_table(
                facts[k], s, exts[s], int(stoich[k, s]), model
            )[cs]
            if s in facts[k].factors:
                t *= factor_table(facts[k], s, exts[s], model)[cs]
        patU[k] = u
        patD[k] = t

    # reactions with no in-kernel row factors contribute a single
    # pre-summed diagonal pattern; the rest keep their own slot
    row_ks = [k for k in range(R) if placements[k][1]]
    patD_static = patD[[k for k in range(R) if not placements[k][1]]].sum(0)
    patD_rows = np.stack([patD_static] + [patD[k] for k in row_ks])
    patU_f32 = jnp.asarray(patU, jnp.float32)
    patD_f32 = jnp.asarray(patD_rows, jnp.float32)

    params_env = {
        name: float(v)
        for name, v in zip(
            model.parameter_names, np.asarray(model.parameters)
        )
    }
    names = list(model.species_names)

    def kernel(xp_ref, mc_ref, pu_ref, pd_ref, y_ref, win, sem):
        i = pl.program_id(0).astype(jnp.int32)
        w0 = i * jnp.int32(B) + jnp.int32(PAD + qmin_al)
        dma = pltpu.make_async_copy(xp_ref.at[pl.ds(w0, WR), :], win, sem)
        dma.start()

        # (B, 1) global row ids of the output block
        rowid = (
            jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0) + i * jnp.int32(B)
        )

        # trace-time caches shared across reactions
        coord_cache: dict = {}
        fac_cache: dict = {}

        def row_coord(s):
            if s not in coord_cache:
                coord_cache[s] = (
                    rowid >> jnp.int32(shifts[s] - 7)
                ) & jnp.int32(exts[s] - 1)
            return coord_cache[s]

        def row_factor(k, s, shifted: bool):
            """(B,1) f32 factor of species s for reaction k; cache key
            includes the factor AST identity and the stoich shift."""
            nu = int(stoich[k, s]) if shifted else 0
            node = facts[k].factors.get(s)
            key = (id(node), s, nu)
            if key in fac_cache:
                return fac_cache[key]
            c = row_coord(s)
            src = c - jnp.int32(nu) if nu else c
            if node is None:
                val = jnp.ones((B, 1), jnp.float32)
            else:
                env = dict(params_env)
                env[names[s]] = src.astype(jnp.float32)
                val = jnp.asarray(_eval_node(node, env), jnp.float32)
                val = jnp.broadcast_to(val, (B, 1))
            if nu:
                ok = (src >= 0) & (src < jnp.int32(exts[s]))
                val = jnp.where(ok, val, 0.0)
            fac_cache[key] = val
            return val

        def tile(pat2d):
            # (Pmax,128) -> (B,128); block start rows are multiples of B
            # and Pmax | B, so the phase is always 0
            return jnp.broadcast_to(
                pat2d[None], (B // Pmax, Pmax, LANES)
            ).reshape(B, LANES)

        dma.wait()
        center = win[c0 : c0 + B, :]

        dacc = tile(pd_ref[0])
        for j, k in enumerate(row_ks):
            t = tile(pd_ref[j + 1])
            for s in placements[k][1]:
                t = t * row_factor(k, s, shifted=False)
            dacc = dacc + t
        acc = -dacc * center

        for k in range(R):
            base = c0 + q[k]
            if r[k] == 0:
                shifted = win[base : base + B, :]
            else:
                hi = win[base : base + B, r[k] :]
                lo = win[base + 1 : base + B + 1, : r[k]]
                shifted = jnp.concatenate([hi, lo], axis=1)
            term = tile(pu_ref[k]) * shifted
            for s in placements[k][1]:
                term = term * row_factor(k, s, shifted=True)
            acc = acc + term

        y_ref[:, :] = jnp.where(mc_ref[:, :] != 0, acc, 0.0)

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM),
            pl.BlockSpec(
                (B, LANES), lambda i: (i, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (R, Pmax, LANES),
                lambda i: (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (len(row_ks) + 1, Pmax, LANES),
                lambda i: (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, LANES), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows_tot, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WR, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )

    def matvec(mask, x):
        xm = jnp.where(mask, x, 0).astype(jnp.float32).reshape(
            rows_tot, LANES
        )
        xp = jnp.pad(xm, ((PAD, PAD), (0, 0)))
        m8 = mask.astype(jnp.int8).reshape(rows_tot, LANES)
        y = call(xp, m8, patU_f32, patD_f32)
        return y.reshape(vol)

    return matvec


def make_pallas_stencil_matvec_v4(
    model: Model,
    box: BoxSpace,
    block_rows: int = 1024,
    interpret: bool = False,
):
    """Fourth-generation stencil kernel: zero-copy input, overlapped DMA.

    Same factor-table compute as v3, with the per-call XLA prep pass
    removed (it cost ~1/3 of the v3 wall time):

    * **no input padding** — x arrives as the raw (rows, 128) view; the
      first/last grid blocks clamp their window DMA to the array and
      zero-fill the out-of-range halo rows in VMEM (every other block is
      a plain full-window copy, branch chosen by grid position);
    * **no input pre-masking** — callers guarantee ``supp(x) ⊆ mask``
      (the Krylov iteration maintains this invariant: every Arnoldi
      vector is a linear combination of masked matvec outputs, and
      drop/growth re-mask w).  Out-of-mask *window* rows beyond the box
      are zero-filled, and the output mask still gates y, so FSP
      truncation semantics (reference ADJ=0, StateSpace.f90:235) are
      unchanged;
    * **double-buffered window DMA** — block i+1's window fetch overlaps
      block i's compute (the v3 kernel fetched synchronously per block).

    Returns None when the model is not separable or the geometry does
    not qualify (halo taller than one block, volume not lane-aligned);
    callers fall back to v3/v2.
    """
    from ..models.factorize import (
        factorize_model,
        factor_table,
        shifted_factor_table,
    )
    from ..models.expressions import _eval_node

    facts = factorize_model(model)
    if facts is None:
        return None

    stoich = np.asarray(box.stoichiometry, dtype=np.int64)
    R = stoich.shape[0]
    d = box.n_species
    vol = box.volume
    if vol % LANES != 0:
        return None
    rows_tot = vol // LANES
    shifts = [int(sh) for sh in box.shift_of_species]
    bits = [int(b) for b in box.bits_of_species]
    exts = [1 << b for b in bits]

    s_off = [-int(o) for o in np.asarray(box.offsets)]
    q = [so // LANES for so in s_off]
    r = [so - LANES * qq for so, qq in zip(s_off, q)]
    qmin = min(q + [0])
    qmax = max(q + [0])

    B = min(block_rows, rows_tot)
    while rows_tot % B:
        B //= 2
    B = max(B, 8)
    n_blocks = rows_tot // B
    qmin_al = (qmin // 8) * 8
    c0 = -qmin_al
    WR = _round_up(B + (qmax - qmin_al) + 1, 8)
    #: window rows missing before row 0 (block 0) / beyond the last row
    lead = -qmin_al
    excess = WR - B + qmin_al
    if n_blocks < 2 or lead > B or excess > B or WR - lead > rows_tot:
        return None  # halo taller than a block: keep the padded v3 path

    logp = int(np.log2(PCAP))

    def _placement(k):
        relevant = set(facts[k].factors) | {
            int(s) for s in np.nonzero(stoich[k])[0]
        }
        pat, row = [], []
        for s in sorted(relevant):
            if shifts[s] + bits[s] <= 7 + logp:
                pat.append(s)
            elif shifts[s] >= 7:
                row.append(s)
            else:
                return None
        return pat, row

    placements = [_placement(k) for k in range(R)]
    if any(p is None for p in placements):
        return None

    P_k = []
    for k, (pat, _row) in enumerate(placements):
        p = 1
        for s in pat:
            p = max(p, 1 << max(0, shifts[s] + bits[s] - 7))
        P_k.append(p)
    Pmax = max(P_k)
    if Pmax > B:
        return None

    pgrid = np.arange(Pmax)[:, None] * LANES + np.arange(LANES)[None, :]

    def _pat_coord(s):
        return (pgrid >> shifts[s]) & (exts[s] - 1)

    patU = np.zeros((R, Pmax, LANES), dtype=np.float64)
    patD = np.zeros((R, Pmax, LANES), dtype=np.float64)
    for k, (pat, _row) in enumerate(placements):
        u = np.full((Pmax, LANES), facts[k].const, dtype=np.float64)
        t = np.full((Pmax, LANES), facts[k].const, dtype=np.float64)
        for s in pat:
            cs = _pat_coord(s)
            u *= shifted_factor_table(
                facts[k], s, exts[s], int(stoich[k, s]), model
            )[cs]
            if s in facts[k].factors:
                t *= factor_table(facts[k], s, exts[s], model)[cs]
        patU[k] = u
        patD[k] = t

    row_ks = [k for k in range(R) if placements[k][1]]
    patD_static = patD[[k for k in range(R) if not placements[k][1]]].sum(0)
    patD_rows = np.stack([patD_static] + [patD[k] for k in row_ks])
    patU_f32 = jnp.asarray(patU, jnp.float32)
    patD_f32 = jnp.asarray(patD_rows, jnp.float32)

    params_env = {
        name: float(v)
        for name, v in zip(
            model.parameter_names, np.asarray(model.parameters)
        )
    }
    names = list(model.species_names)

    def kernel(x_ref, mc_ref, pu_ref, pd_ref, y_ref, win, sem):
        i = pl.program_id(0).astype(jnp.int32)
        nb = pl.num_programs(0)

        def start_dma(j, slot):
            """Fetch block j's window; first/last blocks clamp + zero."""

            @pl.when(j == 0)
            def _():
                if lead:
                    win[slot, :lead, :] = jnp.zeros(
                        (lead, LANES), jnp.float32
                    )
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(0, WR - lead), :],
                    win.at[slot, pl.ds(lead, WR - lead), :],
                    sem.at[slot],
                ).start()

            if n_blocks > 2:  # middle windows exist (static guard:
                # at n_blocks == 2 the WR-row slice can exceed the array)
                @pl.when((j > 0) & (j < nb - 1))
                def _():
                    w0 = j * jnp.int32(B) + jnp.int32(qmin_al)
                    pltpu.make_async_copy(
                        x_ref.at[pl.ds(w0, WR), :], win.at[slot],
                        sem.at[slot]
                    ).start()

            @pl.when(j == nb - 1)
            def _():
                if excess:
                    win[slot, WR - excess :, :] = jnp.zeros(
                        (excess, LANES), jnp.float32
                    )
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(rows_tot - (WR - excess), WR - excess), :],
                    win.at[slot, pl.ds(0, WR - excess), :],
                    sem.at[slot],
                ).start()

        def wait_dma(j, slot):
            """Wait with the same descriptor shape start_dma used for j."""

            @pl.when(j == 0)
            def _():
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(0, WR - lead), :],
                    win.at[slot, pl.ds(lead, WR - lead), :],
                    sem.at[slot],
                ).wait()

            if n_blocks > 2:
                @pl.when((j > 0) & (j < nb - 1))
                def _():
                    w0 = j * jnp.int32(B) + jnp.int32(qmin_al)
                    pltpu.make_async_copy(
                        x_ref.at[pl.ds(w0, WR), :], win.at[slot],
                        sem.at[slot]
                    ).wait()

            @pl.when(j == nb - 1)
            def _():
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(rows_tot - (WR - excess), WR - excess), :],
                    win.at[slot, pl.ds(0, WR - excess), :],
                    sem.at[slot],
                ).wait()

        @pl.when(i == 0)
        def _():
            start_dma(jnp.int32(0), jnp.int32(0))

        slot = jax.lax.rem(i, jnp.int32(2))
        nslot = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

        @pl.when(i + 1 < nb)
        def _():
            start_dma(i + jnp.int32(1), nslot)

        wait_dma(i, slot)

        rowid = (
            jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0) + i * jnp.int32(B)
        )
        coord_cache: dict = {}
        fac_cache: dict = {}

        def row_coord(s):
            if s not in coord_cache:
                coord_cache[s] = (
                    rowid >> jnp.int32(shifts[s] - 7)
                ) & jnp.int32(exts[s] - 1)
            return coord_cache[s]

        def row_factor(k, s, shifted: bool):
            nu = int(stoich[k, s]) if shifted else 0
            node = facts[k].factors.get(s)
            key = (id(node), s, nu)
            if key in fac_cache:
                return fac_cache[key]
            c = row_coord(s)
            src = c - jnp.int32(nu) if nu else c
            if node is None:
                val = jnp.ones((B, 1), jnp.float32)
            else:
                env = dict(params_env)
                env[names[s]] = src.astype(jnp.float32)
                val = jnp.asarray(_eval_node(node, env), jnp.float32)
                val = jnp.broadcast_to(val, (B, 1))
            if nu:
                ok = (src >= 0) & (src < jnp.int32(exts[s]))
                val = jnp.where(ok, val, 0.0)
            fac_cache[key] = val
            return val

        def tile(pat2d):
            return jnp.broadcast_to(
                pat2d[None], (B // Pmax, Pmax, LANES)
            ).reshape(B, LANES)

        # slice the scratch REF (Mosaic allows arbitrary sublane/lane
        # offsets when slicing refs, but not computed arrays)
        center = win[slot, c0 : c0 + B, :]

        dacc = tile(pd_ref[0])
        for j, k in enumerate(row_ks):
            t = tile(pd_ref[j + 1])
            for s in placements[k][1]:
                t = t * row_factor(k, s, shifted=False)
            dacc = dacc + t
        acc = -dacc * center

        for k in range(R):
            base = c0 + q[k]
            if r[k] == 0:
                shifted = win[slot, base : base + B, :]
            else:
                hi = win[slot, base : base + B, r[k] :]
                lo = win[slot, base + 1 : base + B + 1, : r[k]]
                shifted = jnp.concatenate([hi, lo], axis=1)
            term = tile(pu_ref[k]) * shifted
            for s in placements[k][1]:
                term = term * row_factor(k, s, shifted=True)
            acc = acc + term

        y_ref[:, :] = jnp.where(mc_ref[:, :] != 0, acc, 0.0)

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM),
            pl.BlockSpec(
                (B, LANES), lambda i: (i, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (R, Pmax, LANES),
                lambda i: (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (len(row_ks) + 1, Pmax, LANES),
                lambda i: (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, LANES), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows_tot, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, WR, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )

    def matvec(mask, x):
        xm = x.astype(jnp.float32).reshape(rows_tot, LANES)
        m8 = mask.astype(jnp.int8).reshape(rows_tot, LANES)
        y = call(xm, m8, patU_f32, patD_f32)
        return y.reshape(vol)

    return matvec


def make_pallas_stencil_matvec_v5(
    model: Model,
    box: BoxSpace,
    block_rows: int = 1024,
    interpret: bool = False,
    pattern_vmem_bytes: int = 4 << 20,
    _ablate: frozenset = frozenset(),
):
    """Fifth-generation stencil kernel: streamed diagonal, deep pattern fold.

    The v4 ablation showed the remaining time spread across the in-kernel
    diagonal accumulation, per-reaction row-factor multiplies, lane shifts,
    and output masking.  v5 removes the first two:

    * **streamed precomputed diagonal** — the total-outflow field
      ``D(z) = sum_k a_k(z)`` (reference DIAG, StateSpace.f90:211-212) is
      x-independent, so it is materialized ONCE per geometry (device
      computation via the factor tables, f64 math, f32 ship) and streamed
      block-by-block through the pallas pipeline.  One extra input vector
      of HBM traffic replaces ~R (B,128) VPU multiplies+adds per block;
    * **deep pattern fold** — the per-reaction inflow field
      ``U_k(z) = C_k prod_s u_{k,s}(coord_s(z))`` is periodic in the block
      row with period 2^(shift_s+bits_s-7); v3/v4 capped the precomputed
      pattern at PCAP=128 rows and evaluated higher species as in-kernel
      row factors.  v5 raises the cap to the largest period that (a)
      divides the block, (b) fits ``pattern_vmem_bytes`` — on the Goutsias
      flagship geometry this folds the 6-bit RNA axis into the patterns,
      leaving only the two topmost gene-state axes as row factors.

    Same zero-copy input and double-buffered window DMA as v4.  Returns
    None when the model is not separable or the geometry does not qualify
    (callers fall back to v4/v3/v2).
    """
    from ..models.factorize import factorize_model, shifted_factor_table
    from ..models.expressions import _eval_node

    facts = factorize_model(model)
    if facts is None:
        return None

    stoich = np.asarray(box.stoichiometry, dtype=np.int64)
    R = stoich.shape[0]
    d = box.n_species
    vol = box.volume
    if vol % LANES != 0:
        return None
    rows_tot = vol // LANES
    shifts = [int(sh) for sh in box.shift_of_species]
    bits = [int(b) for b in box.bits_of_species]
    exts = [1 << b for b in bits]

    s_off = [-int(o) for o in np.asarray(box.offsets)]
    q = [so // LANES for so in s_off]
    r = [so - LANES * qq for so, qq in zip(s_off, q)]
    qmin = min(q + [0])
    qmax = max(q + [0])

    qmin_al = (qmin // 8) * 8
    c0 = -qmin_al
    blk = _choose_block(rows_tot, qmin_al, qmax, block_rows)
    if blk is None:
        return None
    B, WR, lead, excess = blk
    n_blocks = rows_tot // B

    # ---- deepest pattern fold that fits the VMEM budget ------------------
    def _placement(logp):
        placements, pmax = [], 1
        for k in range(R):
            relevant = set(facts[k].factors) | {
                int(s) for s in np.nonzero(stoich[k])[0]
            }
            pat, row = [], []
            for s in sorted(relevant):
                if shifts[s] + bits[s] <= 7 + logp:
                    pat.append(s)
                elif shifts[s] >= 7:
                    row.append(s)
                else:
                    return None, None, None
                if s in pat:
                    pmax = max(pmax, 1 << max(0, shifts[s] + bits[s] - 7))
            placements.append((pat, row))
        return placements, pmax, logp

    chosen = None
    for logp in range(int(np.log2(B)), -1, -1):
        placements, Pmax, _ = _placement(logp)
        if placements is None or Pmax > B:
            continue
        if R * Pmax * LANES * 4 <= pattern_vmem_bytes:
            chosen = (placements, Pmax)
            break
    if chosen is None:
        return None
    placements, Pmax = chosen

    # ---- precomputed inflow patterns (f64 build, f32 ship) ---------------
    pgrid = np.arange(Pmax)[:, None] * LANES + np.arange(LANES)[None, :]
    patU = np.zeros((R, Pmax, LANES), dtype=np.float64)
    for k, (pat, _row) in enumerate(placements):
        u = np.full((Pmax, LANES), facts[k].const, dtype=np.float64)
        for s in pat:
            cs = (pgrid >> shifts[s]) & (exts[s] - 1)
            u *= shifted_factor_table(
                facts[k], s, exts[s], int(stoich[k, s]), model
            )[cs]
        patU[k] = u
    patU_f32 = jnp.asarray(patU, jnp.float32)

    # ---- streamed diagonal field (device-built once per geometry) --------
    from .stencil import make_diag_fn

    diag_fn = make_diag_fn(model, box, jnp.float64)
    D_f32 = jax.jit(
        lambda: diag_fn(jnp.ones((vol,), bool)).astype(jnp.float32)
    )().reshape(rows_tot, LANES)

    params_env = {
        name: float(v)
        for name, v in zip(
            model.parameter_names, np.asarray(model.parameters)
        )
    }
    names = list(model.species_names)

    # reactions sharing one lane roll r with nearby row offsets share ONE
    # rolled strip (one lane-misaligned concat instead of one per reaction;
    # e.g. the Goutsias M birth/death pair both roll by 64)
    _byr: dict = {}
    for k in range(R):
        if r[k]:
            _byr.setdefault(r[k], []).append(k)
    roll_groups = {
        rr: (min(q[k] for k in ks), max(q[k] for k in ks))
        for rr, ks in _byr.items()
        if len(ks) >= 2
        and max(q[k] for k in ks) - min(q[k] for k in ks) <= 8
    }

    def kernel(x_ref, mc_ref, d_ref, pu_ref, y_ref, win, sem):
        i = pl.program_id(0).astype(jnp.int32)
        nb = pl.num_programs(0)

        def start_dma(j, slot):
            @pl.when(j == 0)
            def _():
                if lead:
                    win[slot, :lead, :] = jnp.zeros(
                        (lead, LANES), jnp.float32
                    )
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(0, WR - lead), :],
                    win.at[slot, pl.ds(lead, WR - lead), :],
                    sem.at[slot],
                ).start()

            if n_blocks > 2:  # middle windows exist (static guard:
                # at n_blocks == 2 the WR-row slice can exceed the array)
                @pl.when((j > 0) & (j < nb - 1))
                def _():
                    w0 = j * jnp.int32(B) + jnp.int32(qmin_al)
                    pltpu.make_async_copy(
                        x_ref.at[pl.ds(w0, WR), :], win.at[slot],
                        sem.at[slot]
                    ).start()

            @pl.when(j == nb - 1)
            def _():
                if excess:
                    win[slot, WR - excess :, :] = jnp.zeros(
                        (excess, LANES), jnp.float32
                    )
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(rows_tot - (WR - excess), WR - excess), :],
                    win.at[slot, pl.ds(0, WR - excess), :],
                    sem.at[slot],
                ).start()

        def wait_dma(j, slot):
            @pl.when(j == 0)
            def _():
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(0, WR - lead), :],
                    win.at[slot, pl.ds(lead, WR - lead), :],
                    sem.at[slot],
                ).wait()

            if n_blocks > 2:
                @pl.when((j > 0) & (j < nb - 1))
                def _():
                    w0 = j * jnp.int32(B) + jnp.int32(qmin_al)
                    pltpu.make_async_copy(
                        x_ref.at[pl.ds(w0, WR), :], win.at[slot],
                        sem.at[slot]
                    ).wait()

            @pl.when(j == nb - 1)
            def _():
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(rows_tot - (WR - excess), WR - excess), :],
                    win.at[slot, pl.ds(0, WR - excess), :],
                    sem.at[slot],
                ).wait()

        @pl.when(i == 0)
        def _():
            start_dma(jnp.int32(0), jnp.int32(0))

        slot = jax.lax.rem(i, jnp.int32(2))
        nslot = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

        @pl.when(i + 1 < nb)
        def _():
            start_dma(i + jnp.int32(1), nslot)

        wait_dma(i, slot)

        rowid = (
            jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0) + i * jnp.int32(B)
        )
        coord_cache: dict = {}
        fac_cache: dict = {}

        def row_coord(s):
            if s not in coord_cache:
                coord_cache[s] = (
                    rowid >> jnp.int32(shifts[s] - 7)
                ) & jnp.int32(exts[s] - 1)
            return coord_cache[s]

        def row_factor(k, s):
            """(B,1) f32 shifted factor of species s for reaction k."""
            nu = int(stoich[k, s])
            node = facts[k].factors.get(s)
            key = (id(node), s, nu)
            if key in fac_cache:
                return fac_cache[key]
            c = row_coord(s)
            src = c - jnp.int32(nu) if nu else c
            if node is None:
                val = jnp.ones((B, 1), jnp.float32)
            else:
                env = dict(params_env)
                env[names[s]] = src.astype(jnp.float32)
                val = jnp.asarray(_eval_node(node, env), jnp.float32)
                val = jnp.broadcast_to(val, (B, 1))
            if nu:
                ok = (src >= 0) & (src < jnp.int32(exts[s]))
                val = jnp.where(ok, val, 0.0)
            fac_cache[key] = val
            return val

        def tile(pat2d):
            return jnp.broadcast_to(
                pat2d[None], (B // Pmax, Pmax, LANES)
            ).reshape(B, LANES)

        center = win[slot, c0 : c0 + B, :]
        acc = -(d_ref[:, :] * center)

        rolled = {}
        if "no_shift" not in _ablate and "no_grouproll" not in _ablate:
            for rr, (qlo, qhi) in roll_groups.items():
                g0 = c0 + qlo
                srows = B + (qhi - qlo)
                hi = win[slot, g0 : g0 + srows, rr:]
                lo = win[slot, g0 + 1 : g0 + srows + 1, :rr]
                rolled[rr] = (
                    jnp.concatenate([hi, lo], axis=1), qlo
                )

        for k in range(R if "one_term" not in _ablate else 1):
            base = c0 + q[k]
            if r[k] == 0 or "no_shift" in _ablate:
                shifted = win[slot, base : base + B, :]
            elif r[k] in rolled:
                strip, qlo = rolled[r[k]]
                shifted = strip[q[k] - qlo : q[k] - qlo + B, :]
            else:
                hi = win[slot, base : base + B, r[k] :]
                lo = win[slot, base + 1 : base + B + 1, : r[k]]
                shifted = jnp.concatenate([hi, lo], axis=1)
            if "no_pattern" in _ablate:
                term = shifted
            else:
                term = tile(pu_ref[k]) * shifted
            if "no_rowfac" not in _ablate:
                for s in placements[k][1]:
                    term = term * row_factor(k, s)
            acc = acc + term

        if "no_mask" in _ablate:
            y_ref[:, :] = acc
        else:
            y_ref[:, :] = jnp.where(mc_ref[:, :] != 0, acc, 0.0)

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM),
            pl.BlockSpec(
                (B, LANES), lambda i: (i, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (B, LANES), lambda i: (i, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (R, Pmax, LANES),
                lambda i: (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, LANES), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows_tot, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, WR, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )

    def matvec(mask, x):
        xm = x.astype(jnp.float32).reshape(rows_tot, LANES)
        m8 = mask.astype(jnp.int8).reshape(rows_tot, LANES)
        y = call(xm, m8, D_f32, patU_f32)
        return y.reshape(vol)

    # introspection for tests/benchmark ablations
    matvec._pmax = Pmax
    matvec._placements = placements
    matvec._block_rows = B
    return matvec


def make_pallas_stencil_matvec_v6(
    model: Model,
    box: BoxSpace,
    block_rows: int = 2048,
    interpret: bool = False,
    pattern_vmem_bytes: int = 4 << 20,
    _ablate: frozenset = frozenset(),
):
    """Sixth-generation stencil kernel: scalarized row factors, tile loop.

    The v5 ablation left the remaining time spread across per-reaction
    in-kernel row factors (expression evaluation + (B, 1) broadcast
    multiplies — on the VPU a (B, 1) op costs as much as a full (B, 128)
    pass), the lane-shift concats, and broadcast materialization of the
    periodic patterns.  v6 removes all three:

    * **scalarized row factors** — a row species s has its coordinate
      constant over runs of ``2^(shifts[s]-7)`` consecutive rows.  When
      every row species' run length is >= the pattern tile height T
      (true on the flagship Goutsias geometry: the one row species D has
      run 512 = T), the whole row-factor product of reaction k collapses
      to ONE scalar per (reaction, T-row tile), precomputed per geometry
      into a tiny ``(R, rows/T)`` SMEM table with FSP validity baked in
      (reference ADJ=-1 semantics, StateSpace.f90:235).  All in-kernel
      expression evaluation and (B, 1) broadcasts disappear; the scalar
      rides the pattern multiply as a free VPU scalar operand;
    * **per-tile fused loop** — the block is processed as B/T tiles of
      exactly one pattern period, so the pattern multiplies never
      materialize a broadcast copy: every op is a (T, 128) fused
      multiply-add on VMEM-resident operands;
    * **block-wide rolled strips for every nonzero lane roll** (v5 only
      shared them between >= 2 reactions): each distinct roll builds its
      lane-misaligned concat once per block and every tile slices it;
    * **pre-negated streamed diagonal** — the total-outflow field is
      shipped as -D so the accumulator initializes with a single
      multiply (reference DIAG, StateSpace.f90:211-212).

    Same zero-copy input and double-buffered window DMA as v4/v5, same
    ``supp(x) ⊆ mask`` caller contract.  Returns None when the model is
    not separable or a row species' run is shorter than the tile (callers
    fall back to v5).  Reference semantics: FMATVEC
    (/root/reference/src/fsp/KrylovSolver.f90:577-607).
    """
    from ..models.factorize import factorize_model, shifted_factor_table

    facts = factorize_model(model)
    if facts is None:
        return None

    stoich = np.asarray(box.stoichiometry, dtype=np.int64)
    R = stoich.shape[0]
    vol = box.volume
    if vol % LANES != 0:
        return None
    rows_tot = vol // LANES
    shifts = [int(sh) for sh in box.shift_of_species]
    bits = [int(b) for b in box.bits_of_species]
    exts = [1 << b for b in bits]

    s_off = [-int(o) for o in np.asarray(box.offsets)]
    q = [so // LANES for so in s_off]
    r = [so - LANES * qq for so, qq in zip(s_off, q)]
    qmin = min(q + [0])
    qmax = max(q + [0])

    qmin_al = (qmin // 8) * 8
    c0 = -qmin_al
    blk = _choose_block(rows_tot, qmin_al, qmax, block_rows)
    if blk is None:
        return None
    B, WR, lead, excess = blk
    n_blocks = rows_tot // B

    # ---- deepest pattern fold whose row factors are tile-constant --------
    def _placement(logp):
        placements, pmax = [], 1
        for k in range(R):
            relevant = set(facts[k].factors) | {
                int(s) for s in np.nonzero(stoich[k])[0]
            }
            pat, row = [], []
            for s in sorted(relevant):
                if shifts[s] + bits[s] <= 7 + logp:
                    pat.append(s)
                elif shifts[s] >= 7:
                    row.append(s)
                else:
                    return None, None
                if s in pat:
                    pmax = max(pmax, 1 << max(0, shifts[s] + bits[s] - 7))
            placements.append((pat, row))
        return placements, pmax

    chosen = None
    for logp in range(int(np.log2(B)), -1, -1):
        placements, Pmax = _placement(logp)
        if placements is None or Pmax > B:
            continue
        T = max(Pmax, 8)
        if T > B or B % T:
            continue
        if R * T * LANES * 4 > pattern_vmem_bytes:
            continue
        if all(
            shifts[s] - 7 >= int(np.log2(T))
            for _pat, row in placements
            for s in row
        ):
            chosen = (placements, Pmax, T)
            break
    if chosen is None:
        return None
    placements, Pmax, T = chosen
    tpb = B // T
    n_tiles = rows_tot // T

    # ---- precomputed inflow patterns (f64 build, f32 ship) ---------------
    pgrid = np.arange(T)[:, None] * LANES + np.arange(LANES)[None, :]
    patU = np.zeros((R, T, LANES), dtype=np.float64)
    for k, (pat, _row) in enumerate(placements):
        u = np.full((T, LANES), facts[k].const, dtype=np.float64)
        for s in pat:
            cs = (pgrid >> shifts[s]) & (exts[s] - 1)
            u *= shifted_factor_table(
                facts[k], s, exts[s], int(stoich[k, s]), model
            )[cs]
        patU[k] = u
    patU_f32 = jnp.asarray(patU, jnp.float32)

    # ---- per-(tile, reaction) row-factor scalars (f64 build) -------------
    # shipped transposed (n_tiles, R) whole in SMEM and read as true
    # SCALARS per (reaction, tile): scalar * (T, LANES) vector is a native
    # VPU op.  History of this spec: an earlier SMEM attempt failed the
    # remote Mosaic compile with "failed to legalize func.return
    # (i64, i64)" — later root-caused to the synthesized i64 BlockSpec
    # index map under jax_enable_x64 (now explicit int32 everywhere), not
    # to SMEM itself; the interim (1, 1)-VMEM-slice workaround then hit
    # "Not implemented: Broadcast in both sublanes and lanes" (a (1,1)
    # vector cannot be broadcast to a (T, 128) tile in one op —
    # BENCH_r04.json tail).  SMEM scalar reads sidestep the vector-layout
    # broadcast entirely.
    if n_tiles * R * 4 > 16 << 10:  # stay well inside SMEM
        return None
    trow = np.arange(n_tiles) * T
    scal = np.ones((R, n_tiles), dtype=np.float64)
    has_scal = [False] * R
    for k, (_pat, row) in enumerate(placements):
        for s in row:
            c = (trow >> (shifts[s] - 7)) & (exts[s] - 1)
            scal[k] *= shifted_factor_table(
                facts[k], s, exts[s], int(stoich[k, s]), model
            )[c]
        has_scal[k] = bool(row) and not np.all(scal[k] == 1.0)
    scal_f32 = jnp.asarray(scal.T.copy(), jnp.float32)  # (n_tiles, R)

    # ---- pre-negated streamed diagonal (device-built once per geometry) --
    from .stencil import make_diag_fn

    diag_fn = make_diag_fn(model, box, jnp.float64)
    Dneg_f32 = jax.jit(
        lambda: (-diag_fn(jnp.ones((vol,), bool))).astype(jnp.float32)
    )().reshape(rows_tot, LANES)

    # one rolled strip per distinct nonzero lane roll, shared by every
    # reaction (and tile) using that roll
    _byr: dict = {}
    for k in range(R):
        if r[k]:
            _byr.setdefault(r[k], []).append(k)
    roll_groups = {
        rr: (min(q[k] for k in ks), max(q[k] for k in ks))
        for rr, ks in _byr.items()
        if max(q[k] for k in ks) - min(q[k] for k in ks) <= 8
    }

    def kernel(x_ref, scal_ref, mc_ref, nd_ref, pu_ref, y_ref, win, sem):
        i = pl.program_id(0).astype(jnp.int32)
        nb = pl.num_programs(0)

        def start_dma(j, slot):
            @pl.when(j == 0)
            def _():
                if lead:
                    win[slot, :lead, :] = jnp.zeros(
                        (lead, LANES), jnp.float32
                    )
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(0, WR - lead), :],
                    win.at[slot, pl.ds(lead, WR - lead), :],
                    sem.at[slot],
                ).start()

            if n_blocks > 2:  # middle windows exist (static guard)
                @pl.when((j > 0) & (j < nb - 1))
                def _():
                    w0 = j * jnp.int32(B) + jnp.int32(qmin_al)
                    pltpu.make_async_copy(
                        x_ref.at[pl.ds(w0, WR), :], win.at[slot],
                        sem.at[slot]
                    ).start()

            @pl.when(j == nb - 1)
            def _():
                if excess:
                    win[slot, WR - excess :, :] = jnp.zeros(
                        (excess, LANES), jnp.float32
                    )
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(rows_tot - (WR - excess), WR - excess), :],
                    win.at[slot, pl.ds(0, WR - excess), :],
                    sem.at[slot],
                ).start()

        def wait_dma(j, slot):
            @pl.when(j == 0)
            def _():
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(0, WR - lead), :],
                    win.at[slot, pl.ds(lead, WR - lead), :],
                    sem.at[slot],
                ).wait()

            if n_blocks > 2:
                @pl.when((j > 0) & (j < nb - 1))
                def _():
                    w0 = j * jnp.int32(B) + jnp.int32(qmin_al)
                    pltpu.make_async_copy(
                        x_ref.at[pl.ds(w0, WR), :], win.at[slot],
                        sem.at[slot]
                    ).wait()

            @pl.when(j == nb - 1)
            def _():
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(rows_tot - (WR - excess), WR - excess), :],
                    win.at[slot, pl.ds(0, WR - excess), :],
                    sem.at[slot],
                ).wait()

        @pl.when(i == 0)
        def _():
            start_dma(jnp.int32(0), jnp.int32(0))

        slot = jax.lax.rem(i, jnp.int32(2))
        nslot = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

        @pl.when(i + 1 < nb)
        def _():
            start_dma(i + jnp.int32(1), nslot)

        wait_dma(i, slot)

        rolled = {}
        if "no_shift" not in _ablate:
            for rr, (qlo, qhi) in roll_groups.items():
                g0 = c0 + qlo
                srows = B + (qhi - qlo)
                hi = win[slot, g0 : g0 + srows, rr:]
                lo = win[slot, g0 + 1 : g0 + srows + 1, :rr]
                rolled[rr] = (jnp.concatenate([hi, lo], axis=1), qlo)

        for t in range(tpb):
            r0 = t * T
            center = win[slot, c0 + r0 : c0 + r0 + T, :]
            acc = nd_ref[r0 : r0 + T, :] * center
            for k in range(R if "one_term" not in _ablate else 1):
                base = c0 + q[k] + r0
                if r[k] == 0 or "no_shift" in _ablate:
                    shifted = win[slot, base : base + T, :]
                elif r[k] in rolled:
                    strip, qlo = rolled[r[k]]
                    o = q[k] - qlo + r0
                    shifted = strip[o : o + T, :]
                else:
                    hi = win[slot, base : base + T, r[k] :]
                    lo = win[slot, base + 1 : base + T + 1, : r[k]]
                    shifted = jnp.concatenate([hi, lo], axis=1)
                if "no_pattern" in _ablate:
                    term = shifted
                else:
                    p = pu_ref[k]
                    if has_scal[k] and "no_scal" not in _ablate:
                        # SMEM scalar load; scalar * vector is legal
                        p = p * scal_ref[i * jnp.int32(tpb) + t, k]
                    term = p * shifted
                acc = acc + term
            if "no_mask" in _ablate:
                y_ref[r0 : r0 + T, :] = acc
            else:
                y_ref[r0 : r0 + T, :] = jnp.where(
                    mc_ref[r0 : r0 + T, :] != 0, acc, 0.0
                )

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM),
            # whole-array block with an EXPLICIT int32 index map: under
            # jax_enable_x64 the synthesized default map returns i64
            # indices, which Mosaic fails to legalize ("func.return
            # (i64, i64)") — same class of issue as _lane_roll's shift
            pl.BlockSpec(
                (n_tiles, R),
                lambda i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (B, LANES), lambda i: (i, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (B, LANES), lambda i: (i, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (R, T, LANES),
                lambda i: (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, LANES), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows_tot, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, WR, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )

    def matvec(mask, x):
        xm = x.astype(jnp.float32).reshape(rows_tot, LANES)
        m8 = mask.astype(jnp.int8).reshape(rows_tot, LANES)
        y = call(xm, scal_f32, m8, Dneg_f32, patU_f32)
        return y.reshape(vol)

    # introspection for tests/benchmark ablations
    matvec._pmax = Pmax
    matvec._tile = T
    matvec._placements = placements
    matvec._block_rows = B
    matvec._has_scal = has_scal
    return matvec


def make_pallas_local_matvec_v5(
    model: Model,
    box: BoxSpace,
    n_dev: int,
    block_rows: int = 1024,
    interpret: bool = False,
    pattern_vmem_bytes: int = 4 << 20,
):
    """Shard-local v5 kernel for the halo-exchange SpMV (ops/halo.py).

    Same streamed-diagonal / deep-pattern compute as
    :func:`make_pallas_stencil_matvec_v5`, operating on ONE row shard of
    the global cell axis: the first/last grid blocks source their halo
    rows from the neighbour-boundary buffers that the ppermute exchange
    delivered (instead of zero-filling, which is what the single-device
    kernel's edge clamp does).  Multi-chip runs therefore stop paying the
    XLA-stencil penalty on the hot loop (VERDICT r2 item 5).

    Returns ``fn(x_l, left, right, mask_l, d_l, row0) -> y_l`` over
    (rows_l, 128)-shaped locals — ``left``/``right`` are (lead, 128) /
    (excess, 128) halo buffers, ``row0`` a (1, 1) int32 global row origin
    — or None when the model/geometry does not qualify.
    """
    from ..models.factorize import factorize_model, shifted_factor_table
    from ..models.expressions import _eval_node

    facts = factorize_model(model)
    if facts is None:
        return None

    stoich = np.asarray(box.stoichiometry, dtype=np.int64)
    R = stoich.shape[0]
    vol = box.volume
    if vol % (n_dev * LANES) != 0:
        return None
    rows_tot = vol // LANES
    rows_l = rows_tot // n_dev
    shifts = [int(sh) for sh in box.shift_of_species]
    bits = [int(b) for b in box.bits_of_species]
    exts = [1 << b for b in bits]

    s_off = [-int(o) for o in np.asarray(box.offsets)]
    q = [so // LANES for so in s_off]
    r = [so - LANES * qq for so, qq in zip(s_off, q)]
    qmin = min(q + [0])
    qmax = max(q + [0])

    qmin_al = (qmin // 8) * 8
    c0 = -qmin_al
    blk = _choose_block(rows_l, qmin_al, qmax, block_rows)
    if blk is None:
        return None
    B, WR, lead, excess = blk
    n_blocks = rows_l // B
    if lead >= rows_l or excess >= rows_l:
        return None  # halo taller than a neighbour shard
    if lead == 0 or excess == 0:
        return None  # degenerate one-sided stencil: keep the XLA path

    # ---- deepest pattern fold; shard origins must be phase-0 -------------
    def _placement(logp):
        placements, pmax = [], 1
        for k in range(R):
            relevant = set(facts[k].factors) | {
                int(s) for s in np.nonzero(stoich[k])[0]
            }
            pat, row = [], []
            for s in sorted(relevant):
                if shifts[s] + bits[s] <= 7 + logp:
                    pat.append(s)
                elif shifts[s] >= 7:
                    row.append(s)
                else:
                    return None, None
                if s in pat:
                    pmax = max(pmax, 1 << max(0, shifts[s] + bits[s] - 7))
            placements.append((pat, row))
        return placements, pmax

    chosen = None
    for logp in range(int(np.log2(B)), -1, -1):
        placements, Pmax = _placement(logp)
        if placements is None or Pmax > B or rows_l % Pmax:
            continue
        if R * Pmax * LANES * 4 <= pattern_vmem_bytes:
            chosen = (placements, Pmax)
            break
    if chosen is None:
        return None
    placements, Pmax = chosen

    pgrid = np.arange(Pmax)[:, None] * LANES + np.arange(LANES)[None, :]
    patU = np.zeros((R, Pmax, LANES), dtype=np.float64)
    for k, (pat, _row) in enumerate(placements):
        u = np.full((Pmax, LANES), facts[k].const, dtype=np.float64)
        for s in pat:
            cs = (pgrid >> shifts[s]) & (exts[s] - 1)
            u *= shifted_factor_table(
                facts[k], s, exts[s], int(stoich[k, s]), model
            )[cs]
        patU[k] = u
    patU_f32 = jnp.asarray(patU, jnp.float32)

    params_env = {
        name: float(v)
        for name, v in zip(
            model.parameter_names, np.asarray(model.parameters)
        )
    }
    names = list(model.species_names)

    # shared rolled strips (see make_pallas_stencil_matvec_v5)
    _byr: dict = {}
    for k in range(R):
        if r[k]:
            _byr.setdefault(r[k], []).append(k)
    roll_groups = {
        rr: (min(q[k] for k in ks), max(q[k] for k in ks))
        for rr, ks in _byr.items()
        if len(ks) >= 2
        and max(q[k] for k in ks) - min(q[k] for k in ks) <= 8
    }

    def kernel(row0_ref, x_ref, l_ref, rr_ref, mc_ref, d_ref, pu_ref,
               y_ref, win, sem):
        i = pl.program_id(0).astype(jnp.int32)
        nb = pl.num_programs(0)

        def start_dma(j, slot):
            @pl.when(j == 0)
            def _():
                if lead:
                    pltpu.make_async_copy(
                        l_ref, win.at[slot, pl.ds(0, lead), :], sem.at[slot]
                    ).start()
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(0, WR - lead), :],
                    win.at[slot, pl.ds(lead, WR - lead), :],
                    sem.at[slot],
                ).start()

            if n_blocks > 2:  # middle windows exist (static guard:
                # at n_blocks == 2 the WR-row slice can exceed the array)
                @pl.when((j > 0) & (j < nb - 1))
                def _():
                    w0 = j * jnp.int32(B) + jnp.int32(qmin_al)
                    pltpu.make_async_copy(
                        x_ref.at[pl.ds(w0, WR), :], win.at[slot],
                        sem.at[slot]
                    ).start()

            @pl.when(j == nb - 1)
            def _():
                if excess:
                    pltpu.make_async_copy(
                        rr_ref, win.at[slot, pl.ds(WR - excess, excess), :],
                        sem.at[slot],
                    ).start()
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(rows_l - (WR - excess), WR - excess), :],
                    win.at[slot, pl.ds(0, WR - excess), :],
                    sem.at[slot],
                ).start()

        def wait_dma(j, slot):
            # semaphore waits must mirror the byte counts started for j
            @pl.when(j == 0)
            def _():
                if lead:
                    pltpu.make_async_copy(
                        l_ref, win.at[slot, pl.ds(0, lead), :], sem.at[slot]
                    ).wait()
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(0, WR - lead), :],
                    win.at[slot, pl.ds(lead, WR - lead), :],
                    sem.at[slot],
                ).wait()

            if n_blocks > 2:
                @pl.when((j > 0) & (j < nb - 1))
                def _():
                    w0 = j * jnp.int32(B) + jnp.int32(qmin_al)
                    pltpu.make_async_copy(
                        x_ref.at[pl.ds(w0, WR), :], win.at[slot],
                        sem.at[slot]
                    ).wait()

            @pl.when(j == nb - 1)
            def _():
                if excess:
                    pltpu.make_async_copy(
                        rr_ref, win.at[slot, pl.ds(WR - excess, excess), :],
                        sem.at[slot],
                    ).wait()
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(rows_l - (WR - excess), WR - excess), :],
                    win.at[slot, pl.ds(0, WR - excess), :],
                    sem.at[slot],
                ).wait()

        @pl.when(i == 0)
        def _():
            start_dma(jnp.int32(0), jnp.int32(0))

        slot = jax.lax.rem(i, jnp.int32(2))
        nslot = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

        @pl.when(i + 1 < nb)
        def _():
            start_dma(i + jnp.int32(1), nslot)

        wait_dma(i, slot)

        rowid = (
            jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
            + i * jnp.int32(B)
            + row0_ref[0, 0]
        )
        coord_cache: dict = {}
        fac_cache: dict = {}

        def row_coord(s):
            if s not in coord_cache:
                coord_cache[s] = (
                    rowid >> jnp.int32(shifts[s] - 7)
                ) & jnp.int32(exts[s] - 1)
            return coord_cache[s]

        def row_factor(k, s):
            nu = int(stoich[k, s])
            node = facts[k].factors.get(s)
            key = (id(node), s, nu)
            if key in fac_cache:
                return fac_cache[key]
            c = row_coord(s)
            src = c - jnp.int32(nu) if nu else c
            if node is None:
                val = jnp.ones((B, 1), jnp.float32)
            else:
                env = dict(params_env)
                env[names[s]] = src.astype(jnp.float32)
                val = jnp.asarray(_eval_node(node, env), jnp.float32)
                val = jnp.broadcast_to(val, (B, 1))
            if nu:
                ok = (src >= 0) & (src < jnp.int32(exts[s]))
                val = jnp.where(ok, val, 0.0)
            fac_cache[key] = val
            return val

        def tile(pat2d):
            return jnp.broadcast_to(
                pat2d[None], (B // Pmax, Pmax, LANES)
            ).reshape(B, LANES)

        center = win[slot, c0 : c0 + B, :]
        acc = -(d_ref[:, :] * center)

        rolled = {}
        for rr, (qlo, qhi) in roll_groups.items():
            g0 = c0 + qlo
            srows = B + (qhi - qlo)
            hi = win[slot, g0 : g0 + srows, rr:]
            lo = win[slot, g0 + 1 : g0 + srows + 1, :rr]
            rolled[rr] = (jnp.concatenate([hi, lo], axis=1), qlo)

        for k in range(R):
            base = c0 + q[k]
            if r[k] == 0:
                shifted = win[slot, base : base + B, :]
            elif r[k] in rolled:
                strip, qlo = rolled[r[k]]
                shifted = strip[q[k] - qlo : q[k] - qlo + B, :]
            else:
                hi = win[slot, base : base + B, r[k] :]
                lo = win[slot, base + 1 : base + B + 1, : r[k]]
                shifted = jnp.concatenate([hi, lo], axis=1)
            term = tile(pu_ref[k]) * shifted
            for s in placements[k][1]:
                term = term * row_factor(k, s)
            acc = acc + term

        y_ref[:, :] = jnp.where(mc_ref[:, :] != 0, acc, 0.0)

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            # explicit int32 index map (under jax_enable_x64 the default
            # synthesized map returns i64 — Mosaic legalization failure;
            # found via the v6 family, latent here)
            pl.BlockSpec(
                (1, 1), lambda i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM),
            pl.BlockSpec(
                (B, LANES), lambda i: (i, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (B, LANES), lambda i: (i, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (R, Pmax, LANES),
                lambda i: (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, LANES), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows_l, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, WR, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )

    def local_matvec(x_l, left, right, mask_l, d_l, row0):
        y = call(row0, x_l, left, right, mask_l, d_l, patU_f32)
        return y

    local_matvec._lead = lead
    local_matvec._excess = excess
    local_matvec._pmax = Pmax
    return local_matvec


def make_pallas_local_matvec_v6(
    model: Model,
    box: BoxSpace,
    n_dev: int,
    block_rows: int = 2048,
    interpret: bool = False,
    pattern_vmem_bytes: int = 4 << 20,
):
    """Shard-local v6 kernel for the halo-exchange SpMV (ops/halo.py).

    Same scalarized-row-factor / per-tile compute as
    :func:`make_pallas_stencil_matvec_v6`, with the v5-local halo DMA:
    the first/last grid blocks source their halo rows from the
    neighbour-boundary buffers delivered by the ppermute exchange.  The
    per-tile scalar table is indexed GLOBALLY (``row0/T + i*tpb + t``) so
    every shard reads its own slice of one shared table.

    Returns ``fn(x_l, left, right, mask_l, d_l, row0) -> y_l`` (same
    contract as the v5 local kernel) or None when the model/geometry/
    sharding does not qualify (callers fall back to v5-local).
    """
    from ..models.factorize import factorize_model, shifted_factor_table

    facts = factorize_model(model)
    if facts is None:
        return None

    stoich = np.asarray(box.stoichiometry, dtype=np.int64)
    R = stoich.shape[0]
    vol = box.volume
    if vol % (n_dev * LANES) != 0:
        return None
    rows_tot = vol // LANES
    rows_l = rows_tot // n_dev
    shifts = [int(sh) for sh in box.shift_of_species]
    bits = [int(b) for b in box.bits_of_species]
    exts = [1 << b for b in bits]

    s_off = [-int(o) for o in np.asarray(box.offsets)]
    q = [so // LANES for so in s_off]
    r = [so - LANES * qq for so, qq in zip(s_off, q)]
    qmin = min(q + [0])
    qmax = max(q + [0])

    qmin_al = (qmin // 8) * 8
    c0 = -qmin_al
    blk = _choose_block(rows_l, qmin_al, qmax, block_rows)
    if blk is None:
        return None
    B, WR, lead, excess = blk
    n_blocks = rows_l // B
    if lead >= rows_l or excess >= rows_l:
        return None  # halo taller than a neighbour shard
    if lead == 0 or excess == 0:
        # degenerate one-sided stencil: callers fall back to the v5-local
        # Pallas kernel when it builds, else the XLA halo path
        # (ops/halo.py selection)
        return None

    def _placement(logp):
        placements, pmax = [], 1
        for k in range(R):
            relevant = set(facts[k].factors) | {
                int(s) for s in np.nonzero(stoich[k])[0]
            }
            pat, row = [], []
            for s in sorted(relevant):
                if shifts[s] + bits[s] <= 7 + logp:
                    pat.append(s)
                elif shifts[s] >= 7:
                    row.append(s)
                else:
                    return None, None
                if s in pat:
                    pmax = max(pmax, 1 << max(0, shifts[s] + bits[s] - 7))
            placements.append((pat, row))
        return placements, pmax

    chosen = None
    for logp in range(int(np.log2(B)), -1, -1):
        placements, Pmax = _placement(logp)
        if placements is None or Pmax > B or rows_l % Pmax:
            continue
        T = max(Pmax, 8)
        if T > B or B % T or rows_l % T:
            continue
        if R * T * LANES * 4 > pattern_vmem_bytes:
            continue
        if all(
            shifts[s] - 7 >= int(np.log2(T))
            for _pat, row in placements
            for s in row
        ):
            chosen = (placements, Pmax, T)
            break
    if chosen is None:
        return None
    placements, Pmax, T = chosen
    tpb = B // T
    n_tiles = rows_tot // T

    pgrid = np.arange(T)[:, None] * LANES + np.arange(LANES)[None, :]
    patU = np.zeros((R, T, LANES), dtype=np.float64)
    for k, (pat, _row) in enumerate(placements):
        u = np.full((T, LANES), facts[k].const, dtype=np.float64)
        for s in pat:
            cs = (pgrid >> shifts[s]) & (exts[s] - 1)
            u *= shifted_factor_table(
                facts[k], s, exts[s], int(stoich[k, s]), model
            )[cs]
        patU[k] = u
    patU_f32 = jnp.asarray(patU, jnp.float32)

    # global per-(tile, reaction) row-factor scalars, shipped (n_tiles, R)
    # whole in SMEM; each shard reads its rows as true scalars indexed
    # GLOBALLY (row0/T + tile), multiplied into the (T, LANES) pattern —
    # see the single-chip v6 spec comment for the Mosaic history
    if n_tiles * R * 4 > 16 << 10:  # stay well inside SMEM
        return None
    trow = np.arange(n_tiles) * T
    scal = np.ones((R, n_tiles), dtype=np.float64)
    has_scal = [False] * R
    for k, (_pat, row) in enumerate(placements):
        for s in row:
            c = (trow >> (shifts[s] - 7)) & (exts[s] - 1)
            scal[k] *= shifted_factor_table(
                facts[k], s, exts[s], int(stoich[k, s]), model
            )[c]
        has_scal[k] = bool(row) and not np.all(scal[k] == 1.0)
    scal_f32 = jnp.asarray(scal.T.copy(), jnp.float32)  # (n_tiles, R)

    _byr: dict = {}
    for k in range(R):
        if r[k]:
            _byr.setdefault(r[k], []).append(k)
    roll_groups = {
        rr: (min(q[k] for k in ks), max(q[k] for k in ks))
        for rr, ks in _byr.items()
        if max(q[k] for k in ks) - min(q[k] for k in ks) <= 8
    }

    def kernel(row0_ref, scal_ref, x_ref, l_ref, rr_ref, mc_ref, d_ref,
               pu_ref, y_ref, win, sem):
        i = pl.program_id(0).astype(jnp.int32)
        nb = pl.num_programs(0)

        def start_dma(j, slot):
            @pl.when(j == 0)
            def _():
                if lead:
                    pltpu.make_async_copy(
                        l_ref, win.at[slot, pl.ds(0, lead), :], sem.at[slot]
                    ).start()
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(0, WR - lead), :],
                    win.at[slot, pl.ds(lead, WR - lead), :],
                    sem.at[slot],
                ).start()

            if n_blocks > 2:  # middle windows exist (static guard)
                @pl.when((j > 0) & (j < nb - 1))
                def _():
                    w0 = j * jnp.int32(B) + jnp.int32(qmin_al)
                    pltpu.make_async_copy(
                        x_ref.at[pl.ds(w0, WR), :], win.at[slot],
                        sem.at[slot]
                    ).start()

            @pl.when(j == nb - 1)
            def _():
                if excess:
                    pltpu.make_async_copy(
                        rr_ref, win.at[slot, pl.ds(WR - excess, excess), :],
                        sem.at[slot],
                    ).start()
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(rows_l - (WR - excess), WR - excess), :],
                    win.at[slot, pl.ds(0, WR - excess), :],
                    sem.at[slot],
                ).start()

        def wait_dma(j, slot):
            @pl.when(j == 0)
            def _():
                if lead:
                    pltpu.make_async_copy(
                        l_ref, win.at[slot, pl.ds(0, lead), :], sem.at[slot]
                    ).wait()
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(0, WR - lead), :],
                    win.at[slot, pl.ds(lead, WR - lead), :],
                    sem.at[slot],
                ).wait()

            if n_blocks > 2:
                @pl.when((j > 0) & (j < nb - 1))
                def _():
                    w0 = j * jnp.int32(B) + jnp.int32(qmin_al)
                    pltpu.make_async_copy(
                        x_ref.at[pl.ds(w0, WR), :], win.at[slot],
                        sem.at[slot]
                    ).wait()

            @pl.when(j == nb - 1)
            def _():
                if excess:
                    pltpu.make_async_copy(
                        rr_ref, win.at[slot, pl.ds(WR - excess, excess), :],
                        sem.at[slot],
                    ).wait()
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(rows_l - (WR - excess), WR - excess), :],
                    win.at[slot, pl.ds(0, WR - excess), :],
                    sem.at[slot],
                ).wait()

        @pl.when(i == 0)
        def _():
            start_dma(jnp.int32(0), jnp.int32(0))

        slot = jax.lax.rem(i, jnp.int32(2))
        nslot = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

        @pl.when(i + 1 < nb)
        def _():
            start_dma(i + jnp.int32(1), nslot)

        wait_dma(i, slot)

        # global tile origin of this block (row0 is T-aligned: T | rows_l;
        # shift instead of divide — T is a power of two)
        logT = int(np.log2(T))
        tile0 = (row0_ref[0, 0] >> jnp.int32(logT)) + i * jnp.int32(tpb)

        rolled = {}
        for rr, (qlo, qhi) in roll_groups.items():
            g0 = c0 + qlo
            srows = B + (qhi - qlo)
            hi = win[slot, g0 : g0 + srows, rr:]
            lo = win[slot, g0 + 1 : g0 + srows + 1, :rr]
            rolled[rr] = (jnp.concatenate([hi, lo], axis=1), qlo)

        for t in range(tpb):
            r0 = t * T
            center = win[slot, c0 + r0 : c0 + r0 + T, :]
            acc = -(d_ref[r0 : r0 + T, :] * center)
            for k in range(R):
                base = c0 + q[k] + r0
                if r[k] == 0:
                    shifted = win[slot, base : base + T, :]
                elif r[k] in rolled:
                    strip, qlo = rolled[r[k]]
                    o = q[k] - qlo + r0
                    shifted = strip[o : o + T, :]
                else:
                    hi = win[slot, base : base + T, r[k] :]
                    lo = win[slot, base + 1 : base + T + 1, : r[k]]
                    shifted = jnp.concatenate([hi, lo], axis=1)
                p = pu_ref[k]
                if has_scal[k]:
                    # SMEM scalar load; scalar * vector is legal (the
                    # (1,1)-VMEM-slice form hits Mosaic's "Broadcast in
                    # both sublanes and lanes" — see the single-chip v6)
                    p = p * scal_ref[tile0 + t, k]
                acc = acc + p * shifted
            y_ref[r0 : r0 + T, :] = jnp.where(
                mc_ref[r0 : r0 + T, :] != 0, acc, 0.0
            )

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            # explicit int32 index maps: under jax_enable_x64 the
            # synthesized default maps return i64 — Mosaic legalization
            # failure (see the single-chip v6 spec comment)
            pl.BlockSpec(
                (1, 1), lambda i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (n_tiles, R),
                lambda i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM),
            pl.BlockSpec(
                (B, LANES), lambda i: (i, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (B, LANES), lambda i: (i, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (R, T, LANES),
                lambda i: (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, LANES), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows_l, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, WR, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )

    def local_matvec(x_l, left, right, mask_l, d_l, row0):
        y = call(row0, scal_f32, x_l, left, right, mask_l, d_l, patU_f32)
        return y

    local_matvec._lead = lead
    local_matvec._excess = excess
    local_matvec._pmax = Pmax
    local_matvec._tile = T
    local_matvec._has_scal = has_scal
    return local_matvec


def make_pallas_stencil_matvec_v2(
    model: Model,
    box: BoxSpace,
    block_rows: int = 1024,
    interpret: bool = False,
):
    """Second-generation stencil kernel: fewer evals, overlapped DMA.

    Improvements over :func:`make_pallas_stencil_matvec`:

    * **one propensity eval per reaction per window cell** — the identity
      y(z) = sum_k p_k(z - nu_k) - sum_k p_k(z), with p_k = a_k * x * mask,
      reuses each evaluation for both the inflow (shifted) and diagonal
      terms (the reference FMATVEC's OFFDIAG/DIAG share the same products,
      KrylovSolver.f90:588-606);
    * **lazy coordinate decode** — expression propensities only materialize
      the species they actually reference (bounds VMEM temporaries);
    * **double-buffered window DMA** — the block i+1 window fetch overlaps
      block i's compute (scratch persists across grid steps);
    * x is pre-masked and zero-padded in one fused XLA pass, so the kernel
      streams a single window; the output mask arrives as an aligned block.
    """
    if model.custom_propensity is not None:
        fns = None
    else:
        fns = model._ensure_compiled()
    names = list(model.species_names)
    pnames = list(model.parameter_names)
    params = [float(v) for v in np.asarray(model.parameters)]
    stoich = np.asarray(box.stoichiometry, dtype=np.int64)
    R = stoich.shape[0]
    d = box.n_species

    vol = box.volume
    assert vol % LANES == 0, "box volume must be a multiple of 128"
    rows_tot = vol // LANES
    shifts = [int(sh) for sh in box.shift_of_species]
    exts = [1 << int(b) for b in box.bits_of_species]

    s_off = [-int(o) for o in np.asarray(box.offsets)]
    q = [so // LANES for so in s_off]
    r = [so - LANES * qq for so, qq in zip(s_off, q)]
    qmin = min(q + [0])
    qmax = max(q + [0])

    B = min(block_rows, rows_tot)
    while rows_tot % B:
        B //= 2
    B = max(B, 8)
    n_blocks = rows_tot // B
    # align the window start to the (8,128) sublane tiling: DMA sources
    # must start on a tile boundary, so the halo start rounds down to a
    # multiple of 8 and c0 compensates
    qmin_al = (qmin // 8) * 8
    c0 = -qmin_al
    WR = _round_up(B + (qmax - qmin_al) + 1, 8)
    PAD = _round_up(max(-qmin_al, qmax + 1) + 8, 8)

    class _LazyCoords:
        """Expression env computing species coordinates on first access
        (a Mapping over all species + parameter names)."""

        def __init__(self, zw):
            self._zw = zw
            self._cache = {name: params[j] for j, name in enumerate(pnames)}

        def __iter__(self):
            return iter(list(self._cache) + names)

        def __len__(self):
            return len(self._cache) + len(names)

        def __getitem__(self, name):
            if name not in self._cache:
                sp = names.index(name)
                self._cache[name] = (
                    (self._zw >> jnp.int32(shifts[sp]))
                    & jnp.int32(exts[sp] - 1)
                ).astype(jnp.float32)
            return self._cache[name]

    def _propensity(k: int, zw):
        if fns is not None:
            return jnp.asarray(fns[k](_LazyCoords(zw)), jnp.float32)
        coords = [
            ((zw >> jnp.int32(shifts[sp])) & jnp.int32(exts[sp] - 1)).astype(
                jnp.float32
            )
            for sp in range(d)
        ]
        states = jnp.stack(coords, axis=-1)
        return jnp.asarray(
            model.custom_propensity(states, k, params), jnp.float32
        )

    def kernel(xp_ref, mc_ref, y_ref, xwin, pk_ref, sem_x):
        i = pl.program_id(0).astype(jnp.int32)
        nb = pl.num_programs(0)

        def dma(j, slot):
            w0 = j * jnp.int32(B) + jnp.int32(PAD + qmin_al)
            return pltpu.make_async_copy(
                xp_ref.at[pl.ds(w0, WR), :], xwin.at[slot], sem_x.at[slot]
            )

        @pl.when(i == 0)
        def _():
            dma(jnp.int32(0), jnp.int32(0)).start()

        slot = jax.lax.rem(i, jnp.int32(2))
        nslot = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

        @pl.when(i + 1 < nb)
        def _():
            dma(i + jnp.int32(1), nslot).start()

        dma(i, slot).wait()

        # window cell flat indices: window row wj = global row
        # i*B + qmin_al + wj; padding rows clamp to genuine cells whose
        # x is zero, so their p_k contributions vanish
        row_w = jax.lax.broadcasted_iota(jnp.int32, (WR, LANES), 0)
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (WR, LANES), 1)
        zw = ((i * jnp.int32(B) + jnp.int32(qmin_al) + row_w)
              * jnp.int32(LANES) + lane_w)
        zw = jnp.minimum(jnp.maximum(zw, jnp.int32(0)), jnp.int32(vol - 1))

        # center coordinates for source validity (always genuine cells)
        row_c = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 0)
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 1)
        zc = (i * jnp.int32(B) + row_c) * jnp.int32(LANES) + lane_c

        xm_w = xwin[slot]

        acc = jnp.zeros((B, LANES), jnp.float32)
        diag = jnp.zeros((B, LANES), jnp.float32)
        for k in range(R):
            # stage p_k through a VMEM ref: Mosaic allows arbitrary sublane
            # offsets when slicing refs, but not computed arrays
            pk_ref[:, :] = _propensity(k, zw) * xm_w  # (WR, LANES)
            diag = diag + pk_ref[c0 : c0 + B, :]
            src_ok = None
            for sp in range(d):
                nu = int(stoich[k, sp])
                if nu == 0:
                    continue
                c = ((zc >> jnp.int32(shifts[sp]))
                     & jnp.int32(exts[sp] - 1)) - jnp.int32(nu)
                ok = (c >= 0) & (c < jnp.int32(exts[sp]))
                src_ok = ok if src_ok is None else (src_ok & ok)
            base = c0 + q[k]
            if r[k] == 0:
                shifted = pk_ref[base : base + B, :]
            else:
                hi = pk_ref[base : base + B, r[k]:]
                lo = pk_ref[base + 1 : base + B + 1, : r[k]]
                shifted = jnp.concatenate([hi, lo], axis=1)
            if src_ok is None:
                acc = acc + shifted
            else:
                acc = acc + jnp.where(src_ok, shifted, 0.0)

        y_ref[:, :] = jnp.where(mc_ref[:, :] != 0, acc - diag, 0.0)

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM),
            pl.BlockSpec(
                (B, LANES), lambda i: (i, jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, LANES), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows_tot, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, WR, LANES), jnp.float32),
            pltpu.VMEM((WR, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )

    def matvec(mask, x):
        xm = jnp.where(mask, x, 0).astype(jnp.float32).reshape(
            rows_tot, LANES
        )
        xp = jnp.pad(xm, ((PAD, PAD), (0, 0)))
        m8 = mask.astype(jnp.int8).reshape(rows_tot, LANES)
        y = call(xp, m8)
        return y.reshape(vol)

    return matvec
