"""Matrix-free stencil SpMV over the masked box state space.

On the box representation (boxspace/box.py), state x - nu_k sits at constant
flat offset, so the projected CME matvec

    y[z] = sum_k a_k(z - nu_k) * x[z - nu_k]  -  diag(z) * x[z]

is R shifted elementwise multiplies plus a diagonal term: no gathers, no
stored matrix.  Propensities are *recomputed from coordinates* on every
matvec — coordinates decode from the flat index by shift/mask (power-of-two
extents), so the kernel's only memory traffic is x in, y out, mask in.
This is the TPU-native replacement for the reference's pointer-chasing
FMATVEC scatter loop (KrylovSolver.f90:577-607).

This module is the XLA implementation (portable, used for correctness and
as the non-TPU path); ``pallas_stencil.py`` holds the hand-tiled TPU kernel.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..boxspace.box import BoxSpace
from ..models.model import Model


def make_propensity_evaluator(
    model: Model, box: BoxSpace, dtype=jnp.float64
) -> Callable[[jnp.ndarray, int], jnp.ndarray]:
    """Returns a(flat_cells, k) -> propensity of reaction k at those cells.

    For expression models the compiled AST is evaluated directly on the
    decoded coordinate arrays (fully fuseable); custom propensities get a
    stacked (n, d) state array (parity with CUSTOMPROP).
    """
    params = jnp.asarray(model.parameters, dtype=dtype)

    if model.custom_propensity is None:
        fns = model._ensure_compiled()
        names = list(model.species_names)
        pnames = list(model.parameter_names)

        def evaluate(flat, k):
            coords = box.species_counts(flat, dtype)
            env = {name: coords[s] for s, name in enumerate(names)}
            env.update({name: params[j] for j, name in enumerate(pnames)})
            return jnp.broadcast_to(
                jnp.asarray(fns[k](env), dtype=dtype), flat.shape
            )

    else:

        def evaluate(flat, k):
            coords = box.species_counts(flat, dtype)
            states = jnp.stack(coords, axis=-1)
            return jnp.broadcast_to(
                jnp.asarray(
                    model.custom_propensity(states, k, params), dtype=dtype
                ),
                flat.shape,
            )

    return evaluate


def _dest_valid(box: BoxSpace, flat: jnp.ndarray, k: int) -> jnp.ndarray:
    """Cells z whose predecessor z - nu_k lies inside the box."""
    stoich = np.asarray(box.stoichiometry)
    ok = jnp.ones(flat.shape, dtype=bool)
    for s in range(box.n_species):
        nu = int(stoich[k, s])
        if nu == 0:
            continue
        sh = int(box.shift_of_species[s])
        bits = int(box.bits_of_species[s])
        co = (flat >> sh) & ((1 << bits) - 1)
        pred = co - nu
        ok = ok & (pred >= 0) & (pred < (1 << bits))
    return ok


def _axis_field(box: BoxSpace, tabs_by_species: dict, const: float, dtype):
    """Broadcast outer product of per-species 1-D tables over the box,
    flattened to (vol,).  Only used for boxes too small for the lane-
    pattern form (its N-D temps tile poorly on TPU when minor axis
    extents are < 128)."""
    shape = box.shape
    nd = len(shape)
    arr = None
    for s, tab in tabs_by_species.items():
        ax = box.axis_of_species[s]
        t = jnp.asarray(tab, dtype).reshape(
            (1,) * ax + (shape[ax],) + (1,) * (nd - ax - 1)
        )
        arr = t if arr is None else arr * t
    c = jnp.asarray(const, dtype)
    if arr is None:
        return jnp.full((box.volume,), c, dtype)
    return jnp.broadcast_to(c * arr, shape).reshape(box.volume)


_FIELD_LANES = 128
#: largest lane-pattern row period materialized as a constant
_FIELD_PCAP = 2048


def _lane_field(box: BoxSpace, tabs_by_species: dict, const: float, dtype):
    """Rank-1 propensity field in TPU-native (rows, 128) layout.

    The flat cell index splits as row*128 + lane.  Species whose bit
    field ends at/below bit 7 + log2(P) contribute a periodic (P, 128)
    *lane pattern* (a precomputed numpy constant, tiled down the rows);
    species entirely above bit 7 contribute a per-row factor via a tiny
    1-D table gather of length vol/128.  Every op is 2-D with a 128-lane
    minor axis — the layout both TPU tiling and CPU vectorization want —
    unlike the naive N-D broadcast product whose minor axes (often extent
    4) pad 32x on TPU.
    """
    vol = box.volume
    if vol % _FIELD_LANES != 0:
        return _axis_field(box, tabs_by_species, const, dtype)
    rows = vol // _FIELD_LANES

    pat_species, row_species = [], []
    for s in tabs_by_species:
        sh = int(box.shift_of_species[s])
        b = int(box.bits_of_species[s])
        if sh >= 7:
            row_species.append(s)
        elif (1 << max(0, sh + b - 7)) <= min(rows, _FIELD_PCAP):
            pat_species.append(s)
        else:
            return _axis_field(box, tabs_by_species, const, dtype)

    P = 1
    for s in pat_species:
        sh = int(box.shift_of_species[s])
        b = int(box.bits_of_species[s])
        P = max(P, 1 << max(0, sh + b - 7))
    P = min(P, rows)

    pgrid = (
        np.arange(P)[:, None] * _FIELD_LANES + np.arange(_FIELD_LANES)[None, :]
    )
    pat = np.full((P, _FIELD_LANES), const, dtype=np.float64)
    for s in pat_species:
        sh = int(box.shift_of_species[s])
        b = int(box.bits_of_species[s])
        pat *= np.asarray(tabs_by_species[s])[(pgrid >> sh) & ((1 << b) - 1)]
    pat_j = jnp.asarray(pat, dtype)

    field2d = jnp.broadcast_to(
        pat_j[None], (rows // P, P, _FIELD_LANES)
    ).reshape(rows, _FIELD_LANES)
    if row_species:
        rowfac = None
        ridx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)[:, 0]
        for s in row_species:
            sh = int(box.shift_of_species[s])
            b = int(box.bits_of_species[s])
            t = jnp.asarray(tabs_by_species[s], dtype)
            f = t[(ridx >> (sh - 7)) & ((1 << b) - 1)]
            rowfac = f if rowfac is None else rowfac * f
        field2d = field2d * rowfac[:, None]
    return field2d.reshape(vol)


def _field(box: BoxSpace, tabs_by_species: dict, const: float, dtype):
    """Backend-tuned rank-1 field: the (rows, 128) lane-pattern form on
    accelerators (N-D broadcasts pad catastrophically in TPU tiling), the
    N-D broadcast outer product on CPU (measured faster there; no tiling,
    and gathers are the slow op instead)."""
    if jax.default_backend() == "cpu":
        return _axis_field(box, tabs_by_species, const, dtype)
    return _lane_field(box, tabs_by_species, const, dtype)


def _factored_reaction_tables(model: Model, box: BoxSpace):
    """Per-reaction (const, u_tabs, t_tabs) from the propensity
    factorization, or None.  ``u_tabs[s]`` is the *shifted* source-factor
    table with FSP validity baked in (zero where the source coordinate
    leaves the box); ``t_tabs[s]`` the plain factor table (for the
    diagonal).  Only species that are referenced or moved by the reaction
    appear."""
    from ..models.factorize import (
        factor_table,
        factorize_model,
        shifted_factor_table,
    )

    facts = factorize_model(model)
    if facts is None:
        return None
    stoich = np.asarray(box.stoichiometry)
    exts = np.asarray(box.extents)
    out = []
    for k, fz in enumerate(facts):
        relevant = set(fz.factors) | {
            int(s) for s in np.nonzero(stoich[k])[0]
        }
        u_tabs = {
            s: shifted_factor_table(
                fz, s, int(exts[s]), int(stoich[k, s]), model
            )
            for s in relevant
        }
        t_tabs = {
            s: factor_table(fz, s, int(exts[s]), model) for s in fz.factors
        }
        out.append((fz.const, u_tabs, t_tabs))
    return out


def make_stencil_matvec(model: Model, box: BoxSpace, dtype=jnp.float64):
    """Build matvec(mask, x) -> y for the current box geometry.

    The returned function is jit-traceable; `mask` is the FSP membership
    mask (bool, flat) and x a flat vector supported on it.

    For separable propensities (models/factorize.py) the matvec runs in
    *destination form*: y[z] = sum_k U_k[z] * x[z - nu_k] - D[z] * x[z]
    with U_k the shifted-factor outer-product field (validity baked in) —
    one multiply-add per reaction per cell, no expression re-evaluation
    and no per-cell bounds arithmetic.  Non-separable models fall back to
    direct evaluation (reference FMATVEC semantics either way,
    KrylovSolver.f90:577-607).
    """
    offsets = [int(o) for o in box.offsets]
    R = model.n_reactions
    vol = box.volume

    tables = _factored_reaction_tables(model, box)
    if tables is not None:

        def matvec(mask, x):
            xm = jnp.where(mask, x, 0)
            diag = sum(
                _field(box, t_tabs, const, dtype)
                for const, _, t_tabs in tables
            )
            y = -diag * xm
            for k, (const, u_tabs, _) in enumerate(tables):
                y = y + _field(box, u_tabs, const, dtype) * jnp.roll(
                    xm, offsets[k]
                )
            return jnp.where(mask, y, 0)

        return matvec

    evaluate = make_propensity_evaluator(model, box, dtype)

    def matvec(mask, x):
        flat = jax.lax.broadcasted_iota(jnp.int64, (vol, 1), 0)[:, 0]
        xm = jnp.where(mask, x, 0)
        diag = sum(evaluate(flat, k) for k in range(R))
        y = -diag * xm
        for k in range(R):
            contrib = evaluate(flat, k) * xm
            rolled = jnp.roll(contrib, offsets[k])
            y = y + jnp.where(_dest_valid(box, flat, k), rolled, 0)
        return jnp.where(mask, y, 0)

    return matvec


def select_stencil_matvec(model: Model, box: BoxSpace, config, dtype,
                          mesh=None):
    """Pick the SpMV implementation per config.use_pallas ("auto" takes the
    hand-tiled Pallas kernel for float32 on TPU backends when the box
    geometry qualifies; the XLA stencil otherwise).  With ``mesh`` set,
    prefer the explicit ppermute halo-exchange shard_map path (ops/halo.py)
    when the model/geometry qualify."""
    use = getattr(config, "use_pallas", "auto")
    if mesh is not None:
        if getattr(config, "use_halo", True):
            from .halo import make_halo_stencil_matvec

            mv = make_halo_stencil_matvec(
                model, box, mesh, dtype, use_pallas=use
            )
            if mv is not None:
                return mv
        # GSPMD fallback: a single-device pallas_call cannot be
        # partitioned by GSPMD, so mesh solves without the halo path run
        # the XLA stencil
        return make_stencil_matvec(model, box, dtype)
    if use != "never" and dtype == jnp.float32:
        from .pallas_stencil import (
            make_pallas_stencil_matvec_v2,
            make_pallas_stencil_matvec_v3,
            make_pallas_stencil_matvec_v4,
            make_pallas_stencil_matvec_v5,
            make_pallas_stencil_matvec_v6,
            pallas_applicable,
        )

        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        if use == "always" or (on_tpu and pallas_applicable(box)):
            # v6/v5/v4 (zero-copy input, overlapped DMA) assume
            # supp(x) ⊆ mask — an invariant of the Krylov iteration (every
            # Arnoldi vector is a combination of masked matvec outputs;
            # drop/growth re-mask w).  v6 (scalarized row factors, SMEM
            # scalar table) is the round-5 production default: TPU
            # hardware-validated at 0.171 ms / 300% stored-CSR roofline
            # on the flagship box vs v5's 0.181 ms (V6_BENCH.jsonl);
            # use_pallas="v5" pins the previous default.
            mv = None
            if use != "v5":
                mv = make_pallas_stencil_matvec_v6(model, box)
            if mv is None:
                mv = make_pallas_stencil_matvec_v5(model, box)
            if mv is None:
                mv = make_pallas_stencil_matvec_v4(model, box)
            if mv is None:
                mv = make_pallas_stencil_matvec_v3(model, box)
            if mv is not None:
                return mv
            return make_pallas_stencil_matvec_v2(model, box)
    return make_stencil_matvec(model, box, dtype)


def make_diag_fn(model: Model, box: BoxSpace, dtype=jnp.float64):
    """Build diag(mask) -> total propensity sum_k a_k(x) per active cell
    (0 elsewhere) — the reference's DIAG column (StateSpace.f90:211-212),
    used here to event-scale FSP expansion (diag * t = expected number of
    reaction firings at that state over horizon t)."""
    R = model.n_reactions
    vol = box.volume

    tables = _factored_reaction_tables(model, box)
    if tables is not None:

        def diag(mask):
            d = sum(
                _field(box, t_tabs, const, dtype)
                for const, _, t_tabs in tables
            )
            return jnp.where(mask, d, 0)

        return diag

    evaluate = make_propensity_evaluator(model, box, dtype)

    def diag(mask):
        flat = jax.lax.broadcasted_iota(jnp.int64, (vol, 1), 0)[:, 0]
        d = sum(evaluate(flat, k) for k in range(R))
        return jnp.where(mask, d, 0)

    return diag


def expansion_rounds(lam, t_ssa, rounds_min: int, rounds_max: int):
    """Dilation count matching the reference SSA extender's reach: the
    number of reaction events in time t at rate lam is Poisson(lam*t);
    cover its upper tail with ev + 3*sqrt(ev) + 1 shells (the FSP
    criterion loop remains the backstop for the truncated tail)."""
    ev = jnp.maximum(t_ssa, 0.0) * jnp.maximum(lam, 0.0)
    k = jnp.ceil(ev + 3.0 * jnp.sqrt(ev)) + 1.0
    return jnp.clip(k, rounds_min, rounds_max).astype(jnp.int32)


def dilate_mask(box: BoxSpace, mask: jnp.ndarray) -> jnp.ndarray:
    """One round of 1-step reachability: activate every legal successor of
    an active cell (the ONESTEP_EXTENDER analog, StateSpace.f90:347-396)."""
    vol = box.volume
    flat = jax.lax.broadcasted_iota(jnp.int64, (vol, 1), 0)[:, 0]
    out = mask
    for k in range(box.stoichiometry.shape[0]):
        rolled = jnp.roll(mask, int(box.offsets[k]))
        out = out | (rolled & _dest_valid(box, flat, k))
    return out


def active_touches_face(box: BoxSpace, mask: jnp.ndarray) -> np.ndarray:
    """Per-species flag: an active cell sits within the largest |nu| of the
    axis' upper face — growing that axis is warranted before expanding."""
    m = np.asarray(mask).reshape(box.shape)
    stoich = np.asarray(box.stoichiometry)
    out = np.zeros(box.n_species, dtype=bool)
    for s in range(box.n_species):
        reach = int(np.abs(stoich[:, s]).max())
        if reach == 0:
            continue
        ax = box.axis_of_species[s]
        ext = box.shape[ax]
        sl = [slice(None)] * len(box.shape)
        sl[ax] = slice(ext - reach, ext)
        out[s] = bool(m[tuple(sl)].any())
    return out
