"""Fused multi-step device loop for the box backend.

The host-orchestrated solvers pay one device round-trip per attempted step.
On the masked-box representation every state-set mutation is elementwise
(drop = clear mask bits, 1-step expansion = mask dilation), so the *entire*
reference main loop (KrylovSolver.f90:206-550) — stepping, rejection
handling, dropping, expansion — runs inside ONE ``lax.while_loop``.  The
host is re-entered only when:

  * the integration reaches t_out                       (event DONE)
  * active cells touch a growable box face              (event GROW — the
    only host-visible reshape)
  * ``max_steps`` device-loop iterations elapsed        (event BUDGET —
    lets the host stream progress records)

A per-step statistics ring buffer (fsp size, tau, t, m, wsum, flags) is
written on device so observability survives the fusion (PRINT_STATS
parity, KrylovSolver.f90:641-651).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..boxspace.box import BoxSpace
from ..config import SolverConfig
from ..models.model import Model
from ..ops.stencil import (
    dilate_mask,
    expansion_rounds,
    make_diag_fn,
    select_stencil_matvec,
)
from ..statespace.drop import _N_LEVELS
from .stepper import StepCarry, make_step_fn

EVENT_NONE = 0
EVENT_DONE = 1
EVENT_GROW = 2
EVENT_BUDGET = 3
#: solver failure surfaced from the stepper (carry.iflag != 0, e.g. the
#: mxreject rejection budget was exhausted — KrylovSolver.f90:392-397)
EVENT_FAIL = 4
#: table backend: the stepper requested SSA expansion — a host-side state
#: table mutation (SSA_EXTENDER + ONESTEP_EXTENDER + operator rebuild)
EVENT_EXPAND = 5

#: per-step record fields in the device ring buffer
RECORD_FIELDS = (
    "nstep",
    "fsp_size",
    "t_step",
    "t_new",
    "t_now",
    "m",
    "wsum",
    "err_loc",
    "advanced",
    "expanded",
    "dropped",
)


class AdvanceState(NamedTuple):
    w: jnp.ndarray
    mask: jnp.ndarray
    carry: StepCarry
    event: jnp.ndarray
    steps: jnp.ndarray
    records: jnp.ndarray  # (max_steps, len(RECORD_FIELDS)) f64
    n_drops: jnp.ndarray
    n_expansions: jnp.ndarray


def _touch_flags(box: BoxSpace, mask, growable: tuple[int, ...]):
    """Does any active cell sit within reach of a growable axis' face?"""
    m = mask.reshape(box.shape)
    stoich = np.asarray(box.stoichiometry)
    out = jnp.asarray(False)
    for s in growable:
        reach = int(np.abs(stoich[:, s]).max())
        if reach == 0:
            continue
        ax = box.axis_of_species[s]
        ext = box.shape[ax]
        sl = [slice(None)] * len(box.shape)
        sl[ax] = slice(ext - reach, ext)
        out = out | jnp.any(m[tuple(sl)])
    return out


class TableAdvanceState(NamedTuple):
    """Fused-loop state for the gather-ELL table backend.

    ``active`` is the soft-drop row mask: DROP_STATES runs inline on device
    by deactivating rows (zero w, mask the matvec output) instead of
    compacting the host table; the host compacts lazily at the next
    expansion event.  The last attempted step's outcome fields are carried
    out so the host can replay its drop/expand decisions exactly as in the
    non-fused path."""

    w: jnp.ndarray
    active: jnp.ndarray  # (cap,) bool soft-drop row mask
    carry: StepCarry
    event: jnp.ndarray
    steps: jnp.ndarray
    records: jnp.ndarray  # (max_steps, len(RECORD_FIELDS)) f64
    n_drops: jnp.ndarray
    # --- last-step outcome (StepResult scalars) ---
    advanced: jnp.ndarray
    iexpand: jnp.ndarray
    t_ssa: jnp.ndarray
    dsum: jnp.ndarray


def make_masked_table_step(config: SolverConfig):
    """Single attempted step on the table backend's (op, active) pair.

    Shared by the fused device loop below AND the host-orchestrated
    stepwise path (solver.py) so both compile the numerically identical
    program: ``jnp.where(active, spmv(op, x), 0)`` with the active-count
    op_info.  (Using a bare ``spmv`` in one path and the masked form in
    the other produces ulp-different matvec roundings — enough to flip a
    step-size/m choice mid-run and break fused-vs-stepwise equality.)
    """
    from ..ops.spmv import spmv

    def masked_matvec(oa):
        op, active = oa

        def mv(x):
            return jnp.where(active, spmv(op, x), 0)

        return mv

    from ..ops.spmv import operator_nreactions

    return make_step_fn(
        masked_matvec,
        config,
        op_info=lambda oa: (
            jnp.sum(oa[1]).astype(jnp.int32),
            operator_nreactions(oa[0]),
            # operator-norm proxy for the scaled breakdown threshold
            2.0 * jnp.max(jnp.where(oa[1], oa[0].diag, 0.0)),
        ),
    )


def make_table_advance_fn(
    config: SolverConfig, max_steps: int, max_states: int | None = None
):
    """Fused multi-step device loop for the table (gather-ELL) backend.

    The reference main loop (KrylovSolver.f90:206-550) runs in-process; the
    host-orchestrated ``CmeSolver.solve`` pays one device round-trip per
    attempted step, which dominates wall time on high-latency backends
    (BASELINE.md round-3 findings).  This builds
    ``advance(op, w, active, carry, t_out, fsptol, krytol)`` running up to
    ``max_steps`` attempted steps in ONE ``lax.while_loop`` dispatch; the
    host is re-entered only on:

      * t_out reached                                  (EVENT_DONE)
      * SSA expansion requested by the FSP criterion   (EVENT_EXPAND — the
        state-table mutation is host-side by design)
      * stepper failure (iflag != 0)                   (EVENT_FAIL)
      * ``max_steps`` elapsed                          (EVENT_BUDGET)

    Probability-mass dropping (KrylovSolver.f90:509-511, DROP_STATES
    StateSpace.f90:398-548) runs INLINE as a soft drop: rows are
    deactivated (w zeroed, matvec output masked), which is mathematically
    identical to removing the state from the projection — inflow into a
    deactivated row is discarded (the reference's ADJ=0 dropped-mass path)
    and its outflow vanishes with x=0.  The operator itself is static
    between expansion events.
    """
    from ..ops.spmv import spmv

    step = make_masked_table_step(config)
    droptol_start = config.droptol_start
    inflow_guard = config.inflow_guard
    drop_fraction = config.drop_fraction
    drop_rate_frac = config.drop_rate_frac

    def drop_inline(op, active, w, dsum, rate_budget, carry):
        """DROP_STATES as row-mask arithmetic (StateSpace.f90:398-548):
        pick the largest droptol level whose below-threshold mass fits in
        dsum, deactivate those rows unless the inflow guard keeps them,
        and only commit when more than drop_fraction of rows would go AND
        the drop set's total inflow rate fits the FSP budget rate (the
        anti-thrash gate, config.drop_rate_frac — see config.py)."""
        w64 = w.astype(jnp.float64)
        inflow = jnp.where(active, spmv(op, w), 0).astype(jnp.float64)
        levels = droptol_start / (
            10.0 ** jnp.arange(_N_LEVELS, dtype=jnp.float64)
        )
        below = (
            (w64[None, :] < levels[:, None])
            & (w64[None, :] > 0)
            & active[None, :]
        )
        sums = jnp.sum(jnp.where(below, w64[None, :], 0.0), axis=1)
        ok = sums < dsum
        droptol = jnp.where(jnp.any(ok), levels[jnp.argmax(ok)], levels[-1])
        dmask = (w64 < droptol) & active & ~(inflow > inflow_guard)
        count = jnp.sum(dmask)
        n_active = jnp.sum(active)
        # anti-thrash gate on the GROSS inflow into the drop set.  The
        # per-state guard above keeps reference semantics (net A w — the
        # derivative), but a quasi-equilibrated boundary state has
        # (A w)_i ~ 0 while carrying real throughput: dropping it
        # truncates the gross flux sum_k a_k(pred) w_pred = (A w)_i +
        # D_i w_i, which is what the FSP criterion will charge on the
        # next step.  Only commit when the total gross leak rate fits
        # the scaled FSP budget rate.
        gross_in = inflow + (op.diag * w).astype(jnp.float64)
        loss_rate = jnp.sum(
            jnp.where(dmask, jnp.maximum(gross_in, 0.0), 0.0)
        )
        gate = loss_rate <= rate_budget
        if max_states is not None:
            # memory-pressure escape (config.drop_pressure_frac)
            pressure = n_active.astype(jnp.float64) >= (
                config.drop_pressure_frac * max_states
            )
            gate = gate | pressure
        do = (
            count.astype(jnp.float64)
            > drop_fraction * n_active.astype(jnp.float64)
        ) & gate
        active_new = jnp.where(do, active & ~dmask, active)
        w_new = jnp.where(do & dmask, 0, w)
        beta_new = jnp.sqrt(jnp.sum((w_new * w_new).astype(jnp.float64)))
        dropped_mass = jnp.sum(jnp.where(dmask, w64, 0.0))
        carry = carry._replace(
            beta=jnp.where(do, beta_new, carry.beta),
            hump=jnp.where(do, jnp.maximum(carry.hump, beta_new), carry.hump),
            spent=carry.spent + jnp.where(do, dropped_mass, 0.0),
        )
        return active_new, w_new, carry, jnp.where(do, count, 0)

    def advance(op, w, active, carry: StepCarry, t_out, fsptol, krytol):
        t_out_abs = jnp.abs(t_out)
        # FSP budget rate fsp_tol/t_out (FERRORBOUND slope,
        # KrylovSolver.f90:609-616) scaled by the anti-thrash fraction
        rate_budget = drop_rate_frac * fsptol / t_out_abs

        def cond(st: TableAdvanceState):
            return (st.event == EVENT_NONE) & (st.steps < max_steps)

        def body(st: TableAdvanceState) -> TableAdvanceState:
            res = step((op, st.active), st.w, st.carry, t_out, fsptol, krytol)
            w, carry, active = res.w, res.carry, st.active

            # ---- inline soft drop (KrylovSolver.f90:509-511) -----------
            do_drop = res.advanced & (res.dsum > 0.0)
            active, w, carry, dropped = jax.lax.cond(
                do_drop,
                lambda args: drop_inline(op, *args),
                lambda args: (
                    args[0],
                    args[1],
                    args[4],
                    jnp.asarray(0, jnp.int64),
                ),
                (active, w, res.dsum, rate_budget, carry),
            )
            n_drops = st.n_drops + (dropped > 0)

            # ---- events ------------------------------------------------
            failed = carry.iflag != 0
            done = (carry.t_now >= t_out_abs) & ~failed
            expand = res.iexpand & ~done & ~failed
            event = jnp.where(
                failed,
                EVENT_FAIL,
                jnp.where(
                    done,
                    EVENT_DONE,
                    jnp.where(expand, EVENT_EXPAND, EVENT_NONE),
                ),
            ).astype(jnp.int32)

            # ---- record ------------------------------------------------
            rec = jnp.stack(
                [
                    carry.nstep.astype(jnp.float64),
                    jnp.sum(active).astype(jnp.float64),
                    res.t_step.astype(jnp.float64),
                    carry.t_new.astype(jnp.float64),
                    carry.t_now.astype(jnp.float64),
                    res.m_used.astype(jnp.float64),
                    res.wsum.astype(jnp.float64),
                    res.err_loc.astype(jnp.float64),
                    res.advanced.astype(jnp.float64),
                    res.iexpand.astype(jnp.float64),
                    dropped.astype(jnp.float64),
                ]
            )
            records = jax.lax.dynamic_update_slice(
                st.records,
                rec[None, :],
                (st.steps, jnp.asarray(0, st.steps.dtype)),
            )

            return TableAdvanceState(
                w=w,
                active=active,
                carry=carry,
                event=event,
                steps=st.steps + 1,
                records=records,
                n_drops=n_drops,
                advanced=res.advanced,
                iexpand=res.iexpand,
                t_ssa=res.t_ssa,
                dsum=res.dsum,
            )

        z = jnp.asarray(0.0, jnp.float64)
        init = TableAdvanceState(
            w=w,
            active=active,
            carry=carry,
            event=jnp.asarray(EVENT_NONE, jnp.int32),
            steps=jnp.asarray(0, jnp.int32),
            records=jnp.zeros((max_steps, len(RECORD_FIELDS)), jnp.float64),
            n_drops=jnp.asarray(0, jnp.int32),
            advanced=jnp.asarray(False),
            iexpand=jnp.asarray(False),
            t_ssa=z,
            dsum=z,
        )
        st = jax.lax.while_loop(cond, body, init)
        event = jnp.where(
            st.event == EVENT_NONE, EVENT_BUDGET, st.event
        ).astype(jnp.int32)
        return st._replace(event=event)

    return advance


def make_advance_fn(
    model: Model,
    box: BoxSpace,
    config: SolverConfig,
    growable: tuple[int, ...],
    max_steps: int,
    dtype=jnp.float64,
    mesh=None,
):
    """Build advance(w, mask, carry, t_out, fsptol, krytol) -> AdvanceState.

    Static in box geometry / growable axes / max_steps; jit once per box.
    With ``mesh`` the SpMV uses the explicit halo-exchange shard_map path
    when the model/geometry qualify.
    """
    matvec = select_stencil_matvec(model, box, config, dtype, mesh=mesh)
    R = model.n_reactions
    _diag_for_norm = make_diag_fn(model, box, jnp.float64)
    step = make_step_fn(
        lambda mask: (lambda x: matvec(mask, x)),
        config,
        op_info=lambda mask: (
            jnp.sum(mask).astype(jnp.int32),
            R,
            2.0 * jnp.max(jnp.where(mask, _diag_for_norm(mask), 0.0)),
        ),
    )
    droptol_start = config.droptol_start
    inflow_guard = config.inflow_guard
    drop_fraction = config.drop_fraction
    expand_rounds = config.box_expand_rounds
    expand_rounds_max = config.box_expand_rounds_max
    diag_fn = make_diag_fn(model, box, jnp.float64)

    def drop_inline(mask, w, dsum, rate_budget, carry):
        """DROP_STATES as pure mask arithmetic (StateSpace.f90:398-548),
        with the same anti-thrash gate as the table backend's drop_inline
        (config.drop_rate_frac — gross-leak-rate bound, plus a
        memory-pressure escape on the box volume)."""
        w64 = w.astype(jnp.float64)
        inflow = matvec(mask, w).astype(jnp.float64)
        levels = droptol_start / (
            10.0 ** jnp.arange(_N_LEVELS, dtype=jnp.float64)
        )
        below = (
            (w64[None, :] < levels[:, None]) & (w64[None, :] > 0) & mask[None, :]
        )
        sums = jnp.sum(jnp.where(below, w64[None, :], 0.0), axis=1)
        ok = sums < dsum
        droptol = jnp.where(jnp.any(ok), levels[jnp.argmax(ok)], levels[-1])
        dmask = (w64 < droptol) & mask & ~(inflow > inflow_guard)
        count = jnp.sum(dmask)
        n_active = jnp.sum(mask)
        gross_in = inflow + diag_fn(mask) * w64
        loss_rate = jnp.sum(
            jnp.where(dmask, jnp.maximum(gross_in, 0.0), 0.0)
        )
        pressure = n_active.astype(jnp.float64) >= (
            config.drop_pressure_frac * mask.size
        )
        gate = (loss_rate <= rate_budget) | pressure
        do = (
            count.astype(jnp.float64)
            > drop_fraction * n_active.astype(jnp.float64)
        ) & gate
        mask_new = jnp.where(do, mask & ~dmask, mask)
        w_new = jnp.where(do & dmask, 0.0, w)
        beta_new = jnp.sqrt(jnp.sum((w_new * w_new).astype(jnp.float64)))
        dropped_mass = jnp.sum(jnp.where(dmask, w64, 0.0))
        carry = carry._replace(
            beta=jnp.where(do, beta_new, carry.beta),
            hump=jnp.where(
                do, jnp.maximum(carry.hump, beta_new), carry.hump
            ),
            # dropped mass is spent FSP budget (drives the f32 drop budget)
            spent=carry.spent + jnp.where(do, dropped_mass, 0.0),
        )
        return mask_new, w_new, carry, jnp.where(do, count, 0)

    def expand_inline(mask, w, t_ssa):
        """SSA_EXTENDER analog (StateSpace.f90:550-630): dilate by the
        event-count the reference's walks would cover in t_ssa."""
        w64 = w.astype(jnp.float64)
        support = mask & (w64 > droptol_start)
        support = jnp.where(jnp.any(support), support, mask)
        lam = jnp.max(jnp.where(support, diag_fn(mask), 0.0))
        k = expansion_rounds(lam, t_ssa, expand_rounds, expand_rounds_max)

        def dil(c):
            m, i = c
            return dilate_mask(box, m), i + 1

        mask, _ = jax.lax.while_loop(
            lambda c: c[1] < k, dil, (mask, jnp.asarray(0, jnp.int32))
        )
        return mask

    def advance(w, mask, carry: StepCarry, t_out, fsptol, krytol):
        t_out_abs = jnp.abs(t_out)
        # FSP budget rate fsp_tol/t_out scaled by the anti-thrash fraction
        rate_budget = config.drop_rate_frac * fsptol / t_out_abs

        def cond(st: AdvanceState):
            return (st.event == EVENT_NONE) & (st.steps < max_steps)

        def body(st: AdvanceState) -> AdvanceState:
            res = step(st.mask, st.w, st.carry, t_out, fsptol, krytol)
            w, carry, mask = res.w, res.carry, st.mask
            dropped = jnp.asarray(0, jnp.int64)
            n_drops = st.n_drops
            n_exp = st.n_expansions

            # ---- drop (KrylovSolver.f90:509-511) -----------------------
            do_drop = res.advanced & (res.dsum > 0.0)
            mask, w, carry, dropped = jax.lax.cond(
                do_drop,
                lambda args: drop_inline(*args),
                lambda args: (args[0], args[1], args[4], jnp.asarray(0, jnp.int64)),
                (mask, w, res.dsum, rate_budget, carry),
            )
            n_drops = n_drops + (dropped > 0)

            # ---- expansion (KrylovSolver.f90:516-534) ------------------
            do_expand = res.iexpand
            mask = jax.lax.cond(
                do_expand,
                lambda args: expand_inline(*args),
                lambda args: args[0],
                (mask, w, res.t_ssa),
            )
            n_exp = n_exp + do_expand

            # ---- events ------------------------------------------------
            failed = carry.iflag != 0
            done = (carry.t_now >= t_out_abs) & ~failed
            grow = _touch_flags(box, mask, growable) & ~done & ~failed
            event = jnp.where(
                failed,
                EVENT_FAIL,
                jnp.where(
                    done, EVENT_DONE, jnp.where(grow, EVENT_GROW, EVENT_NONE)
                ),
            ).astype(jnp.int32)

            # ---- record ------------------------------------------------
            rec = jnp.stack(
                [
                    carry.nstep.astype(jnp.float64),
                    jnp.sum(mask).astype(jnp.float64),
                    res.t_step.astype(jnp.float64),
                    carry.t_new.astype(jnp.float64),
                    carry.t_now.astype(jnp.float64),
                    res.m_used.astype(jnp.float64),
                    res.wsum.astype(jnp.float64),
                    res.err_loc.astype(jnp.float64),
                    res.advanced.astype(jnp.float64),
                    res.iexpand.astype(jnp.float64),
                    dropped.astype(jnp.float64),
                ]
            )
            records = jax.lax.dynamic_update_slice(
                st.records, rec[None, :], (st.steps, jnp.asarray(0, st.steps.dtype))
            )

            return AdvanceState(
                w=w,
                mask=mask,
                carry=carry,
                event=event,
                steps=st.steps + 1,
                records=records,
                n_drops=n_drops,
                n_expansions=n_exp,
            )

        init = AdvanceState(
            w=w,
            mask=mask,
            carry=carry,
            event=jnp.asarray(EVENT_NONE, jnp.int32),
            steps=jnp.asarray(0, jnp.int32),
            records=jnp.zeros((max_steps, len(RECORD_FIELDS)), jnp.float64),
            n_drops=jnp.asarray(0, jnp.int32),
            n_expansions=jnp.asarray(0, jnp.int32),
        )
        st = jax.lax.while_loop(cond, body, init)
        event = jnp.where(
            st.event == EVENT_NONE, EVENT_BUDGET, st.event
        ).astype(jnp.int32)
        return st._replace(event=event)

    return advance
