"""Probability-mass-based state dropping.

Reference: ``FIND_DROPTOL`` + ``DROP_STATES``
(``/root/reference/src/state_space/StateSpace.f90:398-548``): find the
largest threshold in {1e-8, 1e-9, ...} whose below-threshold probability
mass stays under the droppable surplus ``dsum``; mark states below it,
un-mark states with large probability inflow (A w)_i; physically compact
the table only when more than 10% of states are droppable.

TPU-first: all threshold sums are evaluated in one vectorized pass, the
inflow guard is one SpMV, and compaction is an order-preserving gather (the
operator is then *rebuilt* from scratch instead of re-indexed in place).
The reference's double-decrement defect in the drop counter
(StateSpace.f90:490-495 decrements even for states that were never marked)
is not replicated; the count here is the true size of the drop set.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

#: threshold ladder 1e-8, 1e-9, ... (StateSpace.f90:416-426)
_N_LEVELS = 24


@partial(jax.jit, static_argnames=("droptol_start", "inflow_guard"))
def drop_mask_device(
    w: jnp.ndarray,
    inflow: jnp.ndarray,
    active,
    dsum: jnp.ndarray,
    droptol_start: float = 1.0e-8,
    inflow_guard: float = 1.0e-8,
):
    """Compute the drop mask and its count entirely on device.

    Args:
      w: (cap,) probability vector (padding rows are zero).
      inflow: (cap,) A @ w (the inflow guard vector, StateSpace.f90:486).
      active: membership — either an int count (table backend: rows < n) or
        a bool mask array (box backend).
      dsum: droppable surplus mass.

    Returns:
      (mask (cap,) bool — True = drop, count int32, droptol).
    """
    cap = w.shape[0]
    active = jnp.asarray(active)
    if active.dtype != jnp.bool_:
        active = jnp.arange(cap) < active
    levels = droptol_start / (10.0 ** jnp.arange(_N_LEVELS, dtype=jnp.float64))
    # mass below each level, counting only 0 < w < level (FIND_DROPTOL)
    below = (w[None, :] < levels[:, None]) & (w[None, :] > 0) & active[None, :]
    sums = jnp.sum(jnp.where(below, w[None, :], 0.0), axis=1)
    ok = sums < dsum
    # first level that satisfies the condition; fall back to the smallest
    first = jnp.argmax(ok)
    droptol = jnp.where(jnp.any(ok), levels[first], levels[-1])
    mask = (w < droptol) & active
    mask = mask & ~(inflow > inflow_guard)
    count = jnp.sum(mask).astype(jnp.int32)
    return mask, count, droptol


@jax.jit
def drop_loss_rate(w, inflow, diag, dmask):
    """Gross inflow rate into the drop set (the anti-thrash gate input).

    The reference's per-state inflow guard (StateSpace.f90:486-495) tests
    the NET derivative (A w)_i, which is ~0 for a quasi-equilibrated
    boundary state that still carries real throughput.  Dropping such a
    state truncates the GROSS flux sum_k a_k(pred) w_pred =
    (A w)_i + D_i w_i — the rate the FSP criterion will charge on the
    next step.  ``config.drop_rate_frac`` gates drop commits on this sum
    staying under a fraction of the FSP budget rate fsp_tol/t_out (a fix
    for the drop/expand limit cycle; no reference counterpart).

    Args:
      w: (cap,) f64 probability vector.
      inflow: (cap,) f64 A @ w.
      diag: (cap,) f64 positive total-outflow diagonal D.
      dmask: (cap,) bool drop set.
    """
    gross = inflow + diag * w
    return jnp.sum(jnp.where(dmask, jnp.maximum(gross, 0.0), 0.0))
