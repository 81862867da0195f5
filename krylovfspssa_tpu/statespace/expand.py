"""FSP state-space expansion: 1-step reachability and batched SSA walks.

Reference: ``ONESTEP_EXTENDER`` (``/root/reference/src/state_space/
StateSpace.f90:347-396``) adds, for every state, every legal reaction
successor not yet in the table; ``SSA_EXTENDER`` (StateSpace.f90:550-630)
runs one Gillespie walk from every state for a local time budget, adding
every visited state.

TPU-first re-design:

* 1-step: one batched key computation + lookup over all (state, reaction)
  pairs, then a dedup-merge — O(nR log n) fully parallel instead of serial
  hash probing.
* SSA: walks from *all* origins advance in lockstep under ``vmap`` +
  ``lax.scan`` over a bounded number of jumps; each jump evaluates the
  propensities at the walker's current state on the fly (the reference reads
  them from matrix columns it mutates as it walks).  Visited-state keys are
  collected per step and merged once at the end.  Deviations from the
  serial reference, by design: walks don't stop early when they re-enter
  "already swept" territory (the J >= J0 guard, StateSpace.f90:626, is a
  serial-sweep artifact), and jump counts are bounded by
  ``config.ssa_max_steps``.  Both only affect *exploration heuristics*; the
  FSP criterion still guards solution accuracy.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .encoding import StateEncoder
from .table import StateTable


def onestep_candidates(table: StateTable, stoichiometry: np.ndarray):
    """Keys + states of all legal 1-step successors not in the table."""
    stoich = jnp.asarray(np.asarray(stoichiometry), dtype=jnp.int32)
    n, cap, d = table.n, table.capacity, table.encoder.n_species
    R = stoich.shape[0]
    succ = table.states[:, None, :] + stoich[None, :, :]  # (cap, R, d)
    keys = table.encoder.encode(succ.reshape(cap * R, d))
    active = (jnp.arange(cap) < n)[:, None]
    keys = jnp.where(active, keys.reshape(cap, R), -1).reshape(-1)
    present = table.lookup(keys)
    keys = jnp.where(present < 0, keys, -1)
    return keys, succ.reshape(cap * R, d)


def onestep_extend(
    table: StateTable, stoichiometry: np.ndarray, max_capacity: int | None
) -> tuple[StateTable, int]:
    """One round of 1-step reachability expansion."""
    keys, succ = onestep_candidates(table, stoichiometry)
    return table.merge_keys(np.asarray(keys), np.asarray(succ), max_capacity)


# ---------------------------------------------------------------- SSA ----


@partial(jax.jit, static_argnames=("max_steps", "props_fn"))
def _ssa_walk_keys(
    states,  # (chunk, d) int32 walk origins
    alive0,  # (chunk,) bool
    t_budget,  # scalar f64
    rng,  # PRNG key
    props_fn,  # static: (m, d) states -> (m, R) propensities
    stoich,  # (R, d) int32
    shifts,  # (d,) int64 encoder shifts
    species_cap: jnp.ndarray,  # scalar int64
    max_steps: int,
):
    """Run Gillespie walks from each origin; return (max_steps, chunk) int64
    keys of visited states (-1 where no visit)."""
    chunk, d = states.shape
    R = stoich.shape[0]

    def encode(x):
        ok = jnp.all((x >= 0) & (x <= species_cap), axis=-1)
        key = jnp.sum(
            jnp.where(ok[:, None], x.astype(jnp.int64), 0) << shifts, axis=-1
        )
        return jnp.where(ok, key, -1), ok

    def step(carry, step_rng):
        x, t, alive = carry
        props = props_fn(x)  # (chunk, R)
        diag = props.sum(axis=1)
        r1 = jax.random.uniform(step_rng[0], (chunk,), dtype=jnp.float64)
        r2 = jax.random.uniform(step_rng[1], (chunk,), dtype=jnp.float64)
        # exponential waiting time (StateSpace.f90:577-579); the reference
        # caps t at the budget but still takes the final jump
        safe_diag = jnp.where(diag > 0, diag, 1.0)
        t_next = jnp.minimum(t_budget, t + (-jnp.log(r1) / safe_diag))
        # categorical reaction choice by cumulative propensity scan
        # (StateSpace.f90:581-588)
        r2a = jnp.minimum(r2 * diag, diag)
        cum = jnp.cumsum(props, axis=1)
        k = jnp.sum((cum < r2a[:, None]).astype(jnp.int32), axis=1)
        k = jnp.minimum(k, R - 1)
        x_next = x + stoich[k]
        key, legal = encode(x_next)
        stepped = alive & (diag > 0)
        emit = jnp.where(stepped & legal, key, -1)
        x_new = jnp.where((stepped & legal)[:, None], x_next, x)
        t_new = jnp.where(stepped, t_next, t)
        # walk ends on illegal move (StateSpace.f90:594-596) or exhausted
        # budget (loop guard :626)
        alive_new = stepped & legal & (t_new < t_budget)
        return (x_new, t_new, alive_new), emit

    rngs = jax.random.split(rng, max_steps * 2).reshape(max_steps, 2, -1)
    t0 = jnp.zeros((chunk,), dtype=jnp.float64)
    (_, _, _), emitted = jax.lax.scan(step, (states, t0, alive0), rngs)
    return emitted  # (max_steps, chunk)


def ssa_extend(
    table: StateTable,
    model_props_fn,
    stoichiometry: np.ndarray,
    t_budget: float,
    rng,
    max_steps: int,
    max_capacity: int | None,
    chunk_size: int = 1 << 16,
) -> tuple[StateTable, int]:
    """SSA-driven expansion from every current state (SSA_EXTENDER parity).

    ``model_props_fn`` must be a jax-traceable (m, d) -> (m, R) batched
    propensity evaluator.
    """
    stoich = jnp.asarray(np.asarray(stoichiometry), dtype=jnp.int32)
    shifts = jnp.asarray(table.encoder.shifts)
    cap_val = jnp.int64(table.encoder.species_cap)
    n = table.n
    added_total = 0
    for lo in range(0, n, chunk_size):
        hi = min(lo + chunk_size, n)
        m = hi - lo
        pad = -(-m // 256) * 256  # pad chunk to avoid shape churn
        origin = np.zeros((pad, table.encoder.n_species), dtype=np.int32)
        origin[:m] = np.asarray(table.states[lo:hi])
        alive = np.zeros(pad, dtype=bool)
        alive[:m] = True
        keys = _ssa_walk_keys(
            jnp.asarray(origin),
            jnp.asarray(alive),
            jnp.asarray(float(t_budget), jnp.float64),
            jax.random.fold_in(rng, lo),
            model_props_fn,
            stoich,
            shifts,
            cap_val,
            max_steps,
        )
        keys_np = np.asarray(keys).reshape(-1)
        keys_np = np.unique(keys_np[keys_np >= 0])
        if keys_np.size == 0:
            continue
        states_np = np.asarray(table.encoder.decode(jnp.asarray(keys_np)))
        table, added = table.merge_keys(keys_np, states_np, max_capacity)
        added_total += added
    return table, added_total
