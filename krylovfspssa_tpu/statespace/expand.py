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

from .table import StateTable


def onestep_candidates(table: StateTable, stoichiometry: np.ndarray):
    """Keys + states of all legal 1-step successors not in the table."""
    stoich = jnp.asarray(np.asarray(stoichiometry), dtype=jnp.int32)
    enc = table.encoder
    n, cap, d = table.n, table.capacity, enc.n_species
    R = stoich.shape[0]
    succ = table.states[:, None, :] + stoich[None, :, :]  # (cap, R, d)
    keys = enc.encode(succ.reshape(cap * R, d))
    inactive = ~((jnp.arange(cap)[:, None] < n) & jnp.ones((1, R), bool))
    keys = enc.invalidate(keys, inactive.reshape(-1))
    present = table.lookup(keys)
    keys = enc.invalidate(keys, present >= 0)
    return keys, succ.reshape(cap * R, d)


def onestep_extend(
    table: StateTable, stoichiometry: np.ndarray, max_capacity: int | None
) -> tuple[StateTable, int]:
    """One round of 1-step reachability expansion."""
    keys, succ = onestep_candidates(table, stoichiometry)
    return table.merge_keys(np.asarray(keys), np.asarray(succ), max_capacity)


# ---------------------------------------------------------------- SSA ----


@partial(jax.jit, static_argnames=("max_steps", "props_fn"))
def _ssa_walk_states(
    states,  # (chunk, d) int32 walk origins
    alive0,  # (chunk,) bool
    t_budget,  # scalar f64
    rng,  # PRNG key
    props_fn,  # static: (m, d) states -> (m, R) propensities
    stoich,  # (R, d) int32
    species_cap: jnp.ndarray,  # scalar int64
    max_steps: int,
):
    """Run Gillespie walks from each origin; return (max_steps, chunk, d)
    int32 visited states (all -1 where no visit).  Emitting states instead
    of packed keys keeps this path encoder-independent (single- and
    multi-word keys alike)."""
    chunk, d = states.shape
    R = stoich.shape[0]

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
        legal = jnp.all(
            (x_next >= 0) & (x_next.astype(jnp.int64) <= species_cap),
            axis=-1,
        )
        stepped = alive & (diag > 0)
        ok = stepped & legal
        emit = jnp.where(ok[:, None], x_next, -1)
        x_new = jnp.where(ok[:, None], x_next, x)
        t_new = jnp.where(stepped, t_next, t)
        # walk ends on illegal move (StateSpace.f90:594-596) or exhausted
        # budget (loop guard :626)
        alive_new = ok & (t_new < t_budget)
        return (x_new, t_new, alive_new), emit

    rngs = jax.random.split(rng, max_steps * 2).reshape(max_steps, 2, -1)
    t0 = jnp.zeros((chunk,), dtype=jnp.float64)
    (_, _, _), emitted = jax.lax.scan(step, (states, t0, alive0), rngs)
    return emitted  # (max_steps, chunk, d)


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
    cap_val = jnp.int64(table.encoder.species_cap)
    d = table.encoder.n_species
    n = table.n
    added_total = 0
    for lo in range(0, n, chunk_size):
        hi = min(lo + chunk_size, n)
        m = hi - lo
        pad = -(-m // 256) * 256  # pad chunk to avoid shape churn
        origin = np.zeros((pad, d), dtype=np.int32)
        origin[:m] = np.asarray(table.states[lo:hi])
        alive = np.zeros(pad, dtype=bool)
        alive[:m] = True
        visited = _ssa_walk_states(
            jnp.asarray(origin),
            jnp.asarray(alive),
            jnp.asarray(float(t_budget), jnp.float64),
            jax.random.fold_in(rng, lo),
            model_props_fn,
            stoich,
            cap_val,
            max_steps,
        )
        st = np.asarray(visited).reshape(-1, d)
        st = np.unique(st[st[:, 0] >= 0], axis=0)
        if st.shape[0] == 0:
            continue
        keys_np = np.asarray(table.encoder.encode(jnp.asarray(st)))
        table, added = table.merge_keys(keys_np, st, max_capacity)
        added_total += added
    return table, added_total
