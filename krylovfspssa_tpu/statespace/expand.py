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
    """Keys + states of all legal 1-step successors of active rows.

    Pure host (numpy) computation: the candidate sets are small bookkeeping
    arrays and eager device dispatches cost a tunnel round-trip each on
    remote backends (round-4 profiling).  ``merge_keys`` filters
    already-present keys, so no present-filter is needed here."""
    stoich = np.asarray(stoichiometry, dtype=np.int32)
    enc = table.encoder
    n, d = table.n, enc.n_species
    R = stoich.shape[0]
    succ = table.states[:n, None, :] + stoich[None, :, :]  # (n, R, d)
    succ = succ.reshape(n * R, d)
    keys = enc.encode_np(succ)  # illegal successors -> INVALID_KEY
    return keys, succ


def onestep_extend(
    table: StateTable, stoichiometry: np.ndarray, max_capacity: int | None
) -> tuple[StateTable, int]:
    """One round of 1-step reachability expansion."""
    keys, succ = onestep_candidates(table, stoichiometry)
    return table.merge_keys(keys, succ, max_capacity)


# ---------------------------------------------------------------- SSA ----


@partial(jax.jit, static_argnames=("max_steps", "props_fn", "encoder"))
def _ssa_walk(
    states,  # (chunk, d) int32 walk origins
    alive0,  # (chunk,) bool
    t_budget,  # scalar f64
    rng,  # PRNG key
    props_fn,  # static: (m, d) states -> (m, R) propensities
    stoich,  # (R, d) int32
    encoder,  # static: StateEncoder (frozen dataclass)
    max_steps: int,
):
    """Run Gillespie walks from each origin; return the visited-state
    record: (max_steps, chunk) packed int64 keys for single-word encoders
    (-1 where no visit — 1/3 the D2H volume of raw states), else
    (max_steps, chunk, d) int32 states."""
    chunk, d = states.shape
    R = stoich.shape[0]
    species_cap = jnp.int64(encoder.species_cap)

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
        if encoder.n_words == 1:
            emit = jnp.where(ok, encoder.encode(x_next), jnp.int64(-1))
        else:
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
    return emitted


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
    enc = table.encoder
    d = enc.n_species
    n = table.n
    added_total = 0
    for lo in range(0, n, chunk_size):
        hi = min(lo + chunk_size, n)
        m = hi - lo
        # pad the chunk to a power-of-two bucket (min 1024): each distinct
        # shape costs a full XLA compile, which dominated round-3 flagship
        # expansions (~20 s each on the remote backend)
        pad = max(1024, 1 << int(np.ceil(np.log2(max(m, 1)))))
        pad = min(pad, chunk_size)
        origin = np.zeros((pad, d), dtype=np.int32)
        origin[:m] = table.states[lo:hi]
        alive = np.zeros(pad, dtype=bool)
        alive[:m] = True
        visited = _ssa_walk(
            jnp.asarray(origin),
            jnp.asarray(alive),
            jnp.asarray(float(t_budget), jnp.float64),
            jax.random.fold_in(rng, lo),
            model_props_fn,
            stoich,
            enc,
            max_steps,
        )
        if enc.n_words == 1:
            keys_np = np.unique(np.asarray(visited).ravel())
            keys_np = keys_np[keys_np >= 0]
            if keys_np.shape[0] == 0:
                continue
            st = enc.decode_np(keys_np)
        else:
            st = np.asarray(visited).reshape(-1, d)
            st = np.unique(st[st[:, 0] >= 0], axis=0)
            if st.shape[0] == 0:
                continue
            keys_np = enc.encode_np(st)
        table, added = table.merge_keys(keys_np, st, max_capacity)
        added_total += added
    return table, added_total
