"""On-device assembly of the sparse CME generator.

The reference stores the operator in *scatter* (outgoing-reaction ELL) form:
column i holds the propensities of state i and ``ADJ(k,i)`` points at the row
of x_i + nu_k, so the matvec scatters ``y(ADJ(k,i)) += OFFDIAG(k,i)*x(i)``
(``/root/reference/src/fsp/KrylovSolver.f90:577-607``, assembly in
``StateSpace.f90:200-244,301-343``).  Scatters serialize badly on TPU, so we
build the *transposed index set*: for each row i the incoming edges

    y[i] = sum_k  a_k(x_i - nu_k) * x[index(x_i - nu_k)]  -  diag[i] * x[i]

which makes the SpMV a batched gather + row reduction.  The matrix is the
same principal submatrix A_J of the CME generator: off-diagonal entries
exist only when both endpoints are inside the projection, and the diagonal
always carries the full outflow sum_k a_k(x_i) — mass flowing to states
outside the projection is lost, which is exactly the FSP truncation.

Assembly is one batched pass (propensities for all states, key arithmetic,
sorted-table lookups) instead of the reference's per-state hash-probe loop —
"regenerate, don't patch".
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..statespace.encoding import StateEncoder


class CmeOperator(NamedTuple):
    """Gather-form ELL representation of the projected CME generator.

    All arrays are padded to the state-table capacity; rows >= n are zero.
    """

    #: (cap,) float — total outflow rate of each state (diagonal)
    diag: jnp.ndarray
    #: (cap, R) int32 — row index of x_i - nu_k, or -1 when the predecessor
    #: is outside the projection / illegal
    pred_idx: jnp.ndarray
    #: (cap, R) float — a_k(x_i - nu_k) where pred_idx >= 0, else 0
    pred_prop: jnp.ndarray
    #: (cap, R) float — a_k(x_i) (outgoing propensities; used by SSA walks
    #: and for nnz bookkeeping)
    props: jnp.ndarray
    #: (cap, R) int32 — row index of x_i + nu_k, or -1 if absent/illegal
    #: (the reference ADJ; absent-vs-illegal is distinguished by succ_legal)
    succ_idx: jnp.ndarray
    #: (cap, R) bool — successor state is componentwise >= 0 and encodable
    succ_legal: jnp.ndarray
    #: number of active rows (traced scalar ok)
    n: jnp.ndarray


def lookup_keys(sorted_keys, sorted_to_row, queries):
    """Membership lookup: int64 keys -> row indices (or -1).

    ``sorted_keys`` is padded with INT64_MAX so searchsorted stays in-range;
    this replaces the reference's Brent hash probes (HashTable.f90:61-236)
    with one vectorized binary search.  Multi-word keys (shape (..., W),
    wide models — encoding.py) use an explicit lexicographic binary search.
    """
    if sorted_keys.ndim == 2:
        return _lookup_keys_wide(sorted_keys, sorted_to_row, queries)
    cap = sorted_keys.shape[0]
    pos = jnp.searchsorted(sorted_keys, queries)
    pos = jnp.clip(pos, 0, cap - 1)
    hit = (sorted_keys[pos] == queries) & (queries >= 0)
    return jnp.where(hit, sorted_to_row[pos], -1).astype(jnp.int32)


def _lex_less(a, b):
    """Lexicographic a < b over the trailing word axis (word 0 major)."""
    W = a.shape[-1]
    lt = jnp.zeros(a.shape[:-1], dtype=bool)
    eq = jnp.ones(a.shape[:-1], dtype=bool)
    for w in range(W):
        lt = lt | (eq & (a[..., w] < b[..., w]))
        eq = eq & (a[..., w] == b[..., w])
    return lt


def _lookup_keys_wide(sorted_keys, sorted_to_row, queries):
    """Vectorized lexicographic binary search over (cap, W) sorted keys
    (padded rows = all INT64_MAX).  ~log2(cap) gather rounds."""
    cap, W = sorted_keys.shape
    q = queries.reshape(-1, W)
    m = q.shape[0]
    lo = jnp.zeros((m,), jnp.int32)
    hi = jnp.full((m,), cap, jnp.int32)
    steps = int(np.ceil(np.log2(max(cap, 2)))) + 1
    for _ in range(steps):
        mid = (lo + hi) // 2
        a = sorted_keys[jnp.clip(mid, 0, cap - 1)]
        less = _lex_less(a, q)
        lo = jnp.where(less, jnp.minimum(mid + 1, hi), lo)
        hi = jnp.where(less, hi, mid)
    pos = jnp.clip(lo, 0, cap - 1)
    hit = jnp.all(sorted_keys[pos] == q, axis=-1) & (q[:, 0] >= 0)
    out = jnp.where(hit, sorted_to_row[pos], -1).astype(jnp.int32)
    return out.reshape(queries.shape[:-1])


def build_operator(
    states: jnp.ndarray,
    sorted_keys: jnp.ndarray,
    sorted_to_row: jnp.ndarray,
    n: jnp.ndarray,
    propensities_fn,
    stoichiometry: jnp.ndarray,
    encoder: StateEncoder,
    dtype=jnp.float64,
) -> CmeOperator:
    """Assemble the gather-form operator for the current state set.

    Args:
      states: (cap, d) int32 state table (rows >= n are padding).
      sorted_keys / sorted_to_row: sorted membership index over the table.
      n: active row count.
      propensities_fn: batched (cap, d) -> (cap, R) propensity evaluator.
      stoichiometry: (R, d) reaction state-changes.
      encoder: packed-key codec.
    """
    cap, d = states.shape
    stoich = jnp.asarray(stoichiometry, dtype=jnp.int32)
    R = stoich.shape[0]

    row_ids = jnp.arange(cap, dtype=jnp.int32)
    active = row_ids < n

    props = propensities_fn(states).astype(dtype)
    props = jnp.where(active[:, None], props, 0)
    diag = props.sum(axis=1)

    # successors: x + nu_k  (reference ADJ columns)
    succ = states[:, None, :].astype(jnp.int32) + stoich[None, :, :]
    succ_keys = encoder.encode(succ.reshape(cap * R, d))
    succ_legal = encoder.keys_valid(succ_keys).reshape(cap, R) & active[
        :, None
    ]
    succ_idx = lookup_keys(sorted_keys, sorted_to_row, succ_keys)
    succ_idx = succ_idx.reshape(cap, R)
    succ_idx = jnp.where(active[:, None], succ_idx, -1)

    # predecessors: x - nu_k (incoming edges; reference patches these rows
    # one at a time in ADD_STATE StateSpace.f90:240-244 — we recompute all)
    pred = states[:, None, :].astype(jnp.int32) - stoich[None, :, :]
    pred_keys = encoder.encode(pred.reshape(cap * R, d))
    pred_idx = lookup_keys(sorted_keys, sorted_to_row, pred_keys)
    pred_idx = pred_idx.reshape(cap, R)
    pred_idx = jnp.where(active[:, None], pred_idx, -1)

    # incoming propensity a_k(pred) = props[pred_row, k]: already evaluated,
    # just gather it (exactly the reference's OFFDIAG(k, pred_col))
    safe_pred = jnp.maximum(pred_idx, 0)
    pred_prop = jnp.stack(
        [props[safe_pred[:, k], k] for k in range(R)], axis=1
    )
    pred_prop = jnp.where(pred_idx >= 0, pred_prop, 0)

    return CmeOperator(
        diag=diag,
        pred_idx=pred_idx,
        pred_prop=pred_prop,
        props=props,
        succ_idx=succ_idx,
        succ_legal=succ_legal,
        n=jnp.asarray(n, dtype=jnp.int32),
    )


def operator_nnz(op: CmeOperator) -> jnp.ndarray:
    """Reference nnz estimate: (R+1) * n (KrylovSolver.f90:196,537)."""
    return (op.props.shape[1] + 1) * op.n
