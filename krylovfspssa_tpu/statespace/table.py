"""Device-resident FSP state table.

Replaces the reference's Brent hash table + incremental single-state
insertion (``/root/reference/src/hash_table/HashTable.f90``,
``StateSpace.f90:136-246``) with a TPU-friendly design:

* the state set is a dense (capacity, d) int32 array plus packed int64 keys;
* membership queries are vectorized binary searches over a sorted key view
  (one ``searchsorted`` for a whole batch of queries);
* insertions are *batched merges*: dedup the candidates, append, re-sort —
  "regenerate, don't patch";
* capacities are bucketed (powers of two) so jitted consumers recompile only
  on bucket growth, not on every size change.

Newly appended states keep append order (reference parity: ADD_STATE appends
at FSP%SIZE+1); dropping compacts while preserving relative order
(DROP_STATES, StateSpace.f90:497-546).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .encoding import StateEncoder

#: padding value for the sorted-key view; larger than any valid key
_KEY_PAD = np.int64(np.iinfo(np.int64).max)


@dataclasses.dataclass
class StateTable:
    """Padded state table + sorted membership index.

    All arrays are HOST (numpy) arrays: the table is pure bookkeeping, and
    on remote device backends every eager device op is a tunnel round-trip
    (round-4 profiling: the expansion path's eager dispatches dominated the
    flagship wall).  Device consumers (operator assembly, the fused solve
    loop) receive these arrays as jit arguments, which handles H2D once
    per state-set mutation.

    ``host_index`` is the native C++ hash table (HashTable.f90 parity,
    native/kfs_hash.cpp) mirroring key -> row; it lets ``merge_keys`` filter
    and dedup candidates without a sort.  Tables are used linearly by the
    solver: a merge mutates the shared host index, so the *pre-merge*
    table's host lookups become stale (arrays stay immutable).
    """

    encoder: StateEncoder
    capacity: int
    n: int
    states: np.ndarray  #: (capacity, d) int32, rows >= n are zero
    keys: np.ndarray  #: (capacity,) int64, rows >= n are INVALID (-1)
    sorted_keys: np.ndarray  #: (capacity,) int64 ascending, padded KEY_PAD
    sorted_to_row: np.ndarray  #: (capacity,) int32
    host_index: object | None = None

    # ------------------------------------------------------------------ #

    @classmethod
    def from_states(
        cls,
        states,
        encoder: StateEncoder,
        capacity: int,
        max_capacity: int | None = None,
    ) -> "StateTable":
        states = np.asarray(states, dtype=np.int32)
        if states.ndim != 2 or states.shape[1] != encoder.n_species:
            raise ValueError(f"states shape {states.shape} invalid")
        keys = encoder.encode_np(states)
        if np.any(_keys_invalid(keys, encoder)):
            raise ValueError("initial states out of encodable range")
        # dedup, preserving first-occurrence order
        if encoder.n_words == 1:
            _, first = np.unique(keys, return_index=True)
        else:
            _, first = np.unique(keys, axis=0, return_index=True)
        order = np.sort(first)
        states = states[order]
        keys = keys[order]
        n = states.shape[0]
        capacity = _bucket(n, capacity, max_capacity)
        return cls._build(states, keys, n, capacity, encoder)

    @classmethod
    def _build(
        cls, states_np, keys_np, n, capacity, encoder, host_index="rebuild"
    ) -> "StateTable":
        d = encoder.n_species
        W = encoder.n_words
        st = np.zeros((capacity, d), dtype=np.int32)
        st[:n] = states_np[:n]
        key_shape = (capacity,) if W == 1 else (capacity, W)
        ky = np.full(key_shape, -1, dtype=np.int64)
        ky[:n] = keys_np[:n]
        if W == 1:
            sort_src = np.where(ky >= 0, ky, _KEY_PAD)
            perm = np.argsort(sort_src, kind="stable").astype(np.int32)
        else:
            sort_src = np.where(ky[:, :1] >= 0, ky, _KEY_PAD)
            # lexicographic with word 0 major (np.lexsort: last key primary)
            perm = np.lexsort(
                tuple(sort_src[:, w] for w in range(W - 1, -1, -1))
            ).astype(np.int32)
        if host_index == "rebuild":
            host_index = None
            if W == 1:
                try:
                    from ..native import NativeHashTable, available

                    if available():
                        host_index = NativeHashTable(max(64, 2 * int(n)))
                        host_index.insert(
                            keys_np[:n], np.arange(int(n), dtype=np.int32)
                        )
                except Exception:
                    host_index = None
        return cls(
            encoder=encoder,
            capacity=capacity,
            n=int(n),
            states=st,
            keys=ky,
            sorted_keys=sort_src[perm],
            sorted_to_row=perm,
            host_index=host_index,
        )

    # ------------------------------------------------------------------ #

    def lookup(self, query_keys) -> np.ndarray:
        """Batch membership: int64 keys -> row indices or -1 (host-side:
        native hash when available, else numpy binary search)."""
        q = np.asarray(query_keys)
        W = self.encoder.n_words
        if W == 1 and self.host_index is not None:
            return self.host_index.lookup(np.ascontiguousarray(q, np.int64))
        if W == 1:
            pos = np.searchsorted(self.sorted_keys, q)
            pos = np.clip(pos, 0, self.capacity - 1)
            hit = (self.sorted_keys[pos] == q) & (q >= 0)
            return np.where(hit, self.sorted_to_row[pos], -1).astype(np.int32)
        # multi-word: vectorized lexicographic binary search (host mirror
        # of ops/operator.py:_lookup_keys_wide)
        cap = self.capacity
        qf = q.reshape(-1, W)
        m = qf.shape[0]
        lo = np.zeros(m, np.int64)
        hi = np.full(m, cap, np.int64)
        steps = int(np.ceil(np.log2(max(cap, 2)))) + 1
        for _ in range(steps):
            mid = (lo + hi) // 2
            a = self.sorted_keys[np.clip(mid, 0, cap - 1)]
            lt = np.zeros(m, bool)
            eq = np.ones(m, bool)
            for w in range(W):
                lt |= eq & (a[:, w] < qf[:, w])
                eq &= a[:, w] == qf[:, w]
            lo = np.where(lt, np.minimum(mid + 1, hi), lo)
            hi = np.where(lt, hi, mid)
        pos = np.clip(lo, 0, cap - 1)
        hit = np.all(self.sorted_keys[pos] == qf, axis=-1) & (qf[:, 0] >= 0)
        out = np.where(hit, self.sorted_to_row[pos], -1).astype(np.int32)
        return out.reshape(q.shape[:-1])

    def lookup_states(self, states) -> np.ndarray:
        return self.lookup(self.encoder.encode_np(np.asarray(states)))

    def merge_keys(
        self, new_keys, new_states, max_capacity: int | None = None
    ) -> tuple["StateTable", int]:
        """Append previously-absent states; returns (table, n_added).

        ``new_keys`` may contain duplicates, invalid (-1) keys, and keys
        already present — all are filtered.
        """
        new_keys = np.asarray(new_keys)
        new_states = np.asarray(new_states, dtype=np.int32)
        if self.host_index is not None:
            # native path: present-filter + dedup + row assignment in one
            # C call, no device round-trip (the index is mutated in place)
            rows, n_fresh = self.host_index.assign_fresh(new_keys, self.n)
            if n_fresh == 0:
                return self, 0
            take = rows >= 0
            order = np.argsort(rows[take], kind="stable")
            cand_keys = new_keys[take][order]
            cand_states = new_states[take][order]
            reuse_index = self.host_index
        else:
            present = self.lookup(new_keys)
            fresh = (present < 0) & ~_keys_invalid(new_keys, self.encoder)
            cand_keys = new_keys[fresh]
            cand_states = new_states[fresh]
            if cand_keys.shape[0] == 0:
                return self, 0
            if self.encoder.n_words == 1:
                _, first = np.unique(cand_keys, return_index=True)
            else:
                _, first = np.unique(cand_keys, axis=0, return_index=True)
            order = np.sort(first)
            cand_keys = cand_keys[order]
            cand_states = cand_states[order]
            reuse_index = "rebuild"
        n_new = self.n + cand_keys.shape[0]
        capacity = _bucket(n_new, self.capacity, max_capacity)
        states_np = np.asarray(self.states[: self.n])
        keys_np = np.asarray(self.keys[: self.n])
        all_states = np.concatenate([states_np, cand_states], axis=0)
        all_keys = np.concatenate([keys_np, cand_keys], axis=0)
        table = StateTable._build(
            all_states, all_keys, n_new, capacity, self.encoder,
            host_index=reuse_index,
        )
        return table, int(cand_keys.shape[0])

    def compact(self, keep_mask) -> tuple["StateTable", np.ndarray]:
        """Drop rows where keep_mask is False (order-preserving).

        Returns (table, old_row -> new_row int32 map with -1 for dropped).
        Capacity is kept (no shrink) to avoid recompilation churn.
        """
        keep = np.asarray(keep_mask)[: self.n]
        states_np = np.asarray(self.states[: self.n])[keep]
        keys_np = np.asarray(self.keys[: self.n])[keep]
        remap = np.full(self.n, -1, dtype=np.int32)
        remap[keep] = np.arange(states_np.shape[0], dtype=np.int32)
        table = StateTable._build(
            states_np, keys_np, states_np.shape[0], self.capacity, self.encoder
        )
        return table, remap


def _keys_invalid(keys: np.ndarray, encoder: StateEncoder) -> np.ndarray:
    """Invalid-key mask for single- or multi-word host key arrays."""
    if encoder.n_words == 1:
        return keys < 0
    return keys[..., 0] < 0


def _bucket(n: int, current: int, max_capacity: int | None) -> int:
    """Smallest power-of-two bucket >= max(n, current)."""
    cap = max(current, 1)
    while cap < n:
        cap *= 2
    if max_capacity is not None and cap > max_capacity:
        if n > max_capacity:
            raise OverflowError(
                f"FSP size {n} exceeds the configured maximum "
                f"{max_capacity} states (reference: hard STOP on overflow, "
                "StateSpace.f90:389)"
            )
        cap = max_capacity
    return cap
