"""Packed int64 state keys.

The reference maps a state x to a 150-digit big-integer key
``2 + sum_k x_k * (B+1)^(k-1)`` with B = MAXNUMBERMOLECULES = 10000
(``/root/reference/src/hash_table/HashTable.f90:39-59``), paying big-number
arithmetic on every hash probe.  On TPU we pack the mixed-radix key into a
single int64 using *power-of-two* per-species radixes so encode/decode are
shifts and masks:

    key(x) = sum_k x_k << shift_k,        shift_k = k * bits_per_species

A state is *encodable* iff every component is in [0, cap] where
cap = 2**bits_per_species - 1 with ``bits_per_species`` sized to cover
``max_molecules`` (reference parity: the per-species count cap,
MAXNUMBERMOLECULES).  When the full-width packing does not fit in one
62-bit word (more than 4 species at the reference cap of 10000), keys
become **multi-word**: shape (..., n_words) int64 with at most
``62 // bits`` species per word — the packed-radix replacement for the
reference's 150-digit bignum keys (big_integer_module.f90), still fully
device-native (membership is a vectorized lexicographic binary search,
ops/operator.py:lookup_keys).

Sentinel: key -1 (all words -1) denotes "invalid / empty slot"; all valid
words are >= 0 so (lexicographic) sort order == state order.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

#: keys are signed int64; keep a sign bit plus headroom
_MAX_TOTAL_BITS = 62

#: sentinel for "no state" (sorts after every valid key)
INVALID_KEY = np.int64(-1)


@dataclasses.dataclass(frozen=True)
class StateEncoder:
    """Bijective packing of bounded nonnegative integer states into one or
    more int64 key words.

    ``n_words == 1`` (every bundled model at the fitted width) keeps keys
    as plain (n,) int64 — the fast path.  Wider models get (n, n_words)
    keys: species s lives in word ``s // species_per_word`` at shift
    ``(s % species_per_word) * bits``.
    """

    n_species: int
    bits_per_species: int
    n_words: int = 1

    @classmethod
    def for_model(
        cls, n_species: int, max_molecules: int = 10_000
    ) -> "StateEncoder":
        bits = int(np.ceil(np.log2(max_molecules + 1)))
        per_word = max(1, _MAX_TOTAL_BITS // bits)
        n_words = -(-n_species // per_word)
        return cls(
            n_species=n_species, bits_per_species=bits, n_words=n_words
        )

    @property
    def species_cap(self) -> int:
        """Largest representable molecule count per species."""
        return (1 << self.bits_per_species) - 1

    @property
    def species_per_word(self) -> int:
        return max(1, _MAX_TOTAL_BITS // self.bits_per_species)

    @property
    def word_of_species(self) -> np.ndarray:
        return (
            np.arange(self.n_species, dtype=np.int64) // self.species_per_word
        )

    @property
    def shifts(self) -> np.ndarray:
        """Shift of each species within its own key word."""
        return (
            np.arange(self.n_species, dtype=np.int64) % self.species_per_word
        ) * self.bits_per_species

    def keys_valid(self, keys) -> jnp.ndarray:
        """(...,) bool — keys are valid iff every word is >= 0 (invalid
        keys have all words set to -1)."""
        keys = jnp.asarray(keys)
        if self.n_words == 1:
            return keys >= 0
        return keys[..., 0] >= 0

    def invalidate(self, keys, cond) -> jnp.ndarray:
        """Set keys to INVALID where ``cond`` holds."""
        keys = jnp.asarray(keys)
        if self.n_words == 1:
            return jnp.where(cond, jnp.int64(INVALID_KEY), keys)
        return jnp.where(cond[..., None], jnp.int64(INVALID_KEY), keys)

    def encode(self, states) -> jnp.ndarray:
        """(n, d) int array -> (n,) [or (n, n_words)] int64 keys;
        out-of-range states map to INVALID_KEY (the reference's
        out-of-bounds key-0 flag, HashTable.f90:44-52)."""
        states = jnp.asarray(states, dtype=jnp.int64)
        shifts = jnp.asarray(self.shifts)
        valid = jnp.all(
            (states >= 0) & (states <= self.species_cap), axis=-1
        )
        safe = jnp.where(valid[..., None], states, 0) << shifts
        if self.n_words == 1:
            key = jnp.sum(safe, axis=-1)
            return jnp.where(valid, key, jnp.int64(INVALID_KEY))
        words = []
        wos = self.word_of_species
        for w in range(self.n_words):
            sel = jnp.asarray(wos == w)
            words.append(jnp.sum(jnp.where(sel, safe, 0), axis=-1))
        key = jnp.stack(words, axis=-1)
        return jnp.where(valid[..., None], key, jnp.int64(INVALID_KEY))

    def encode_np(self, states: np.ndarray) -> np.ndarray:
        """Host (numpy) mirror of :meth:`encode` — used by the host-side
        table/expansion machinery so state-set mutations never pay an
        eager device dispatch (round-4: on remote backends each eager op
        is a tunnel round-trip)."""
        states = np.asarray(states, dtype=np.int64)
        shifts = self.shifts
        valid = np.all((states >= 0) & (states <= self.species_cap), axis=-1)
        safe = np.where(valid[..., None], states, 0) << shifts
        if self.n_words == 1:
            key = safe.sum(axis=-1)
            return np.where(valid, key, INVALID_KEY)
        wos = self.word_of_species
        key = np.stack(
            [safe[..., wos == w].sum(axis=-1) for w in range(self.n_words)],
            axis=-1,
        )
        return np.where(valid[..., None], key, INVALID_KEY)

    def decode_np(self, keys: np.ndarray) -> np.ndarray:
        """Host (numpy) mirror of :meth:`decode`."""
        keys = np.asarray(keys, dtype=np.int64)
        shifts = self.shifts
        mask = np.int64(self.species_cap)
        if self.n_words == 1:
            comps = (keys[..., None] >> shifts) & mask
            valid = keys >= 0
            return np.where(valid[..., None], comps, 0).astype(np.int32)
        wos = self.word_of_species
        words = np.take_along_axis(
            keys, np.broadcast_to(wos, keys.shape[:-1] + wos.shape), axis=-1
        )
        comps = (words >> shifts) & mask
        valid = keys[..., 0] >= 0
        return np.where(valid[..., None], comps, 0).astype(np.int32)

    def decode(self, keys) -> jnp.ndarray:
        """keys -> (n, d) int32 states (invalid keys -> zeros)."""
        keys = jnp.asarray(keys, dtype=jnp.int64)
        shifts = jnp.asarray(self.shifts)
        mask = jnp.int64(self.species_cap)
        if self.n_words == 1:
            comps = (keys[..., None] >> shifts) & mask
            valid = keys >= 0
            return jnp.where(valid[..., None], comps, 0).astype(jnp.int32)
        wos = jnp.asarray(self.word_of_species)
        words = jnp.take_along_axis(
            keys, jnp.broadcast_to(wos, keys.shape[:-1] + wos.shape), axis=-1
        )
        comps = (words >> shifts) & mask
        valid = keys[..., 0] >= 0
        return jnp.where(valid[..., None], comps, 0).astype(jnp.int32)

    def reaction_deltas(self, stoichiometry: np.ndarray) -> np.ndarray:
        """Per-reaction key increments: key(x + nu_r) = key(x) + delta_r
        (per word) whenever both states are encodable — the packed-radix
        analog of the reference's REACTIONKEY/RKEYSIGN
        (StateSpace.f90:635-669)."""
        stoich = np.asarray(stoichiometry, dtype=np.int64)
        shifted = stoich << self.shifts[None, :]
        if self.n_words == 1:
            return shifted.sum(axis=1)
        wos = self.word_of_species
        return np.stack(
            [shifted[:, wos == w].sum(axis=1) for w in range(self.n_words)],
            axis=1,
        )
