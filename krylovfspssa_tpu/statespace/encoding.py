"""Packed int64 state keys.

The reference maps a state x to a 150-digit big-integer key
``2 + sum_k x_k * (B+1)^(k-1)`` with B = MAXNUMBERMOLECULES = 10000
(``/root/reference/src/hash_table/HashTable.f90:39-59``), paying big-number
arithmetic on every hash probe.  On TPU we pack the mixed-radix key into a
single int64 using *power-of-two* per-species radixes so encode/decode are
shifts and masks:

    key(x) = sum_k x_k << shift_k,        shift_k = k * bits_per_species

A state is *encodable* iff every component is in [0, cap] where
cap = 2**bits_per_species - 1.  ``bits_per_species`` is chosen as the
largest value with n_species * bits <= 62, capped so that
cap <= max_molecules (reference parity: the per-species count cap).  For
every bundled model this loses nothing (6 species -> cap 1023 >> any
reachable count); key spaces needing more than 62 bits would need the
(future) double-word key path and currently raise.

Sentinel: key -1 (all ones) denotes "invalid / empty slot"; all valid keys
are >= 0 so int64 sort order == lexicographic state order.
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
    """Bijective packing of bounded nonnegative integer states into int64."""

    n_species: int
    bits_per_species: int

    @classmethod
    def for_model(cls, n_species: int, max_molecules: int = 10_000) -> "StateEncoder":
        bits_cap = int(np.ceil(np.log2(max_molecules + 1)))
        bits = min(bits_cap, _MAX_TOTAL_BITS // n_species)
        if bits < 1:
            raise ValueError(
                f"cannot pack {n_species} species into {_MAX_TOTAL_BITS} key "
                "bits; double-word keys not implemented yet"
            )
        return cls(n_species=n_species, bits_per_species=bits)

    @property
    def species_cap(self) -> int:
        """Largest representable molecule count per species."""
        return (1 << self.bits_per_species) - 1

    @property
    def shifts(self) -> np.ndarray:
        return np.arange(self.n_species, dtype=np.int64) * self.bits_per_species

    def encode(self, states) -> jnp.ndarray:
        """(n, d) int array -> (n,) int64 keys; out-of-range states map to
        INVALID_KEY (the reference's out-of-bounds key-0 flag,
        HashTable.f90:44-52)."""
        states = jnp.asarray(states, dtype=jnp.int64)
        shifts = jnp.asarray(self.shifts)
        valid = jnp.all(
            (states >= 0) & (states <= self.species_cap), axis=-1
        )
        key = jnp.sum(
            jnp.where(valid[..., None], states, 0) << shifts, axis=-1
        )
        return jnp.where(valid, key, jnp.int64(INVALID_KEY))

    def decode(self, keys) -> jnp.ndarray:
        """(n,) int64 keys -> (n, d) int32 states (invalid keys -> zeros)."""
        keys = jnp.asarray(keys, dtype=jnp.int64)
        shifts = jnp.asarray(self.shifts)
        mask = jnp.int64(self.species_cap)
        comps = (keys[..., None] >> shifts) & mask
        valid = keys >= 0
        return jnp.where(valid[..., None], comps, 0).astype(jnp.int32)

    def reaction_deltas(self, stoichiometry: np.ndarray) -> np.ndarray:
        """Per-reaction key increments: key(x + nu_r) = key(x) + delta_r
        whenever both states are encodable — the packed-radix analog of the
        reference's REACTIONKEY/RKEYSIGN (StateSpace.f90:635-669)."""
        stoich = np.asarray(stoichiometry, dtype=np.int64)
        return (stoich << self.shifts[None, :]).sum(axis=1)
