"""Masked power-of-two box state space — the TPU-native FSP representation.

The reference stores the FSP as an explicit hashed state list with a
pointer-linked sparse matrix (``/root/reference/src/state_space/
StateSpace.f90``).  On TPU, irregular gathers are element-serial, so the
flagship representation here is different: the projection lives inside an
axis-aligned box with power-of-two extents; a cell's flat index *is* its
packed state (coordinates decode by shift/mask), and membership is a bool
mask over the box.  Consequences:

  * the CME SpMV becomes a *stencil*: state x - nu_k sits at constant flat
    offset ``-offset_k``, so each reaction contributes a shifted elementwise
    multiply — no gathers, no stored matrix (propensities are recomputed
    from coordinates on the fly);
  * dropping states = clearing mask bits; 1-step FSP expansion = dilating
    the mask by the legal-move stencil — both pure elementwise device ops
    with no host round-trip and no re-indexing;
  * the box grows by doubling one axis when mass approaches its face —
    a rare, host-visible reshape (the only recompile event).

Axis order is chosen per model to minimize the largest |flat offset| so the
Pallas SpMV's VMEM window stays small: species are permuted by brute force
over all d! orders (d <= ~8).
"""

from __future__ import annotations

import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BoxSpace:
    """Geometry of the masked box: axis permutation, log2 sizes, offsets."""

    n_species: int
    #: axis_of_species[s] = box axis carrying species s (0 = slowest)
    axis_of_species: tuple[int, ...]
    #: log2 extent per axis
    log2: tuple[int, ...]
    #: (R, d) stoichiometry (species order)
    stoichiometry: np.ndarray

    # ------------------------------------------------------------------ #

    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(1 << b for b in self.log2)

    @property
    def volume(self) -> int:
        return 1 << sum(self.log2)

    @property
    def strides(self) -> np.ndarray:
        sh = self.shape
        return np.cumprod((1,) + sh[::-1][:-1]).astype(np.int64)[::-1]

    @property
    def shift_of_species(self) -> np.ndarray:
        """log2(stride) of each species' axis."""
        stride_bits = np.log2(self.strides).astype(np.int64)
        return np.array(
            [stride_bits[self.axis_of_species[s]] for s in range(self.n_species)]
        )

    @property
    def bits_of_species(self) -> np.ndarray:
        return np.array(
            [self.log2[self.axis_of_species[s]] for s in range(self.n_species)]
        )

    @property
    def extents(self) -> np.ndarray:
        """Per-species extent (max count + 1)."""
        return 1 << self.bits_of_species

    @property
    def offsets(self) -> np.ndarray:
        """Flat-index change per reaction: idx(x + nu_k) = idx(x) + offsets[k]."""
        sh = self.shift_of_species
        return (self.stoichiometry.astype(np.int64) << sh[None, :]).sum(axis=1)

    # ------------------------------------------------------------------ #

    @classmethod
    def for_model(
        cls,
        stoichiometry: np.ndarray,
        initial_states: np.ndarray,
        min_log2: int = 2,
    ) -> "BoxSpace":
        """Choose the axis permutation minimizing max |offset| and initial
        extents covering the seed states."""
        stoich = np.asarray(stoichiometry, dtype=np.int64)
        d = stoich.shape[1]
        init = np.atleast_2d(np.asarray(initial_states))
        need = init.max(axis=0) + 1
        log2_sp = np.maximum(min_log2, np.ceil(np.log2(need + 1)).astype(int))

        best = None
        for perm in itertools.permutations(range(d)):
            # perm[axis] = species on that axis; species s sits on axis
            # inverse_perm[s]
            axis_of = [0] * d
            for ax, sp in enumerate(perm):
                axis_of[sp] = ax
            lg = tuple(int(log2_sp[perm[ax]]) for ax in range(d))
            cand = cls(
                n_species=d,
                axis_of_species=tuple(axis_of),
                log2=lg,
                stoichiometry=stoich,
            )
            m = np.abs(cand.offsets).max()
            if best is None or m < best[0]:
                best = (m, cand)
        return best[1]

    # ------------------------------------------------------------------ #

    def flat_index(self, states) -> jnp.ndarray:
        """(n, d) states -> flat cell indices (-1 if outside the box)."""
        states = jnp.asarray(states, dtype=jnp.int64)
        sh = jnp.asarray(self.shift_of_species)
        ext = jnp.asarray(self.extents)
        ok = jnp.all((states >= 0) & (states < ext), axis=-1)
        idx = jnp.sum(jnp.where(ok[..., None], states, 0) << sh, axis=-1)
        return jnp.where(ok, idx, -1)

    def species_counts(self, flat, dtype=jnp.float64) -> list[jnp.ndarray]:
        """Decode species copy-numbers from flat indices (shift/mask)."""
        out = []
        for s in range(self.n_species):
            sh = int(self.shift_of_species[s])
            bits = int(self.bits_of_species[s])
            out.append(((flat >> sh) & ((1 << bits) - 1)).astype(dtype))
        return out

    def coords_iota(self, dtype=jnp.float64) -> list[jnp.ndarray]:
        """Per-species coordinate arrays over the whole (flat) box."""
        flat = jax.lax.broadcasted_iota(jnp.int64, (self.volume, 1), 0)[:, 0]
        return self.species_counts(flat, dtype)

    def states_array(self) -> jnp.ndarray:
        """(volume, d) int32 state of every cell (for batched model eval)."""
        cols = self.coords_iota(jnp.int32)
        return jnp.stack(cols, axis=1)

    def grow(self, species: int) -> "BoxSpace":
        """Double the extent of one species' axis."""
        ax = self.axis_of_species[species]
        lg = list(self.log2)
        lg[ax] += 1
        return dataclasses.replace(self, log2=tuple(lg))

    def shrink(self, species: int) -> "BoxSpace":
        """Halve the extent of one species' axis (caller must have checked
        that no active cell lies in the upper half)."""
        ax = self.axis_of_species[species]
        lg = list(self.log2)
        lg[ax] -= 1
        return dataclasses.replace(self, log2=tuple(lg))

    def embed(self, old: "BoxSpace", arr_old: jnp.ndarray, fill=0):
        """Re-embed a flat array from another box into this one.

        Both boxes must share the axis permutation; each shared axis range
        is a prefix.  Axes that grew are padded with ``fill``; axes that
        shrank are truncated (the caller guarantees the truncated region is
        inactive).
        """
        assert old.axis_of_species == self.axis_of_species
        a = arr_old.reshape(old.shape)
        a = a[tuple(slice(0, min(ns, os)) for ns, os in zip(self.shape, old.shape))]
        pads = [(0, max(0, ns - os)) for ns, os in zip(self.shape, old.shape)]
        a = jnp.pad(a, pads, constant_values=fill)
        return a.reshape(self.volume)
