"""krylovfspssa_tpu — a TPU-native Krylov-FSP-SSA solver for the Chemical Master Equation.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
Fortran code (voduchuy/KrylovFspSsa): adaptive Finite State Projection of the
CME, EXPOKIT-style Arnoldi ``expv`` with adaptive step size and Krylov
dimension, SSA-driven state-space expansion, and probability-mass-based state
dropping — re-designed for TPU hardware:

* the state set is a dense, device-resident ``(capacity, n_species)`` array;
* membership is a sorted-int64-key table (searchsorted lookups) instead of a
  serial Brent hash table;
* the sparse CME operator is stored in *gather* (incoming-reaction ELL) form
  so the SpMV is a batched gather + row reduction — no scatters;
* the whole adaptive time-stepper runs inside ``jax.jit`` with
  ``lax.while_loop``; the host is only involved when the state set changes
  size (expansion/drop re-bucketing);
* multi-chip scaling row-partitions the state axis over a
  ``jax.sharding.Mesh`` (``shard_map`` + ``psum`` collectives).

Float64 is required for the FSP mass criterion (1 - wsum ~ 1e-6..1e-8), so
importing this package enables JAX x64 mode.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

from .config import SolverConfig
from .models.model import Model, load_model
from .solver import CmeSolver, SolveResult, solve_cme

__all__ = [
    "SolverConfig",
    "Model",
    "load_model",
    "CmeSolver",
    "SolveResult",
    "solve_cme",
]

__version__ = "0.1.0"
