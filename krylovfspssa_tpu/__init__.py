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

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the fused main-loop executable is large
# (nested while_loops + emulated-f64 expm) and can take minutes to compile
# on a TPU backend; caching it on disk makes every solve after the first
# start instantly.  Opt out with KFS_NO_COMPILE_CACHE=1 or point
# KFS_COMPILE_CACHE_DIR elsewhere (JAX's own JAX_COMPILATION_CACHE_DIR
# takes precedence if the user set it).
if not _os.environ.get("KFS_NO_COMPILE_CACHE"):
    if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
        # default dir is keyed per host CPU: XLA:CPU AOT entries embed the
        # compile machine's feature set, and loading them on a different
        # host logs feature-mismatch errors and risks SIGILL
        def _host_tag():
            import hashlib
            import platform as _pf

            tag = _pf.machine()
            try:
                with open("/proc/cpuinfo") as fh:
                    for line in fh:
                        if line.startswith("flags"):
                            tag += hashlib.sha1(
                                line.encode()
                            ).hexdigest()[:8]
                            break
            except OSError:
                pass
            return tag

        _cache_dir = _os.environ.get(
            "KFS_COMPILE_CACHE_DIR",
            _os.path.join(
                _os.path.expanduser("~"), ".cache",
                f"kfs_jax_cache_{_host_tag()}",
            ),
        )
        try:
            _os.makedirs(_cache_dir, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        except OSError:
            pass
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # keep only the JAX-level executable cache; XLA's nested AOT caches
    # key on exact host CPU feature flags and spam mismatch warnings when
    # test (CPU) and bench (TPU tunnel) processes share the directory
    try:
        _jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:
        pass

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
