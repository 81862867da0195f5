"""Multi-chip scaling: mesh construction and row-partitioned kernels.

The state dimension n (probability-vector length) is the single parallel
axis of the Krylov-FSP-SSA math; ``sharded.py`` row-partitions the
probability vector, Krylov basis, and operator over a 1-D device mesh via
``jit`` + ``NamedSharding`` annotations (GSPMD inserts the psum reductions
and the boundary collective-permutes / all-gathers for off-shard SpMV
reads).
"""

__all__ = [
    "make_mesh",
    "operator_shardings",
    "shard_operator",
    "sharded_matvec",
    "sharded_step_fn",
]


def __getattr__(name):
    if name in __all__:
        from . import sharded

        return getattr(sharded, name)
    raise AttributeError(name)
