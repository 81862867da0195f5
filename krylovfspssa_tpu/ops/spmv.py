"""Sparse matrix-vector product for the gather-form CME operator.

The reference matvec is a serial scatter loop
(``/root/reference/src/fsp/KrylovSolver.f90:577-607``); here it is a single
batched gather + row reduction, which XLA fuses into one HBM-bandwidth-bound
kernel on TPU: stream ``pred_idx``/``pred_prop``/``diag`` once, gather x.
This is the portable XLA path and the numerical ground truth; the TPU-tuned
hot path is the masked-box *stencil* backend (ops/stencil.py +
ops/pallas_stencil.py), which needs no stored matrix at all.
"""

from __future__ import annotations

import jax.numpy as jnp

from .operator import CmeOperator
from .pencil import PencilOperator, pencil_matvec


def spmv(op, x: jnp.ndarray) -> jnp.ndarray:
    """y = A_J @ x with A_J the projected CME generator.

    Dispatches on the operator representation: gather-ELL (CmeOperator —
    y[i] = sum_k pred_prop[i,k] * x[pred_idx[i,k]] - diag[i] * x[i]) or
    pencil (PencilOperator — row gathers + static lane shifts; the
    support-adapted form that avoids XLA:TPU's serialized per-element
    gathers, ops/pencil.py).  Dispatch happens at trace time; jit caches
    key on the pytree structure, so both forms coexist.
    """
    if isinstance(op, PencilOperator):
        return pencil_matvec(op, x)
    safe = jnp.maximum(op.pred_idx, 0)
    gathered = x[safe]  # (cap, R)
    inflow = jnp.sum(op.pred_prop * gathered, axis=1)
    return inflow - op.diag * x


def operator_nreactions(op) -> int:
    """Reaction count R of either operator representation (static)."""
    if isinstance(op, PencilOperator):
        return op.pred_prop.shape[0]
    return op.props.shape[1]
