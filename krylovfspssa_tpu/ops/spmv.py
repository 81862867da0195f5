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


def spmv(op: CmeOperator, x: jnp.ndarray) -> jnp.ndarray:
    """y = A_J @ x with A_J the projected CME generator.

    y[i] = sum_k pred_prop[i,k] * x[pred_idx[i,k]] - diag[i] * x[i]
    """
    safe = jnp.maximum(op.pred_idx, 0)
    gathered = x[safe]  # (cap, R)
    inflow = jnp.sum(op.pred_prop * gathered, axis=1)
    return inflow - op.diag * x
