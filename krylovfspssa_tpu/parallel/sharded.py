"""Row-partitioned multi-chip execution of the Krylov-FSP-SSA solver.

The single parallel axis in the Krylov-FSP-SSA math is the state dimension
n — the probability vector, the Krylov basis, and the CME operator all
scale with it (the reference is single-core Fortran; this layer has no
reference counterpart and follows the standard JAX scaling recipe: pick a
mesh, annotate shardings, let XLA insert the collectives).

Sharding layout over a 1-D mesh axis ``"s"`` (state axis):

  * ``w`` (cap,)            -> P("s")          row-partitioned
  * ``V`` (m_max+2, cap)    -> P(None, "s")    basis rows partitioned
  * operator arrays (cap,*) -> P("s", ...)     rows partitioned
  * ``H``, ``E`` (small)    -> replicated

Under ``jit`` with these shardings XLA turns the SpMV's x-gather into an
all-gather over ICI and the Arnoldi dot products into psums — exactly the
collectives described in SURVEY.md §2 (parallelism inventory).  A Pallas
halo-exchange SpMV that avoids the full all-gather is the planned
optimization once profiles justify it.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SolverConfig
from ..krylov.stepper import make_step_fn
from ..ops.spmv import spmv
from ..ops.operator import CmeOperator

STATE_AXIS = "s"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D device mesh over the state axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (STATE_AXIS,))


def operator_shardings(mesh: Mesh) -> CmeOperator:
    """A CmeOperator pytree of NamedShardings (rows partitioned)."""
    row = NamedSharding(mesh, P(STATE_AXIS))
    row2 = NamedSharding(mesh, P(STATE_AXIS, None))
    rep = NamedSharding(mesh, P())
    return CmeOperator(
        diag=row,
        pred_idx=row2,
        pred_prop=row2,
        props=row2,
        succ_idx=row2,
        succ_legal=row2,
        n=rep,
    )


def shard_operator(op: CmeOperator, mesh: Mesh) -> CmeOperator:
    sh = operator_shardings(mesh)
    return jax.tree.map(jax.device_put, op, sh)


def sharded_matvec(mesh: Mesh):
    """jit-compiled SpMV with the row-partitioned layout."""
    row = NamedSharding(mesh, P(STATE_AXIS))
    return jax.jit(
        spmv,
        in_shardings=(operator_shardings(mesh), row),
        out_shardings=row,
    )


def sharded_step_fn(mesh: Mesh, config: SolverConfig):
    """The full adaptive step (krylov/stepper.py) compiled with the
    row-partitioned layout; scalars/H replicated, vectors sharded."""
    step = make_step_fn(lambda op: (lambda x: spmv(op, x)), config)
    row = NamedSharding(mesh, P(STATE_AXIS))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(
            operator_shardings(mesh),
            row,
            jax.tree.map(lambda _: rep, _carry_struct()),
            rep,
            rep,
            rep,
        ),
    )


def _carry_struct():
    from ..krylov.stepper import initial_carry

    return initial_carry(1.0, 1.0, 1e-8, 1.0, 10)


# ---------------------------------------------------------------- box ----


def sharded_box_step_fn(mesh: Mesh, model, box, config: SolverConfig):
    """The box-backend adaptive step with the flat cell axis partitioned.

    The stencil matvec's shifted reads (jnp.roll) become XLA
    collective-permutes of the shard boundaries over ICI; the mask is
    row-partitioned alongside w; everything else replicates.  Returns
    step(mask, w, carry, t_out, fsptol, krytol).
    """
    import jax.numpy as jnp

    from ..ops.stencil import make_stencil_matvec

    dtype = (
        jnp.float64 if config.resolved_dtype() == "float64" else jnp.float32
    )
    matvec = make_stencil_matvec(model, box, dtype)
    R = model.n_reactions
    step = make_step_fn(
        lambda mask: (lambda x: matvec(mask, x)),
        config,
        op_info=lambda mask: (
            jnp.sum(mask).astype(jnp.int32),
            R,
        ),
    )
    row = NamedSharding(mesh, P(STATE_AXIS))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(
            row,  # mask
            row,  # w
            jax.tree.map(lambda _: rep, _carry_struct()),
            rep,
            rep,
            rep,
        ),
    )


def sharded_dilate_fn(mesh: Mesh, box):
    """Mask dilation (1-step FSP expansion) with the cell axis partitioned."""
    from ..ops.stencil import dilate_mask

    row = NamedSharding(mesh, P(STATE_AXIS))
    return jax.jit(
        lambda m: dilate_mask(box, m), in_shardings=(row,), out_shardings=row
    )
