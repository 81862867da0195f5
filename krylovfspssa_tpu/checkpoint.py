"""Checkpoint / resume for in-progress CME solves.

The reference has no checkpointing (single in-memory run, SURVEY.md §6);
here a solve's entire state is a handful of arrays — box geometry, mask,
probability vector, and the scalar ``StepCarry`` — so snapshots are cheap
``.npz`` files.  ``BoxCmeSolver.solve`` accepts ``checkpoint_path`` /
``checkpoint_every`` (write a snapshot every N accepted steps, at each host
re-entry of the fused loop) and ``resume_from`` (continue a previous run,
including its statistics counters).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .boxspace.box import BoxSpace
from .krylov.stepper import StepCarry

FORMAT_VERSION = 1


def save_checkpoint(
    path: str | Path,
    box: BoxSpace,
    mask: np.ndarray,
    w: np.ndarray,
    carry: StepCarry,
    t_out: float,
    fsp_tol: float,
    krylov_tol: float,
) -> None:
    """Atomically write a solve snapshot (write temp + rename)."""
    path = Path(path)
    fields = {f"carry_{k}": np.asarray(v) for k, v in carry._asdict().items()}
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as fh:
        np.savez_compressed(
            fh,
            version=FORMAT_VERSION,
            n_species=box.n_species,
            axis_of_species=np.asarray(box.axis_of_species, np.int64),
            log2=np.asarray(box.log2, np.int64),
            stoichiometry=np.asarray(box.stoichiometry, np.int64),
            mask=np.asarray(mask),
            w=np.asarray(w, np.float64),
            t_out=float(t_out),
            fsp_tol=float(fsp_tol),
            krylov_tol=float(krylov_tol),
            **fields,
        )
    tmp.replace(path)


def load_checkpoint(path: str | Path):
    """Returns (box, mask, w, carry, t_out, fsp_tol, krylov_tol)."""
    import jax.numpy as jnp

    with np.load(Path(path)) as z:
        version = int(z["version"])
        if version != FORMAT_VERSION:
            raise ValueError(
                f"checkpoint format {version} != expected {FORMAT_VERSION}"
            )
        box = BoxSpace(
            n_species=int(z["n_species"]),
            axis_of_species=tuple(int(a) for a in z["axis_of_species"]),
            log2=tuple(int(b) for b in z["log2"]),
            stoichiometry=z["stoichiometry"],
        )
        mask = z["mask"]
        w = z["w"]
        carry = StepCarry(
            **{
                k: jnp.asarray(z[f"carry_{k}"])
                for k in StepCarry._fields
            }
        )
        return (
            box,
            mask,
            w,
            carry,
            float(z["t_out"]),
            float(z["fsp_tol"]),
            float(z["krylov_tol"]),
        )


# ------------------------------------------------------- table backend ----


def save_table_checkpoint(
    path: str | Path,
    states: np.ndarray,
    w: np.ndarray,
    carry: StepCarry,
    t_out: float,
    fsp_tol: float,
    krylov_tol: float,
    rng_state: np.ndarray,
) -> None:
    """Snapshot of a table-backend solve: the active state list, the
    probability vector over it, the adaptive carry, and the SSA RNG key
    (so resumed expansion walks continue the same stream)."""
    path = Path(path)
    fields = {f"carry_{k}": np.asarray(v) for k, v in carry._asdict().items()}
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as fh:
        np.savez_compressed(
            fh,
            version=FORMAT_VERSION,
            backend="table",
            states=np.asarray(states, np.int32),
            w=np.asarray(w, np.float64),
            t_out=float(t_out),
            fsp_tol=float(fsp_tol),
            krylov_tol=float(krylov_tol),
            rng_state=np.asarray(rng_state),
            **fields,
        )
    tmp.replace(path)


def load_table_checkpoint(path: str | Path):
    """Returns (states, w, carry, t_out, fsp_tol, krylov_tol, rng_state)."""
    import jax.numpy as jnp

    with np.load(Path(path)) as z:
        version = int(z["version"])
        if version != FORMAT_VERSION:
            raise ValueError(
                f"checkpoint format {version} != expected {FORMAT_VERSION}"
            )
        if str(z.get("backend", "table")) != "table":
            raise ValueError("not a table-backend checkpoint")
        carry = StepCarry(
            **{k: jnp.asarray(z[f"carry_{k}"]) for k in StepCarry._fields}
        )
        return (
            z["states"],
            z["w"],
            carry,
            float(z["t_out"]),
            float(z["fsp_tol"]),
            float(z["krylov_tol"]),
            z["rng_state"],
        )
