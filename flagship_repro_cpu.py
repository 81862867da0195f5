"""CPU reproduction of the deterministic flagship crash at t=218.67.

Both round-4 run2 and round-5 attempt 1 killed the TPU worker at the
identical trajectory point: EXPAND t=218.67 grows the table
397858 -> 512912 (cap 524288), then the next fused-advance dispatch
crashes the worker.  Deterministic + data-dependent => likely an
unbounded device loop (NaN tau/5 retry, or the mxreject=0 attempt
loop) or a numeric blowup in the newly added boundary states.

Replays the same resume on CPU with the STEPWISE path (one dispatch
per attempted step) and prints operator/vector numeric probes at
every rebuild so the blowup (if any) is visible before the hang.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags  # single CPU device is fine

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from krylovfspssa_tpu.config import SolverConfig  # noqa: E402
from krylovfspssa_tpu.models.library import goutsias_model  # noqa: E402
from krylovfspssa_tpu.solver import CmeSolver  # noqa: E402

CKPT = "flagship_r04_ckpt.npz"


def main():
    model = goutsias_model()
    cfg = SolverConfig(dtype="float64", verbosity=2, fused_steps=False)
    solver = CmeSolver(model, cfg)

    # NOTE (round-5 resolution): the crash was root-caused to a too-long
    # fused dispatch tripping the remote execution watchdog (~160 ms
    # serialized-gather matvecs x 10-step budget), not a numeric blowup;
    # this harness is kept for future numeric autopsies.
    orig_operator = solver._operator

    def probed_operator(table):
        op, vl = orig_operator(table)
        diag = np.asarray(op.diag)
        print(
            f"[probe] n={table.n} cells={vl.cells} "
            f"diag max={diag.max():.6g} min={diag.min():.6g} "
            f"nan={np.isnan(diag).any()}",
            flush=True,
        )
        return op, vl

    solver._operator = probed_operator

    res = solver.solve(300.0, resume_from=CKPT, verbosity=2)
    print("final t:", res.stats.t_final, "wsum:", res.wsum)


if __name__ == "__main__":
    main()
