"""Goutsias t=300 flagship head-to-head run (BASELINE.md north star).

Reference: examples/transcr6d.f90:16,54-58 — program solve_goutsias,
x0=(2,6,0,2,0,0), t=300, fsp_tol 1e-6, krylov_tol 1e-8, elapsed printout.

Runs the table backend (reference-format gather-ELL, float64) with the
fused multi-step device loop, checkpointing so the run can be chained
across harness windows:

    python bench_flagship.py [--resume] [--t 300]

Writes per-step records to flagship_r04_steps.jsonl and a summary line to
flagship_r04.json on completion.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

CKPT = "flagship_r04_ckpt.npz"
STEPS = "flagship_r04_steps.jsonl"
SUMMARY = "flagship_r04.json"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--t", type=float, default=300.0)
    ap.add_argument("--fsp-tol", type=float, default=1e-6)
    ap.add_argument("--krylov-tol", type=float, default=1e-8)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint path override (comparative legs)")
    ap.add_argument("--tag", default=None,
                    help="suffix for the steps/summary artifact names")
    ap.add_argument("--table-operator", default=None,
                    choices=("auto", "ell", "pencil"))
    ap.add_argument("--steps-per-call", type=int, default=1)
    args = ap.parse_args()

    global CKPT, STEPS, SUMMARY
    if args.ckpt:
        CKPT = args.ckpt
    if args.tag:
        STEPS = f"flagship_{args.tag}_steps.jsonl"
        SUMMARY = f"flagship_{args.tag}.json"

    import jax

    from krylovfspssa_tpu.config import SolverConfig
    from krylovfspssa_tpu.models.library import goutsias_model
    from krylovfspssa_tpu.solver import CmeSolver
    from krylovfspssa_tpu.utils.stats import StepRecord

    print("devices:", jax.devices(), flush=True)
    model = goutsias_model()
    # max_steps_per_call=1: one attempted step per device dispatch.  The
    # round-4/5 "TPU worker crashed" at t=218.67 was a too-long fused
    # dispatch, not a kernel fault: at 300-660k states the f64
    # gather-ELL matvec costs ~160-320 ms (XLA serializes the scalar
    # gathers — TABLE_MATVEC.json), so a 10-step dispatch with a
    # rejection cascade runs 200-500 s of device time and trips the
    # remote execution watchdog (~4 min), deterministically at the
    # tau=2.5 rejection cascade after that expansion.  Single-step
    # dispatches stay ~16-50 s; the extra host re-entry costs ~27 ms.
    cfg_kw = dict(
        dtype="float64", verbosity=1,
        max_steps_per_call=args.steps_per_call,
    )
    if args.table_operator:
        cfg_kw["table_operator"] = args.table_operator
    cfg = SolverConfig(**cfg_kw)
    solver = CmeSolver(model, cfg)

    # stream step records to disk as they arrive
    log = open(STEPS, "a")
    orig_format = StepRecord.format

    def format_and_log(rec):
        log.write(json.dumps(dataclasses.asdict(rec)) + "\n")
        log.flush()
        return orig_format(rec)

    StepRecord.format = format_and_log

    wall0 = time.perf_counter()
    kw = dict(
        fsp_tol=args.fsp_tol,
        krylov_tol=args.krylov_tol,
        checkpoint_path=CKPT,
        checkpoint_every=5,
        verbosity=2,
    )
    if args.resume and os.path.exists(CKPT):
        res = solver.solve(args.t, resume_from=CKPT, **kw)
    else:
        res = solver.solve(args.t, [[2, 6, 0, 2, 0, 0]], **kw)
    wall = time.perf_counter() - wall0

    s = res.stats
    summary = {
        "model": "goutsias (examples/transcr6d.f90)",
        "backend": "table-fused",
        "table_operator": cfg.table_operator,
        "dtype": "float64",
        "t": s.t_final,
        "fsp_tol": args.fsp_tol,
        "krylov_tol": args.krylov_tol,
        "wall_s_this_segment": wall,
        "wsum": res.wsum,
        "fsp_size": s.final_fsp_size,
        "nstep": s.nstep,
        "nmult": s.nmult,
        "nexph": s.nexph,
        "nreject": s.nreject,
        "n_expansions": s.n_expansions,
        "n_drops": s.n_drops,
        "step_min": s.step_min,
        "step_max": s.step_max,
        "mass_spent": s.mass_spent,
    }
    with open(SUMMARY, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
