"""Phase-level wall profiler for the table-backend solver.

Wraps CmeSolver's per-iteration phases (step dispatch, drop, SSA expand,
1-step expand, operator rebuild) with host timers to attribute the
per-step wall observed on the Goutsias flagship (BASELINE.md round-3
findings: ~2 min/step of host re-entry latency).  Run:

    python bench_profile_table.py [--t 300] [--budget 600] [--model goutsias]

Prints a per-phase breakdown (count/total/max) and the step trace.
"""

from __future__ import annotations

import argparse
import collections
import time

import jax
import numpy as np

from krylovfspssa_tpu import solver as solver_mod
from krylovfspssa_tpu.config import SolverConfig
from krylovfspssa_tpu.models.library import get_model
from krylovfspssa_tpu.solver import CmeSolver

PHASES = collections.defaultdict(lambda: [0, 0.0, 0.0])  # count, total, max


def timed(name, fn, block=False):
    def wrapper(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        if block:
            # _operator returns (op, vector-layout); the layout is a
            # host object block_until_ready cannot traverse
            blockable = r[0] if name == "build_op" else r
            jax.block_until_ready(blockable)
        dt = time.perf_counter() - t0
        e = PHASES[name]
        e[0] += 1
        e[1] += dt
        e[2] = max(e[2], dt)
        return r

    return wrapper


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="goutsias")
    ap.add_argument("--t", type=float, default=300.0)
    ap.add_argument("--budget", type=float, default=600.0, help="wall budget s")
    ap.add_argument("--fsp-tol", type=float, default=1e-6)
    ap.add_argument("--krylov-tol", type=float, default=1e-8)
    ap.add_argument("--dtype", default="float64")
    args = ap.parse_args()

    model = get_model(args.model)
    x0 = {
        "goutsias": [[2, 6, 0, 2, 0, 0]],
        "toggle": [[0, 0]],
        "repressilator": [[22, 0, 0]],
        "bursting_gene": [[0, 0]],
    }[args.model]

    cfg = SolverConfig(dtype=args.dtype)
    s = CmeSolver(model, cfg)

    s._step = timed("step", s._step, block=True)
    s._operator = timed("build_op", s._operator, block=True)
    s._matvec = timed("drop_matvec", s._matvec, block=True)
    solver_mod.ssa_extend = timed("ssa_extend", solver_mod.ssa_extend)
    solver_mod.onestep_extend = timed("onestep_extend", solver_mod.onestep_extend)
    solver_mod.drop_mask_device = timed(
        "drop_mask", solver_mod.drop_mask_device, block=True
    )

    deadline = time.perf_counter() + args.budget
    records = []
    orig_append = list.append

    class Budget(Exception):
        pass

    # cut the run off at the wall budget from inside the loop: wrap the
    # stats record list append
    wall0 = time.perf_counter()

    import krylovfspssa_tpu.utils.stats as stats_mod

    class BudgetList(list):
        def append(self, rec):
            super().append(rec)
            print(rec.format(), flush=True)
            if time.perf_counter() > deadline:
                raise Budget()

    orig_stats = stats_mod.SolverStats

    def patched_stats(*a, **k):
        st = orig_stats(*a, **k)
        st.records = BudgetList()
        return st

    solver_mod.SolverStats = patched_stats

    try:
        res = s.solve(
            args.t, x0, fsp_tol=args.fsp_tol, krylov_tol=args.krylov_tol
        )
        print(
            f"COMPLETED t={res.t} wsum={res.wsum:.9f} "
            f"fsp={res.stats.final_fsp_size} nstep={res.stats.nstep} "
            f"nmult={res.stats.nmult} wall={res.stats.wall_s:.1f}s"
        )
    except Budget:
        print(f"BUDGET HIT after {time.perf_counter() - wall0:.1f}s")

    total = time.perf_counter() - wall0
    print(f"\n=== phase breakdown (total wall {total:.1f}s) ===")
    acc = 0.0
    for name, (cnt, tot, mx) in sorted(PHASES.items(), key=lambda kv: -kv[1][1]):
        print(
            f"{name:16s} n={cnt:5d} total={tot:8.2f}s avg={tot / max(cnt, 1):7.3f}s max={mx:7.2f}s"
        )
        acc += tot
    print(f"{'(unattributed)':16s} total={total - acc:8.2f}s")


if __name__ == "__main__":
    main()
