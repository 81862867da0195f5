"""End-to-end Krylov-FSP-SSA solve wall-time benchmark.

Times the full adaptive solve (Arnoldi + expm + FSP criterion + drop +
expansion, fused device main loop) for the reference's own driver
scenarios (/root/reference/test/TestSolverFromFile.f90:12-38,
/root/reference/examples/transcr6d.f90:16-58):

  * toggle_model.input  t=1000, fsp_tol 1e-4, krylov_tol 1e-10
  * Goutsias (6-D)      t=300,  fsp_tol 1e-6, krylov_tol 1e-8

Each scenario runs in the solver's float64 mode and in the float32 mode
(f32 vectors + Pallas stencil on TPU, f64 small-H expm and mass
reductions).  Wall time excludes compilation: every configuration is
solved once to warm the jit caches, then timed fresh from the initial
condition (the second solve re-traces nothing unless the box geometry
path differs, which is part of the measured algorithm).

The reference Fortran publishes no numbers and gfortran is not available
in this image (BASELINE.md), so the output is recorded as the measured
TPU-side wall time for head-to-head comparison once a Fortran box exists.

Usage: python bench_e2e.py [toggle goutsias repressilator]
Prints one JSON line per (scenario, dtype) on stdout.
"""

from __future__ import annotations

import json
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


SCENARIOS = {
    # name -> (model-factory, t, fsp_tol, krylov_tol, x0)
    "toggle": ("toggle_from_file", 1000.0, 1e-4, 1e-10, [[0, 0]]),
    "goutsias": ("goutsias_model", 300.0, 1e-6, 1e-8, [[2, 6, 0, 2, 0, 0]]),
    "repressilator": (
        "repressilator_model", 10.0, 1e-4, 1e-14, [[22, 0, 0]],
    ),
}


def get_model(factory: str):
    from krylovfspssa_tpu.models import library

    if factory == "toggle_from_file":
        return library.toggle_file_model()
    return getattr(library, factory)()


def run(name: str, dtype: str):
    import jax

    from krylovfspssa_tpu.boxsolver import BoxCmeSolver
    from krylovfspssa_tpu.config import SolverConfig

    factory, t, fsp_tol, krylov_tol, x0 = SCENARIOS[name]
    model = get_model(factory)
    cfg = SolverConfig(dtype=dtype)
    # one solver for warm-up and timing: its per-geometry jit cache is the
    # production steady state (a server solving many instances re-traces
    # nothing); the warm-up walks every box geometry the solve visits
    solver = BoxCmeSolver(model, cfg)

    def solve():
        return solver.solve(
            t, x0, fsp_tol=fsp_tol, krylov_tol=krylov_tol
        )

    res = solve()  # warm-up: populates jit caches for every box geometry
    t0 = time.perf_counter()
    res = solve()
    wall = time.perf_counter() - t0

    rec = {
        "metric": f"e2e_solve_{name}_{dtype}",
        "value": round(wall, 3),
        "unit": "s",
        "wsum": round(res.wsum, 8),
        "fsp_size": res.stats.final_fsp_size,
        "nstep": res.stats.nstep,
        "nmult": res.stats.nmult,
        "nreject": res.stats.nreject,
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    names = sys.argv[1:] or ["toggle", "goutsias"]
    for name in names:
        for dtype in ("float64", "float32"):
            t0 = time.time()
            try:
                run(name, dtype)
            except Exception as e:  # noqa: BLE001
                log(f"{name}/{dtype} FAILED: {type(e).__name__}: {e}")
            log(f"{name}/{dtype}: total (incl. compile) {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
