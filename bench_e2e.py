"""End-to-end Krylov-FSP-SSA solve wall-time benchmark.

Times the full adaptive solve (Arnoldi + expm + FSP criterion + drop +
expansion, fused device main loop) for the reference's own driver
scenarios (/root/reference/test/TestSolverFromFile.f90:12-38,
/root/reference/examples/transcr6d.f90:16-58):

  * toggle_model.input  t=1000, fsp_tol 1e-4, krylov_tol 1e-10
  * Goutsias (6-D)      t=300,  fsp_tol 1e-6, krylov_tol 1e-8

Each scenario runs in float64 and float32 (f32 runs at the tightest
f32-certifiable fsp_tol if the scenario's is below it — the contract in
config.resolve_solve_dtype; the effective tolerance is recorded).

THREE wall times are recorded per configuration, covering the latency
story end to end (the reference's only timing is the driver elapsed
printout, TestSolverFromFile.f90:33-38):

  * cold_s      — time-to-first-result: a fresh process with an EMPTY
                  persistent compilation cache (full XLA compiles).
  * warmdisk_s  — fresh process, persistent cache already populated
                  (disk loads instead of compiles) — the "second run
                  ever on this machine" experience.
  * value       — warm-jit steady state: second solve in the same
                  process (re-traces nothing) — a server solving many
                  instances.

Usage:
  python bench_e2e.py [toggle goutsias repressilator]   # parent mode
Prints one JSON line per (scenario, dtype) on stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

CHILD_TIMEOUT_S = int(os.environ.get("KFS_BENCH_TIMEOUT_S", "10800"))


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


def child(name: str, dtype: str, backend: str = "box"):
    """One fresh-process measurement: first solve (time-to-first-result
    under whatever cache state the parent arranged) + second solve
    (warm-jit steady state).  Prints one JSON line."""
    import jax

    from krylovfspssa_tpu.boxsolver import BoxCmeSolver
    from krylovfspssa_tpu.config import SolverConfig
    from krylovfspssa_tpu.solver import CmeSolver

    factory, t, fsp_tol, krylov_tol, x0 = SCENARIOS[name]
    model = get_model(factory)
    cfg = SolverConfig(dtype=dtype)
    if dtype == "float32" and fsp_tol < cfg.f32_min_fsp_tol():
        fsp_tol = 2e-5  # tightest round tolerance f32 certifies
    solver = (
        CmeSolver(model, cfg) if backend == "table" else
        BoxCmeSolver(model, cfg)
    )

    def solve():
        return solver.solve(t, x0, fsp_tol=fsp_tol, krylov_tol=krylov_tol)

    t0 = time.perf_counter()
    res = solve()
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = solve()
    warm = time.perf_counter() - t0

    rec = {
        "first_s": round(first, 3),
        "warm_s": round(warm, 3),
        "fsp_tol": fsp_tol,
        "wsum": round(res.wsum, 8),
        "fsp_size": res.stats.final_fsp_size,
        "nstep": res.stats.nstep,
        "nmult": res.stats.nmult,
        "nreject": res.stats.nreject,
        "backend": backend,
        "platform": jax.devices()[0].platform,
    }
    print("CHILD " + json.dumps(rec), flush=True)


def run_child(name: str, dtype: str, cache_dir: str, backend: str) -> dict:
    env = dict(os.environ, KFS_COMPILE_CACHE_DIR=cache_dir)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", name, dtype,
         backend],
        env=env, capture_output=True, text=True, timeout=CHILD_TIMEOUT_S,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    for line in out.stdout.splitlines():
        if line.startswith("CHILD "):
            return json.loads(line[6:])
    raise RuntimeError(
        f"child failed (rc={out.returncode}):\n{out.stderr[-3000:]}"
    )


def run(name: str, dtype: str, backend: str = "box"):
    with tempfile.TemporaryDirectory(prefix="kfs_bench_cache_") as cache:
        t0 = time.time()
        r_cold = run_child(name, dtype, cache, backend)  # empty cache
        log(f"{name}/{dtype}/{backend} cold child: {time.time()-t0:.1f}s "
            f"(first solve {r_cold['first_s']}s)")
        t0 = time.time()
        r_warm = run_child(name, dtype, cache, backend)  # populated cache
        log(f"{name}/{dtype}/{backend} warm child: {time.time()-t0:.1f}s")

    rec = {
        "metric": f"e2e_solve_{name}_{dtype}_{backend}",
        "value": r_warm["warm_s"],
        "unit": "s",
        "cold_s": r_cold["first_s"],
        "warmdisk_s": r_warm["first_s"],
        **{k: r_warm[k] for k in (
            "fsp_tol", "wsum", "fsp_size", "nstep", "nmult", "nreject",
            "backend", "platform",
        )},
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3],
              sys.argv[4] if len(sys.argv) > 4 else "box")
        return
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    backends = (
        ("table", "box") if "--both-backends" in sys.argv else ("table",)
    )
    dtypes = (
        ("float64",) if "--f64-only" in sys.argv
        else ("float64", "float32")
    )
    names = args or ["toggle", "goutsias"]
    for name in names:
        for dtype in dtypes:
            for backend in backends:
                t0 = time.time()
                try:
                    run(name, dtype, backend)
                except Exception as e:  # noqa: BLE001
                    log(f"{name}/{dtype}/{backend} FAILED: "
                        f"{type(e).__name__}: {e}")
                log(f"{name}/{dtype}/{backend}: "
                    f"total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
