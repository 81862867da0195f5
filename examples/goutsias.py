"""Goutsias transcription regulation model (6 species, 10 reactions).

Mirrors ``/root/reference/examples/transcr6d.f90`` (program solve_goutsias):
x0 = (2, 6, 0, 2, 0, 0), t = 300, stiff rate constants spanning ten orders
of magnitude.  This is the solver's stress model and the SpMV benchmark
operator (bench.py).

Run:  python examples/goutsias.py [--t 300]
"""

import argparse
import time

from krylovfspssa_tpu.boxsolver import solve_cme_box
from krylovfspssa_tpu.models.library import goutsias_model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=float, default=300.0)
    ap.add_argument("--fsp-tol", type=float, default=1e-4)
    args = ap.parse_args()

    model = goutsias_model()
    t0 = time.perf_counter()
    res = solve_cme_box(
        model, args.t, [[2, 6, 0, 2, 0, 0]], fsp_tol=args.fsp_tol,
        krylov_tol=1e-10, verbosity=1,
    )
    wall = time.perf_counter() - t0
    print(f"\nfinal FSP size {res.stats.final_fsp_size}, "
          f"wsum {res.wsum:.8f}, {res.stats.nstep} steps, {wall:.2f}s")


if __name__ == "__main__":
    main()
