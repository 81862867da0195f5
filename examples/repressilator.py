"""Repressilator oscillator.

Mirrors ``/root/reference/examples/repressilator.f90``: 3 species,
6 reactions, x0 = (22, 0, 0), t = 10, krylov_tol = 1e-14.

Run:  python examples/repressilator.py
"""

import time

from krylovfspssa_tpu.boxsolver import solve_cme_box
from krylovfspssa_tpu.models.library import repressilator_model


def main():
    model = repressilator_model()
    t0 = time.perf_counter()
    res = solve_cme_box(
        model, 10.0, [[22, 0, 0]], fsp_tol=1e-4, krylov_tol=1e-14,
        verbosity=1,
    )
    wall = time.perf_counter() - t0
    print(f"\nfinal FSP size {res.stats.final_fsp_size}, "
          f"wsum {res.wsum:.8f}, {res.stats.nstep} steps, {wall:.2f}s")


if __name__ == "__main__":
    main()
