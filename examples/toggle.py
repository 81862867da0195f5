"""Toggle switch built programmatically with a custom propensity callable.

Mirrors ``/root/reference/examples/toggle.f90``: 2 species, 4 reactions,
x0 = (0, 0), t = 100, with the propensities supplied as a Python function
(the CUSTOMPROP parity path) instead of expressions.

Run:  python examples/toggle.py
"""

import time

from krylovfspssa_tpu.boxsolver import solve_cme_box
from krylovfspssa_tpu.models.library import toggle_programmatic_model


def main():
    model = toggle_programmatic_model()
    t0 = time.perf_counter()
    res = solve_cme_box(
        model, 100.0, [[0, 0]], fsp_tol=1e-4, krylov_tol=1e-10, verbosity=1
    )
    wall = time.perf_counter() - t0
    print(f"\nfinal FSP size {res.stats.final_fsp_size}, "
          f"wsum {res.wsum:.8f}, {res.stats.nstep} steps, {wall:.2f}s")
    # marginal mode of each species
    import numpy as np

    for s, name in enumerate(model.species_names):
        counts = res.states[:, s]
        mean = float(np.sum(counts * res.probabilities))
        print(f"E[{name}] = {mean:.4f}")


if __name__ == "__main__":
    main()
