"""End-to-end coverage of the remaining reference model families.

Repressilator (examples/repressilator.f90) against the sparse expm oracle,
and ge5d (the 5-D scaling model) as a smoke solve — completing the model
matrix beyond toggle/bursting-gene/goutsias.
"""

import numpy as np
import pytest

from krylovfspssa_tpu.boxsolver import solve_cme_box
from krylovfspssa_tpu.config import SolverConfig
from krylovfspssa_tpu.models.library import ge5d_model, repressilator_model
from tests.test_solver import dense_solution


def test_repressilator_vs_oracle():
    """Short-horizon repressilator solve vs scipy expm on a fixed box
    (examples/repressilator.f90 setup: x0=(22,0,0), krylov_tol 1e-14)."""
    model = repressilator_model()
    t = 1.0
    res = solve_cme_box(
        model, t, [[22, 0, 0]], fsp_tol=1e-5, krylov_tol=1e-12,
    )
    assert res.wsum >= 1.0 - 1e-5
    box = (40, 12, 12)
    states, p_ref = dense_solution(model, box, [22, 0, 0], t)
    ref = {tuple(s): q for s, q in zip(states, p_ref) if q > 1e-9}
    for s, q in ref.items():
        assert res.probability(s) == pytest.approx(q, abs=2e-5)


def test_ge5d_smoke_solve():
    """The 5-species gene-expression model solves and conserves mass
    (the shipped ge5d_model.input is inconsistent — SURVEY.md §2 — so the
    library constructor provides the consistent interpretation)."""
    model = ge5d_model()
    res = solve_cme_box(
        model, 2.0, [[0, 0, 0, 0, 0]], fsp_tol=1e-4, krylov_tol=1e-8,
        config=SolverConfig(box_min_log2=2),
    )
    assert res.wsum >= 1.0 - 1e-4
    assert res.stats.final_fsp_size > 1
