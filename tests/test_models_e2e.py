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


def test_repressilator_vs_oracle_fast():
    """Short-horizon repressilator solve vs scipy expm on a fixed box
    (examples/repressilator.f90 setup: x0=(22,0,0)); the fast default
    profile — the full-horizon variant is marked slow."""
    model = repressilator_model()
    t = 0.25
    res = solve_cme_box(
        model, t, [[22, 0, 0]], fsp_tol=1e-5, krylov_tol=1e-12,
    )
    assert res.wsum >= 1.0 - 1e-5
    box = (32, 8, 8)
    states, p_ref = dense_solution(model, box, [22, 0, 0], t)
    ref = {tuple(s): q for s, q in zip(states, p_ref) if q > 1e-9}
    for s, q in ref.items():
        assert res.probability(s) == pytest.approx(q, abs=2e-5)


@pytest.mark.slow
def test_repressilator_vs_oracle():
    """Longer-horizon repressilator solve vs scipy expm
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


def test_ge5d_smoke_solve_fast():
    """The 5-species gene-expression model solves and conserves mass over a
    short horizon (the shipped ge5d_model.input is inconsistent — SURVEY.md
    §2 — so the library constructor provides the consistent version)."""
    model = ge5d_model()
    res = solve_cme_box(
        model, 0.4, [[0, 0, 0, 0, 0]], fsp_tol=1e-4, krylov_tol=1e-8,
        config=SolverConfig(box_min_log2=2),
    )
    assert res.wsum >= 1.0 - 1e-4
    assert res.stats.final_fsp_size > 1


@pytest.mark.slow
def test_ge5d_smoke_solve():
    """Full-horizon ge5d smoke solve (slow: the box grows to ~1M cells on
    the CPU test mesh)."""
    model = ge5d_model()
    res = solve_cme_box(
        model, 2.0, [[0, 0, 0, 0, 0]], fsp_tol=1e-4, krylov_tol=1e-8,
        config=SolverConfig(box_min_log2=2),
    )
    assert res.wsum >= 1.0 - 1e-4
    assert res.stats.final_fsp_size > 1


def test_goutsias_vs_oracle():
    """Short-horizon Goutsias (the stiff 6-species flagship,
    examples/transcr6d.f90:16-58) against the sparse expm oracle — the
    correctness anchor for the hardest bundled model (VERDICT r1 item 2)."""
    from krylovfspssa_tpu.models.library import goutsias_model

    model = goutsias_model()
    t = 1.0
    x0 = [2, 6, 0, 2, 0, 0]
    res = solve_cme_box(
        model, t, [x0], fsp_tol=1e-6, krylov_tol=1e-8,
    )
    assert res.wsum >= 1.0 - 1e-6
    # covers the t=1 support: M<=28, D<=12, RNA<=17, gene states <=2
    box = (30, 13, 18, 3, 3, 3)
    states, p_ref = dense_solution(model, box, x0, t)
    ref = {tuple(s): q for s, q in zip(states, p_ref) if q > 1e-7}
    assert sum(ref.values()) > 1.0 - 1e-5, "oracle box too small"
    for s, q in ref.items():
        assert res.probability(s) == pytest.approx(q, abs=5e-6), s
