"""End-to-end solver tests against a dense matrix-exponential oracle.

The reference has no machine-checkable oracle (its tests print for human
inspection, test/TestSolverFromFile.f90); we create one: on a fixed
hyper-rectangle large enough to hold essentially all probability mass, the
CME solution is exp(t*A) @ p0 computed densely with scipy.  The adaptive
Krylov-FSP-SSA solution must agree within the FSP tolerance (the FSP
truncation plus local Krylov errors are the only differences).
"""

import numpy as np
import pytest
import scipy.sparse
import scipy.sparse.linalg

from krylovfspssa_tpu.config import SolverConfig
from krylovfspssa_tpu.models.library import (
    bursting_gene_model,
    toggle_file_model,
)
from krylovfspssa_tpu.solver import solve_cme


def dense_solution(model, box, p0_state, t):
    """exp(tA) @ delta_{p0_state} on the full box (sparse oracle via
    scipy expm_multiply)."""
    grids = np.meshgrid(*[np.arange(b) for b in box], indexing="ij")
    states = np.stack([g.ravel() for g in grids], axis=1)
    strides = np.cumprod([1] + list(box[::-1][:-1]))[::-1]

    def idx_of(sts):
        inside = np.all((sts >= 0) & (sts < np.array(box)), axis=1)
        flat = (sts * strides).sum(axis=1)
        return np.where(inside, flat, -1)

    props = np.asarray(model.propensities(states))
    n = states.shape[0]
    rows, cols, vals = [], [], []
    for k in range(model.n_reactions):
        succ = states + np.asarray(model.stoichiometry[k])[None, :]
        j = idx_of(succ)
        src = np.arange(n)
        # diagonal outflow (always)
        rows.append(src)
        cols.append(src)
        vals.append(-props[:, k])
        # off-diagonal inflow where the successor is inside the box
        m = j >= 0
        rows.append(j[m])
        cols.append(src[m])
        vals.append(props[m, k])
    A = scipy.sparse.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n),
    )
    p0 = np.zeros(n)
    p0[int(idx_of(np.asarray(p0_state)[None, :])[0])] = 1.0
    p = scipy.sparse.linalg.expm_multiply(A * t, p0)
    return states, p


def compare_to_oracle(result, states_oracle, p_oracle, tol):
    """Max pointwise difference between FSP result and dense oracle."""
    lut = {tuple(s): p for s, p in zip(result.states, result.probabilities)}
    diff = 0.0
    for s, p in zip(states_oracle, p_oracle):
        diff = max(diff, abs(lut.get(tuple(s), 0.0) - p))
    # mass of oracle states never found by the FSP must be within budget
    missing = sum(
        p for s, p in zip(states_oracle, p_oracle) if tuple(s) not in lut
    )
    return diff, missing


@pytest.mark.parametrize("t,fsp_tol", [(1.0, 1e-4), (10.0, 1e-4)])
def test_toggle_vs_dense_oracle(t, fsp_tol):
    # the 6-parameter basal toggle at the TestSolverFromFile.f90:31 values
    # [1,100,1,1,100,1] (preset by the constructor)
    model = toggle_file_model()
    res = solve_cme(
        model,
        t,
        [[0, 0]],
        fsp_tol=fsp_tol,
        krylov_tol=1e-10,
        config=SolverConfig(init_capacity=256, seed=1),
    )
    # probability conservation up to FSP truncation
    assert res.wsum <= 1.0 + 1e-12
    assert res.wsum >= 1.0 - fsp_tol

    # both arms of the bistable toggle are populated: X production peaks at
    # bx+kx/2=51 (Y small), Y production at by+ky=101 (X small)
    box = (110, 200)
    states_o, p_o = dense_solution(model, box, (0, 0), t)
    assert p_o.sum() > 1.0 - 1e-9  # box truly captures the mass
    diff, missing = compare_to_oracle(res, states_o, p_o, fsp_tol)
    assert diff < fsp_tol
    assert missing < fsp_tol


def test_bursting_gene_vs_dense_oracle():
    model = bursting_gene_model()
    res = solve_cme(
        model,
        t=50.0,
        initial_states=[[0, 0]],
        fsp_tol=1e-5,
        krylov_tol=1e-10,
        config=SolverConfig(init_capacity=64, seed=2),
    )
    assert res.wsum >= 1.0 - 1e-5
    box = (2, 40)
    states_o, p_o = dense_solution(model, box, (0, 0), 50.0)
    assert p_o.sum() > 1.0 - 1e-10
    diff, missing = compare_to_oracle(res, states_o, p_o, 1e-5)
    assert diff < 1e-5
    assert missing < 1e-5


def test_point_probability_query():
    model = bursting_gene_model()
    res = solve_cme(
        model, 10.0, [[0, 0]], fsp_tol=1e-5, krylov_tol=1e-10,
        config=SolverConfig(init_capacity=64),
    )
    # POINTWISE_FSP parity: in-table and out-of-table lookups
    assert res.probability([0, 0]) > 0
    assert res.probability([0, 9999]) == 0.0


def test_stats_populated():
    model = bursting_gene_model()
    res = solve_cme(
        model, 5.0, [[0, 0]], fsp_tol=1e-5, krylov_tol=1e-10,
        config=SolverConfig(init_capacity=64),
    )
    s = res.stats
    assert s.nstep >= 1
    assert s.nmult > 0
    assert s.nexph >= s.nstep
    assert s.t_final == pytest.approx(5.0)
    assert s.final_fsp_size == res.states.shape[0]
    assert 0 < s.step_min <= s.step_max
    assert len(s.records) >= s.nstep
