"""Operator assembly, SpMV, and Padé expm tests against scipy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.linalg
import scipy.sparse

from krylovfspssa_tpu.models.library import goutsias_model, toggle_file_model
from krylovfspssa_tpu.ops.expm import expm_pade
from krylovfspssa_tpu.ops.operator import build_operator, operator_nnz
from krylovfspssa_tpu.ops.spmv import spmv
from krylovfspssa_tpu.statespace.encoding import StateEncoder
from krylovfspssa_tpu.statespace.table import StateTable


def dense_cme_matrix(states, model):
    """Dense principal submatrix of the CME generator on `states` —
    the scatter-form oracle replicating the reference FMATVEC semantics
    (KrylovSolver.f90:588-606)."""
    states = np.asarray(states)
    n = states.shape[0]
    index = {tuple(s): i for i, s in enumerate(states)}
    props = np.asarray(model.propensities(states))
    A = np.zeros((n, n))
    for i in range(n):
        for k in range(model.n_reactions):
            A[i, i] -= props[i, k]
            succ = states[i] + np.asarray(model.stoichiometry[k])
            if np.all(succ >= 0):
                j = index.get(tuple(succ))
                if j is not None:
                    A[j, i] += props[i, k]
    return A


def grid_states(nx, ny):
    xs, ys = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    return np.stack([xs.ravel(), ys.ravel()], axis=1).astype(np.int32)


def make_table_and_op(model, states, capacity=None):
    enc = StateEncoder.for_model(model.n_species, 10_000)
    capacity = capacity or 1 << int(np.ceil(np.log2(len(states))))
    t = StateTable.from_states(states, enc, capacity=capacity)
    op = build_operator(
        t.states, t.sorted_keys, t.sorted_to_row,
        jnp.asarray(t.n, jnp.int32),
        model.propensities, jnp.asarray(model.stoichiometry), enc,
    )
    return t, op


def test_operator_matches_dense_toggle():
    model = toggle_file_model()
    states = grid_states(12, 12)
    t, op = make_table_and_op(model, states)
    A = dense_cme_matrix(np.asarray(t.states[: t.n]), model)
    rng = np.random.default_rng(1)
    for _ in range(3):
        x = np.zeros(t.capacity)
        x[: t.n] = rng.random(t.n)
        y = np.asarray(spmv(op, jnp.asarray(x)))
        np.testing.assert_allclose(y[: t.n], A @ x[: t.n], rtol=1e-12, atol=1e-12)
        assert np.all(y[t.n:] == 0)


def test_operator_matches_dense_goutsias():
    model = goutsias_model()
    # small box around the Goutsias initial state
    rng = np.random.default_rng(2)
    base = np.array([2, 6, 0, 2, 0, 0])
    states = {tuple(base)}
    for _ in range(400):
        s = base + rng.integers(-2, 3, size=6)
        if np.all(s >= 0):
            states.add(tuple(s))
    states = np.array(sorted(states), dtype=np.int32)
    t, op = make_table_and_op(model, states)
    A = dense_cme_matrix(np.asarray(t.states[: t.n]), model)
    x = np.zeros(t.capacity)
    x[: t.n] = rng.random(t.n)
    y = np.asarray(spmv(op, jnp.asarray(x)))
    np.testing.assert_allclose(y[: t.n], A @ x[: t.n], rtol=1e-11, atol=1e-11)


def test_operator_nnz_estimate():
    model = toggle_file_model()
    t, op = make_table_and_op(model, grid_states(5, 5))
    assert int(operator_nnz(op)) == (model.n_reactions + 1) * t.n


def test_succ_structures():
    model = toggle_file_model()
    t, op = make_table_and_op(model, grid_states(3, 3))
    succ_idx = np.asarray(op.succ_idx)[: t.n]
    legal = np.asarray(op.succ_legal)[: t.n]
    states = np.asarray(t.states[: t.n])
    # death moves from (0,*) in species X are illegal
    for i, s in enumerate(states):
        if s[0] == 0:
            assert not legal[i, 1]  # reaction 1: X -> 0
        # production successor x+e_x at the boundary is absent (not illegal)
        if s[0] == 2:
            assert legal[i, 0] and succ_idx[i, 0] == -1


@pytest.mark.parametrize("mx,t", [(5, 0.3), (12, 1.7), (30, -0.8), (102, 4.0)])
def test_expm_matches_scipy(mx, t):
    MH = 102
    rng = np.random.default_rng(mx)
    H = np.zeros((MH, MH))
    # upper-Hessenberg-like block
    blk = rng.standard_normal((mx, mx)) * 0.5
    H[:mx, :mx] = np.triu(blk, -1)
    E, hnorm, ns = expm_pade(
        jnp.asarray(H), jnp.asarray(mx), jnp.asarray(float(t))
    )
    E = np.asarray(E)
    ref = scipy.linalg.expm(t * H[:mx, :mx])
    np.testing.assert_allclose(E[:mx, :mx], ref, rtol=1e-10, atol=1e-10)
    # padding block is the identity
    np.testing.assert_allclose(E[mx:, mx:], np.eye(MH - mx), atol=1e-14)
    assert np.all(E[:mx, mx:] == 0) and np.all(E[mx:, :mx] == 0)
    # hnorm = |t| * inf-norm of the block (dgpadm.f:71-83)
    assert float(hnorm) == pytest.approx(
        abs(t) * np.abs(H[:mx, :mx]).sum(axis=1).max(), rel=1e-12
    )


def test_expm_zero_matrix():
    MH = 16
    E, hnorm, ns = expm_pade(
        jnp.zeros((MH, MH)), jnp.asarray(4), jnp.asarray(1.0)
    )
    np.testing.assert_allclose(np.asarray(E), np.eye(MH), atol=1e-15)
    assert float(hnorm) == 0.0 and int(ns) == 0


def test_expm_scaling_count():
    # hnorm = 8 -> ns = int(log2(8)) + 2 = 5 (dgpadm.f:85)
    MH = 8
    H = np.zeros((MH, MH))
    H[0, 0] = 8.0
    _, hnorm, ns = expm_pade(jnp.asarray(H), jnp.asarray(2), jnp.asarray(1.0))
    assert float(hnorm) == 8.0
    assert int(ns) == 5
