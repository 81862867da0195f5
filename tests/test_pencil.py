"""Pencil-structured operator (ops/pencil.py) vs the gather-ELL oracle.

The pencil matvec must reproduce ops/spmv.py exactly (same principal
submatrix A_J, FMATVEC semantics KrylovSolver.f90:588-606) on arbitrary
ragged supports — the pencil layout is a pure re-indexing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from krylovfspssa_tpu.models.library import (
    bursting_gene_model,
    goutsias_model,
    toggle_file_model,
)
from krylovfspssa_tpu.ops.operator import build_operator
from krylovfspssa_tpu.ops.pencil import (
    LANES,
    build_pencil_layout,
    build_pencil_operator,
    pencil_matvec,
)
from krylovfspssa_tpu.ops.spmv import spmv
from krylovfspssa_tpu.statespace.encoding import StateEncoder
from krylovfspssa_tpu.statespace.table import StateTable


def _random_support(model, n_target, seed, spans):
    """A ragged random support: union of random states + their 1-step
    successors (so the operator has real off-diagonal structure)."""
    rng = np.random.default_rng(seed)
    d = model.n_species
    pts = np.stack(
        [rng.integers(0, spans[s], size=n_target) for s in range(d)], axis=1
    ).astype(np.int64)
    stoich = np.asarray(model.stoichiometry, np.int64)
    succ = (pts[:, None, :] + stoich[None, :, :]).reshape(-1, d)
    allpts = np.concatenate([pts, succ], axis=0)
    allpts = allpts[(allpts >= 0).all(axis=1)]
    return np.unique(allpts, axis=0).astype(np.int32)


def _oracle_y(model, states, x_states):
    enc = StateEncoder.for_model(model.n_species, 10_000)
    t = StateTable.from_states(states, enc, 64, None)
    op = build_operator(
        t.states, t.sorted_keys, t.sorted_to_row,
        jnp.asarray(t.n, jnp.int32),
        model.propensities, jnp.asarray(
            np.asarray(model.stoichiometry, np.int64)
        ),
        enc, jnp.float64,
    )
    rows = np.asarray(t.lookup_states(states))
    x = np.zeros(t.capacity)
    x[rows] = x_states
    y = np.asarray(spmv(op, jnp.asarray(x)))
    return y[rows]


def _pencil_y(model, states, x_states, lane_species=None):
    layout = build_pencil_layout(states, lane_species)
    # mask-derived member count must equal the state count (bijection)
    assert layout.mask.sum() == len(states)

    def props_np(s):
        return np.asarray(model.propensities(jnp.asarray(s)))

    op = build_pencil_operator(
        layout, states, props_np,
        np.asarray(model.stoichiometry, np.int64),
        species_cap=(1 << 14) - 1,
    )
    x = np.zeros(layout.n_cells)
    x[layout.slot_of_state] = x_states
    y = np.asarray(pencil_matvec(op, jnp.asarray(x)))
    return y[layout.slot_of_state]


@pytest.mark.parametrize(
    "model_fn,spans,seed",
    [
        (bursting_gene_model, (2, 60), 0),
        (toggle_file_model, (40, 300), 1),  # lane extent > 128
        (goutsias_model, (50, 40, 12, 3, 3, 3), 2),
    ],
)
def test_pencil_matvec_matches_ell(model_fn, spans, seed):
    model = model_fn()
    states = _random_support(model, 400, seed, spans)
    rng = np.random.default_rng(seed + 10)
    xs = rng.random(len(states))
    y_ref = _oracle_y(model, states, xs)
    y_p = _pencil_y(model, states, xs)
    np.testing.assert_allclose(y_p, y_ref, rtol=1e-12, atol=1e-12)


def test_pencil_matvec_every_lane_choice():
    """The layout must be correct for ANY lane species, including ones
    giving multi-row pencils and tiny extents."""
    model = goutsias_model()
    states = _random_support(model, 200, 3, (160, 30, 8, 3, 3, 3))
    rng = np.random.default_rng(42)
    xs = rng.random(len(states))
    y_ref = _oracle_y(model, states, xs)
    for ls in range(model.n_species):
        y_p = _pencil_y(model, states, xs, lane_species=ls)
        np.testing.assert_allclose(
            y_p, y_ref, rtol=1e-12, atol=1e-12,
            err_msg=f"lane_species={ls}",
        )


def test_pencil_layout_multirow():
    """Bases whose lane extent exceeds 128 get several rows."""
    states = np.stack(
        [np.arange(300, dtype=np.int32), np.zeros(300, np.int32)], axis=1
    )
    layout = build_pencil_layout(states, lane_species=0)
    assert layout.n_rows == 3  # ceil(300/128)
    assert layout.mask.sum() == 300
    # slot bijection round-trips coordinates
    r, l = np.divmod(layout.slot_of_state, LANES)
    M = layout.row_block[r] * LANES + l
    np.testing.assert_array_equal(M, states[:, 0])


def test_pencil_solver_e2e_matches_ell():
    """Full adaptive solves on the pencil operator (table_operator=
    "pencil") must agree with the gather-ELL default within solver
    error: same algorithm, same FSP decisions, different SpMV layout."""
    from krylovfspssa_tpu.config import SolverConfig
    from krylovfspssa_tpu.solver import solve_cme

    for model_fn, t, x0 in (
        (bursting_gene_model, 20.0, [[0, 0]]),
        (toggle_file_model, 30.0, [[0, 0]]),
    ):
        model = model_fn()
        kw = dict(fsp_tol=1e-4, krylov_tol=1e-10)
        r_ell = solve_cme(model, t, x0,
                          config=SolverConfig(table_operator="ell"), **kw)
        r_pen = solve_cme(model, t, x0,
                          config=SolverConfig(table_operator="pencil"), **kw)
        assert r_pen.wsum >= 1.0 - 1e-4
        assert r_pen.wsum == pytest.approx(r_ell.wsum, abs=1e-6)
        d = {tuple(s): p for s, p in zip(r_ell.states, r_ell.probabilities)}
        for s, p in zip(r_pen.states, r_pen.probabilities):
            if p > 1e-9:
                assert d.get(tuple(s), 0.0) == pytest.approx(p, abs=1e-6)


def test_pencil_solver_stepwise_and_checkpoint(tmp_path):
    """Pencil path under fused_steps=False, and checkpoint/resume."""
    from krylovfspssa_tpu.config import SolverConfig
    from krylovfspssa_tpu.solver import CmeSolver

    model = bursting_gene_model()
    cfg = SolverConfig(table_operator="pencil", fused_steps=False)
    full = CmeSolver(model, cfg).solve(
        20.0, [[0, 0]], fsp_tol=1e-4, krylov_tol=1e-8
    )
    assert full.wsum >= 1.0 - 1e-4

    path = str(tmp_path / "pencil_ck.npz")
    cfg2 = SolverConfig(table_operator="pencil")
    CmeSolver(model, cfg2).solve(
        20.0, [[0, 0]], fsp_tol=1e-4, krylov_tol=1e-8,
        checkpoint_path=path, checkpoint_every=5,
    )
    resumed = CmeSolver(model, cfg2).solve(20.0, resume_from=path)
    assert resumed.stats.t_final >= 20.0
    assert resumed.wsum == pytest.approx(full.wsum, abs=1e-5)
