"""Chebyshev expv (DGCHBV parity, ideg=0) vs Padé and scipy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.linalg

from krylovfspssa_tpu.config import SolverConfig
from krylovfspssa_tpu.ops.expm import expm_chebyshev_col0, expm_pade


def _stable_hessenberg(mx, mh, seed=0):
    """Random upper-Hessenberg with spectrum on the negative real side —
    the regime the (14,14) Chebyshev approximation is valid in (it is an
    approximation of exp on (-inf, 0], dgchbv.f:30-38)."""
    rng = np.random.default_rng(seed)
    A = np.triu(rng.standard_normal((mx, mx)), k=-1)
    A = A - np.eye(mx) * (np.abs(A).sum(axis=1).max())  # shift spectrum left
    H = np.zeros((mh, mh))
    H[:mx, :mx] = A
    return H


@pytest.mark.parametrize("mx", [5, 12])
def test_chebyshev_col0_matches_scipy(mx):
    mh = 20
    H = _stable_hessenberg(mx, mh, seed=mx)
    t = 0.7
    E, hnorm, ns = expm_chebyshev_col0(
        jnp.asarray(H), jnp.asarray(mx), jnp.asarray(t)
    )
    ref = scipy.linalg.expm(t * H[:mx, :mx])[:, 0]
    np.testing.assert_allclose(
        np.asarray(E)[:mx, 0], ref, rtol=1e-10, atol=1e-12
    )
    assert int(ns) == 0
    # hnorm matches the DGPADMNORM definition
    _, hnorm_p, _ = expm_pade(jnp.asarray(H), jnp.asarray(mx), jnp.asarray(t))
    assert float(hnorm) == pytest.approx(float(hnorm_p))


def test_solver_ideg0_matches_pade():
    from krylovfspssa_tpu.boxsolver import solve_cme_box
    from krylovfspssa_tpu.models.library import bursting_gene_model

    model = bursting_gene_model()
    res_p = solve_cme_box(model, 10.0, [[0, 0]], fsp_tol=1e-5,
                          config=SolverConfig(ideg=6))
    res_c = solve_cme_box(model, 10.0, [[0, 0]], fsp_tol=1e-5,
                          config=SolverConfig(ideg=0))
    assert res_c.wsum >= 1.0 - 1e-5
    d_p = {tuple(s): p for s, p in zip(res_p.states, res_p.probabilities)}
    d_c = {tuple(s): p for s, p in zip(res_c.states, res_c.probabilities)}
    for k in set(d_p) | set(d_c):
        # the two expm backends take different step sequences, so the
        # solutions agree only to the FSP truncation budget
        assert d_c.get(k, 0.0) == pytest.approx(d_p.get(k, 0.0), abs=2e-5)
