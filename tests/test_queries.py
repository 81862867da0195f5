"""Unit tests for solution-query helpers (marginals, moments)."""

import numpy as np

from krylovfspssa_tpu.utils.queries import marginal, mean, variance


def _fixture():
    # 2-species toy distribution on 4 states
    states = np.array([[0, 0], [1, 0], [0, 2], [1, 2]], dtype=np.int32)
    probs = np.array([0.1, 0.2, 0.3, 0.4])
    return states, probs


def test_marginal_sums_and_values():
    states, probs = _fixture()
    m0 = marginal(states, probs, 0)
    m1 = marginal(states, probs, 1)
    assert np.allclose(m0, [0.4, 0.6])
    assert np.allclose(m1, [0.3, 0.0, 0.7])
    assert np.isclose(m0.sum(), probs.sum())
    assert np.isclose(m1.sum(), probs.sum())


def test_moments_match_dense():
    states, probs = _fixture()
    w = probs.sum()
    s = states.astype(float)
    mu_ref = (s * probs[:, None]).sum(0) / w
    var_ref = (s**2 * probs[:, None]).sum(0) / w - mu_ref**2
    assert np.allclose(mean(states, probs), mu_ref)
    assert np.allclose(variance(states, probs), var_ref)


def test_moments_normalize_truncated_mass():
    states, probs = _fixture()
    # scaling the captured mass (FSP truncation) must not change moments
    assert np.allclose(mean(states, probs), mean(states, 0.5 * probs))
    assert np.allclose(variance(states, probs), variance(states, 0.5 * probs))
