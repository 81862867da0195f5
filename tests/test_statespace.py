"""State encoding, table membership, expansion, and drop tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from krylovfspssa_tpu.statespace.encoding import StateEncoder
from krylovfspssa_tpu.statespace.table import StateTable
from krylovfspssa_tpu.statespace.expand import onestep_extend, ssa_extend
from krylovfspssa_tpu.statespace.drop import drop_mask_device


def test_encoder_roundtrip():
    enc = StateEncoder.for_model(3, max_molecules=10_000)
    rng = np.random.default_rng(0)
    states = rng.integers(0, enc.species_cap + 1, size=(1000, 3))
    keys = np.asarray(enc.encode(states))
    assert np.unique(keys).size == np.unique(states, axis=0).shape[0]
    back = np.asarray(enc.decode(jnp.asarray(keys)))
    np.testing.assert_array_equal(back, states)


def test_encoder_bounds():
    enc = StateEncoder.for_model(2, max_molecules=10_000)
    assert enc.species_cap >= 10_000  # 2 species fit the full reference cap
    keys = np.asarray(enc.encode(np.array([[-1, 0], [0, enc.species_cap + 1]])))
    assert np.all(keys == -1)
    enc6 = StateEncoder.for_model(6, max_molecules=10_000)
    # 6 species cannot fit radix 10001 in int64; cap reduced but still large
    assert enc6.species_cap >= 1000


def test_encoder_reaction_deltas():
    enc = StateEncoder.for_model(3, max_molecules=100)
    stoich = np.array([[1, 0, -1], [0, 2, 0]])
    deltas = enc.reaction_deltas(stoich)
    x = np.array([[5, 5, 5]])
    for r in range(2):
        k0 = int(np.asarray(enc.encode(x))[0])
        k1 = int(np.asarray(enc.encode(x + stoich[r]))[0])
        assert k1 - k0 == deltas[r]


def test_table_lookup_and_merge():
    enc = StateEncoder.for_model(2, max_molecules=100)
    init = np.array([[0, 0], [1, 0], [0, 1]])
    t = StateTable.from_states(init, enc, capacity=8)
    assert t.n == 3
    idx = np.asarray(t.lookup_states(np.array([[0, 0], [1, 0], [5, 5], [0, 1]])))
    np.testing.assert_array_equal(idx, [0, 1, -1, 2])

    new_states = np.array([[2, 2], [1, 0], [2, 2], [3, 3]])
    new_keys = np.asarray(enc.encode(new_states))
    t2, added = t.merge_keys(new_keys, new_states)
    assert added == 2
    assert t2.n == 5
    # old rows preserved
    idx = np.asarray(t2.lookup_states(init))
    np.testing.assert_array_equal(idx, [0, 1, 2])
    idx = np.asarray(t2.lookup_states(np.array([[2, 2], [3, 3]])))
    assert set(idx.tolist()) == {3, 4}


def test_table_capacity_growth():
    enc = StateEncoder.for_model(1, max_molecules=1000)
    t = StateTable.from_states(np.array([[0]]), enc, capacity=4)
    states = np.arange(20)[:, None]
    t2, added = t.merge_keys(np.asarray(enc.encode(states)), states)
    assert added == 19
    assert t2.capacity >= 20 and (t2.capacity & (t2.capacity - 1)) == 0


def test_table_overflow_raises():
    enc = StateEncoder.for_model(1, max_molecules=1000)
    t = StateTable.from_states(np.array([[0]]), enc, capacity=4, max_capacity=8)
    states = np.arange(20)[:, None]
    with pytest.raises(OverflowError):
        t.merge_keys(np.asarray(enc.encode(states)), states, max_capacity=8)


def test_table_compact():
    enc = StateEncoder.for_model(1, max_molecules=1000)
    states = np.arange(6)[:, None]
    t = StateTable.from_states(states, enc, capacity=8)
    keep = np.array([True, False, True, True, False, True])
    t2, remap = t.compact(keep)
    assert t2.n == 4
    np.testing.assert_array_equal(remap, [0, -1, 1, 2, -1, 3])
    idx = np.asarray(t2.lookup_states(states))
    np.testing.assert_array_equal(idx, [0, -1, 1, 2, -1, 3])


def test_onestep_extend_birth_death():
    enc = StateEncoder.for_model(1, max_molecules=1000)
    t = StateTable.from_states(np.array([[0]]), enc, capacity=4)
    stoich = np.array([[1], [-1]])
    t, added = onestep_extend(t, stoich, None)
    # from {0}: successors {1} (birth); death illegal
    assert added == 1 and t.n == 2
    t, added = onestep_extend(t, stoich, None)
    assert added == 1 and t.n == 3
    got = np.sort(np.asarray(t.states[: t.n]).ravel())
    np.testing.assert_array_equal(got, [0, 1, 2])


def test_ssa_extend_explores():
    import jax

    enc = StateEncoder.for_model(2, max_molecules=1000)
    t = StateTable.from_states(np.array([[0, 0]]), enc, capacity=8)
    stoich = np.array([[1, 0], [0, 1], [-1, 0], [0, -1]])

    def props(states):
        x = states.astype(jnp.float64)
        return jnp.stack(
            [
                jnp.full(x.shape[0], 10.0),
                jnp.full(x.shape[0], 10.0),
                1.0 * x[:, 0],
                1.0 * x[:, 1],
            ],
            axis=1,
        )

    t2, added = ssa_extend(
        t, props, stoich, t_budget=5.0, rng=jax.random.PRNGKey(0),
        max_steps=50, max_capacity=None,
    )
    assert added > 5  # walks with rate-20 production must find many states
    # all discovered states are legal
    st = np.asarray(t2.states[: t2.n])
    assert np.all(st >= 0)


def test_drop_mask():
    w = jnp.asarray(np.array([0.5, 0.4, 1e-9, 1e-12, 0.0, 0.0, 0.0, 0.0]))
    inflow = jnp.zeros(8)
    mask, count, droptol = drop_mask_device(
        w, inflow, jnp.asarray(6), jnp.asarray(1e-6)
    )
    mask = np.asarray(mask)
    # the two tiny states and the two zero (active) states drop
    np.testing.assert_array_equal(mask[:6], [False, False, True, True, True, True])
    assert not mask[6:].any()  # padding rows never marked
    assert int(count) == 4

    # inflow guard keeps states that are about to receive mass
    inflow = jnp.asarray(np.array([0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0]))
    mask, count, _ = drop_mask_device(
        w, inflow, jnp.asarray(6), jnp.asarray(1e-6)
    )
    assert not np.asarray(mask)[2]
    assert int(count) == 3


def test_drop_tightens_threshold():
    # large mass below 1e-8 forces the threshold ladder to descend
    w_np = np.full(64, 2e-9)
    w_np[0] = 1.0
    w = jnp.asarray(w_np)
    mask, count, droptol = drop_mask_device(
        w, jnp.zeros(64), jnp.asarray(64), jnp.asarray(1e-8)
    )
    # at droptol=1e-8 the droppable mass is 63*2e-9 >> dsum; ladder must
    # descend to 1e-9 where nothing is below threshold
    assert float(droptol) <= 1e-9
    assert int(count) == 0
