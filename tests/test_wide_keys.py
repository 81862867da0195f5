"""Multi-word state keys: key spaces wider than one 62-bit int64.

At the reference per-species cap MAXNUMBERMOLECULES = 10000 (14 bits),
models with more than 4 species exceed one key word; the encoder packs
them into (n, n_words) int64 keys and membership becomes a lexicographic
binary search (the packed-radix replacement for the reference's 150-digit
bignum keys, big_integer_module.f90 / HashTable.f90:39-59).
"""

import numpy as np
import jax.numpy as jnp

from krylovfspssa_tpu.ops.operator import lookup_keys
from krylovfspssa_tpu.statespace.encoding import StateEncoder
from krylovfspssa_tpu.statespace.table import StateTable


def test_wide_encoder_roundtrip():
    enc = StateEncoder.for_model(7, 10_000)
    assert enc.n_words == 2
    assert enc.species_cap >= 10_000
    rng = np.random.default_rng(0)
    states = rng.integers(0, 10_001, size=(500, 7)).astype(np.int32)
    keys = np.asarray(enc.encode(states))
    assert keys.shape == (500, 2)
    assert np.all(keys >= 0)
    back = np.asarray(enc.decode(jnp.asarray(keys)))
    np.testing.assert_array_equal(back, states)
    # out-of-range -> all words -1
    bad = states.copy()
    bad[0, 3] = enc.species_cap + 1
    bad[1, 0] = -1
    kb = np.asarray(enc.encode(bad))
    assert np.all(kb[0] == -1) and np.all(kb[1] == -1)
    assert np.all(kb[2:] >= 0)


def test_wide_encoder_distinct_keys():
    """Keys must be injective over a grid spanning both words."""
    enc = StateEncoder.for_model(6, 10_000)
    assert enc.n_words == 2
    g = np.stack(
        np.meshgrid(*[np.arange(3)] * 6, indexing="ij"), axis=-1
    ).reshape(-1, 6)
    keys = np.asarray(enc.encode(g))
    assert np.unique(keys, axis=0).shape[0] == g.shape[0]


def test_wide_table_lookup_and_merge():
    enc = StateEncoder.for_model(6, 10_000)
    rng = np.random.default_rng(1)
    states = np.unique(
        rng.integers(0, 9000, size=(300, 6)).astype(np.int32), axis=0
    )
    t = StateTable.from_states(states, enc, capacity=1024)
    assert t.host_index is None  # native hash is single-word only
    # every inserted state is found at its own row
    rows = np.asarray(t.lookup_states(states))
    got = np.asarray(t.states)[rows]
    np.testing.assert_array_equal(got, states)
    # absent states return -1
    absent = states.copy()
    absent[:, 0] += 9001
    assert np.all(np.asarray(t.lookup_states(absent)) == -1)
    # merge adds only the genuinely new ones
    extra = states.copy()
    extra[:100, 1] = extra[:100, 1] % 50 + 9001  # stays under species_cap
    keys = np.asarray(enc.encode(extra))
    t2, added = t.merge_keys(keys, extra)
    assert added == np.unique(extra[:100], axis=0).shape[0]
    rows2 = np.asarray(t2.lookup_states(extra[:100]))
    assert np.all(rows2 >= 0)


def test_wide_lookup_keys_against_bruteforce():
    enc = StateEncoder.for_model(5, 10_000)
    assert enc.n_words == 2
    rng = np.random.default_rng(2)
    states = np.unique(
        rng.integers(0, 50, size=(200, 5)).astype(np.int32), axis=0
    )
    t = StateTable.from_states(states, enc, capacity=512)
    queries = rng.integers(0, 50, size=(400, 5)).astype(np.int32)
    qk = enc.encode(queries)
    got = np.asarray(lookup_keys(t.sorted_keys, t.sorted_to_row, qk))
    want = np.full(400, -1, dtype=np.int32)
    lut = {tuple(s): i for i, s in enumerate(states)}
    for i, q in enumerate(queries):
        want[i] = lut.get(tuple(q), -1)
    np.testing.assert_array_equal(got, want)


def test_wide_key_solve_e2e():
    """Table-backend end-to-end solve on a 5-species model whose key space
    (5 x 14 bits) exceeds one int64 word — the overflow scenario that
    round 1 rejected outright (statespace/encoding.py)."""
    from krylovfspssa_tpu.models.library import ge5d_model
    from krylovfspssa_tpu.solver import solve_cme

    model = ge5d_model()
    res = solve_cme(
        model, 0.3, [[0, 0, 0, 0, 0]], fsp_tol=1e-4, krylov_tol=1e-8
    )
    assert res.stats.nstep >= 1
    assert res.wsum >= 1.0 - 1e-4
    assert res.table.encoder.n_words == 2
