"""Native C++ hash table vs numpy oracle (HashTable.f90 parity surface)."""

import numpy as np
import pytest

from krylovfspssa_tpu.native import NativeHashTable, available

pytestmark = pytest.mark.skipif(
    not available(), reason="no C++ toolchain for the native hash"
)


def test_insert_lookup_delete_roundtrip():
    t = NativeHashTable(16)
    keys = np.array([5, 17, 900000000000, 5, -1, 33], dtype=np.int64)
    vals = np.arange(6, dtype=np.int32)
    got = t.insert(keys, vals)
    # duplicate key 5 keeps its first value; invalid key -> -1
    np.testing.assert_array_equal(got, [0, 1, 2, 0, -1, 5])
    assert len(t) == 4
    np.testing.assert_array_equal(
        t.lookup(np.array([5, 17, 33, 900000000000, 12], dtype=np.int64)),
        [0, 1, 5, 2, -1],
    )
    deleted = t.delete(np.array([17, 17, 12], dtype=np.int64))
    np.testing.assert_array_equal(deleted, [True, False, False])
    assert len(t) == 3
    assert t.lookup(np.array([17], dtype=np.int64))[0] == -1
    # tombstone slot is reusable
    t.insert(np.array([17], dtype=np.int64), np.array([9], dtype=np.int32))
    assert t.lookup(np.array([17], dtype=np.int64))[0] == 9


def test_assign_fresh_dedup_semantics():
    t = NativeHashTable(16)
    t.insert(np.array([100], dtype=np.int64), np.array([0], dtype=np.int32))
    keys = np.array([100, 7, 7, 8, -3, 9], dtype=np.int64)
    rows, fresh = t.assign_fresh(keys, next_row=1)
    # 100 present, 7 fresh (row 1; dup filtered), 8 -> 2, -3 invalid, 9 -> 3
    np.testing.assert_array_equal(rows, [-1, 1, -1, 2, -1, 3])
    assert fresh == 3
    assert len(t) == 4


def test_growth_and_random_parity():
    rng = np.random.default_rng(0)
    t = NativeHashTable(8)  # force many growth cycles
    oracle = {}
    next_row = 0
    for _ in range(20):
        batch = rng.integers(0, 5000, size=500).astype(np.int64)
        rows, fresh = t.assign_fresh(batch, next_row)
        seen = set()
        for k, r in zip(batch.tolist(), rows.tolist()):
            if k in oracle or k in seen:
                assert r == -1
            else:
                assert r >= next_row
                oracle[k] = r
                seen.add(k)
        next_row += fresh
    assert len(t) == len(oracle)
    q = np.array(list(oracle), dtype=np.int64)
    np.testing.assert_array_equal(
        t.lookup(q), np.array([oracle[k] for k in q.tolist()], np.int32)
    )
