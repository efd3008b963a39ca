"""HLL laws mirroring reference test/hyperloglog.jl plus the accuracy gate
the reference left as a stub (test/accuracy.jl:1-8)."""

import numpy as np
import pytest

from probably_jl_spark.sketches.hll import HyperLogLog
from tests.conftest import hash_stream


def test_param_validation():
    # reference: P in 4:18 enforced (hyperloglog.jl:39-41; test :23-36)
    for p in (3, 19, 0):
        with pytest.raises(ValueError):
            HyperLogLog(p)
    for p in (4, 14, 18):
        assert HyperLogLog(p).m == 2**p


def test_sizeof_and_empty():
    h = HyperLogLog(14)
    assert h.sizeof() == 2**14
    assert h.is_empty()
    assert h.cardinality() == 0  # empty => estimate 0 (< 5, test :110-128)
    h.update_hashes(hash_stream(10))
    assert not h.is_empty()
    h.clear()
    assert h.is_empty()


def test_identical_pushes_identical_registers():
    # reference test/hyperloglog.jl:45-70
    s = hash_stream(5000, seed=7)
    a, b = HyperLogLog(), HyperLogLog()
    a.update_hashes(s)
    b.update_hashes(s[:2500])
    b.update_hashes(s[2500:])
    assert a == b
    assert a.to_bytes() == b.to_bytes()


def test_merge_law_identical_to_union_stream():
    # reference test/hyperloglog.jl:72-88: union(x,y) register-identical to
    # a sketch fed the concatenated streams, with overlap.
    for seed in range(5):
        rs = np.random.default_rng(seed)
        pool = rs.integers(0, 2**64, size=3000, dtype=np.uint64)
        sa = pool[rs.random(3000) < 0.66]
        sb = pool[rs.random(3000) < 0.66]
        x, y, u = HyperLogLog(), HyperLogLog(), HyperLogLog()
        x.update_hashes(sa)
        y.update_hashes(sb)
        u.update_hashes(np.concatenate([sa, sb]))
        merged = x.copy().merge(y)
        assert merged == u
        # commutativity
        assert y.copy().merge(x) == merged
        # idempotence
        assert merged.copy().merge(merged) == merged


def test_merge_associativity_random_trees():
    parts = [hash_stream(1000, seed=s) for s in range(6)]
    sketches = []
    for ps in parts:
        h = HyperLogLog()
        h.update_hashes(ps)
        sketches.append(h)
    left = sketches[0].copy()
    for s in sketches[1:]:
        left.merge(s)
    right = sketches[-1].copy()
    for s in reversed(sketches[:-1]):
        right.merge(s)
    assert left == right


def test_merge_p_mismatch_raises():
    with pytest.raises(ValueError):
        HyperLogLog(14).merge(HyperLogLog(12))


def test_serialization_roundtrip():
    h = HyperLogLog()
    h.update_hashes(hash_stream(10_000, seed=3))
    data = h.to_bytes()
    h2 = HyperLogLog.from_bytes(data)
    assert h2 == h and h2.to_bytes() == data


def test_small_batch_and_large_batch_paths_agree():
    # the >4096 segment-max fast path must equal the ufunc.at path
    s = hash_stream(20_000, seed=9)
    a, b = HyperLogLog(), HyperLogLog()
    a.update_hashes(s)  # fast path
    for chunk in np.array_split(s, 10):  # small-path chunks
        b.update_hashes(chunk)
    assert a == b


@pytest.mark.parametrize("n", [1_000, 100_000, 1_000_000])
def test_accuracy_bound(n):
    """|est - N|/N <= 3 * 1.04/sqrt(2^14) on distinct seeded hashes
    (BASELINE.md accuracy target; reference publishes the bound at
    hyperloglog.jl:20-24 but never tests it)."""
    h = HyperLogLog(14)
    # distinct items: use a permutation-free counter hashed stream
    from probably_jl_spark.sketches.hashing import xxhash64_long_array

    vals = xxhash64_long_array(np.arange(n, dtype=np.int64))
    h.update_hashes(vals)
    est = h.estimate()
    rel = abs(est - n) / n
    assert rel <= 3 * HyperLogLog.error_bound(14), f"rel err {rel:.4f} at n={n}"
