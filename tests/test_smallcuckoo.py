"""SmallCuckoo semisorted compression laws (reference
test/cuckoo_bucket.jl:141-168 analogues, computed combinadically)."""

import numpy as np
import pytest

from probably_jl_spark.sketches.cuckoo import CuckooFilter
from probably_jl_spark.sketches.hashing import xxhash64_any
from probably_jl_spark.sketches.smallcuckoo import (
    N_PREFIX_CODES,
    SmallCuckooFilter,
    decode_bucket,
    encode_bucket,
    prefix_rank,
    prefix_unrank,
)


def test_prefix_code_space():
    # reference: PREFIXES has exactly 3876 sorted unique entries (:141-145)
    assert N_PREFIX_CODES == 3876
    seen = set()
    for a in range(16):
        for b in range(a, 16):
            for c in range(b, 16):
                for d in range(c, 16):
                    r = prefix_rank((a, b, c, d))
                    assert 0 <= r < 3876
                    assert prefix_unrank(r) == (a, b, c, d)
                    seen.add(r)
    assert len(seen) == 3876  # bijective


@pytest.mark.parametrize("f", [4, 8, 12, 16])
def test_encode_decode_identity(f):
    # reference: encode∘decode identity and the 4-bit saving (:147-168)
    rs = np.random.default_rng(f)
    for _ in range(100):
        fps = sorted(int(x) for x in rs.integers(0, 1 << f, size=4))
        nbits, code = encode_bucket(fps, f)
        assert nbits == 4 * f - 4  # exactly 4 bits saved per bucket
        assert decode_bucket(code, f) == fps


def test_serialized_roundtrip_membership_and_canonical_form():
    f = SmallCuckooFilter(1 << 10, f=12)
    keys = [f"k{i}" for i in range(600)]
    f.update_hashes(np.array([xxhash64_any(k) for k in keys], dtype=np.uint64))
    blob = f.to_bytes()
    back = SmallCuckooFilter.from_bytes(blob)
    # membership fully preserved (slot order within a bucket is not
    # semantic: set semantics, reference filter.jl:28-31)
    for k in keys:
        assert back.contains(k)
    # the serialized form is canonical: serialize(deserialize(x)) == x
    assert back.to_bytes() == blob
    # estimates/metrics preserved
    assert back.loadfactor() == f.loadfactor()
    assert back.ejected == f.ejected


def test_smaller_than_fast_serialization():
    fast = CuckooFilter(1 << 12, f=12)
    small = SmallCuckooFilter(1 << 12, f=12)
    h = np.array([xxhash64_any(f"k{i}") for i in range(1000)], dtype=np.uint64)
    fast.update_hashes(h)
    small.update_hashes(h)
    # identical in-memory semantics (same base class, same updates)
    assert np.array_equal(fast.buckets, small.buckets)
    # wire format: 44 bits/bucket vs 64 (uint64 Fast payload)
    assert len(small.to_bytes()) < len(fast.to_bytes())
    saving = 1 - (len(small.to_bytes()) / len(fast.to_bytes()))
    assert saving > 0.25  # 44/64 -> ~31% smaller payload


def test_closed_filter_roundtrip():
    f = SmallCuckooFilter(16, f=8)
    i = 0
    while f.push(f"k{i}"):
        i += 1
    assert f.ejected != 0
    back = SmallCuckooFilter.from_bytes(f.to_bytes())
    assert back.ejected == f.ejected and back.ejected_index == f.ejected_index
