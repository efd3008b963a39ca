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


@pytest.mark.parametrize("f", [20, 32])
def test_wide_f_roundtrip(f):
    """Semisort codec at F>16 (two-word buckets, big-int bit stream)."""
    filt = SmallCuckooFilter(1 << 10, f=f)
    keys = [f"k{i}" for i in range(300)]
    assert filt.update_hashes(np.array([xxhash64_any(k) for k in keys], dtype=np.uint64))
    blob = filt.to_bytes()
    back = SmallCuckooFilter.from_bytes(blob)
    for k in keys:
        assert back.contains(k)
    assert back.to_bytes() == blob
    # still 4 bits/bucket smaller than the Fast layout payload
    assert len(blob) < len(CuckooFilter.to_bytes(filt))


def test_copy_preserves_subclass_and_format():
    """ADVICE r01: copy() must not downgrade SmallCuckooFilter to the
    uncompressed v1 wire format."""
    f = SmallCuckooFilter(1 << 8, f=12)
    f.update_hashes(np.array([xxhash64_any(f"k{i}") for i in range(100)], dtype=np.uint64))
    c = f.copy()
    assert type(c) is SmallCuckooFilter
    assert c.to_bytes() == f.to_bytes()


def test_codec_linear_time():
    """ADVICE r01: to_bytes/from_bytes must be ~linear in filter size —
    the old whole-payload big-int codec was quadratic (1.05s at len=1<<16,
    4x size => ~16x time). Asymptotic check: 4x the filter must cost well
    under the quadratic 16x (min-of-3 timings; generous 8x threshold and
    a loose absolute bound keep this stable under co-tenant load)."""
    import time

    def codec_time(len_slots, n_keys):
        f = SmallCuckooFilter(len_slots, f=12)
        f.update_hashes(np.arange(n_keys, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        enc = dec = float("inf")
        blob = None
        for _ in range(3):
            t0 = time.perf_counter()
            blob = f.to_bytes()
            enc = min(enc, time.perf_counter() - t0)
            t0 = time.perf_counter()
            back = SmallCuckooFilter.from_bytes(blob)
            dec = min(dec, time.perf_counter() - t0)
        assert back.to_bytes() == blob
        return enc + dec

    t1 = codec_time(1 << 14, 10_000)
    t4 = codec_time(1 << 16, 40_000)
    assert t4 < 8 * max(t1, 1e-4), (t1, t4)  # quadratic would be ~16x
    assert t4 < 2.0  # sanity: the old codec took >2s at this size


def test_vectorized_matches_scalar_codec():
    """The numpy fast path (f<=16) must produce byte-identical streams to
    the scalar big-int path used for f>16."""
    from probably_jl_spark.sketches import codec as _codec
    from probably_jl_spark.sketches.smallcuckoo import _HDR, encode_bucket

    f = SmallCuckooFilter(1 << 8, f=12)
    f.update_hashes(np.array([xxhash64_any(f"k{i}") for i in range(150)], dtype=np.uint64))
    # scalar re-encode (the f>16 branch's algorithm, applied at f=12)
    acc, acc_bits, out = 0, 0, bytearray()
    for b in range(f.nbuckets):
        w = f._get_bucket(b)
        fps = [(w >> (s * f.f)) & f.fpmask for s in range(4)]
        nbits, code = encode_bucket(fps, f.f)
        acc = (acc << nbits) | code
        acc_bits += nbits
        while acc_bits >= 8:
            acc_bits -= 8
            out.append((acc >> acc_bits) & 0xFF)
        acc &= (1 << acc_bits) - 1
    if acc_bits:
        out.append((acc << (8 - acc_bits)) & 0xFF)
    hdr = _HDR.pack(f.f, f.nbuckets, f.ejected, f.ejected_index)
    expect = _codec.wrap(_codec.KIND_CUCKOO, hdr, bytes(out), version=2)
    assert f.to_bytes() == expect


# ------------------------- resident semisorted layout (VERDICT r02 #9)


@pytest.mark.parametrize("f", [8, 12, 16, 20])
def test_resident_matches_fast_semantics(f):
    """Same inserts into a Fast filter and a ResidentSmallCuckoo: no
    false negatives on either, identical member SETS at low load (no
    kicks), cross-layout equality via the canonical semisorted coding."""
    from probably_jl_spark.sketches.cuckoo import CuckooFilter
    from probably_jl_spark.sketches.smallcuckoo import ResidentSmallCuckoo

    rs = np.random.default_rng(5)
    h = rs.integers(0, 2**64, size=400, dtype=np.uint64)
    fast = CuckooFilter(1 << 11, f=f)
    small = ResidentSmallCuckoo(1 << 11, f=f)
    assert fast.update_hashes(h)
    assert small.update_hashes(h)
    assert small.contains_hashes(h).all()  # no false negatives
    assert fast.contains_hashes(h).all()
    assert abs(small.loadfactor() - fast.loadfactor()) < 1e-12
    assert small == fast  # cross-layout canonical equality (low load)

    # vectorized == scalar membership on absent keys too
    probe = rs.integers(0, 2**64, size=500, dtype=np.uint64)
    vec = small.contains_hashes(probe)
    for hh, v in zip(probe.tolist(), vec.tolist()):
        assert small.contains_hash(hh) == v


def test_resident_is_wire_identical_and_smaller():
    """The resident layout IS the v2 wire payload (memcpy round-trip),
    and is smaller than the Fast word layout."""
    from probably_jl_spark.sketches.cuckoo import CuckooFilter
    from probably_jl_spark.sketches.smallcuckoo import (
        ResidentSmallCuckoo,
        SmallCuckooFilter,
    )

    rs = np.random.default_rng(9)
    h = rs.integers(0, 2**64, size=1000, dtype=np.uint64)
    small = ResidentSmallCuckoo(1 << 12, f=12)
    small.update_hashes(h)
    blob = small.to_bytes()
    back = ResidentSmallCuckoo.from_bytes(blob)
    assert back == small
    assert back.to_bytes() == blob
    # the same blob decodes into the Fast-resident SmallCuckooFilter with
    # identical membership
    fastside = SmallCuckooFilter.from_bytes(blob)
    assert fastside.contains_hashes(h).all()
    # f=12: 44 bits/bucket resident vs 64 — ~31% smaller
    fast = CuckooFilter(1 << 12, f=12)
    assert small.stats()["memory_bytes"] < 0.72 * fast.stats()["memory_bytes"]
    assert small.stats()["layout"] == "resident-semisorted"


def test_resident_pop_and_merge():
    from probably_jl_spark.sketches.cuckoo import CuckooFilter
    from probably_jl_spark.sketches.smallcuckoo import ResidentSmallCuckoo

    a = ResidentSmallCuckoo(1 << 10, f=12)
    b = ResidentSmallCuckoo(1 << 10, f=12)
    fast = CuckooFilter(1 << 10, f=12)
    for k in range(200):
        assert a.push(f"a{k}")
        assert b.push(f"b{k}")
        assert fast.push(f"c{k}")
    # pop removes and membership reflects it (fixture chosen so a7's
    # (fp, bucket) is collision-free among the 200 keys)
    assert a.pop("a7")
    assert not a.contains("a7")
    # resident + resident and resident + fast merges
    _, ok = a.merge(b)
    assert ok
    for k in range(200):
        assert a.contains(f"b{k}")
    _, ok = a.merge(fast)
    assert ok
    for k in range(200):
        assert a.contains(f"c{k}")


def test_resident_spark_build_roundtrip(spark):
    """SketchSpec(smallcuckoo, resident=True) builds through the fused
    Spark path; states decode and contain every key."""
    from probably_jl_spark.operators.build import sketch_table
    from probably_jl_spark.operators.specs import SketchSpec

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    spec = SketchSpec(
        "types_rsc", "smallcuckoo",
        key_cols=("event_type",), params={"len": 1 << 12, "resident": True},
    )
    res = sketch_table(ev, [spec])
    sk = res.sketches["types_rsc"]
    for r in ev.select("event_type").distinct().collect():
        assert sk.contains(r["event_type"])


def test_cross_layout_merge_and_eq_symmetry():
    """code-review r3: Fast.merge(Resident) must work (layout-agnostic
    _nonzero_buckets) and ==/!= must be symmetric between the sibling
    Small and Resident classes."""
    from probably_jl_spark.sketches.cuckoo import CuckooFilter
    from probably_jl_spark.sketches.smallcuckoo import (
        ResidentSmallCuckoo,
        SmallCuckooFilter,
    )

    res = ResidentSmallCuckoo(1 << 10, f=12)
    fast = CuckooFilter(1 << 10, f=12)
    for k in range(150):
        assert res.push(f"r{k}")
        assert fast.push(f"f{k}")
    _, ok = fast.merge(res)  # base merge with a resident `other`
    assert ok
    for k in range(150):
        assert fast.contains(f"r{k}")

    blob = res.to_bytes()
    small = SmallCuckooFilter.from_bytes(blob)
    res2 = ResidentSmallCuckoo.from_bytes(blob)
    assert small == res2 and res2 == small  # symmetric across siblings
    assert res2.push("extra")
    assert (small == res2) == (res2 == small) == False


def test_pack_unpack_chunked_wire_identical():
    """pack_payload/from_bytes process the bit expansion in bounded
    chunks (code-review r5: the one-shot (buckets x bits) uint64
    temporary cost ~64x the payload). Any chunk setting must produce the
    SAME wire bytes and decode back canonically."""
    from probably_jl_spark.sketches import smallcuckoo as sc

    f = SmallCuckooFilter(1 << 10, 12)
    rng = np.random.RandomState(0)
    hs = rng.randint(0, 2**63, 600).astype(np.uint64)
    f.update_hashes(hs)
    one = f.to_bytes()
    try:
        for ch in (2, 3, 6, 10, 1 << 20):
            sc._PACK_CHUNK = ch
            assert f.to_bytes() == one
            g = SmallCuckooFilter.from_bytes(one)
            assert g.to_bytes() == one
            assert bool(g.contains_hashes(hs).all())
    finally:
        sc._PACK_CHUNK = 1 << 20


def test_resident_eq_includes_ejected_index():
    from probably_jl_spark.sketches.smallcuckoo import ResidentSmallCuckoo

    """Same law as CuckooFilter.__eq__ (pop! re-pushes the ejected fp at
    its recorded index; the wire serializes it): resident filters
    differing only in ejected_index are NOT equal."""
    a = ResidentSmallCuckoo(8, 12)
    b = ResidentSmallCuckoo(8, 12)
    a.ejected, a.ejected_index = 5, 1
    b.ejected, b.ejected_index = 5, 2
    assert a != b and hash(a) != hash(b)
    b.ejected_index = 1
    assert a == b and hash(a) == hash(b)
