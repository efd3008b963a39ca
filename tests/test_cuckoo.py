"""Cuckoo laws mirroring reference test/cuckoo_filter.jl."""

import numpy as np
import pytest

from probably_jl_spark.sketches.cuckoo import CuckooFilter, constrain_cuckoo
from probably_jl_spark.sketches.hashing import xxhash64_any


def _hashes(keys):
    return np.array([xxhash64_any(k) for k in keys], dtype=np.uint64)


def test_constructor_constraints():
    # reference test/cuckoo_filter.jl:1-21: pow-2 length >= 4
    for bad in (3, 5, 6, 100):
        with pytest.raises(ValueError):
            CuckooFilter(bad)
    with pytest.raises(ValueError):
        CuckooFilter(64, f=3)
    with pytest.raises(ValueError):
        CuckooFilter(64, f=33)
    assert CuckooFilter(64, f=12).nbuckets == 16
    # reference allows F up to 32 (filter.jl:77-129); wide fingerprints
    # use two uint64 words per bucket
    assert CuckooFilter(64, f=17).wpb == 2
    assert CuckooFilter(64, f=32).wpb == 2
    assert CuckooFilter(64, f=16).wpb == 1


def test_membership_after_push():
    # reference test/cuckoo_filter.jl:30-58
    f = CuckooFilter(1 << 10, f=12)
    keys = [f"k{i}" for i in range(200)]
    assert f.update_hashes(_hashes(keys))
    for k in keys:
        assert f.contains(k)
    vec = f.contains_hashes(_hashes(keys))
    assert vec.all()


def test_contains_hashes_matches_scalar_on_absent():
    f = CuckooFilter(1 << 10, f=10)
    f.update_hashes(_hashes([f"k{i}" for i in range(100)]))
    probe = [f"z{i}" for i in range(300)]
    vec = f.contains_hashes(_hashes(probe))
    for k, v in zip(probe, vec.tolist()):
        assert f.contains(k) == v


def test_overfilled_push_returns_false_and_closes():
    # reference test/cuckoo_filter.jl:49-57
    f = CuckooFilter(16, f=8)  # 4 buckets, 16 slots
    ok = True
    for i in range(200):
        ok &= f.push(f"k{i}")
    assert not ok
    assert f.ejected != 0
    # closed filter rejects further inserts but keeps no-false-negatives
    assert f.push("brand-new-key") is False


def test_no_false_negatives_until_closed():
    f = CuckooFilter(1 << 8, f=12)
    inserted = []
    for i in range(1000):
        if f.push(f"k{i}"):
            inserted.append(f"k{i}")
        else:
            break
    for k in inserted:
        assert f.contains(k)


def test_index_involution():
    # reference test/cuckoo_filter.jl:137-146
    f = CuckooFilter(1 << 12, f=12)
    rs = np.random.default_rng(5)
    h = rs.integers(0, 2**64, size=100, dtype=np.uint64)
    fp = f.fingerprints(h)
    i1 = f.primary_index(h)
    i2 = f.other_index(i1, fp)
    back = f.other_index(i2, fp)
    assert np.array_equal(back, i1)
    assert (fp != 0).all()  # fingerprint never zero (test/cuckoo_bucket.jl:95-101)


def test_pop_removes():
    # reference test/cuckoo_filter.jl:161-190 (fingerprint-deduped inputs)
    f = CuckooFilter(1 << 10, f=14)
    keys = [f"k{i}" for i in range(50)]
    # dedupe by (fp, i1) to dodge collisions, as the reference test does
    seen, uniq = set(), []
    for k in keys:
        h = xxhash64_any(k)
        sig = (f.fingerprint_scalar(h), h & f.mask)
        if sig not in seen:
            seen.add(sig)
            uniq.append(k)
    f.update_hashes(_hashes(uniq))
    for k in uniq:
        assert f.contains(k)
        assert f.pop(k)
        assert not f.contains(k)
    assert f.is_empty()


def test_pop_reopens_closed_filter():
    f = CuckooFilter(16, f=8)
    pushed = []
    i = 0
    while True:
        k = f"k{i}"
        if not f.push(k):
            break
        pushed.append(k)
        i += 1
    assert f.ejected != 0
    victim = pushed[0]
    f.pop(victim)
    assert f.ejected == 0  # ejected slot re-inserted => reopened


def test_union_membership_superset():
    # reference test/cuckoo_filter.jl:192-210: membership postcondition,
    # not byte equality (kick order differs)
    a = CuckooFilter(1 << 10, f=12)
    b = CuckooFilter(1 << 10, f=12)
    ka = [f"a{i}" for i in range(100)]
    kb = [f"b{i}" for i in range(100)]
    a.update_hashes(_hashes(ka))
    b.update_hashes(_hashes(kb))
    merged, ok = a.copy().merge(b)
    assert ok
    for k in ka + kb:
        assert merged.contains(k)


def test_merge_mismatch_raises():
    with pytest.raises(ValueError):
        CuckooFilter(64, f=12).merge(CuckooFilter(128, f=12))
    with pytest.raises(ValueError):
        CuckooFilter(64, f=12).merge(CuckooFilter(64, f=8))


def test_loadfactor_quarter_fill():
    # reference test/cuckoo_filter.jl:119-127
    f = CuckooFilter(1 << 10, f=14)
    n = (4 * f.nbuckets) // 4
    f.update_hashes(_hashes([f"k{i}" for i in range(n)]))
    assert abs(f.loadfactor() - 0.25) < 0.02
    assert f.capacity() == int(0.95 * 4 * f.nbuckets)


def test_deterministic_rebuild():
    """Counter-based kick choice => identical states across rebuilds
    (resumability requirement, SURVEY.md §7)."""
    keys = _hashes([f"k{i}" for i in range(900)])
    a = CuckooFilter(1 << 10, f=12)
    b = CuckooFilter(1 << 10, f=12)
    a.update_hashes(keys)
    b.update_hashes(keys)
    assert a == b and a.to_bytes() == b.to_bytes()


def test_serialization_roundtrip():
    f = CuckooFilter(1 << 8, f=12)
    f.update_hashes(_hashes([f"k{i}" for i in range(100)]))
    data = f.to_bytes()
    back = CuckooFilter.from_bytes(data)
    assert back == f and back.to_bytes() == data


def test_empirical_fpr():
    f = CuckooFilter(1 << 12, f=12)
    f.update_hashes(_hashes([f"in{i}" for i in range(3000)]))
    probes = _hashes([f"out{i}" for i in range(30_000)])
    fpr = f.contains_hashes(probes).mean()
    assert fpr <= 2 * f.fprof() + 0.002


def test_constrain():
    plan = constrain_cuckoo(fpr=0.001, capacity=10_000)
    assert plan.capacity >= 10_000
    assert plan.fpr <= 0.001 * 1.05
    assert plan.len_slots & (plan.len_slots - 1) == 0
    with pytest.raises(ValueError):
        constrain_cuckoo(fpr=0.01)


# ---------------------------------------------------- round 2: F in 17..32


@pytest.mark.parametrize("f", [20, 32])
def test_wide_fingerprint_laws(f):
    """Involution/push/contains/pop laws at F>16 (two-word buckets),
    mirroring reference filter.jl:77-129 bit-packing coverage."""
    filt = CuckooFilter(1 << 10, f=f)
    rs = np.random.default_rng(11)
    h = rs.integers(0, 2**64, size=300, dtype=np.uint64)
    fp = filt.fingerprints(h)
    assert (fp != 0).all() and (fp <= filt.fpmask).all()
    i1 = filt.primary_index(h)
    i2 = filt.other_index(i1, fp)
    assert np.array_equal(filt.other_index(i2, fp), i1)

    keys = [f"k{i}" for i in range(500)]
    assert filt.update_hashes(_hashes(keys))
    assert filt.contains_hashes(_hashes(keys)).all()
    for k in keys[:50]:
        assert filt.contains(k)
    # vectorized matches scalar on absent keys too
    probe = _hashes([f"z{i}" for i in range(500)])
    vec = filt.contains_hashes(probe)
    for hh, v in zip(probe.tolist(), vec.tolist()):
        assert filt.contains_hash(hh) == v
    # serialization roundtrip with the two-word layout
    back = CuckooFilter.from_bytes(filt.to_bytes())
    assert back == filt


def test_wide_union_and_pop():
    a = CuckooFilter(1 << 9, f=20)
    b = CuckooFilter(1 << 9, f=20)
    a.update_hashes(_hashes([f"a{i}" for i in range(80)]))
    b.update_hashes(_hashes([f"b{i}" for i in range(80)]))
    merged, ok = a.copy().merge(b)
    assert ok
    for k in [f"a{i}" for i in range(80)] + [f"b{i}" for i in range(80)]:
        assert merged.contains(k)
    assert merged.pop("a0") and not merged.contains("a0")


def test_fprof_exact_formula():
    """fprof matches the reference's closed form (filter.jl:524-533)."""
    from probably_jl_spark.sketches.cuckoo import fprof

    for F in (4, 12, 16, 20, 32):
        m = 1 << F
        avoid_ej = (m - 2) / (m - 1)
        avoid_bucket = 1.0
        for i in range(1, 5):
            avoid_bucket *= (m - 1 - i) / (m - i)
        expect = 1 - avoid_ej * avoid_bucket * avoid_bucket
        assert CuckooFilter(64, f=F).fprof() == pytest.approx(expect, rel=1e-12)


def test_constrain_tight_fpr():
    """FPR below the F=16 floor (8/2^16-ish) needs F>16 — previously
    silently clamped (VERDICT round 1 missing #1)."""
    plan = constrain_cuckoo(fpr=1e-5, capacity=10_000)
    assert plan.f > 16
    assert plan.fpr <= 1e-5
    plan32 = constrain_cuckoo(fpr=1e-8, capacity=1000)
    assert plan32.f <= 32 and plan32.fpr <= 1e-8
    with pytest.raises(ValueError):
        constrain_cuckoo(fpr=1e-9, capacity=1000)  # fprof(32)≈2.1e-9 > 1e-9


def test_merge_overflow_raises_in_merge_blobs():
    """ADVICE r01: a merge that closes the filter must not silently drop
    fingerprints (false negatives) — merge_blobs raises."""
    from probably_jl_spark.operators.specs import merge_blobs
    from probably_jl_spark.sketches.cuckoo import CuckooOverflowError

    a = CuckooFilter(16, f=8)
    b = CuckooFilter(16, f=8)
    a.update_hashes(_hashes([f"a{i}" for i in range(14)]))
    b.update_hashes(_hashes([f"b{i}" for i in range(14)]))
    with pytest.raises(CuckooOverflowError):
        merge_blobs(a.to_bytes(), b.to_bytes())
    # a merge that fits does not raise
    small = CuckooFilter(1 << 10, f=12)
    small.update_hashes(_hashes(["x", "y"]))
    out = merge_blobs(small.to_bytes(), small.to_bytes())
    assert out is not None


def test_build_update_overflow_raises():
    """Spec-level update surfaces build-time overflow instead of shipping
    a lossy membership state."""
    from probably_jl_spark.operators.specs import SketchSpec
    from probably_jl_spark.sketches.cuckoo import CuckooOverflowError

    spec = SketchSpec("tiny", "cuckoo", key_cols=("k",), params={"len": 16, "f": 8})
    sk = spec.new()
    with pytest.raises(CuckooOverflowError):
        spec.update(sk, _hashes([f"k{i}" for i in range(200)]), None, None)


def test_constrain_mem_capacity_maximizes_f():
    """VERDICT r02 #6 (reference filter.jl:576-586): under memory +
    capacity the planner takes the LARGEST feasible F, and under the
    SmallCuckoo wire model every intermediate F is reachable (4
    bits/bucket per F step), not just the 16/32 word layouts."""
    # capacity 10k -> 16384 slots -> 4096 buckets
    # wire bytes(f) = 4096 * (12 + 4*(f-4)) / 8; f=20 -> 38912, f=21 -> 40960
    plan = constrain_cuckoo(memory=39_000, capacity=10_000, budget="wire")
    assert plan.f == 20, plan
    assert plan.memory_bytes == 38_912
    assert constrain_cuckoo(memory=40_960, capacity=10_000, budget="wire").f == 21
    # a budget in the middle of a word layout still lands on the widest
    # F of that layout under the resident model
    res = constrain_cuckoo(memory=16_384 * 2 + 100, capacity=10_000, budget="resident")
    assert res.f == 16
    assert constrain_cuckoo(memory=16_384 * 4, capacity=10_000, budget="resident").f == 32
    # even F=4 (12 bits/bucket wire) over budget -> loud error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="Too little memory"):
        constrain_cuckoo(memory=6_000, capacity=10_000, budget="wire")


def test_constrain_fpr_memory_fits_budget():
    """fpr+memory picks the largest power-of-two length whose cost fits
    the budget (the old planner could round len UP past the budget)."""
    for budget in ("resident", "wire"):
        plan = constrain_cuckoo(fpr=0.001, memory=100_000, budget=budget)
        assert plan.memory_bytes <= 100_000, (budget, plan)
        assert plan.fpr <= 0.001 * 1.05


def test_constrain_fpr_memory_too_little_raises():
    """ADVICE r3: fpr+memory with a budget smaller than the minimum
    4-slot filter must raise (mirroring the memory+capacity branch), not
    silently return a plan over budget."""
    with pytest.raises(ValueError, match="Too little memory"):
        constrain_cuckoo(fpr=0.001, memory=1, budget="resident")
    with pytest.raises(ValueError, match="Too little memory"):
        constrain_cuckoo(fpr=1e-6, memory=2, budget="wire")


def test_vectorized_batch_insert_matches_sequential_no_kicks():
    """r4 vectorized no-kick insert: per-bucket insertion order equals
    array order, so at loads where no kicks occur the result is
    byte-identical however the batch is split — including one item at a
    time through the scalar push_fp path."""
    rs = np.random.default_rng(21)
    h = rs.integers(0, 2**64, size=2000, dtype=np.uint64)
    one = CuckooFilter(1 << 16, f=12)
    assert one.update_hashes(h)
    assert one._kick_counter == 0  # fixture is genuinely kick-free
    split = CuckooFilter(1 << 16, f=12)
    for i in range(0, 2000, 333):
        assert split.update_hashes(h[i : i + 333])
    scalar = CuckooFilter(1 << 16, f=12)
    for x in h.tolist():
        assert scalar.push_hash(x)
    assert np.array_equal(one.buckets, split.buckets)
    assert np.array_equal(one.buckets, scalar.buckets)


def test_vectorized_batch_insert_closed_filter_rejects():
    """A closed filter must reject unseen items (and accept present ones)
    through the vectorized path exactly like push_fp."""
    filt = CuckooFilter(16, f=8)
    h = _hashes([f"x{i}" for i in range(30)])
    filt.update_hashes(h)  # small filter: may close
    if not filt.ejected:  # force closure deterministically
        more = _hashes([f"y{i}" for i in range(60)])
        filt.update_hashes(more)
    assert filt.ejected
    present = h[filt.contains_hashes(h)]
    assert filt.update_hashes(present[:4])  # all present -> True
    fresh = _hashes(["definitely new key"])
    assert not filt.update_hashes(np.concatenate([present[:2], fresh]))


def test_batch_same_fp_alternate_pair_stores_once():
    """code-review r4: two batch items with the SAME fingerprint whose
    primary indices are each other's alternate bucket are one logical
    item — the canonical (fp, min(i1,i2)) dedup must store it once,
    byte-identical to sequential insertion."""
    probe = CuckooFilter(64, f=8)  # nbuckets=16: collisions easy to find
    rs = np.random.default_rng(3)
    h = rs.integers(0, 2**64, size=200_000, dtype=np.uint64)
    fp = probe.fingerprints(h)
    i1 = probe.primary_index(h)
    i2 = probe.other_index(i1, fp)
    seen: dict[tuple, int] = {}
    pair = None
    for j in range(h.size):
        key = (int(fp[j]), min(int(i1[j]), int(i2[j])), max(int(i1[j]), int(i2[j])))
        if key in seen and i1[seen[key]] != i1[j]:
            pair = (seen[key], j)
            break
        seen.setdefault(key, j)
    assert pair is not None, "fixture search failed"
    a_h = np.array([h[pair[0]], h[pair[1]]], dtype=np.uint64)
    batch = CuckooFilter(64, f=8)
    assert batch.update_hashes(a_h)
    seq = CuckooFilter(64, f=8)
    for x in a_h.tolist():
        assert seq.push_hash(x)
    assert np.array_equal(batch.buckets, seq.buckets)
    # exactly ONE stored copy across both candidate buckets
    the_fp = int(fp[pair[0]])
    copies = sum(
        s == the_fp
        for b in {int(i1[pair[0]]), int(i2[pair[0]])}
        for s in batch._bucket_slots(b)
    )
    assert copies == 1


def test_batch_closed_filter_matches_push_fp_on_ejected_fp():
    """code-review r4: an unseen item whose fingerprint equals the
    ejected one must be REJECTED by the batch path exactly like push_fp
    (only the conservative membership query treats fp==ejected as
    present)."""
    filt = CuckooFilter(16, f=8)
    filt.update_hashes(_hashes([f"x{i}" for i in range(60)]))
    if not filt.ejected:
        filt.update_hashes(_hashes([f"y{i}" for i in range(120)]))
    assert filt.ejected
    target = int(filt.ejected)
    rs = np.random.default_rng(7)
    h = rs.integers(0, 2**64, size=300_000, dtype=np.uint64)
    fps = filt.fingerprints(h)
    cand = None
    for j in np.flatnonzero(fps == target).tolist():
        # need a candidate NOT bucket-present (contains_fp would call it
        # present via the conservative fp==ejected rule — that's a QUERY
        # rule, not an insert rule)
        i1 = int(h[j]) & filt.mask
        i2 = filt.other_index(i1, target)
        if not filt._bucket_contains(i1, target) and not filt._bucket_contains(i2, target):
            cand = j
            break
    assert cand is not None, "fixture search failed"
    assert filt.push_fp(target, int(h[cand]) & filt.mask) is False
    assert filt.update_hashes(h[cand : cand + 1]) is False


def test_resident_small_batch_update():
    """code-review r4: a trickle update (batch far smaller than the
    filter) on ResidentSmallCuckoo must take the per-bucket codec path,
    not crash on the word-layout fast path (buckets is None)."""
    from probably_jl_spark.sketches.smallcuckoo import ResidentSmallCuckoo

    filt = ResidentSmallCuckoo(1 << 12, f=12)
    h = np.array([1, 2, 3], dtype=np.uint64)
    assert filt.update_hashes(h)
    assert filt.contains_hashes(h).all()


def test_eq_includes_ejected_index():
    """Two closed filters with identical buckets/ejected fp but different
    ejected_index must NOT compare equal: pop! re-pushes the ejected fp
    at its recorded index, so they diverge on the next operation (and the
    wire serializes the index)."""
    a = CuckooFilter(8, 12)
    b = CuckooFilter(8, 12)
    a.ejected, a.ejected_index = 5, 1
    b.ejected, b.ejected_index = 5, 2
    assert a != b and hash(a) != hash(b)
    b.ejected_index = 1
    assert a == b and hash(a) == hash(b)
