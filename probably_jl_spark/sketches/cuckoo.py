"""Cuckoo filter — membership sketch with deletion support.

Semantics preserved from the reference (src/cuckoo/filter.jl +
src/cuckoo/bucket.jl), which documents three deliberate deviations from the
Fan et al. paper (filter.jl:1-58); we keep all three:

1. power-of-two bucket count so the alternate-index map
   ``i2 = i1 XOR h(fp)`` (masked) is an involution (filter.jl:254-261;
   law tested like reference test/cuckoo_filter.jl:137-146);
2. a single ``ejected`` fingerprint slot that "closes" the filter when an
   insert fails after MAX_KICKS evictions, preserving the no-false-negative
   guarantee (filter.jl:65,346-393); ``pop!`` may reopen it
   (filter.jl:446-452);
3. set semantics — an item is stored at most once (filter.jl:28-31).

Layout (SURVEY.md §2.4): the full reference fingerprint range F in 4..32
(filter.jl:77-129) is supported. Each 4-slot bucket is stored in one
uint64 word for F <= 16 and two words for F in 17..32 (slot s occupies
bits [s*F, (s+1)*F), possibly spanning the word boundary — mirrors the
reference's bit-packed UInt128 buckets, filter.jl:267-325, without
transliterating them). Unlike the reference's ``rand(1:4)`` kick-slot
choice (filter.jl:367), eviction slots come from a counter-based
deterministic mix so distributed builds are reproducible and resumable
(SURVEY.md §7 risk register).

The kick loop is inherently sequential per filter (mutating evictions), so
batch insert vectorizes fingerprint/index derivation and dedup, and loops
only over unique unseen items; deletion-heavy workloads stay driver-side
(deletion is order-dependent, hence not a CRDT — documented limitation).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from . import codec
from .hashing import (
    MASK64,
    SALT_CUCKOO_ALT,
    SALT_CUCKOO_FP,
    mix64,
    mix64_scalar,
    xxhash64_any,
)

_U = np.uint64
MAX_KICKS = 512  # reference filter.jl:65
_HDR = struct.Struct("<BQQQ")  # F, nbuckets, ejected_fp, ejected_index


class CuckooOverflowError(RuntimeError):
    """A cuckoo filter closed (insert failed after MAX_KICKS) and further
    items could not be stored — continuing would break the
    no-false-negative contract. Resize via ``constrain_cuckoo``."""


class CuckooFilter:
    __slots__ = (
        "f",
        "nbuckets",
        "wpb",
        "mask",
        "fpmask",
        "buckets",
        "ejected",
        "ejected_index",
        "_kick_counter",
    )

    def __init__(
        self,
        len_slots: int = 1 << 12,
        f: int = 12,
        buckets: np.ndarray | None = None,
        ejected: int = 0,
        ejected_index: int = 0,
    ):
        # reference constraints: len a power of two >= 4 (filter.jl:94-101),
        # F in 4..32 for the Fast layout (filter.jl:77-129).
        if len_slots < 4 or len_slots & (len_slots - 1):
            raise ValueError("len must be a power of two >= 4")
        if not 4 <= f <= 32:
            raise ValueError("f must be in 4..32")
        self.f = f
        self.nbuckets = len_slots // 4
        self.wpb = 1 if f <= 16 else 2  # uint64 words per 4-slot bucket
        self.mask = self.nbuckets - 1
        self.fpmask = (1 << f) - 1
        if buckets is None:
            buckets = np.zeros((self.nbuckets, self.wpb), dtype=np.uint64)
        else:
            if buckets.dtype != np.uint64:
                raise ValueError("buckets dtype must be uint64")
            if buckets.shape == (self.nbuckets,) and self.wpb == 1:
                buckets = buckets.reshape(self.nbuckets, 1)
            if buckets.shape != (self.nbuckets, self.wpb):
                raise ValueError("buckets shape mismatch")
        self.buckets = buckets
        self.ejected = ejected  # nonzero fp => filter is closed
        self.ejected_index = ejected_index
        self._kick_counter = 0

    # --------------------------------------------------------- derivations
    def fingerprint_scalar(self, h: int) -> int:
        """F-bit nonzero fingerprint; re-derive with bumped salt until
        nonzero (reference imprint, bucket.jl:45-53)."""
        salt = SALT_CUCKOO_FP
        fp = mix64_scalar(h, salt) & self.fpmask
        while fp == 0:
            salt += 1
            fp = mix64_scalar(h, salt) & self.fpmask
        return fp

    def fingerprints(self, h: np.ndarray) -> np.ndarray:
        h = h.astype(np.uint64, copy=False)
        fp = mix64(h, SALT_CUCKOO_FP) & _U(self.fpmask)
        salt = SALT_CUCKOO_FP
        while (fp == 0).any():
            salt += 1
            redo = fp == 0
            fp[redo] = mix64(h[redo], salt) & _U(self.fpmask)
        return fp

    def primary_index(self, h: np.ndarray) -> np.ndarray:
        return (h.astype(np.uint64, copy=False) & _U(self.mask)).astype(np.int64)

    def other_index(self, index, fp):
        """Alternate bucket: i XOR h(fp), masked — an involution
        (reference otherindex, filter.jl:259-261)."""
        if isinstance(index, np.ndarray):
            hfp = mix64(fp.astype(np.uint64), SALT_CUCKOO_ALT) & _U(self.mask)
            return (index.astype(np.uint64) ^ hfp).astype(np.int64)
        return index ^ (mix64_scalar(int(fp), SALT_CUCKOO_ALT) & self.mask)

    # --------------------------------------------------------- bucket ops
    def _get_bucket(self, b: int) -> int:
        """Whole 4-slot bucket as a Python int (up to 128 bits)."""
        if self.wpb == 1:
            return int(self.buckets[b, 0])
        return int(self.buckets[b, 0]) | (int(self.buckets[b, 1]) << 64)

    def _set_bucket(self, b: int, w: int) -> None:
        self.buckets[b, 0] = _U(w & MASK64)
        if self.wpb == 2:
            self.buckets[b, 1] = _U((w >> 64) & MASK64)

    def _bucket_slots(self, b: int) -> list[int]:
        w = self._get_bucket(b)
        return [(w >> (s * self.f)) & self.fpmask for s in range(4)]

    def _bucket_contains(self, b: int, fp: int) -> bool:
        return fp in self._bucket_slots(b)

    def _bucket_put(self, b: int, fp: int) -> bool:
        """Insert fp into first empty slot of bucket b (reference
        putinbucket!, bucket.jl:171-191)."""
        w = self._get_bucket(b)
        for s in range(4):
            if (w >> (s * self.f)) & self.fpmask == 0:
                self._set_bucket(b, w | (fp << (s * self.f)))
                return True
        return False

    def _bucket_remove(self, b: int, fp: int) -> bool:
        w = self._get_bucket(b)
        for s in range(4):
            if (w >> (s * self.f)) & self.fpmask == fp:
                self._set_bucket(b, w & ~(self.fpmask << (s * self.f)))
                return True
        return False

    def _bucket_swap(self, b: int, fp: int, slot: int) -> int:
        """Evict the fingerprint in `slot`, store fp there (reference
        kick!, bucket.jl:195-203)."""
        w = self._get_bucket(b)
        old = (w >> (slot * self.f)) & self.fpmask
        w &= ~(self.fpmask << (slot * self.f))
        self._set_bucket(b, w | (fp << (slot * self.f)))
        return old

    # -------------------------------------------------------------- push
    def push_fp(self, fp: int, i1: int) -> bool:
        """Insert a (fingerprint, primary-index) pair; kick loop on
        conflict; closes the filter (stores in ``ejected``) on failure
        (reference pushfingerprint, filter.jl:346-373)."""
        i2 = self.other_index(i1, fp)
        if self._bucket_contains(i1, fp) or self._bucket_contains(i2, fp):
            return True  # set semantics (deviation 3)
        if self.ejected:
            return False  # closed filter rejects inserts (filter.jl:381-385)
        if self._bucket_put(i1, fp) or self._bucket_put(i2, fp):
            return True
        # eviction loop, deterministic slot choice (vs reference rand(1:4))
        idx = i2
        for _ in range(MAX_KICKS):
            self._kick_counter += 1
            slot = mix64_scalar(self._kick_counter, 0xC0FFEE) & 3
            fp = self._bucket_swap(idx, fp, slot)
            idx = self.other_index(idx, fp)
            if self._bucket_put(idx, fp):
                return True
        self.ejected = fp  # close the filter (filter.jl:370-372)
        self.ejected_index = idx
        return False

    def push_hash(self, h: int) -> bool:
        fp = self.fingerprint_scalar(h)
        return self.push_fp(fp, h & self.mask)

    def push(self, key, int_bytes: int = 8) -> bool:
        return self.push_hash(xxhash64_any(key, int_bytes=int_bytes))

    def update_hashes(self, h: np.ndarray) -> bool:
        """Batch insert of uint64 item hashes. Fingerprint/index derivation
        and (fp, i1) dedup are vectorized; for the single-word layout
        (f <= 16) the whole NO-KICK insert path is vectorized too
        (_insert_batch_words) and only items whose both buckets are full
        fall back to the sequential kick loop. Returns False if any insert
        failed (filter closed)."""
        if h.size == 0:
            return True
        h = h.astype(np.uint64, copy=False)
        fp = self.fingerprints(h)
        i1 = self.primary_index(h)
        # set semantics: the stored item is (fp, {i1, i2}) — the UNORDERED
        # bucket pair, since other_index is an involution. Deduping on the
        # canonical (fp, min(i1, i2)) catches two batch items that carry
        # the same fingerprint with swapped primary/alternate indices
        # (code-review r4: deduping on raw i1 let such a pair double-store
        # through the vectorized path; the scalar path caught it only via
        # its per-item contains re-check)
        ic = np.minimum(i1, self.other_index(i1, fp))
        if self.f + self.nbuckets.bit_length() <= 64:
            pair = fp * _U(self.nbuckets) + ic.astype(np.uint64)
            _, first = np.unique(pair, return_index=True)
        else:  # f=32 with huge filters: pair key would overflow uint64
            _, first = np.unique(np.column_stack([fp, ic.view(np.uint64)]), axis=0, return_index=True)
        first.sort()
        if self.wpb == 1 and self.buckets is not None:
            # (ResidentSmallCuckoo has buckets=None — its small batches
            # take the scalar loop through the bucket-codec accessors)
            return self._insert_batch_words(fp[first], i1[first])
        ok = True
        fpl = fp.tolist()
        i1l = i1.tolist()
        for j in first.tolist():
            ok &= self.push_fp(fpl[j], i1l[j])
        return ok

    def _insert_batch_words(self, fp: np.ndarray, i1: np.ndarray) -> bool:
        """Vectorized batch insert for the single-word bucket layout
        (f <= 16): per round, gather both candidate bucket words for every
        pending item, drop already-present fingerprints, pick the target
        bucket (primary if it has a free slot, else secondary), resolve
        same-bucket collisions by array order (np.unique keeps the FIRST
        pending item per bucket — so per-bucket insertion order equals the
        sequential order, and at no-kick loads the result is identical to
        item-at-a-time insertion regardless of batch boundaries), and
        scatter the updated words. Items whose buckets are both full defer
        to the sequential kick loop after the vector rounds; under kicks
        eviction *timing* differs from pure item-at-a-time insertion, but
        both layouts remain valid filters with identical member sets on
        the no-kick prefix (kick order was never canonical: the reference
        itself uses rand(1:4), filter.jl:357)."""
        f = _U(self.f)
        fm = _U(self.fpmask)
        B = self.buckets[:, 0]
        i2 = self.other_index(i1, fp)
        ok = True
        if self.ejected:
            # closed filter: bucket-present items are fine, new ones are
            # rejected — exactly push_fp's rule (fp == ejected is NOT
            # treated as present here; only the conservative membership
            # query does that, code-review r4)
            w1, w2 = B[i1], B[i2]
            present = np.zeros(fp.size, dtype=bool)
            for s in range(4):
                sh = _U(s) * f
                present |= ((w1 >> sh) & fm) == fp
                present |= ((w2 >> sh) & fm) == fp
            return bool(present.all())
        kicks: list[tuple[int, int]] = []
        # each round places >= 1 item into every distinct non-full target
        # bucket; pending items shrink geometrically (<= 9 slots across
        # the two buckets), so the loop is bounded
        while fp.size:
            w1, w2 = B[i1], B[i2]
            present = np.zeros(fp.size, dtype=bool)
            empty1 = np.zeros((4, fp.size), dtype=bool)
            empty2 = np.zeros((4, fp.size), dtype=bool)
            for s in range(4):
                sh = _U(s) * f
                v1 = (w1 >> sh) & fm
                v2 = (w2 >> sh) & fm
                present |= (v1 == fp) | (v2 == fp)
                empty1[s] = v1 == 0
                empty2[s] = v2 == 0
            has1 = empty1.any(axis=0)
            has2 = empty2.any(axis=0)
            use1 = ~present & has1
            use2 = ~present & ~has1 & has2
            full = ~present & ~has1 & ~has2
            if full.any():
                kicks.extend(zip(fp[full].tolist(), i1[full].tolist()))
            tgt = np.where(use1, i1, i2)
            slot = np.where(use1, empty1.argmax(axis=0), empty2.argmax(axis=0))
            word = np.where(use1, w1, w2)
            cand = use1 | use2
            tgt_c = tgt[cand]
            # first pending item per target bucket wins this round
            _, win = np.unique(tgt_c, return_index=True)
            sel = np.flatnonzero(cand)[win]
            B[tgt[sel]] = word[sel] | (fp[sel] << (slot[sel].astype(np.uint64) * f))
            # survivors: placement losers only (placed/present/full drop out)
            lose = np.ones(fp.size, dtype=bool)
            lose[sel] = False
            lose &= cand
            fp, i1, i2 = fp[lose], i1[lose], i2[lose]
        for kfp, ki1 in kicks:
            ok &= self.push_fp(kfp, ki1)
        return ok

    # ------------------------------------------------------------- query
    def _slot_vals(self, W: np.ndarray, s: int) -> np.ndarray:
        """Slot-s fingerprints from bucket rows W (n, wpb): bits
        [s*f, (s+1)*f) possibly spanning the uint64 word boundary."""
        bitpos = s * self.f
        wi, ofs = bitpos >> 6, bitpos & 63
        val = W[:, wi] >> _U(ofs)
        if ofs + self.f > 64:
            val = val | (W[:, wi + 1] << _U(64 - ofs))
        return val & _U(self.fpmask)

    def contains_fp(self, fp: int, i1: int) -> bool:
        if self.ejected and fp == self.ejected:
            # conservative: ejected check (reference in, filter.jl:402-419)
            return True
        return self._bucket_contains(i1, fp) or self._bucket_contains(self.other_index(i1, fp), fp)

    def contains_hash(self, h: int) -> bool:
        return self.contains_fp(self.fingerprint_scalar(h), h & self.mask)

    def contains(self, key, int_bytes: int = 8) -> bool:
        """int_bytes=4 when the build keyed on an int32 column (hashing.py)."""
        return self.contains_hash(xxhash64_any(key, int_bytes=int_bytes))

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership: expand each bucket word into 4 slots and
        compare (two gathers, no per-row Python)."""
        h = h.astype(np.uint64, copy=False)
        fp = self.fingerprints(h)
        i1 = self.primary_index(h)
        i2 = self.other_index(i1, fp)
        out = np.zeros(h.size, dtype=bool)
        for idx in (i1, i2):
            W = self.buckets[idx]
            for s in range(4):
                out |= self._slot_vals(W, s) == fp
        if self.ejected:
            out |= fp == _U(self.ejected)
        return out

    # -------------------------------------------------------------- pop
    def pop_hash(self, h: int) -> bool:
        """Delete; may delete colliding items (documented, reference
        filter.jl:426-434); re-inserts the ejected fingerprint to reopen
        the filter when possible (filter.jl:446-452)."""
        fp = self.fingerprint_scalar(h)
        i1 = h & self.mask
        removed = self._bucket_remove(i1, fp) or self._bucket_remove(self.other_index(i1, fp), fp)
        if not removed and self.ejected and fp == self.ejected:
            self.ejected = 0
            self.ejected_index = 0
            return True
        if removed and self.ejected:
            ej, eji = self.ejected, self.ejected_index
            self.ejected, self.ejected_index = 0, 0
            if not self.push_fp(ej, eji):
                pass  # push_fp re-closed it; state remains consistent
        return removed

    def pop(self, key, int_bytes: int = 8) -> bool:
        return self.pop_hash(xxhash64_any(key, int_bytes=int_bytes))

    # ------------------------------------------------------------- merge
    def merge(self, other: "CuckooFilter") -> tuple["CuckooFilter", bool]:
        """Bucket-aligned union: every nonzero source fingerprint is pushed
        with its source bucket as primary index (correct because the
        XOR-involution pair is index-order independent). Returns
        (self, success) — False when the merge closed the filter
        (reference union!, filter.jl:464-496)."""
        if (self.f, self.nbuckets) != (other.f, other.nbuckets):
            raise ValueError("cuckoo parameter mismatch in merge")
        ok = True
        nonzero = other._nonzero_buckets()
        for b in nonzero.tolist():
            w = other._get_bucket(b)
            for s in range(4):
                fp = (w >> (s * self.f)) & self.fpmask
                if fp:
                    ok &= self.push_fp(fp, b)
        if other.ejected:
            ok &= self.push_fp(other.ejected, other.ejected_index)
        return self, ok

    def _nonzero_buckets(self) -> np.ndarray:
        """Indices of non-empty buckets — layout-agnostic hook so merge
        works with any storage (ResidentSmallCuckoo overrides)."""
        return np.flatnonzero(self.buckets.any(axis=1))

    # ------------------------------------------------------------ metrics
    def loadfactor(self) -> float:
        used = 0
        for s in range(4):
            used += int((self._slot_vals(self.buckets, s) != 0).sum())
        return used / (4 * self.nbuckets)

    def capacity(self) -> int:
        return int(0.95 * 4 * self.nbuckets)  # reference filter.jl:505-514

    def stats(self) -> dict:
        """Summary stats (reference stats(), filter.jl:549-555): occupancy,
        capacity, memory, closed-state, expected FPR."""
        return {
            "f_bits": self.f,
            "nbuckets": self.nbuckets,
            "slots": 4 * self.nbuckets,
            "occupied": int(round(self.loadfactor() * 4 * self.nbuckets)),
            "loadfactor": self.loadfactor(),
            "capacity": self.capacity(),
            "memory_bytes": self.buckets.nbytes if self.buckets is not None else 0,
            "closed": bool(self.ejected),
            "fprof": self.fprof(),
        }

    def fprof(self) -> float:
        """False-positive probability of a fully-filled filter — the
        reference's exact closed-form (filter.jl:524-533): a probe misses
        iff its fingerprint avoids the ejected slot and all 4 (distinct)
        fingerprints of each of its two candidate buckets."""
        return fprof(self.f)

    def is_empty(self) -> bool:
        return not self.buckets.any() and not self.ejected

    def clear(self) -> None:
        self.buckets.fill(0)
        self.ejected = 0
        self.ejected_index = 0

    def copy(self) -> "CuckooFilter":
        # type(self), not CuckooFilter: subclasses (SmallCuckooFilter)
        # must keep their serialization format through copy()
        return type(self)(
            self.nbuckets * 4, self.f, self.buckets.copy(), self.ejected, self.ejected_index
        )

    def __eq__(self, other) -> bool:
        if not isinstance(other, CuckooFilter):
            return False
        if getattr(other, "buckets", None) is None and self.buckets is not None:
            # other is a resident-compressed layout (sibling class, so
            # Python's reflected-eq rule doesn't fire): delegate so
            # equality stays symmetric (code-review r3)
            return other.__eq__(self)
        return (
            self.f == other.f
            and self.nbuckets == other.nbuckets
            and self.ejected == other.ejected
            # ejected_index is state: pop! re-pushes the ejected fp at
            # its recorded index, so filters differing only here diverge
            # on the next op (and the wire serializes it)
            and self.ejected_index == other.ejected_index
            and bool(np.array_equal(self.buckets, other.buckets))
        )

    def __hash__(self):
        return hash(
            (self.f, self.nbuckets, self.ejected, self.ejected_index, self.buckets.tobytes())
        )

    # ---------------------------------------------------------------- io
    def to_bytes(self) -> bytes:
        hdr = _HDR.pack(self.f, self.nbuckets, self.ejected, self.ejected_index)
        return codec.wrap(codec.KIND_CUCKOO, hdr, self.buckets.tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        header, payload = codec.unwrap(data, codec.KIND_CUCKOO)
        f, nbuckets, ej, eji = _HDR.unpack(header)
        wpb = 1 if f <= 16 else 2
        buckets = np.frombuffer(payload, dtype=np.uint64).reshape(nbuckets, wpb).copy()
        return cls(nbuckets * 4, f, buckets, ej, eji)


def fprof(f_bits: int) -> float:
    """Exact full-filter FPR for fingerprint width F
    (reference fprof, filter.jl:524-533)."""
    m = 1 << f_bits
    prob_avoid_ejected = (m - 2) / (m - 1)
    prob_avoid_bucket = 1.0
    # not ((m-1)/m)^4: the 4 fingerprints in one bucket are distinct
    for i in range(1, 5):
        prob_avoid_bucket *= (m - 1 - i) / (m - i)
    return 1.0 - prob_avoid_ejected * prob_avoid_bucket * prob_avoid_bucket


def minimal_f(fpr: float) -> int:
    """Smallest F in 4..32 whose full-filter FPR beats `fpr`
    (reference minimal_f, filter.jl:536-547)."""
    for f_bits in range(4, 33):
        if fprof(f_bits) < fpr:
            return f_bits
    raise ValueError("Too low FPR: not reachable with F <= 32")


@dataclass
class CuckooPlan:
    len_slots: int
    f: int
    fpr: float
    memory_bytes: int
    capacity: int


def _bytes_per_slot(f: int) -> int:
    return 2 if f <= 16 else 4  # 1 or 2 uint64 words per 4-slot bucket


def _plan_bytes(len_slots: int, f: int, budget: str) -> int:
    """Byte cost of a filter under the chosen budget model.

    * ``resident``: the live uint64 word layout (1 word per 4-slot bucket
      for F <= 16, 2 words above) — F only changes cost at the 16/32
      word boundaries.
    * ``wire``: the SmallCuckoo semisorted blob (smallcuckoo.py), 12 +
      4*(F-4) bits per bucket — every F changes cost, which is what the
      checkpoint/shuffle byte budget actually pays in this engine.
    """
    nbuckets = len_slots // 4
    if budget == "resident":
        return nbuckets * 8 * (1 if f <= 16 else 2)
    if budget == "wire":
        return (nbuckets * (12 + 4 * (f - 4)) + 7) // 8
    raise ValueError(f"budget must be 'resident' or 'wire', got {budget!r}")


def constrain_cuckoo(
    fpr: float | None = None,
    memory: int | None = None,
    capacity: int | None = None,
    budget: str = "resident",
) -> CuckooPlan:
    """Sizing planner (reference constrain(<:AbstractCuckooFilter; ...),
    filter.jl:536-630): minimal F for the target full-filter FPR via the
    exact fprof formula, len the next power of two holding capacity/0.95
    slots.

    memory+capacity maximizes F under the byte budget like the reference
    (filter.jl:576-586): capacity is the hard constraint, then the
    LARGEST F in 4:32 whose `budget` cost fits is chosen — under the
    ``wire`` model every intermediate F is reachable (4 bits/bucket per
    F step), under ``resident`` only the 16/32 word layouts change cost,
    so the planner lands on one of those (VERDICT r02 missing #3)."""
    given = [fpr is not None, memory is not None, capacity is not None]
    if sum(given) != 2:
        raise ValueError("exactly two of fpr/memory/capacity must be given")

    import math

    def pow2_at_least(x: float) -> int:
        return 1 << max(2, int(math.ceil(math.log2(max(4.0, x)))))

    if fpr is not None and capacity is not None:
        f = minimal_f(fpr)
        len_slots = pow2_at_least(capacity / 0.95)
    elif fpr is not None and memory is not None:
        f = minimal_f(fpr)
        len_slots = pow2_at_least(memory / (_plan_bytes(4 * 1, f, budget) / 4))
        while len_slots > 4 and _plan_bytes(len_slots, f, budget) > memory:
            len_slots //= 2
        if _plan_bytes(len_slots, f, budget) > memory:
            # even the minimum 4-slot filter exceeds the budget — raise like
            # the memory+capacity branch instead of silently over-spending
            # (ADVICE r3: inconsistent planner contract)
            raise ValueError(
                f"Too little memory: fpr={fpr} needs F={f}, costing >= "
                f"{_plan_bytes(len_slots, f, budget)} bytes ({budget} layout) "
                f"even at the minimum length"
            )
        capacity = int(0.95 * len_slots)
    else:  # memory + capacity: maximize F under the byte budget
        len_slots = pow2_at_least(capacity / 0.95)
        f = 0
        for cand in range(32, 3, -1):
            if _plan_bytes(len_slots, cand, budget) <= memory:
                f = cand
                break
        if f == 0:
            raise ValueError(
                f"Too little memory: {capacity} slots need >= "
                f"{_plan_bytes(len_slots, 4, budget)} bytes ({budget} layout)"
            )
        # (under 'resident' the descending scan can only land on 32 or 16:
        # every F in a word layout costs the same, so the widest one wins)
    return CuckooPlan(
        len_slots=len_slots,
        f=f,
        fpr=fprof(f),
        memory_bytes=_plan_bytes(len_slots, f, budget),
        capacity=int(0.95 * len_slots),
    )
