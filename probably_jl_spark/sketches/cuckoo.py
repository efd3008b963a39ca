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

Layout decision (SURVEY.md §2.4): the reference ships two bit-packed
layouts (FastCuckoo raw / SmallCuckoo semi-sorted, filter.jl:41-58). We
implement only the Fast layout with one uint64 word per 4-slot bucket
(F <= 16 bits per fingerprint) — the SmallCuckoo 1-bit-per-fp saving is a
CPU/RAM trade, not a semantic feature, and Spark state is already compact
binary. Unlike the reference's ``rand(1:4)`` kick-slot choice
(filter.jl:367), eviction slots come from a counter-based deterministic
mix so distributed builds are reproducible and resumable (SURVEY.md §7
risk register).

The kick loop is inherently sequential per filter (mutating evictions), so
batch insert vectorizes fingerprint/index derivation and dedup, and loops
only over unique unseen items; deletion-heavy workloads stay driver-side
(deletion is order-dependent, hence not a CRDT — documented limitation).
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import numpy as np

from . import codec
from .hashing import (
    SALT_CUCKOO_ALT,
    SALT_CUCKOO_FP,
    mix64,
    mix64_scalar,
    xxhash64_any,
)

_U = np.uint64
MAX_KICKS = 512  # reference filter.jl:65
_HDR = struct.Struct("<BQQQ")  # F, nbuckets, ejected_fp, ejected_index


class CuckooFilter:
    __slots__ = ("f", "nbuckets", "mask", "fpmask", "buckets", "ejected", "ejected_index", "_kick_counter")

    def __init__(
        self,
        len_slots: int = 1 << 12,
        f: int = 12,
        buckets: np.ndarray | None = None,
        ejected: int = 0,
        ejected_index: int = 0,
    ):
        # reference constraints: len a power of two >= 4 (filter.jl:94-101),
        # F in 4..32 for Fast; our uint64 layout needs F <= 16.
        if len_slots < 4 or len_slots & (len_slots - 1):
            raise ValueError("len must be a power of two >= 4")
        if not 4 <= f <= 16:
            raise ValueError("f must be in 4..16 (uint64 bucket layout)")
        self.f = f
        self.nbuckets = len_slots // 4
        self.mask = self.nbuckets - 1
        self.fpmask = (1 << f) - 1
        if buckets is None:
            buckets = np.zeros(self.nbuckets, dtype=np.uint64)
        elif buckets.shape != (self.nbuckets,) or buckets.dtype != np.uint64:
            raise ValueError("buckets shape/dtype mismatch")
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
    def _bucket_slots(self, b: int) -> list[int]:
        w = int(self.buckets[b])
        return [(w >> (s * self.f)) & self.fpmask for s in range(4)]

    def _bucket_contains(self, b: int, fp: int) -> bool:
        return fp in self._bucket_slots(b)

    def _bucket_put(self, b: int, fp: int) -> bool:
        """Insert fp into first empty slot of bucket b (reference
        putinbucket!, bucket.jl:171-191)."""
        w = int(self.buckets[b])
        for s in range(4):
            if (w >> (s * self.f)) & self.fpmask == 0:
                self.buckets[b] = _U(w | (fp << (s * self.f)))
                return True
        return False

    def _bucket_remove(self, b: int, fp: int) -> bool:
        w = int(self.buckets[b])
        for s in range(4):
            if (w >> (s * self.f)) & self.fpmask == fp:
                self.buckets[b] = _U(w & ~(self.fpmask << (s * self.f)))
                return True
        return False

    def _bucket_swap(self, b: int, fp: int, slot: int) -> int:
        """Evict the fingerprint in `slot`, store fp there (reference
        kick!, bucket.jl:195-203)."""
        w = int(self.buckets[b])
        old = (w >> (slot * self.f)) & self.fpmask
        w &= ~(self.fpmask << (slot * self.f))
        self.buckets[b] = _U(w | (fp << (slot * self.f)))
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
        and (fp, i1) dedup are vectorized; only unique unseen pairs hit the
        sequential insert path. Returns False if any insert failed (filter
        closed)."""
        if h.size == 0:
            return True
        h = h.astype(np.uint64, copy=False)
        fp = self.fingerprints(h)
        i1 = self.primary_index(h)
        # set semantics: (fp, i1) fully determines the stored item
        pair = fp * _U(self.nbuckets) + i1.astype(np.uint64)
        _, first = np.unique(pair, return_index=True)
        ok = True
        fpl = fp.tolist()
        i1l = i1.tolist()
        for j in sorted(first.tolist()):
            ok &= self.push_fp(fpl[j], i1l[j])
        return ok

    # ------------------------------------------------------------- query
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
            w = self.buckets[idx]
            for s in range(4):
                out |= ((w >> _U(s * self.f)) & _U(self.fpmask)) == fp
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
        nonzero = np.flatnonzero(other.buckets)
        for b in nonzero.tolist():
            w = int(other.buckets[b])
            for s in range(4):
                fp = (w >> (s * self.f)) & self.fpmask
                if fp:
                    ok &= self.push_fp(fp, b)
        if other.ejected:
            ok &= self.push_fp(other.ejected, other.ejected_index)
        return self, ok

    # ------------------------------------------------------------ metrics
    def loadfactor(self) -> float:
        used = 0
        for s in range(4):
            used += int((((self.buckets >> _U(s * self.f)) & _U(self.fpmask)) != 0).sum())
        return used / (4 * self.nbuckets)

    def capacity(self) -> int:
        return int(0.95 * 4 * self.nbuckets)  # reference filter.jl:505-514

    def stats(self) -> dict:
        """Summary stats (reference stats(), filter.jl:549-555): occupancy,
        capacity, memory, closed-state, expected FPR at current load."""
        return {
            "f_bits": self.f,
            "nbuckets": self.nbuckets,
            "slots": 4 * self.nbuckets,
            "occupied": int(round(self.loadfactor() * 4 * self.nbuckets)),
            "loadfactor": self.loadfactor(),
            "capacity": self.capacity(),
            "memory_bytes": self.buckets.nbytes,
            "closed": bool(self.ejected),
            "fprof": self.fprof(),
        }

    def fprof(self) -> float:
        """Closed-form false-positive probability at current load
        (reference filter.jl:524-533 shape: ~ 8*lf / 2^F)."""
        return min(1.0, 8.0 * self.loadfactor() / (1 << self.f))

    def is_empty(self) -> bool:
        return not self.buckets.any() and not self.ejected

    def clear(self) -> None:
        self.buckets.fill(0)
        self.ejected = 0
        self.ejected_index = 0

    def copy(self) -> "CuckooFilter":
        return CuckooFilter(self.nbuckets * 4, self.f, self.buckets.copy(), self.ejected, self.ejected_index)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, CuckooFilter)
            and self.f == other.f
            and self.nbuckets == other.nbuckets
            and self.ejected == other.ejected
            and bool(np.array_equal(self.buckets, other.buckets))
        )

    def __hash__(self):
        return hash((self.f, self.nbuckets, self.ejected, self.buckets.tobytes()))

    # ---------------------------------------------------------------- io
    def to_bytes(self) -> bytes:
        hdr = _HDR.pack(self.f, self.nbuckets, self.ejected, self.ejected_index)
        return codec.wrap(codec.KIND_CUCKOO, hdr, self.buckets.tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        header, payload = codec.unwrap(data, codec.KIND_CUCKOO)
        f, nbuckets, ej, eji = _HDR.unpack(header)
        buckets = np.frombuffer(payload, dtype=np.uint64).copy()
        return cls(nbuckets * 4, f, buckets, ej, eji)


@dataclass
class CuckooPlan:
    len_slots: int
    f: int
    fpr: float
    memory_bytes: int
    capacity: int


def constrain_cuckoo(
    fpr: float | None = None,
    memory: int | None = None,
    capacity: int | None = None,
) -> CuckooPlan:
    """Sizing planner (reference constrain(<:AbstractCuckooFilter; ...),
    filter.jl:536-630): minimal F for the target fpr via
    fpr ~= 8/2^F at 95% load, len the next power of two holding
    capacity/0.95 slots."""
    given = [fpr is not None, memory is not None, capacity is not None]
    if sum(given) != 2:
        raise ValueError("exactly two of fpr/memory/capacity must be given")

    def f_for(fpr_target: float) -> int:
        f = max(4, int(math.ceil(math.log2(8.0 / fpr_target))))
        return min(16, f)

    def pow2_at_least(x: float) -> int:
        return 1 << max(2, int(math.ceil(math.log2(max(4.0, x)))))

    if fpr is not None and capacity is not None:
        f = f_for(fpr)
        len_slots = pow2_at_least(capacity / 0.95)
    elif fpr is not None and memory is not None:
        f = f_for(fpr)
        # one uint64 per 4-slot bucket => 2 bytes/slot in our layout
        len_slots = pow2_at_least(memory / 2)
        capacity = int(0.95 * len_slots)
    else:  # memory + capacity
        len_slots = pow2_at_least(max(capacity / 0.95, memory / 2))
        f = 16
    achieved = min(1.0, 8.0 * 0.95 / (1 << f))
    return CuckooPlan(
        len_slots=len_slots,
        f=f,
        fpr=achieved,
        memory_bytes=(len_slots // 4) * 8,
        capacity=int(0.95 * len_slots),
    )
