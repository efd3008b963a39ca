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
not resident RAM but the bytes a sketch state occupies on the wire and in
the checkpoint table — so ``SmallCuckooFilter`` runs the full-speed
FastCuckoo layout *in memory* and applies the semisorted encoding in
``to_bytes``/``from_bytes``: every serialized bucket costs 12 + 4*(f-4)
bits instead of 4f. That is the same 4-bits-per-bucket saving as the
reference, paid at (de)serialization time instead of on every probe —
mirroring the reference's own speed/space framing (FastCuckoo ~2.5x
faster, SmallCuckoo ~10% smaller, docs/src/cuckoo.md:35).

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


class SmallCuckooFilter(CuckooFilter):
    """CuckooFilter with semisorted-compressed serialization: identical
    membership/insert/delete semantics and in-memory layout (buckets are
    sets, so sorting at encode time loses nothing), 12 + 4*(f-4) bits per
    bucket on the wire instead of 4f."""

    def to_bytes(self) -> bytes:
        f = self.f
        bits_per = 12 + 4 * (f - 4)
        hdr = _HDR.pack(f, self.nbuckets, self.ejected, self.ejected_index)
        if f <= 16:
            codes = _encode_codes_u64(self)
            shifts = np.arange(bits_per - 1, -1, -1, dtype=np.uint64)
            bits = ((codes[:, None] >> shifts) & _U(1)).astype(np.uint8)
            out = np.packbits(bits.ravel()).tobytes()
            return codec.wrap(codec.KIND_CUCKOO, hdr, out, version=2)
        # f in 17..32: streaming big-int pack with a bounded accumulator
        acc = 0
        acc_bits = 0
        out = bytearray()
        fpmask = self.fpmask
        for b in range(self.nbuckets):
            w = self._get_bucket(b)
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
        return codec.wrap(codec.KIND_CUCKOO, hdr, bytes(out), version=2)

    @classmethod
    def from_bytes(cls, data: bytes) -> "SmallCuckooFilter":
        header, payload = codec.unwrap(data, codec.KIND_CUCKOO, expected_version=2)
        f, nbuckets, ej, eji = _HDR.unpack(header)
        bits_per = 12 + 4 * (f - 4)
        if f <= 16:
            raw = np.unpackbits(np.frombuffer(payload, dtype=np.uint8))
            bits = raw[: nbuckets * bits_per].reshape(nbuckets, bits_per).astype(np.uint64)
            shifts = np.arange(bits_per - 1, -1, -1, dtype=np.uint64)
            codes = (bits << shifts).sum(axis=1, dtype=np.uint64)
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
