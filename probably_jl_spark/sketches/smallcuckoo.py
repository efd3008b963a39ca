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
"""

from __future__ import annotations

import math
import struct

import numpy as np

from . import codec
from .cuckoo import CuckooFilter

_HDR = struct.Struct("<BQQQ")  # same params as CuckooFilter

# binomial table C(n, k) for n<=19, k<=4 — tiny, computed at import
_C = [[math.comb(n, k) for k in range(5)] for n in range(20)]

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


class SmallCuckooFilter(CuckooFilter):
    """CuckooFilter with semisorted-compressed serialization: identical
    membership/insert/delete semantics and in-memory layout (buckets are
    sets, so sorting at encode time loses nothing), 12 + 4*(f-4) bits per
    bucket on the wire instead of 4f."""

    def to_bytes(self) -> bytes:
        f = self.f
        bits_per = 12 + 4 * (f - 4)
        hdr = _HDR.pack(f, self.nbuckets, self.ejected, self.ejected_index)
        acc = 0
        acc_bits = 0
        out = bytearray()
        fpmask = self.fpmask
        for w in self.buckets.tolist():
            fps = [(w >> (s * f)) & fpmask for s in range(4)]
            nbits, code = encode_bucket(fps, f)
            acc = (acc << nbits) | code
            acc_bits += nbits
            while acc_bits >= 8:
                acc_bits -= 8
                out.append((acc >> acc_bits) & 0xFF)
        if acc_bits:
            out.append((acc << (8 - acc_bits)) & 0xFF)
        assert bits_per * self.nbuckets <= len(out) * 8
        return codec.wrap(codec.KIND_CUCKOO, hdr, bytes(out), version=2)

    @classmethod
    def from_bytes(cls, data: bytes) -> "SmallCuckooFilter":
        header, payload = codec.unwrap(data, codec.KIND_CUCKOO, expected_version=2)
        f, nbuckets, ej, eji = _HDR.unpack(header)
        bits_per = 12 + 4 * (f - 4)
        buckets = np.zeros(nbuckets, dtype=np.uint64)
        stream = int.from_bytes(payload, "big")
        total_bits = len(payload) * 8
        pos = 0
        for b in range(nbuckets):
            shift = total_bits - pos - bits_per
            code = (stream >> shift) & ((1 << bits_per) - 1)
            fps = decode_bucket(code, f)
            w = 0
            # re-place fingerprints in sorted order; buckets are sets so
            # slot order is not semantic (set semantics, filter.jl:28-31)
            for s, fp in enumerate(fps):
                w |= fp << (s * f)
            buckets[b] = w
            pos += bits_per
        return cls(nbuckets * 4, f, buckets, ej, eji)

    def sizeof_serialized_bits(self) -> int:
        return (12 + 4 * (self.f - 4)) * self.nbuckets
