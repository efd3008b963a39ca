"""Binary codec shared by all sketch states.

Every sketch serializes to ``MAGIC(4s) | kind(u8) | version(u8) |
header_len(u16) | header bytes | payload bytes`` where the header is a
small struct of the sketch's fixed parameters and the payload is the raw
little-endian state array(s). This single canonical encoding is what
crosses the JVM<->Python boundary (BinaryType column), what lands in the
checkpoint/lineage table, and what the serialization round-trip law tests
(`from_bytes(to_bytes(s)) == s` byte-exact; reference analogue: register
equality semantics at src/hyperloglog/hyperloglog.jl:90-98).
"""

from __future__ import annotations

import struct

MAGIC = b"PJS1"

KIND_HLL = 1
KIND_CMS = 2
KIND_BLOOM = 3
KIND_CUCKOO = 4
KIND_TDIGEST = 5
KIND_KLL = 6
KIND_KMV = 7
KIND_MG = 8

_PREFIX = struct.Struct("<4sBBH")


def wrap(kind: int, header: bytes, payload: bytes, version: int = 1) -> bytes:
    return _PREFIX.pack(MAGIC, kind, version, len(header)) + header + payload


def unwrap(data: bytes, expected_kind: int, expected_version: int = 1) -> tuple[bytes, bytes]:
    if len(data) < _PREFIX.size:
        raise ValueError(f"sketch blob too short ({len(data)} bytes)")
    magic, kind, version, hlen = _PREFIX.unpack_from(data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad magic {magic!r}")
    if kind != expected_kind:
        raise ValueError(f"expected sketch kind {expected_kind}, got {kind}")
    if version != expected_version:
        raise ValueError(f"expected version {expected_version}, got {version}")
    off = _PREFIX.size
    return data[off : off + hlen], data[off + hlen :]


def peek_kind(data: bytes) -> int:
    magic, kind, _, _ = _PREFIX.unpack_from(data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad magic {magic!r}")
    return kind


def peek_version(data: bytes) -> int:
    magic, _, version, _ = _PREFIX.unpack_from(data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad magic {magic!r}")
    return version
