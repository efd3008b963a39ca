"""HyperLogLog with dense 1-byte registers — mergeable cardinality sketch.

Semantics preserved from the reference (jakobnissen/Probably.jl,
src/hyperloglog/hyperloglog.jl):

* state = ``2^p`` one-byte registers, ``p in 4..18``, default p=14
  (hyperloglog.jl:38-48,53);
* update: bin = top-p bits of the 64-bit item hash; register = max(register,
  trailing-zeros(remaining bits, guarded) + 1) (hyperloglog.jl:132-157);
* merge = element-wise register max — commutative, associative, idempotent
  (hyperloglog.jl:68-73), which is what makes treeReduce-style distributed
  merge safe;
* equality / copy = register-array equality (hyperloglog.jl:90-98).

Estimator difference (deliberate, documented): the reference implements the
Google HLL++ empirical-bias-table estimator (hyperloglog.jl:182-223 +
constants.jl tables). We instead use Ertl's improved raw estimator
("New cardinality estimation algorithms for HyperLogLog sketches",
O. Ertl, 2017, arXiv:1702.01284, Alg. 6: sigma/tau corrections), which is
table-free, has no empirical constants to port, and meets or beats the same
published bound (relative standard error <= 1.04/sqrt(m); reference
docstring bound: median 0.5%, <2.5% @99% for 2^10..2^62,
hyperloglog.jl:20-24). Register *update* semantics are identical, so merge
laws and serialization behave exactly like the reference.

All update paths are vectorized numpy over uint64 hash arrays — no
per-row Python (BASELINE.json input_hint).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from . import codec
from .hashing import trailing_zeros64

_U = np.uint64

DEFAULT_P = 14  # reference default: hyperloglog.jl:48

_HDR = struct.Struct("<B")


class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = DEFAULT_P, registers: np.ndarray | None = None):
        if not 4 <= p <= 18:  # reference constraint: hyperloglog.jl:39-41
            raise ValueError("p must be in 4..18")
        self.p = p
        self.m = 1 << p
        if registers is None:
            registers = np.zeros(self.m, dtype=np.uint8)
        else:
            if registers.shape != (self.m,) or registers.dtype != np.uint8:
                raise ValueError("registers must be uint8 of length 2^p")
        self.registers = registers

    # ------------------------------------------------------------- update
    def update_hashes(self, h: np.ndarray) -> None:
        """Scatter-max a batch of uint64 item hashes into the registers.

        bin  = top p bits (reference getbin, hyperloglog.jl:132)
        rho  = trailing zeros of the hash with a guard bit at position 64-p,
               plus 1 => rho in 1..(64-p)+1 (reference getzeros,
               hyperloglog.jl:136-139).
        """
        if h.size == 0:
            return
        h = h.astype(np.uint64, copy=False)
        guard = _U(1) << _U(64 - self.p)
        rho = trailing_zeros64(h | guard) + np.uint8(1)
        idx = (h >> _U(64 - self.p)).astype(np.int64)
        # scatter-max via ufunc.at: measured faster than sort-based
        # segment-max at every batch size now that tz uses frexp (27 vs
        # 45 ns/row on 64k batches, 2^14 registers)
        np.maximum.at(self.registers, idx, rho)

    # -------------------------------------------------------------- merge
    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        """In-place register-wise max; requires equal p (reference union!,
        hyperloglog.jl:68-73; unequal p is an error rather than silent)."""
        if other.p != self.p:
            raise ValueError(f"cannot merge HLL p={self.p} with p={other.p}")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    # ----------------------------------------------------------- estimate
    def estimate(self) -> float:
        """Ertl improved raw estimator (arXiv:1702.01284 Alg. 6)."""
        m = float(self.m)
        q = 64 - self.p  # max register value is q+1
        counts = np.bincount(self.registers, minlength=q + 2).astype(np.float64)
        z = m * _tau(1.0 - counts[q + 1] / m)
        for k in range(q, 0, -1):
            z = 0.5 * (z + counts[k])
        z += m * _sigma(counts[0] / m)
        if z == 0.0:
            return math.inf
        alpha_inf = 1.0 / (2.0 * math.log(2.0))
        return alpha_inf * m * m / z

    def cardinality(self) -> int:
        """Rounded estimate (reference length(), hyperloglog.jl:218-223).
        A fully-saturated register file estimates to infinity — clamp to
        int64 max instead of crashing (int(inf) raises)."""
        e = self.estimate()
        return int(round(e)) if math.isfinite(e) else (1 << 63) - 1

    # -------------------------------------------------------- bookkeeping
    def is_empty(self) -> bool:
        return not self.registers.any()

    def clear(self) -> None:
        self.registers.fill(0)

    def copy(self) -> "HyperLogLog":
        return HyperLogLog(self.p, self.registers.copy())

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, HyperLogLog)
            and self.p == other.p
            and bool(np.array_equal(self.registers, other.registers))
        )

    def __hash__(self):
        return hash((self.p, self.registers.tobytes()))

    def sizeof(self) -> int:
        return self.m  # one byte per register (hyperloglog.jl:53)

    # ---------------------------------------------------------------- io
    def to_bytes(self) -> bytes:
        return codec.wrap(codec.KIND_HLL, _HDR.pack(self.p), self.registers.tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        header, payload = codec.unwrap(data, codec.KIND_HLL)
        (p,) = _HDR.unpack(header)
        regs = np.frombuffer(payload, dtype=np.uint8).copy()
        return cls(p, regs)

    @staticmethod
    def error_bound(p: int = DEFAULT_P) -> float:
        """Published relative standard error 1.04/sqrt(m)."""
        return 1.04 / math.sqrt(1 << p)


def _sigma(x: float) -> float:
    """Ertl sigma: x + sum_{k>=1} x^{2^k} * 2^{k-1}; sigma(1)=inf."""
    if x == 1.0:
        return math.inf
    y = 1.0
    z = x
    while True:
        x = x * x
        z_prev = z
        z += x * y
        y += y
        if z == z_prev:
            return z


def _tau(x: float) -> float:
    """Ertl tau: (1/3)(1 - x - sum_{k>=1}(1 - x^{2^-k})^2 * 2^{-k})."""
    if x == 0.0 or x == 1.0:
        return 0.0
    y = 1.0
    z = 1.0 - x
    while True:
        x = math.sqrt(x)
        z_prev = z
        y *= 0.5
        z -= (1.0 - x) * (1.0 - x) * y
        if z == z_prev:
            return z / 3.0
