"""KLL — mergeable quantile sketch with worst-case guarantees.
[NEW: not in the reference repo]

Derived from the published algorithm only: Z. Karnin, K. Lang, E. Liberty,
"Optimal Quantile Approximation in Streams" (FOCS 2016); lazy-compaction
practice follows the Apache DataSketches description of the same algorithm
(see PAPERS.md: "KLL±" VLDB 2021, "Relative Error Streaming Quantiles"
PODS 2021 for follow-ups).

State: a hierarchy of compactors; level h holds items of weight 2^h.
Capacity of level h (0-indexed from the bottom of H levels) is
ceil(k * c^(H-1-h)) with c = 2/3, floored at 2. When total size exceeds
the sum of capacities, the lowest over-full level is sorted and every
other item (parity chosen by a deterministic counter-based coin — NOT
random, so distributed builds are reproducible/resumable, SURVEY.md §7)
is promoted to level h+1.

* update: whole numpy batches append to level 0, compaction is sort +
  strided slice — fully vectorized;
* merge: level-wise concatenation then compaction — commutative up to the
  rank-error bound (laws tested on rank accuracy plus an exact
  deterministic state for the serialization round-trip);
* rank error: |R_est(x) - R(x)| <= eps * n with eps ~ O(1/k); we gate
  empirically at 2/k per the KLL paper's constants.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from . import codec
from .hashing import SALT_KLL, mix64_scalar

_HDR = struct.Struct("<IQQI")  # k, n, compaction_counter, n_levels
_C = 2.0 / 3.0
# Compaction fires only when the GLOBAL item count crosses a multiple of
# _B (not per update_values call): the state is then a deterministic
# function of the value sequence alone, independent of how callers slice
# it into batches — the property the checkpoint resume law needs
# (plans/checkpoint.py; an Arrow-batch-aligned compaction would make
# bytes depend on spark.sql.execution.arrow.maxRecordsPerBatch and on
# which *other* rows a resumed run filtered out).
_B = 4096


class KLL:
    __slots__ = ("k", "levels", "n", "_compactions")

    def __init__(self, k: int = 200, levels: list[np.ndarray] | None = None, n: int = 0, compactions: int = 0):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.levels = levels if levels is not None else [np.empty(0, dtype=np.float64)]
        self.n = int(n)
        self._compactions = int(compactions)

    # ------------------------------------------------------------ sizing
    def _capacity(self, h: int, nlevels: int) -> int:
        depth = nlevels - 1 - h
        return max(2, int(math.ceil(self.k * (_C**depth))))

    def _total_capacity(self) -> int:
        H = len(self.levels)
        return sum(self._capacity(h, H) for h in range(H))

    # ------------------------------------------------------------- update
    def update_values(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return
        # append in chunks aligned to global multiples of _B; compress
        # exactly at the boundaries (see _B note above)
        i = 0
        while i < values.size:
            take = min(values.size - i, _B - (self.n % _B))
            self.levels[0] = np.concatenate([self.levels[0], values[i : i + take]])
            self.n += take
            i += take
            if self.n % _B == 0:
                self._compress()

    def _compress(self) -> None:
        while sum(lv.size for lv in self.levels) > self._total_capacity():
            H = len(self.levels)
            # compact the lowest level over its capacity
            for h in range(H):
                if self.levels[h].size > self._capacity(h, H):
                    self._compact_level(h)
                    break
            else:
                break

    def _compact_level(self, h: int) -> None:
        if h + 1 >= len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        lv = np.sort(self.levels[h])
        self._compactions += 1
        coin = mix64_scalar(self._compactions, SALT_KLL + h) & 1
        promoted = lv[coin::2]
        self.levels[h] = np.empty(0, dtype=np.float64)
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])

    # -------------------------------------------------------------- merge
    def merge(self, other: "KLL") -> "KLL":
        if other.k != self.k:
            raise ValueError("KLL k mismatch in merge")
        for h, lv in enumerate(other.levels):
            if lv.size == 0:
                continue
            while h >= len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[h] = np.concatenate([self.levels[h], lv])
        self.n += other.n
        self._compactions = max(self._compactions, other._compactions) + 1
        self._compress()
        return self

    # ------------------------------------------------------------ queries
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for h, lv in enumerate(self.levels):
            if lv.size:
                items.append(lv)
                weights.append(np.full(lv.size, float(1 << h)))
        if not items:
            return np.empty(0), np.empty(0)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def rank(self, x: float) -> float:
        """Estimated number of items <= x."""
        it, wt = self._weighted_items()
        if it.size == 0:
            return math.nan
        i = np.searchsorted(it, x, side="right")
        return float(wt[:i].sum())

    def quantile(self, q: float) -> float:
        it, wt = self._weighted_items()
        if it.size == 0:
            return math.nan
        q = min(max(q, 0.0), 1.0)
        cum = np.cumsum(wt)
        target = q * cum[-1]
        i = int(np.searchsorted(cum, target, side="left"))
        return float(it[min(i, it.size - 1)])

    def quantiles(self, qs) -> list[float]:
        it, wt = self._weighted_items()
        if it.size == 0:
            return [math.nan for _ in qs]
        cum = np.cumsum(wt)
        out = []
        for q in qs:
            target = min(max(q, 0.0), 1.0) * cum[-1]
            i = int(np.searchsorted(cum, target, side="left"))
            out.append(float(it[min(i, it.size - 1)]))
        return out

    @staticmethod
    def error_bound(k: int) -> float:
        """Empirical-constant rank-error bound eps ~ 2/k (KLL FOCS'16 gives
        eps = O(1/k) with small constants; DataSketches reports ~1.65/k for
        c=2/3 at 99% confidence — we gate at 2/k)."""
        return 2.0 / k

    # -------------------------------------------------------- bookkeeping
    def is_empty(self) -> bool:
        return self.n == 0

    def copy(self) -> "KLL":
        return KLL(self.k, [lv.copy() for lv in self.levels], self.n, self._compactions)

    def __eq__(self, other) -> bool:
        # semantic equality = identical wire form, computed on compacted
        # COPIES so comparison never mutates either operand (to_bytes is a
        # mutating barrier; see its docstring)
        return (
            isinstance(other, KLL)
            and self.k == other.k
            and self.n == other.n
            and self._wire() == other._wire()
        )

    def __hash__(self):
        return hash((self.k, self.n))

    # ---------------------------------------------------------------- io
    def _wire(self) -> bytes:
        """Wire form of a compacted copy (non-mutating; used by __eq__)."""
        src = self
        if sum(lv.size for lv in self.levels) > self._total_capacity():
            src = self.copy()
            src._compress()
        hdr = _HDR.pack(src.k, src.n, src._compactions, len(src.levels))
        sizes = np.array([lv.size for lv in src.levels], dtype=np.uint32)
        payload = sizes.tobytes() + b"".join(lv.tobytes() for lv in src.levels)
        return codec.wrap(codec.KIND_KLL, hdr, payload)

    def to_bytes(self) -> bytes:
        # Serialization is a deterministic BARRIER: the level-0 tail
        # (exact items awaiting the next _B boundary) is compacted IN
        # PLACE, keeping wire states O(k log n), not O(_B), and leaving
        # the live sketch in exactly the state its deserialized twin will
        # hold — continuing ingestion on either yields byte-identical
        # futures (`n`, and so the _B alignment, rides in the header).
        # Bytes are a deterministic function of (value sequence,
        # serialization points), never of Arrow batch slicing.
        self._compress()
        return self._wire()

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLL":
        header, payload = codec.unwrap(data, codec.KIND_KLL)
        k, n, comp, nlev = _HDR.unpack(header)
        sizes = np.frombuffer(payload[: 4 * nlev], dtype=np.uint32)
        levels = []
        off = 4 * nlev
        for s in sizes.tolist():
            levels.append(np.frombuffer(payload[off : off + 8 * s], dtype=np.float64).copy())
            off += 8 * s
        return cls(k, levels, n, comp)
