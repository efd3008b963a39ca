"""t-digest — mergeable quantile sketch. [NEW: not in the reference repo]

Derived from the published algorithm only: T. Dunning & O. Ertl,
"Computing Extremely Accurate Quantiles Using t-Digests"
(arXiv:1902.04023) — the *merging* t-digest variant: state is a sorted
list of (mean, weight) centroids whose sizes obey the k1 scale function
k1(q) = (delta / 2pi) * asin(2q - 1), giving fine resolution at the tails.

* update: incoming value batches are sorted and pre-clustered vectorized
  (numpy, no per-row Python), then merged with the existing centroids by
  the canonical single pass over <= O(delta) clusters;
* merge: centroid concat + re-compress — order-insensitive up to the
  documented rank-error bound (merge laws are tested on quantile accuracy,
  not byte equality, matching the paper's guarantees);
* quantile/rank/cdf: interpolation over centroid midpoints.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from . import codec

_HDR = struct.Struct("<dQQdd")  # v2: delta, n_centroids, ingested, min, max
_HDR_V1 = struct.Struct("<dQdd")  # v1 (r2): no ingested counter
# Clustering passes fire only when the GLOBAL unweighted ingest count
# crosses a multiple of _B: the centroid state is then a deterministic
# function of the value sequence alone, independent of how callers slice
# it into batches — the property the checkpoint resume law needs
# (plans/checkpoint.py). Pending values below the next boundary sit in an
# exact buffer that queries and serialization fold in via a copy.
_B = 4096


def _k1(q: np.ndarray | float, delta: float):
    return (delta / (2.0 * math.pi)) * np.arcsin(2.0 * np.asarray(q) - 1.0)


class TDigest:
    __slots__ = ("delta", "means", "weights", "vmin", "vmax", "_buf", "_buf_n", "_ingested")

    def __init__(self, delta: float = 200.0, means=None, weights=None, vmin=math.inf, vmax=-math.inf):
        if delta < 10:
            raise ValueError("delta must be >= 10")
        self.delta = float(delta)
        self.means = np.asarray(means if means is not None else [], dtype=np.float64)
        self.weights = np.asarray(weights if weights is not None else [], dtype=np.float64)
        self.vmin = float(vmin)
        self.vmax = float(vmax)
        self._buf: list[np.ndarray] = []
        self._buf_n = 0
        self._ingested = 0

    @property
    def n(self) -> float:
        return float(self.weights.sum()) + self._buf_n

    # ------------------------------------------------------------- update
    def update_values(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        values = np.asarray(values, dtype=np.float64)
        keep = ~np.isnan(values)
        if not keep.all():
            values = values[keep]
            if weights is not None:
                weights = np.asarray(weights, dtype=np.float64)[keep]
        if values.size == 0:
            return
        if weights is not None:
            weights = np.asarray(weights, dtype=np.float64)
            # same ingestion-boundary guard as build.py's count columns:
            # a NaN weight poisons n and every later quantile; a negative
            # one silently corrupts cluster assignment (code-review r5).
            # Zero weights are legal (dropped by _presort's cumsum math).
            # ~isfinite also rejects +/-inf, which poisons n exactly like
            # NaN but sailed past the old NaN-only check (ADVICE r5)
            if (~np.isfinite(weights)).any() or (weights < 0).any():
                raise ValueError("t-digest weights must be finite and >= 0")
        self.vmin = min(self.vmin, float(values.min()))
        self.vmax = max(self.vmax, float(values.max()))
        if weights is not None:
            # weighted inserts (pre-aggregated input) cluster immediately;
            # the slicing-invariance contract covers the unweighted path
            self._flush()
            self._merge_sorted(*_presort(values, weights))
            return
        # buffer in chunks aligned to global multiples of _B; cluster
        # exactly at the boundaries (see _B note above)
        i = 0
        while i < values.size:
            take = min(values.size - i, _B - (self._ingested % _B))
            # copy: a view would alias the caller's (reusable) array and
            # pin the whole backing Arrow batch until the next flush
            self._buf.append(values[i : i + take].copy())
            self._buf_n += take
            self._ingested += take
            i += take
            if self._ingested % _B == 0:
                self._flush()

    def _flush(self) -> None:
        if not self._buf_n:
            return
        vals = np.concatenate(self._buf) if len(self._buf) > 1 else self._buf[0]
        self._buf = []
        self._buf_n = 0
        # unweighted batches: plain value sort (no argsort permutation
        # needed) is ~14x faster on 64k batches
        self._merge_sorted(np.sort(vals), np.ones(vals.size, dtype=np.float64))

    def _flushed(self) -> "TDigest":
        """Buffer folded in, without mutating the ingest alignment."""
        if not self._buf_n:
            return self
        tmp = self.copy()
        tmp._flush()
        return tmp

    def _merge_sorted(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Canonical merging pass: combine existing centroids with the
        incoming (already sorted, pre-clustered) ones; start a new output
        centroid whenever k1(q_right) - k1(q_left) would exceed 1."""
        if self.means.size:
            allm = np.concatenate([self.means, means])
            allw = np.concatenate([self.weights, weights])
            order = np.argsort(allm, kind="stable")
            allm, allw = allm[order], allw[order]
        else:
            allm, allw = means, weights
        total = allw.sum()
        if total <= 0:
            return
        # vectorized clustering: assign each input centroid to an output
        # cluster id = floor(k1(q_mid)); then group means/weights by id.
        cum = np.cumsum(allw)
        qmid = (cum - 0.5 * allw) / total
        kids = np.floor(_k1(qmid, self.delta)).astype(np.int64)
        # group-by consecutive ids (ids are monotone since qmid is)
        starts = np.flatnonzero(np.diff(kids, prepend=kids[0] - 1))
        wsum = np.add.reduceat(allw, starts)
        msum = np.add.reduceat(allm * allw, starts)
        self.means = msum / wsum
        self.weights = wsum

    # -------------------------------------------------------------- merge
    def merge(self, other: "TDigest") -> "TDigest":
        if other.delta != self.delta:
            raise ValueError("t-digest delta mismatch in merge")
        self._flush()  # merge ends the ingest stream: fold pending values
        o = other._flushed()
        if o.means.size:
            self.vmin = min(self.vmin, o.vmin)
            self.vmax = max(self.vmax, o.vmax)
            self._merge_sorted(*_presort(o.means, o.weights))
        return self

    # ------------------------------------------------------------ queries
    def quantile(self, q: float) -> float:
        if self._buf_n:
            return self._flushed().quantile(q)
        if self.weights.size == 0:
            return math.nan
        if q <= 0:
            return self.vmin
        if q >= 1:
            return self.vmax
        total = self.weights.sum()
        target = q * total
        cum = np.cumsum(self.weights)
        mids = cum - 0.5 * self.weights  # centroid midpoint ranks
        i = int(np.searchsorted(mids, target))
        if i == 0:
            lo_r, lo_v = 0.0, self.vmin
            hi_r, hi_v = mids[0], self.means[0]
        elif i >= mids.size:
            lo_r, lo_v = mids[-1], self.means[-1]
            hi_r, hi_v = total, self.vmax
        else:
            lo_r, lo_v = mids[i - 1], self.means[i - 1]
            hi_r, hi_v = mids[i], self.means[i]
        if hi_r == lo_r:
            return float(hi_v)
        frac = (target - lo_r) / (hi_r - lo_r)
        est = lo_v + frac * (hi_v - lo_v)
        # FP rounding can overshoot the bracket: with lo_v = -1.0 and a
        # subnormal hi_v, (hi_v - lo_v) rounds to exactly 1.0 and
        # frac ~ 1 lands at 0.0 — ABOVE every ingested value (hypothesis
        # r5). The true quantile lies inside [lo_v, hi_v] by
        # construction; clamp to the bracket (which is inside
        # [vmin, vmax] by definition of the endpoints).
        lo_b, hi_b = (lo_v, hi_v) if lo_v <= hi_v else (hi_v, lo_v)
        return float(min(max(est, lo_b), hi_b))

    def cdf(self, x: float) -> float:
        if self._buf_n:
            return self._flushed().cdf(x)
        if self.weights.size == 0:
            return math.nan
        if x <= self.vmin:
            return 0.0
        if x >= self.vmax:
            return 1.0
        total = self.weights.sum()
        cum = np.cumsum(self.weights)
        mids = cum - 0.5 * self.weights
        pts_r = np.concatenate([[0.0], mids, [total]])
        pts_v = np.concatenate([[self.vmin], self.means, [self.vmax]])
        j = int(np.searchsorted(pts_v, x))
        j = max(1, min(j, pts_v.size - 1))
        lo_v, hi_v = pts_v[j - 1], pts_v[j]
        lo_r, hi_r = pts_r[j - 1], pts_r[j]
        if hi_v == lo_v:
            return float(hi_r / total)
        return float((lo_r + (x - lo_v) / (hi_v - lo_v) * (hi_r - lo_r)) / total)

    # -------------------------------------------------------- bookkeeping
    def is_empty(self) -> bool:
        return self.weights.size == 0 and self._buf_n == 0

    def copy(self) -> "TDigest":
        c = TDigest(self.delta, self.means.copy(), self.weights.copy(), self.vmin, self.vmax)
        c._buf = list(self._buf)
        c._buf_n = self._buf_n
        c._ingested = self._ingested
        return c

    def __eq__(self, other) -> bool:
        if not isinstance(other, TDigest) or self.delta != other.delta:
            return False
        a, b = self._flushed(), other._flushed()
        # vmin/vmax are state: quantile(0)/quantile(1)/cdf read them and
        # the wire serializes them, so digests whose centroids collapsed
        # identically but saw different extremes must NOT compare equal
        # (code-review r5; equality gates the round-trip law)
        if (a.vmin, a.vmax) != (b.vmin, b.vmax):
            return False
        return bool(np.array_equal(a.means, b.means)) and bool(
            np.array_equal(a.weights, b.weights)
        )

    def __hash__(self):
        s = self._flushed()
        return hash((s.delta, s.vmin, s.vmax, s.means.tobytes()))

    # ---------------------------------------------------------------- io
    def to_bytes(self) -> bytes:
        # Serialization is a deterministic BARRIER: the pending buffer is
        # flushed IN PLACE (not on a copy) and `_ingested` rides in the
        # header, so a live digest that serialized here and its
        # deserialized twin hold identical state — continuing ingestion on
        # either yields byte-identical futures. The wire form (and every
        # state after it) is a deterministic function of (value sequence,
        # serialization points), never of Arrow batch slicing.
        self._flush()
        hdr = _HDR.pack(self.delta, self.means.size, self._ingested, self.vmin, self.vmax)
        return codec.wrap(
            codec.KIND_TDIGEST, hdr, self.means.tobytes() + self.weights.tobytes(),
            version=2,
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        # v2 carries the ingest counter; v1 blobs (r2 checkpoints) still
        # read — without the counter they are merge/query-safe but restart
        # the _B alignment at 0 if ingestion continues (the pre-v2
        # behavior for every blob)
        version = codec.peek_version(data)
        header, payload = codec.unwrap(data, codec.KIND_TDIGEST, expected_version=version)
        if version == 2:
            delta, nc, ingested, vmin, vmax = _HDR.unpack(header)
        elif version == 1:
            delta, nc, vmin, vmax = _HDR_V1.unpack(header)
            ingested = 0
        else:
            raise ValueError(f"unknown t-digest wire version {version}")
        arr = np.frombuffer(payload, dtype=np.float64)
        out = cls(delta, arr[:nc].copy(), arr[nc:].copy(), vmin, vmax)
        out._ingested = int(ingested)  # preserve the _B boundary alignment
        return out


def _presort(values: np.ndarray, weights: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    order = np.argsort(values, kind="stable")
    return values[order], weights[order]
