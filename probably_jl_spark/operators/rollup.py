"""Sketch-state rollup: re-merge grouped sketch STATE rows to a coarser
key without touching raw data — the sublinear reaggregation that is the
point of mergeable sketches at 100 TB (Agarwal et al., "Mergeable
Summaries", PODS 2012). Build per-(tool, hour) states once, then answer
per-(tool, day), per-tool, and global questions by merging KB-sized
states instead of rescanning 10^12 turns.

``rollup_states`` has the same no-hot-key two-stage shape as the grouped
build (operators/grouped.py): stage 1 folds each input partition's state
rows into one partial per coarse key (mapInPandas, flush-capped memory),
so a coarse key covering the whole table costs one partial per partition
— never a single-task row pile-up; stage 2 shuffles only the folded
partials and merges them per key in ascending-partition order (the same
deterministic `_merge_groups` the grouped build uses, including the
auto-derived salt level when the scan is very wide).

Column routing is detected executor-side from the blobs' own kind bytes:
HLL and KMV columns take the vectorized many-blob path (joined-buffer
decode -> packed accumulator -> flat-buffer emit, no per-state-row
Python; see sketches/hll.py / kmv.py many-blob helpers), every other
kind folds through the generic ``merge_blobs`` dispatch. Because HLL and
KMV states are canonical pure set functions, rolling up fine-grained
states is BYTE-identical to building the coarse states directly from the
raw rows (gated by test + the rollup_day_to_type oracle query);
merge-order-sensitive kinds (t-digest, KLL, cuckoo) stay inside their
published bounds and are deterministic for a fixed input partitioning,
exactly like the grouped build itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from ..sketches import codec
from .grouped import (
    _ORD_COL,
    _SALT_COL,
    _NROWS_COL,
    _auto_salt_buckets,
    _group_codes,
    _merge_groups,
)
from .specs import merge_blobs


class _StateCol:
    """Minimal spec shim for `_merge_groups`, which only reads
    ``state_col``."""

    __slots__ = ("state_col",)

    def __init__(self, state_col: str):
        self.state_col = state_col


def _uniform_header_value(flat: np.ndarray, starts: np.ndarray, col: str, kind: str):
    """All blobs of a rollup column must agree on the sizing parameter
    (HLL p at byte 8; KMV k as <u4 at bytes 8:12) — a mixed-parameter
    merge would silently produce garbage registers, so it raises."""
    if kind == "hll":
        vals = flat[starts + 8].astype(np.int64)
    else:
        vals = flat[(starts[:, None] + (8 + np.arange(4))).reshape(-1)].view("<u4").astype(np.int64)
    if vals.size and (vals != vals[0]).any():
        raise ValueError(
            f"rollup_states: column {col!r} mixes {kind} states with "
            f"different sizing parameters ({sorted(set(vals.tolist()))}); "
            "only same-parameter states are mergeable"
        )
    return int(vals[0])


class _ColAcc:
    """Per-column rollup accumulator, routed by the column's own kind
    byte at first sight: 'hll' / 'kmv' -> vectorized packed accumulators
    (same layouts as the grouped kernels), anything else -> generic
    {group code -> folded blob} via merge_blobs."""

    def __init__(self, col: str):
        self.col = col
        self.kind: str | None = None
        self.param: int | None = None  # p (hll) / k (kmv)
        self.acc = None

    def absorb(self, g: np.ndarray, blobs: list) -> None:
        if self.kind is None:
            k = codec.peek_kind(blobs[0])
            self.kind = {codec.KIND_HLL: "hll", codec.KIND_KMV: "kmv"}.get(k, "generic")
            if self.kind == "generic":
                self.acc = {}
        if self.kind == "hll":
            from ..sketches.hll import _dedup_max_rho, packed_entries_many_from_bytes
            from .grouped import _absorb_max

            lens = np.fromiter((len(b) for b in blobs), count=len(blobs), dtype=np.int64)
            starts = np.zeros(len(blobs), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            flat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            p = _uniform_header_value(flat, starts, self.col, "hll")
            if self.param is None:
                self.param = p
                self.acc = np.empty(0, dtype=np.int64)
            elif p != self.param:
                raise ValueError(
                    f"rollup_states: column {self.col!r} mixes p={self.param} and p={p}"
                )
            counts, ent = packed_entries_many_from_bytes(blobs)
            if ent.size:
                packed = (np.repeat(g, counts) << np.int64(24)) | ent.astype(np.int64)
                packed.sort()
                self.acc = _absorb_max(self.acc, _dedup_max_rho(packed))
        elif self.kind == "kmv":
            from ..sketches.kmv import mins_many_from_bytes
            from .grouped import _kmv_combine

            lens = np.fromiter((len(b) for b in blobs), count=len(blobs), dtype=np.int64)
            starts = np.zeros(len(blobs), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            flat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            k = _uniform_header_value(flat, starts, self.col, "kmv")
            if self.param is None:
                self.param = k
                self.acc = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
            elif k != self.param:
                raise ValueError(
                    f"rollup_states: column {self.col!r} mixes k={self.param} and k={k}"
                )
            counts, hh = mins_many_from_bytes(blobs)
            if hh.size:
                self.acc = _kmv_combine(
                    self.acc[0], self.acc[1], np.repeat(g, counts), hh, k
                )
        else:
            acc = self.acc
            for code, blob in zip(g.tolist(), blobs):
                acc[code] = merge_blobs(acc.get(code), blob)

    def emit_blobs(self, n: int) -> list:
        from .grouped import _MASK24

        if self.kind == "hll":
            from ..sketches.hll import packed_entries_many_to_bytes

            bounds = np.searchsorted(self.acc >> np.int64(24), np.arange(n + 1))
            return packed_entries_many_to_bytes(
                self.param, (self.acc & _MASK24).astype(np.uint32), bounds
            )
        if self.kind == "kmv":
            from ..sketches.kmv import mins_many_to_bytes

            g_acc, h_acc = self.acc
            bounds = np.searchsorted(g_acc, np.arange(n + 1))
            return mins_many_to_bytes(self.param, h_acc, bounds)
        return [self.acc.get(i) for i in range(n)]

    def reset(self) -> None:
        if self.kind == "hll":
            self.acc = np.empty(0, dtype=np.int64)
        elif self.kind == "kmv":
            self.acc = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
        elif self.kind == "generic":
            self.acc = {}


def _rollup_partial_builder(group_cols: list[str], state_cols: list[str], cap: int):
    def fn(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        flush = 0
        keys_index = None
        n_rows = np.empty(0, dtype=np.int64)
        cols = {c: _ColAcc(c) for c in state_cols}

        def emit(ord_key):
            n = len(keys_index)
            if len(group_cols) == 1:
                out = pd.DataFrame({group_cols[0]: keys_index})
            else:
                out = keys_index.to_frame(index=False)
                out.columns = list(group_cols)
            out[_ORD_COL] = ord_key
            out[_NROWS_COL] = n_rows[:n]
            for c in state_cols:
                out[c] = cols[c].emit_blobs(n)
            return out

        for pdf in batches:
            if not len(pdf):
                continue
            g, keys_index = _group_codes(pdf, group_cols, keys_index)
            if len(keys_index) > n_rows.size:
                n_rows = np.concatenate(
                    [n_rows, np.zeros(len(keys_index) - n_rows.size, dtype=np.int64)]
                )
            if _NROWS_COL in pdf.columns:
                np.add.at(n_rows, g, pdf[_NROWS_COL].to_numpy(dtype=np.int64))
            for c in state_cols:
                cols[c].absorb(g, list(pdf[c]))
            if len(keys_index) > cap:
                yield emit((pid << 20) | flush)
                flush += 1
                keys_index = None
                n_rows = np.empty(0, dtype=np.int64)
                for c in state_cols:
                    cols[c].reset()
        if keys_index is not None and len(keys_index):
            yield emit((pid << 20) | flush)

    return fn


def rollup_states(
    states_df: DataFrame,
    group_cols: list[str],
    state_cols: list[str] | None = None,
    salt_buckets: int | None = None,
    max_states_per_partition: int = 1 << 16,
) -> DataFrame:
    """Re-merge sketch-state rows to the coarser key ``group_cols``:
    returns one row per coarse group with ``group_cols + [n_rows] +
    state columns`` (``n_rows`` sums the input's ``n_rows`` when present,
    else reports 0). ``group_cols=[]`` rolls everything up to ONE global
    row. ``state_cols`` defaults to every binary column.

    Input is any state table this library produces (``grouped_sketch``
    output, checkpoint tables, previous rollups) — kinds are detected
    from the blobs themselves, HLL/KMV take the fully vectorized path,
    and mixed sizing parameters within a column raise rather than merge
    garbage. State columns must be non-null.

    Scale shape: stage 1 never holds more than ``max_states_per_partition``
    coarse groups in memory (flushes are lossless — merges are
    associative) and emits one partial per (partition, coarse key), so a
    coarse key absorbing the entire input costs #partitions state rows,
    not a single-task row pile-up; only those partials shuffle. The final
    merge applies partials in ascending partition order (deterministic —
    same law as the grouped build); ``salt_buckets`` defaults to the same
    partition-count-derived fan-in bound as ``grouped_sketch``."""
    all_group = list(group_cols)
    df = states_df
    if not all_group:
        df = df.withColumn("__all", F.lit(0))
        all_group = ["__all"]
    if state_cols is None:
        state_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, BinaryType) and f.name not in all_group
        ]
    if not state_cols:
        raise ValueError("rollup_states: no binary state columns to roll up")
    if salt_buckets is None:
        try:
            salt_buckets = _auto_salt_buckets(df.rdd.getNumPartitions())
        except Exception:  # pragma: no cover - un-materializable plans
            salt_buckets = 1
    fields = [StructField(df.schema[c].name, df.schema[c].dataType) for c in all_group]
    fields.append(StructField(_ORD_COL, LongType()))
    fields.append(StructField(_NROWS_COL, LongType()))
    fields += [StructField(c, BinaryType()) for c in state_cols]
    part_schema = StructType(fields)
    keep = all_group + ([_NROWS_COL] if _NROWS_COL in df.columns else []) + state_cols
    partials = df.select(*keep).mapInPandas(
        _rollup_partial_builder(all_group, state_cols, max_states_per_partition),
        schema=part_schema,
    )
    shims = [_StateCol(c) for c in state_cols]
    if salt_buckets > 1:
        level1 = partials.withColumn(
            _SALT_COL, F.pmod(F.shiftright(F.col(_ORD_COL), 20), F.lit(salt_buckets))
        )
        mid_cols = all_group + [_SALT_COL]
        mid_schema = StructType(
            [StructField(c, level1.schema[c].dataType) for c in mid_cols]
            + [StructField(_ORD_COL, LongType()), StructField(_NROWS_COL, LongType())]
            + [StructField(c, BinaryType()) for c in state_cols]
        )
        partials = (
            level1.groupBy(*mid_cols)
            .applyInPandas(_merge_groups(shims, mid_cols, with_ord=True), schema=mid_schema)
            .drop(_SALT_COL)
        )
    out_schema = StructType([f for f in part_schema.fields if f.name != _ORD_COL])
    out = partials.groupBy(*all_group).applyInPandas(
        _merge_groups(shims, all_group, with_ord=False), schema=out_schema
    )
    if not group_cols:
        out = out.drop("__all")
    return out
