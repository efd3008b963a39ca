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
— never a single-task row pile-up; stage 2 hash-repartitions only those
folded partials on the coarse key and merges each partition in ONE
streaming pass, rows pre-sorted by (key, origin order) so
merge-order-sensitive kinds (t-digest, KLL, cuckoo) apply partials in
ascending partition order — the same determinism law as the grouped
build, with no per-key pandas group materialization at any fan-in.

Column routing is detected executor-side from the blobs' own kind bytes:
HLL and KMV columns delegate to the grouped build's vectorized kernels
(`_HllKernel`/`_KmvKernel`: joined-buffer many-blob decode -> packed
accumulator -> flat-buffer emit, no per-state-row Python), every other
kind folds through the generic ``merge_blobs`` dispatch. Because HLL and
KMV states are canonical pure set functions, rolling up fine-grained
states is BYTE-identical to building the coarse states directly from the
raw rows (gated by test + the rollup_day_to_type oracle query);
order-sensitive kinds stay inside their published bounds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from ..sketches import codec
from .grouped import _ORD_COL, _NROWS_COL, _VEC_KERNELS, _group_codes
from .specs import SketchSpec, merge_blobs


def _check_uniform_param(blobs, col: str, kind: str, expect: int | None):
    """All blobs of a rollup column must agree on the sizing parameter
    (HLL p at byte 8; KMV k as <u4 at bytes 8:12) — a mixed-parameter
    merge would silently produce garbage registers, so it raises. Reads
    only the header bytes (no joined-buffer build; the decode helpers do
    that once, later), with an explicit length guard so a truncated blob
    gets a contextful error instead of a bare gather IndexError."""
    need = 9 if kind == "hll" else 16
    lens = np.fromiter((len(b) for b in blobs), count=len(blobs), dtype=np.int64)
    if int(lens.min()) < need:
        raise ValueError(
            f"rollup_states: column {col!r} holds a sketch blob too "
            f"short for a {kind} header ({int(lens.min())} < {need} bytes)"
        )
    if kind == "hll":
        vals = np.fromiter((b[8] for b in blobs), count=len(blobs), dtype=np.int64)
    else:
        vals = np.frombuffer(b"".join(b[8:12] for b in blobs), dtype="<u4").astype(
            np.int64
        )
    if expect is None:
        expect = int(vals[0])
    if (vals != expect).any():
        raise ValueError(
            f"rollup_states: column {col!r} mixes {kind} states with "
            f"different sizing parameters ({sorted(set(vals.tolist()) | {expect})}); "
            "only same-parameter states are mergeable"
        )
    return expect


class _ColAcc:
    """Per-column rollup accumulator, routed by the column's own kind
    byte at first sight: 'hll' / 'kmv' delegate to the grouped build's
    vectorized kernels (one shared implementation of the packed fold and
    flat-buffer emit), anything else folds a {group code -> blob} dict
    through the generic ``merge_blobs`` dispatch (one Python merge per
    STATE row — rollup inputs are state tables, never raw rows)."""

    def __init__(self, col: str):
        self.col = col
        self.kind: str | None = None
        self.param: int | None = None  # p (hll) / k (kmv)
        self.kernel = None
        self.spec: SketchSpec | None = None
        self.acc = None

    def absorb(self, g: np.ndarray, blobs: list) -> None:
        # a null state cell (outer-joined or hand-built state table) is
        # documented as unsupported — name the column instead of dying
        # deep in the executor with a bare TypeError (ADVICE r5)
        if any(b is None for b in blobs):
            raise ValueError(
                f"rollup_states: column {self.col!r} contains null state blobs"
            )
        if self.kind is None:
            k = codec.peek_kind(blobs[0])
            self.kind = {codec.KIND_HLL: "hll", codec.KIND_KMV: "kmv"}.get(k, "generic")
            if self.kind == "generic":
                self.acc = {}
        if self.kind == "generic":
            acc = self.acc
            for code, blob in zip(g.tolist(), blobs):
                acc[code] = merge_blobs(acc.get(code), blob)
            return
        self.param = _check_uniform_param(blobs, self.col, self.kind, self.param)
        if self.kernel is None:
            pkey = "p" if self.kind == "hll" else "k"
            self.spec = SketchSpec(
                self.col, self.kind, key_cols=("_",), params={pkey: self.param}
            )
            self.kernel = _VEC_KERNELS[self.kind]([self.spec])
            self.acc = self.kernel.init_acc()
        self.acc = self.kernel.absorb_states(self.acc, self.spec, g, blobs)

    def emit_blobs(self, n: int) -> list:
        if self.kind == "generic":
            return [self.acc.get(i) for i in range(n)]
        return self.kernel.emit_blobs(self.acc, self.spec, n)

    def reset(self) -> None:
        if self.kind == "generic":
            self.acc = {}
        elif self.kernel is not None:
            self.acc = self.kernel.init_acc()


def _rollup_builder(
    group_cols: list[str], state_cols: list[str], cap: int | None, with_ord: bool
):
    """Shared mapInPandas body for both rollup stages. Stage 1
    (``with_ord=True``): flush-capped partials, one per (partition,
    coarse key), tagged with the deterministic merge order key. Stage 2
    (``with_ord=False``): one streaming pass over a hash-partitioned,
    (key, ord)-sorted partition — every group's partials fold in
    ascending origin order (the grouped build's determinism law) with no
    per-key pandas group materialization."""

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
            if ord_key is not None:
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
            if cap is not None and len(keys_index) > cap:
                yield emit((pid << 20) | flush)
                flush += 1
                keys_index = None
                n_rows = np.empty(0, dtype=np.int64)
                for c in state_cols:
                    cols[c].reset()
        if keys_index is not None and len(keys_index):
            yield emit(((pid << 20) | flush) if with_ord else None)

    return fn


def rollup_states(
    states_df: DataFrame,
    group_cols: list[str],
    state_cols: list[str] | None = None,
    max_states_per_partition: int = 1 << 16,
) -> DataFrame:
    """Re-merge sketch-state rows to the coarser key ``group_cols``:
    returns one row per coarse group with ``group_cols + [n_rows] +
    state columns`` (``n_rows`` sums the input's ``n_rows`` when present,
    else reports 0). ``group_cols=[]`` rolls everything up to ONE global
    row. ``state_cols`` defaults to every binary column.

    Input is any state table this library produces (``grouped_sketch``
    output, checkpoint tables, previous rollups) — kinds are detected
    from the blobs themselves, HLL/KMV take the fully vectorized kernel
    path in BOTH stages, and mixed sizing parameters within a column
    raise rather than merge garbage. State columns must be non-null.

    Scale shape: stage 1 never holds more than ``max_states_per_partition``
    coarse groups in memory (flushes are lossless — merges are
    associative) and emits one partial per (partition, coarse key), so a
    coarse key absorbing the entire input costs #partitions state rows,
    not a single-task row pile-up; only those partials shuffle, and the
    final merge streams each hash-partition in one pass (no per-key
    pandas group, so fan-in needs no salt level). Partials apply in
    ascending partition order (deterministic — same law as the grouped
    build)."""
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
    fields = [StructField(df.schema[c].name, df.schema[c].dataType) for c in all_group]
    fields.append(StructField(_ORD_COL, LongType()))
    fields.append(StructField(_NROWS_COL, LongType()))
    fields += [StructField(c, BinaryType()) for c in state_cols]
    part_schema = StructType(fields)
    keep = all_group + ([_NROWS_COL] if _NROWS_COL in df.columns else []) + state_cols
    partials = df.select(*keep).mapInPandas(
        _rollup_builder(all_group, state_cols, max_states_per_partition, with_ord=True),
        schema=part_schema,
    )
    out_schema = StructType([f for f in part_schema.fields if f.name != _ORD_COL])
    out = (
        partials.repartition(*all_group)
        .sortWithinPartitions(*all_group, _ORD_COL)
        .mapInPandas(
            _rollup_builder(all_group, state_cols, None, with_ord=False),
            schema=out_schema,
        )
    )
    if not group_cols:
        out = out.drop("__all")
    return out
