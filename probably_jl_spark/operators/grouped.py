"""Grouped sketches built as streaming partition-local partials
(north_rule skew handling).

Per-group sketches (e.g. distinct conv_ids per tool, turn-length digest
per role) never materialize a group's rows. Stage 1 is a ``mapInPandas``
pass identical in shape to the global build (build.py): each input
partition keeps a ``{group-key -> sketch}`` dict, updates it per Arrow
batch with vectorized kernels, and emits one small *state* row per
(partition, key). Stage 2 shuffles only those serialized states (KBs per
group) and merges them per key — correct because every sketch merge is
commutative + associative (SURVEY.md §4.2).

Why this shape at 100 TB (VERDICT r01 "What's wrong #2"): the previous
``groupBy(key).applyInPandas`` loaded an entire group into one pandas
frame — a billion-row hot key was a straight executor OOM. Here a hot key
costs one sketch per partition, and rows never shuffle at all.

Skew/fan-in controls:

* ``max_states_per_partition`` bounds stage-1 memory on high-cardinality
  keys (per-user sketches): when the dict exceeds the cap, partials are
  flushed mid-partition and rebuilt — merges make that lossless.
* ``salt_buckets=S > 1`` bounds stage-2 fan-in on huge clusters: states
  first merge on ``(key, partition_id mod S)``, then the S survivors merge
  per key — two state shuffles, never row shuffles. (Row-level salting is
  obsolete in this design; ``salt_cols`` is accepted for API compatibility
  and ignored.)

Merges apply in ascending partition-id order, so grouped states are
deterministic across identical runs even for merge-order-sensitive kinds
(t-digest/KLL) — the checkpoint resume law (plans/checkpoint.py) depends
on this.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from .build import batch_arrays, plan_columns
from .specs import SketchSpec, merge_blobs

_SALT_COL = "__salt"
_ORD_COL = "__ord"  # min partition id feeding a state row: merge sort key
_NROWS_COL = "n_rows"


def _grouped_schema(
    df: DataFrame, group_cols: list[str], specs: list[SketchSpec], with_ord: bool = False
) -> StructType:
    fields = [df.schema[c] for c in group_cols]
    fields = [StructField(f.name, f.dataType) for f in fields]
    if with_ord:
        fields.append(StructField(_ORD_COL, LongType()))
    fields.append(StructField(_NROWS_COL, LongType()))
    fields += [StructField(s.state_col, BinaryType()) for s in specs]
    return StructType(fields)


def _partial_builder(specs: list[SketchSpec], group_cols: list[str], col_map: dict, cap: int):
    """mapInPandas fn: streaming per-partition {key -> sketch} partials,
    flushed when the dict exceeds `cap` keys (bounded memory)."""

    def rows_frame(states: dict, ord_key: int) -> pd.DataFrame:
        keys = list(states.keys())
        data = {c: [k[i] for k in keys] for i, c in enumerate(group_cols)}
        data[_ORD_COL] = [ord_key] * len(keys)
        data[_NROWS_COL] = [states[k][0] for k in keys]
        for s in specs:
            data[s.state_col] = [states[k][1][s.name].to_bytes() for k in keys]
        return pd.DataFrame(data)

    def fn(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        flush = 0  # ord = pid<<20 | flush: mid-partition flushes keep a
        # total deterministic merge order even for the same (key, pid)
        states: dict[tuple, list] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            arrays = batch_arrays(pdf, specs, col_map)
            groups = pdf.groupby(list(group_cols), dropna=False, sort=False).indices
            for key, idx in groups.items():
                kt = key if isinstance(key, tuple) else (key,)
                # normalize float-NaN key components to None: pandas hands
                # back a fresh NaN object per batch and (nan,) tuples never
                # compare equal, so without this every batch would open a
                # new dict entry for the NaN group and the per-key merge
                # order would ride on shuffle row order (ADVICE r2).
                # np.floating covers FloatType columns: np.float32 is NOT a
                # Python-float subclass (code-review r3)
                kt = tuple(
                    None if (isinstance(x, (float, np.floating)) and x != x) else x
                    for x in kt
                )
                ent = states.get(kt)
                if ent is None:
                    ent = states[kt] = [0, {s.name: s.new() for s in specs}]
                ent[0] += len(idx)
                for s in specs:
                    h, v, c = arrays[s.name]
                    s.update(
                        ent[1][s.name],
                        None if h is None else h[idx],
                        None if v is None else v[idx],
                        None if c is None else c[idx],
                    )
            if len(states) > cap:
                yield rows_frame(states, (pid << 20) | flush)
                flush += 1
                states = {}
        if states:
            yield rows_frame(states, (pid << 20) | flush)

    return fn


def _merge_groups(specs: list[SketchSpec], group_cols: list[str], with_ord: bool):
    """applyInPandas fn over state rows: deterministic (partition-ordered)
    per-key merge. Emits `_ORD_COL` = min input ord when feeding another
    merge level."""

    def fn(keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(_ORD_COL, kind="stable")
        row = {c: k for c, k in zip(group_cols, keys)}
        if with_ord:
            row[_ORD_COL] = int(pdf[_ORD_COL].min())
        row[_NROWS_COL] = int(pdf[_NROWS_COL].sum())
        for s in specs:
            acc = None
            for blob in pdf[s.state_col]:
                acc = merge_blobs(acc, blob)
            row[s.state_col] = acc
        return pd.DataFrame([row])

    return fn


def _auto_salt_buckets(n_partitions: int, target_fan_in: int = 256) -> int:
    """Default merge fan-in bound (VERDICT r02 #4): with S salt buckets a
    key's final merge reads S rows and each level-1 merge reads
    ~n_partitions/S — S = nparts/256 caps both near `target_fan_in`, so a
    100k-partition scan never funnels 100k state rows of one key into a
    single applyInPandas group. <= target partitions need no extra level."""
    return max(1, n_partitions // target_fan_in)


def _pre_merge_states(
    df: DataFrame,
    group_cols: list[str],
    specs: list[SketchSpec],
    salt_buckets: int | None,
    max_states_per_partition: int,
) -> DataFrame:
    """Stage 1 (+ optional salted level-1 merge): the state rows feeding
    the final per-key merge. Exposed for fan-in tests."""
    spec_cols, col_map = plan_columns(specs)
    prepared = df.select(*[F.col(c) for c in group_cols], *spec_cols)
    if salt_buckets is None:
        try:
            # plan -> RDD conversion is metadata-only for batch plans
            # (verified safe on foreachBatch callback threads too); the
            # fallback covers plans that cannot convert (e.g. an
            # un-materialized streaming source)
            salt_buckets = _auto_salt_buckets(prepared.rdd.getNumPartitions())
        except Exception:
            salt_buckets = 1

    partials = prepared.mapInPandas(
        _partial_builder(specs, group_cols, col_map, max_states_per_partition),
        schema=_grouped_schema(prepared, group_cols, specs, with_ord=True),
    )
    if salt_buckets > 1:
        level1 = partials.withColumn(
            _SALT_COL, F.pmod(F.shiftright(F.col(_ORD_COL), 20), F.lit(salt_buckets))
        )
        mid_cols = group_cols + [_SALT_COL]
        mid_schema = _grouped_schema(level1, mid_cols, specs, with_ord=True)
        partials = (
            level1.groupBy(*mid_cols)
            .applyInPandas(_merge_groups(specs, mid_cols, with_ord=True), schema=mid_schema)
            .drop(_SALT_COL)
        )
    return partials


def grouped_sketch(
    df: DataFrame,
    group_cols: list[str],
    specs: list[SketchSpec],
    salt_buckets: int | None = None,
    salt_cols: list[str] | None = None,  # obsolete, ignored (see module doc)
    salt_seed: int = 0xBEEF,
    max_states_per_partition: int = 1 << 16,
) -> DataFrame:
    """Per-group sketch states: returns one row per group with
    ``group_cols + [n_rows] + state_<name> binary`` columns.

    Rows never shuffle: partition-local partial states are built in one
    streaming pass, then only states move. ``salt_buckets=S`` adds a
    pre-merge level on (key, partition mod S) to bound per-key fan-in on
    very wide scans; the default (None) derives S from the scan's
    partition count so fan-in stays ~256 at any width."""
    partials = _pre_merge_states(df, group_cols, specs, salt_buckets, max_states_per_partition)
    out_schema = StructType(
        [f for f in partials.schema.fields if f.name != _ORD_COL]
    )
    return partials.groupBy(*group_cols).applyInPandas(
        _merge_groups(specs, group_cols, with_ord=False), schema=out_schema
    )
