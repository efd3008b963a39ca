"""Grouped sketches with explicit skew handling (north_rule).

Per-group sketches (e.g. distinct conv_ids per tool, turn-length digest
per role) are a shuffle on the group key. Two strategies:

* ``grouped_sketch(..., salt_buckets=1)`` — plain two-phase: partition-
  local partial build happens inside ``applyInPandas`` after one hash
  shuffle on the key.
* ``salt_buckets=S > 1`` — **salted two-level aggregation** for skewed
  keys (few huge conversations, FIXTURES.md §1): stage 1 groups on
  ``(key, pmod(xxhash64(salt_cols), S))`` so one hot key spreads over S
  reducers; stage 2 merges the S partial states per key. Correct because
  every sketch merge is commutative + associative (SURVEY.md §4.2).

Both stages stay Arrow-vectorized; the second stage moves only tiny
serialized states (KBs per group), not rows.
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
_NROWS_COL = "n_rows"


def _grouped_schema(df: DataFrame, group_cols: list[str], specs: list[SketchSpec]) -> StructType:
    fields = [df.schema[c] for c in group_cols]
    fields = [StructField(f.name, f.dataType) for f in fields]
    fields.append(StructField(_NROWS_COL, LongType()))
    fields += [StructField(s.state_col, BinaryType()) for s in specs]
    return StructType(fields)


def _build_group(specs: list[SketchSpec], group_cols: list[str], col_map: dict):
    def fn(keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        row = {c: k for c, k in zip(group_cols, keys)}
        row[_NROWS_COL] = len(pdf)
        arrays = batch_arrays(pdf, specs, col_map)
        for s in specs:
            sk = s.new()
            h, v, c = arrays[s.name]
            s.update(sk, h, v, c)
            row[s.state_col] = sk.to_bytes()
        return pd.DataFrame([row])

    return fn


def _merge_groups(specs: list[SketchSpec], group_cols: list[str]):
    def fn(keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        row = {c: k for c, k in zip(group_cols, keys)}
        row[_NROWS_COL] = int(pdf[_NROWS_COL].sum())
        for s in specs:
            acc = None
            for blob in pdf[s.state_col]:
                acc = merge_blobs(acc, blob)
            row[s.state_col] = acc
        return pd.DataFrame([row])

    return fn


def grouped_sketch(
    df: DataFrame,
    group_cols: list[str],
    specs: list[SketchSpec],
    salt_buckets: int = 1,
    salt_cols: list[str] | None = None,
    salt_seed: int = 0xBEEF,
) -> DataFrame:
    """Per-group sketch states: returns one row per group with
    ``group_cols + [n_rows] + state_<name> binary`` columns.

    With salt_buckets > 1, hot groups fan out over the salt before the
    per-key merge (two shuffles of states, not rows)."""
    # one declarative projection: group cols + deduped hashed/cast spec
    # cols (+ the salt, derived before source columns are dropped)
    spec_cols, col_map = plan_columns(specs)
    cols = [F.col(c) for c in group_cols] + spec_cols
    if salt_buckets > 1:
        salt_src = salt_cols or next((list(s.key_cols) for s in specs if s.key_cols), None)
        if not salt_src or list(salt_src) == list(group_cols):
            # salting by the group key itself puts a hot group's rows in
            # ONE salt bucket — the exact straggler the salt exists to
            # prevent; demand a finer-grained salt source instead
            raise ValueError(
                "salt_buckets > 1 needs salt_cols finer-grained than the "
                "group key (no key-bearing spec to borrow from)"
            )
        cols.append(
            F.pmod(F.xxhash64(*salt_src, F.lit(salt_seed)), F.lit(salt_buckets)).alias(_SALT_COL)
        )
    prepared = df.select(*cols)
    schema = _grouped_schema(prepared, group_cols, specs)

    if salt_buckets <= 1:
        return prepared.groupBy(*group_cols).applyInPandas(
            _build_group(specs, group_cols, col_map), schema=schema
        )

    salted = prepared
    stage1_cols = group_cols + [_SALT_COL]
    stage1_schema = _grouped_schema(salted, stage1_cols, specs)
    partials = salted.groupBy(*stage1_cols).applyInPandas(
        _build_group(specs, stage1_cols, col_map), schema=stage1_schema
    )
    return partials.drop(_SALT_COL).groupBy(*group_cols).applyInPandas(
        _merge_groups(specs, group_cols), schema=schema
    )
