"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship fused sketch build over sf0.001.
``queries()``   — one self-verifying DataFrame query per implemented
                  operator (probably_jl_spark/queries.py).
``oracle_sql()``— DuckDB-equivalent SQL for each query; approximate
                  estimates are verified Spark-side against exact values
                  and surfaced as boolean bound-check columns the oracle
                  reproduces as literals (see queries.py docstring).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from probably_jl_spark.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one fused pass over sf0.001 events builds HLL + CMS +
    Bloom + t-digest + KLL; returns one row per sketch with its estimate
    and the exact reference value."""
    from pyspark.sql import functions as F

    from probably_jl_spark.operators.build import sketch_table
    from probably_jl_spark.operators.specs import SketchSpec

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    specs = [
        SketchSpec("distinct_users", "hll", key_cols=("user_id",)),
        SketchSpec("type_freq", "cms", key_cols=("event_type",)),
        SketchSpec("user_member", "bloom", key_cols=("user_id",), params={"m": 1 << 16, "k": 5}),
        SketchSpec("value_digest", "tdigest", value_col="value"),
        SketchSpec("value_kll", "kll", value_col="value"),
    ]
    res = sketch_table(ev, specs)
    exact_users = ev.select("user_id").distinct().count()
    top_type = ev.groupBy("event_type").count().orderBy(F.desc("count")).first()
    rows = [
        ("hll_distinct_users", float(res.sketches["distinct_users"].cardinality()), float(exact_users)),
        ("cms_top_event_type", float(res.sketches["type_freq"].query(top_type["event_type"])), float(top_type["count"])),
        ("bloom_cardinality", float(res.sketches["user_member"].cardinality()), float(exact_users)),
        ("tdigest_p50_value", float(res.sketches["value_digest"].quantile(0.5)), float("nan")),
        ("kll_p99_value", float(res.sketches["value_kll"].quantile(0.99)), float("nan")),
        ("rows_sketched", float(res.n_rows), float(res.n_rows)),
    ]
    return spark.createDataFrame(rows, "metric string, estimate double, exact double")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
