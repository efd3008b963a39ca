"""Transcripts source (BASELINE.json input_hint).

Logical table: ``transcripts(conv_id string, turn_idx int32, role string,
text string, tool string, ts timestamp)`` — Iceberg at production scale,
parquet locally. This module provides:

* ``read_transcripts`` — catalog table (Iceberg) or parquet path;
* ``synth_transcripts`` — fully deterministic synthetic transcripts built
  from ``spark.range`` + JVM expressions only (sequence/explode/xxhash64),
  so generation itself scales to 10^12 turns on a cluster with no Python
  and no driver-side data. Conversation lengths are Zipf-ish (a few huge
  conversations exercise the salted-skew path, FIXTURES.md §1); text
  length is log-normal-ish; ts gaps are per-turn deterministic.
* ``events_as_transcripts`` — maps the driver-provided ``events`` table
  (TESTDATA.md) onto the transcripts shape so every sketch query can run
  against the shared test tables: user_id→conv_id, per-user event order →
  turn_idx, event_type→role, props→text, ts→ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_ROLES = ["user", "assistant", "system", "tool"]
_TOOLS = [f"tool_{i:02d}" for i in range(50)]
_WORDS = (
    "the quick brown fox jumps over lazy dog spark sketch merge register "
    "hash turn conversation agent stream batch filter count distinct "
    "quantile window shuffle partition salt bucket lineage resume checkpoint"
).split()


def read_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """Read the transcripts table: a path (anything with a separator or a
    .parquet suffix — a bare '/' test misrouted relative filenames like
    'transcripts.parquet' into the catalog; code-review r5) or an
    Iceberg/catalog table name otherwise."""
    import os

    if "/" in source or os.sep in source or source.endswith(".parquet"):
        return spark.read.parquet(source)
    return spark.read.table(source)


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    max_turns: int = 256,
) -> DataFrame:
    """Deterministic transcripts, ~9x n_convs turns in expectation.

    All columns derive from xxhash64(conv_idx, salt) chains evaluated in
    the JVM (whole-stage codegen); the same (n_convs, seed) always yields
    byte-identical rows — this is the per-row invariant fixture (per-turn
    text equality under (conv_id, turn_idx) ordering)."""
    u = lambda col, salt: (
        F.pmod(F.xxhash64(col, F.lit(seed), F.lit(salt)), F.lit(1_000_000)) / 1_000_000.0
    )
    convs = spark.range(n_convs).select(F.col("id").alias("cidx"))
    # Zipf-ish length: inverse-power of a uniform, clipped — a few huge convs
    convs = convs.withColumn(
        "n_turns",
        F.least(
            F.lit(max_turns),
            (F.lit(2) + F.pow(F.lit(1.0) / (u(F.col("cidx"), 1) + 1e-6), F.lit(0.55))).cast("int"),
        ),
    ).withColumn(
        "conv_start",
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).cast("long")
        + (u(F.col("cidx"), 2) * 30 * 86400).cast("long"),
    )
    turns = convs.select(
        "cidx",
        "conv_start",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    h = lambda salt: F.xxhash64("cidx", "turn_idx", F.lit(seed), F.lit(salt))
    words = F.array(*[F.lit(w) for w in _WORDS])
    roles = F.array(*[F.lit(r) for r in _ROLES])
    tools = F.array(*[F.lit(t) for t in _TOOLS])
    # text: log-uniform token count 4..~180, deterministic token pick
    ntok = F.exp(F.lit(1.4) + (F.pmod(h(3), F.lit(1000)) / 1000.0) * F.lit(3.8)).cast("int")
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), ntok),
            lambda i: F.element_at(
                words, (F.pmod(F.xxhash64("cidx", "turn_idx", i, F.lit(seed)), F.lit(len(_WORDS))) + 1).cast("int")
            ),
        ),
    )
    out = turns.select(
        F.format_string("conv-%08d", F.col("cidx")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.element_at(roles, (F.pmod(h(4), F.lit(4)) + 1).cast("int")).alias("role"),
        text.alias("text"),
        F.when(
            F.pmod(h(5), F.lit(100)) < 30,  # ~30% of turns name a tool
            F.element_at(
                tools,
                # Zipf-ish tool popularity: square a uniform to skew low ids
                (F.pow(F.pmod(h(6), F.lit(1000)) / 1000.0, F.lit(2.0)) * len(_TOOLS) + 1).cast("int"),
            ),
        ).alias("tool"),
        F.to_timestamp(
            F.from_unixtime(
                F.col("conv_start")
                # TRUE cumulative per-turn gaps: sum of the i-th turn's
                # deterministic 1..300s gap for i=1..turn_idx, so ts is
                # strictly monotone within a conversation. The old
                # turn_idx * gap(turn_idx) re-drew the gap per turn and
                # produced non-monotone ts — with_latency read NEGATIVE
                # latencies off the fixture (code-review r5). sequence()
                # would count DOWN for turn_idx=0, hence the guard.
                + F.when(F.col("turn_idx") < 1, F.lit(0).cast("long")).otherwise(
                    F.aggregate(
                        F.sequence(F.lit(1), F.col("turn_idx")),
                        F.lit(0).cast("long"),
                        lambda acc, i: acc
                        + 1
                        + F.pmod(
                            F.xxhash64("cidx", i, F.lit(seed), F.lit(7)), F.lit(300)
                        ),
                    )
                )
            )
        ).alias("ts"),
    )
    return out


def events_as_transcripts(events: DataFrame) -> DataFrame:
    """Project the driver testdata ``events`` table onto the transcripts
    shape (TESTDATA.md mapping): one 'conversation' per user."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        F.format_string("conv-%08d", F.col("user_id")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.coalesce(F.col("props"), F.lit("")).alias("text"),
        F.when(F.col("event_type") == "click", F.lit("tool_click")).alias("tool"),
        F.col("ts"),
    )


def with_latency(df: DataFrame) -> DataFrame:
    """Inter-turn latency seconds per conversation: ts - lag(ts) over
    (conv_id ORDER BY turn_idx) — the library's one window op
    (SURVEY.md §7 step 6)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # TIMESTAMP_NTZ has no direct double cast in Spark 4 — go via timestamp
    epoch = F.col("ts").cast("timestamp").cast("double")
    return df.withColumn("latency_sec", epoch - F.lag(epoch).over(w))
