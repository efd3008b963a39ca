"""Deterministic sampling for training-data pipelines.

Spark's ``df.sample`` is Bernoulli over the partition RNG: the kept set
changes with partitioning, task retries, and Spark version — useless for
reproducible corpus cuts. These operators gate on a CONTENT hash, so the
same row is kept or dropped forever, on any cluster, at any partition
count, and the decision is re-derivable in plain SQL on any engine:

* ``hash_sample`` — keep rows whose md5(key)'s top 32 bits fall under
  ``rate``: a pure scan-side codegen filter, zero exchanges, exact
  reproducibility (md5 hex strings of equal length compare
  lexicographically == numerically, so the gate is a string compare
  against a precomputed threshold prefix — no bigint conversion needed).
* ``stratified_take`` — at most ``n_per_group`` rows per group, chosen
  by the same hash order (one window exchange on the group key): quota
  sampling that never over-represents a dominant group.

Seeding: the seed is concatenated into the hashed string, so disjoint
seeds give independent samples of the same corpus (train/val/test cuts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_hex(key_cols: list[str], seed: int):
    """First 8 hex chars of md5(concat(keys, seed)) — the sort/gate key.
    NULL key components coalesce to a chr(1) sentinel BEFORE concat_ws
    (which would otherwise silently skip them, collapsing every NULL-key
    row onto one hash — code-review r3); with the chr(31) separator the
    sentinel keeps multi-column keys unambiguous. SQL mirror:
    md5(concat_ws(chr(31), coalesce(CAST(k AS VARCHAR), chr(1)), ...,
    '<seed>'))."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x01")) for c in key_cols
    ] + [F.lit(str(seed))]
    return F.substring(F.md5(F.concat_ws("\x1f", *parts)), 1, 8)


def _hash_hex_full(key_cols: list[str], seed: int):
    """Full 32-hex-char md5 of the same sentinel-coalesced concat — the
    SORT key for quota sampling. The 8-char prefix above is fine as a
    rate GATE but as an order key it collides at ~2^16 rows per group
    (birthday), silently punting the choice to the key-column tiebreak
    (code-review r5); 128 bits makes the 'ties only on identical keys'
    claim true."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x01")) for c in key_cols
    ] + [F.lit(str(seed))]
    return F.md5(F.concat_ws("\x1f", *parts))


def sample_threshold_hex(rate: float) -> str:
    """8-char prefix P such that md5-prefix < P keeps ~rate of rows.
    rate=1.0 returns 'g'*8: 'g' sorts after every hex digit, so the gate
    keeps everything (format(2**32) would be a 9-char string, breaking
    the equal-length lexicographic==numeric invariant — code-review
    r3)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    if rate >= 1.0:
        return "g" * 8
    return format(int(rate * (1 << 32)), "08x")


def hash_sample(
    df: DataFrame,
    rate: float,
    key_cols: list[str],
    seed: int = 0,
) -> DataFrame:
    """Deterministic ~``rate`` sample: keep rows with
    md5(key || seed)[0:8] < threshold. Scan-side filter only — pushes
    into the read, no exchange, stable under repartitioning/retries."""
    return df.filter(_hash_hex(key_cols, seed) < F.lit(sample_threshold_hex(rate)))


def stratified_take(
    df: DataFrame,
    group_cols: list[str],
    n_per_group: int,
    key_cols: list[str],
    seed: int = 0,
) -> DataFrame:
    """At most ``n_per_group`` rows per group, deterministically chosen
    by hash order (full 128-bit md5 sort key, so ties require identical
    ``key_cols`` content up to md5 collisions; key ordering is
    content-derived, not partition-derived). Rows IDENTICAL in key_cols
    are interchangeable — which physical copy is kept is not pinned, so
    ``key_cols`` should uniquely identify rows when payload columns
    matter. One exchange on the group key; at 100 TB prefer group keys
    with bounded fan-in or pre-filter with ``hash_sample`` to cap the
    window input."""
    if n_per_group < 1:
        raise ValueError("n_per_group must be >= 1")
    w = Window.partitionBy(*group_cols).orderBy(
        _hash_hex_full(key_cols, seed), *[F.col(c) for c in key_cols]
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_group)
        .drop("__rk")
    )
