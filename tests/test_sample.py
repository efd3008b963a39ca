"""Deterministic sampling operators (operators/sample.py): hash-gate
sampling and quota sampling must be content-determined — identical kept
sets at any partitioning — and the hash gate must reach the scan."""

import pytest
from pyspark.sql import functions as F

from probably_jl_spark.operators.sample import (
    hash_sample,
    sample_threshold_hex,
    stratified_take,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hash_sample_partition_invariant(spark, docs):
    a = set(hash_sample(docs, 0.3, ["doc_id"], seed=1).toPandas().doc_id)
    b = set(
        hash_sample(docs.repartition(13), 0.3, ["doc_id"], seed=1).toPandas().doc_id
    )
    assert a == b and len(a) > 0
    # rate is approximate but in the right ballpark
    n = docs.count()
    assert 0.15 * n <= len(a) <= 0.45 * n


def test_hash_sample_seeds_independent(spark, docs):
    a = set(hash_sample(docs, 0.3, ["doc_id"], seed=1).toPandas().doc_id)
    b = set(hash_sample(docs, 0.3, ["doc_id"], seed=2).toPandas().doc_id)
    assert a != b  # different cuts
    # rough independence: overlap ~ rate^2 * n, not ~ rate * n
    n = docs.count()
    assert len(a & b) < 0.2 * n


def test_hash_sample_filter_reaches_scan(spark):
    fresh = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        hash_sample(fresh, 0.25, ["doc_id"], seed=7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure scan-side filter
    assert "Filter" in plan


def test_threshold_hex():
    assert sample_threshold_hex(0.25) == "40000000"
    # rate=1.0: 'g' sorts after every hex digit at EQUAL length — a
    # 9-char format(2**32) would compare lexicographically broken
    # (code-review r3: "ffffffff" < "100000000" is False)
    assert sample_threshold_hex(1.0) == "gggggggg"
    assert "ffffffff" < sample_threshold_hex(1.0)
    assert sample_threshold_hex(0.0) == "00000000"
    with pytest.raises(ValueError):
        sample_threshold_hex(1.5)


def test_hash_sample_rate_one_keeps_all_and_nulls_distinct(spark, docs):
    n = docs.count()
    assert hash_sample(docs, 1.0, ["doc_id"], seed=1).count() == n
    # NULL keys must hash per-row-distinctly when another key column
    # differs (concat_ws would otherwise skip NULLs and collapse them)
    rows = spark.createDataFrame(
        [(None, "x"), ("x", None), (None, None), ("a", "b")],
        "k1 string, k2 string",
    )
    from probably_jl_spark.operators.sample import _hash_hex

    hashes = rows.select(_hash_hex(["k1", "k2"], 0).alias("h")).toPandas().h
    assert hashes.nunique() == 4


def test_stratified_take_caps_each_group(spark, docs):
    out = stratified_take(docs, ["lang"], 7, ["doc_id"], seed=3).toPandas()
    per = out.groupby("lang").size()
    assert (per <= 7).all() and per.max() == 7
    # deterministic under repartitioning
    out2 = stratified_take(
        docs.repartition(17), ["lang"], 7, ["doc_id"], seed=3
    ).toPandas()
    assert set(zip(out.lang, out.doc_id)) == set(zip(out2.lang, out2.doc_id))
