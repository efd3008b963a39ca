"""Driver-contract queries (SURVEY.md §5.2 item 5).

Every sketch operation is exposed as a (spark, sf_dir) -> DataFrame query
whose output is **self-verifying**: the Spark side computes the exact
answer (cheap at sf0.01) *and* the sketch estimate, and emits the exact
values plus boolean bound-check columns. The DuckDB oracle computes the
same exact values and literal TRUE for the bound columns — so the
driver's row/schema/value-hash comparison passes iff the sketch estimate
actually landed within its published bound. This is the strongest check
an approximate operator can offer an exact-SQL oracle.

Column types are chosen hash-stably: BIGINT for counts, BOOLEAN for bound
checks, STRING for quantile labels (no float-representation hazards).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import batch_contains
from .operators.build import sketch_table
from .operators.grouped import grouped_sketch
from .operators.specs import SketchSpec, sketch_from_bytes
from .sketches.hll import HyperLogLog
from .sources.transcripts import events_as_transcripts, with_latency

QS = ["0.01", "0.1", "0.25", "0.5", "0.75", "0.9", "0.99"]

HLL_BOUND = 3 * 1.04 / math.sqrt(2**14)  # 3 sigma at p=14


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _bool_row(spark: SparkSession, **cols) -> DataFrame:
    names = list(cols)
    row = [tuple(cols[n] for n in names)]
    schema = ", ".join(
        f"{n} {'boolean' if isinstance(cols[n], bool) else 'bigint'}" for n in names
    )
    return spark.createDataFrame(row, schema)


# --------------------------------------------------------------- HLL


def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    res = sketch_table(ev, [SketchSpec("u", "hll", key_cols=("user_id",))])
    est = res.sketches["u"].cardinality()
    exact = ev.select("user_id").distinct().count()
    ok = abs(est - exact) / max(exact, 1) <= HLL_BOUND
    return _bool_row(spark, exact_distinct=exact, hll_within_bound=ok)


def hll_distinct_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    res = sketch_table(ev, [SketchSpec("ut", "hll", key_cols=("user_id", "event_type"))])
    est = res.sketches["ut"].cardinality()
    exact = ev.select("user_id", "event_type").distinct().count()
    ok = abs(est - exact) / max(exact, 1) <= HLL_BOUND
    return _bool_row(spark, exact_distinct=exact, hll_within_bound=ok)


def hll_distinct_custkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    res = sketch_table(o, [SketchSpec("c", "hll", key_cols=("o_custkey",))])
    est = res.sketches["c"].cardinality()
    exact = o.select("o_custkey").distinct().count()
    ok = abs(est - exact) / max(exact, 1) <= HLL_BOUND
    return _bool_row(spark, exact_distinct=exact, hll_within_bound=ok)


def hll_grouped_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group (salted) HLL: distinct users per event_type."""
    ev = _t(spark, sf_dir, "events")
    states = grouped_sketch(
        ev, ["event_type"], [SketchSpec("u", "hll", key_cols=("user_id",))],
        salt_buckets=8, salt_cols=["user_id"],
    ).toPandas()
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    rows = []
    for _, r in states.iterrows():
        est = sketch_from_bytes(r["state_u"]).cardinality()
        n = exact[r["event_type"]]
        rows.append((r["event_type"], int(n), abs(est - n) / max(n, 1) <= HLL_BOUND))
    return spark.createDataFrame(
        rows, "event_type string, exact_distinct bigint, hll_within_bound boolean"
    )


# --------------------------------------------------------------- CMS


def cms_event_type_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    res = sketch_table(
        ev, [SketchSpec("f", "cms", key_cols=("event_type",), params={"width": 2048, "depth": 5})]
    )
    cms = res.sketches["f"]
    total = res.n_rows
    eps = 2.0 / 2048
    exact = ev.groupBy("event_type").count().collect()
    rows = [
        (
            r["event_type"],
            int(r["count"]),
            cms.query(r["event_type"]) >= r["count"],
            cms.query(r["event_type"]) <= r["count"] + eps * total,
        )
        for r in exact
    ]
    return spark.createDataFrame(
        rows, "event_type string, exact_cnt bigint, cms_ge_exact boolean, cms_within_eps boolean"
    )


def cms_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key CMS over the biggest table (lineitem)."""
    li = _t(spark, sf_dir, "lineitem")
    res = sketch_table(
        li,
        [SketchSpec("f", "cms", key_cols=("l_returnflag", "l_linestatus"), params={"width": 4096, "depth": 5})],
    )
    cms = res.sketches["f"]
    total = res.n_rows
    eps = 2.0 / 4096
    from .sketches.hashing import xxhash64_cols

    exact = li.groupBy("l_returnflag", "l_linestatus").count().collect()
    rows = []
    for r in exact:
        h = xxhash64_cols(r["l_returnflag"], r["l_linestatus"])
        est = int(cms.query_hashes(np.array([h], dtype=np.uint64))[0])
        rows.append(
            (r["l_returnflag"], r["l_linestatus"], int(r["count"]), est >= r["count"], est <= r["count"] + eps * total)
        )
    return spark.createDataFrame(
        rows,
        "l_returnflag string, l_linestatus string, exact_cnt bigint, "
        "cms_ge_exact boolean, cms_within_eps boolean",
    )


# ------------------------------------------------------------ membership


def bloom_membership_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    res = sketch_table(ev, [SketchSpec("m", "bloom", key_cols=("user_id",), params={"m": 1 << 18, "k": 5})])
    bloom = res.sketches["m"]
    present = ev.select("user_id").distinct()
    n_present = present.count()
    missed = batch_contains(present, ["user_id"], bloom).filter(~F.col("member")).count()
    # disjoint absent probe set: ids far above the data range
    absent = spark.range(10_000_000, 10_050_000).select(F.col("id").alias("user_id"))
    fp = batch_contains(absent, ["user_id"], bloom).filter("member").count()
    bound = bloom.expected_fpr(bloom.m, bloom.k, n_present)
    fpr_ok = fp / 50_000 <= 2 * bound + 0.001
    return _bool_row(spark, false_negatives=missed, fpr_within_bound=fpr_ok)


def cuckoo_membership_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cuckoo semantics: membership + deletion support (driver-side pop)."""
    ev = _t(spark, sf_dir, "events")
    res = sketch_table(ev, [SketchSpec("m", "cuckoo", key_cols=("event_type",), params={"len": 1 << 10, "f": 14})])
    cf = res.sketches["m"]
    types = [r["event_type"] for r in ev.select("event_type").distinct().collect()]
    missed = sum(0 if cf.contains(t) else 1 for t in types)
    # deletion: pop each then verify absent (set semantics, no collisions at
    # this cardinality); filter must stay open
    popped_ok = True
    work = cf.copy()
    for t in types:
        work.pop(t)
        popped_ok &= not work.contains(t)
    return _bool_row(spark, false_negatives=missed, deletion_ok=popped_ok and work.is_empty())


# ------------------------------------------------------------- quantiles


def _quantile_bound_rows(spark, df, col, sketch, bound):
    """For each q: exact rank interval of the estimate via one aggregate."""
    qs = [float(q) for q in QS]
    ests = [sketch.quantile(q) for q in qs]
    aggs = []
    for i, v in enumerate(ests):
        aggs.append(F.sum(F.when(F.col(col) < v, 1).otherwise(0)).alias(f"lo{i}"))
        aggs.append(F.sum(F.when(F.col(col) <= v, 1).otherwise(0)).alias(f"hi{i}"))
    aggs.append(F.count(F.col(col)).alias("n"))
    r = df.agg(*aggs).collect()[0]
    n = max(r["n"], 1)
    rows = []
    for i, q in enumerate(qs):
        lo, hi = r[f"lo{i}"] / n, r[f"hi{i}"] / n
        err = 0.0 if lo <= q <= hi else min(abs(q - lo), abs(q - hi))
        rows.append((QS[i], err <= bound))
    return spark.createDataFrame(rows, "q string, within_bound boolean")


def tdigest_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    res = sketch_table(ev, [SketchSpec("d", "tdigest", value_col="value", params={"delta": 200.0})])
    return _quantile_bound_rows(spark, ev, "value", res.sketches["d"], bound=0.015)


def kll_nchars_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    res = sketch_table(docs, [SketchSpec("k", "kll", value_col="n_chars", params={"k": 200})])
    return _quantile_bound_rows(spark, docs, "n_chars", res.sketches["k"], bound=2.0 / 200 + 0.005)


def latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-turn latency quantiles over the transcript view of events
    (window lag per conversation) — t-digest + KLL must both hold."""
    ev = _t(spark, sf_dir, "events")
    lat = with_latency(events_as_transcripts(ev)).filter(F.col("latency_sec").isNotNull())
    res = sketch_table(
        lat,
        [
            SketchSpec("td", "tdigest", value_col="latency_sec"),
            SketchSpec("kl", "kll", value_col="latency_sec"),
        ],
    )
    a = _quantile_bound_rows(spark, lat, "latency_sec", res.sketches["td"], 0.015).withColumnRenamed(
        "within_bound", "tdigest_ok"
    )
    b = _quantile_bound_rows(spark, lat, "latency_sec", res.sketches["kl"], 0.015).withColumnRenamed(
        "within_bound", "kll_ok"
    )
    return a.join(b, "q")


# ----------------------------------------------------------- merge laws


def merge_laws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed property check: states built on different partition
    layouts and merged in different orders are identical; serialization
    round-trips byte-exact (reference test/hyperloglog.jl:72-88,
    test/countmin.jl:119-138, test/bloom.jl:81-101)."""
    ev = _t(spark, sf_dir, "events")
    specs = [
        SketchSpec("h", "hll", key_cols=("user_id",)),
        SketchSpec("c", "cms", key_cols=("event_type",)),
        SketchSpec("b", "bloom", key_cols=("user_id",), params={"m": 1 << 16, "k": 4}),
    ]
    a = sketch_table(ev.repartition(3), specs).sketches
    b = sketch_table(ev.repartition(11), specs).sketches
    layout_invariant = all(a[n].to_bytes() == b[n].to_bytes() for n in ("h", "c", "b"))
    merged_ab = a["h"].copy().merge(b["h"])
    merged_ba = b["h"].copy().merge(a["h"])
    commutative = merged_ab.to_bytes() == merged_ba.to_bytes()
    idempotent = a["h"].copy().merge(a["h"]).to_bytes() == a["h"].to_bytes()
    roundtrip = all(
        type(a[n]).from_bytes(a[n].to_bytes()).to_bytes() == a[n].to_bytes() for n in ("h", "c", "b")
    )
    return _bool_row(
        spark,
        layout_invariant=layout_invariant,
        merge_commutative=commutative,
        merge_idempotent=idempotent,
        serialization_roundtrip=roundtrip,
    )


# ------------------------------------------------------------- registry


def sketch_queries() -> dict:
    return {
        "hll_distinct_users": hll_distinct_users,
        "hll_distinct_user_type": hll_distinct_user_type,
        "hll_distinct_custkey": hll_distinct_custkey,
        "hll_grouped_users_by_type": hll_grouped_users_by_type,
        "cms_event_type_freq": cms_event_type_freq,
        "cms_returnflag_linestatus": cms_returnflag_linestatus,
        "bloom_membership_users": bloom_membership_users,
        "cuckoo_membership_types": cuckoo_membership_types,
        "tdigest_value_quantiles": tdigest_value_quantiles,
        "kll_nchars_quantiles": kll_nchars_quantiles,
        "latency_quantiles": latency_quantiles,
        "merge_laws": merge_laws,
    }


def sketch_oracles() -> dict:
    qrows = ", ".join(f"('{q}', TRUE)" for q in QS)
    return {
        "hll_distinct_users": (
            "SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct, "
            "TRUE AS hll_within_bound FROM events"
        ),
        "hll_distinct_user_type": (
            "SELECT CAST(COUNT(DISTINCT (user_id, event_type)) AS BIGINT) AS exact_distinct, "
            "TRUE AS hll_within_bound FROM events"
        ),
        "hll_distinct_custkey": (
            "SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct, "
            "TRUE AS hll_within_bound FROM orders"
        ),
        "hll_grouped_users_by_type": (
            "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct, "
            "TRUE AS hll_within_bound FROM events GROUP BY event_type"
        ),
        "cms_event_type_freq": (
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS exact_cnt, "
            "TRUE AS cms_ge_exact, TRUE AS cms_within_eps FROM events GROUP BY event_type"
        ),
        "cms_returnflag_linestatus": (
            "SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS exact_cnt, "
            "TRUE AS cms_ge_exact, TRUE AS cms_within_eps "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "bloom_membership_users": (
            "SELECT CAST(0 AS BIGINT) AS false_negatives, TRUE AS fpr_within_bound"
        ),
        "cuckoo_membership_types": (
            "SELECT CAST(0 AS BIGINT) AS false_negatives, TRUE AS deletion_ok"
        ),
        "tdigest_value_quantiles": f"SELECT * FROM (VALUES {qrows}) AS t(q, within_bound)",
        "kll_nchars_quantiles": f"SELECT * FROM (VALUES {qrows}) AS t(q, within_bound)",
        "latency_quantiles": (
            "SELECT * FROM (VALUES "
            + ", ".join(f"('{q}', TRUE, TRUE)" for q in QS)
            + ") AS t(q, tdigest_ok, kll_ok)"
        ),
        "merge_laws": (
            "SELECT TRUE AS layout_invariant, TRUE AS merge_commutative, "
            "TRUE AS merge_idempotent, TRUE AS serialization_roundtrip"
        ),
    }
