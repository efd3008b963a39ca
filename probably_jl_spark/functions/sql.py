"""SQL-facing sketch estimators: query serialized state columns from pure
``spark.sql`` — the surface that makes a sketch-state table (grouped
builds, checkpoints, streaming sinks) usable without the Python API.

``register_sketch_sql_functions(spark)`` registers vectorized pandas UDFs
(Arrow-batched; every distinct blob in a batch is deserialized once via a
per-batch cache, so a state table with few distinct groups pays one
decode per group, not per row):

    SELECT role, pjs_cardinality(state_convs)          FROM role_states
    SELECT pjs_count(state_freq, 'assistant')          FROM global_state
    SELECT pjs_contains(state_member, conv_id)         FROM probes, global_state
    SELECT pjs_quantile(state_len, 0.99)               FROM role_states
    SELECT pjs_merge(a.state, b.state)                 -- pairwise re-merge
    SELECT pjs_intersection(a.state, b.state)          -- KMV direct / HLL incl-excl
    SELECT pjs_difference(a.state, b.state)            -- KMV |A \\ B|
    SELECT pjs_jaccard(a.state, b.state)               -- KMV sample Jaccard

Keys are strings on the SQL surface; a NULL key queries the NULL group
exactly as the JVM build hashed NULL rows; any other key type raises a
TypeError (a numeric key would hash differently than the string the
build hashed — failing loudly beats returning counts for the wrong
hash). Builds keyed on numeric columns query through the typed Python
API (functions.batch_contains / batch_query_counts) instead. Wrong
sketch kinds raise clear TypeErrors (same contract as the driver-side
estimators in functions/__init__.py).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.specs import merge_blobs, sketch_from_bytes
from ..sketches.bloom import BloomFilter
from ..sketches.cms import CountMinSketch
from ..sketches.cuckoo import CuckooFilter
from ..sketches.hashing import xxhash64_any
from ..sketches.hll import HyperLogLog
from ..sketches.kll import KLL
from ..sketches.kmv import KMV
from ..sketches.mg import MisraGries
from ..sketches.tdigest import TDigest


def _sql_key(key):
    """SQL key coercion: NULL stays NULL (xxhash64_any(None) returns the
    seed hash, exactly how the JVM build hashed NULL rows — so a NULL key
    queries the NULL group, consistent with the build); strings pass
    through. Anything else raises: a numeric key hashes differently than
    the string the build hashed, so silently coercing would return
    counts/membership for the wrong hash (ADVICE r2) — cast the column to
    STRING in SQL, or use the typed Python API (functions.batch_contains /
    batch_query_counts) for numeric-keyed builds."""
    if key is None or (isinstance(key, float) and key != key):
        return None
    if not isinstance(key, str):
        raise TypeError(
            f"pjs_* SQL estimators take STRING keys (got {type(key).__name__}: "
            f"{key!r}); CAST the key to STRING if the sketch was built on a "
            "string column, or query numeric-keyed builds through the typed "
            "Python API (functions.batch_contains / batch_query_counts)"
        )
    return key


def _expect(sk, kinds, fn_name: str):
    if not isinstance(sk, kinds):
        names = "/".join(k.__name__ for k in (kinds if isinstance(kinds, tuple) else (kinds,)))
        raise TypeError(f"{fn_name} expects a {names} state, got {type(sk).__name__}")
    return sk


def _pair_cache(fn):
    """Apply fn once per distinct (a, b) blob PAIR in the batch, decoding
    each distinct blob once — the two-column twin of ``_blob_cache``
    below. The documented pjs_* pattern joins a few grouped states
    against many rows, so without this the set-op functions paid a full
    sketch decode per ROW (code-review r5: the module docstring promised
    the cache, pjs_merge/intersection/difference/jaccard didn't have it)."""

    def apply(a: pd.Series, b: pd.Series) -> list:
        dec: dict[bytes, object] = {}
        res: dict[tuple, object] = {}
        out = []
        for x, y in zip(a, b):
            if x is None or y is None:
                out.append(None)
                continue
            key = (bytes(x), bytes(y))
            if key not in res:
                for k in key:
                    if k not in dec:
                        dec[k] = sketch_from_bytes(k)
                res[key] = fn(dec[key[0]], dec[key[1]])
            out.append(res[key])
        return out

    return apply


def _blob_cache(fn):
    """Apply fn once per distinct blob in the batch."""

    def apply(blobs: pd.Series, *args) -> list:
        cache: dict[bytes, object] = {}
        out = []
        for i, b in enumerate(blobs):
            if b is None:
                out.append(None)
                continue
            key = bytes(b)
            if key not in cache:
                cache[key] = sketch_from_bytes(key)
            out.append(fn(cache[key], *(a.iloc[i] for a in args)))
        return out

    return apply


def register_sketch_sql_functions(spark: SparkSession, prefix: str = "pjs_") -> list[str]:
    """Register the estimator UDFs; returns the registered names."""

    @F.pandas_udf("double")
    def _cardinality(blobs: pd.Series) -> pd.Series:
        from ..sketches import codec
        from ..sketches.hll import estimate_many

        def est(sk):
            return float(
                _expect(sk, (HyperLogLog, BloomFilter, KMV), "pjs_cardinality").cardinality()
            )

        # HLL blobs — the kind a grouped build returns tens of millions
        # of — take the whole-batch vectorized Ertl path (estimate_many:
        # one frombuffer per row, numpy recurrences across the batch,
        # bit-identical to the scalar estimator); Bloom/KMV keep the
        # cached per-row path
        out: list = [None] * len(blobs)
        hll_pos: list[int] = []
        hll_blobs: list[bytes] = []
        other_pos: list[int] = []
        for i, b in enumerate(blobs):
            if b is None:
                continue
            bb = bytes(b)  # materialize once (Arrow hands back bytearray)
            if codec.peek_kind(bb) == codec.KIND_HLL:
                hll_pos.append(i)
                hll_blobs.append(bb)
            else:
                other_pos.append(i)
        if hll_pos:
            ests = estimate_many(hll_blobs)
            # same rounding contract as HyperLogLog.cardinality()
            for i, e in zip(hll_pos, ests):
                out[i] = float(round(e)) if math.isfinite(e) else float((1 << 63) - 1)
        if other_pos:
            sub = blobs.iloc[other_pos]
            for i, v in zip(other_pos, _blob_cache(est)(sub)):
                out[i] = v
        # nullable Float64: a NULL blob yields SQL NULL (a plain float64
        # series would turn None into NaN, which Spark orders above every
        # number — NULL rows would pass numeric filters)
        return pd.Series(out, dtype="Float64")

    @F.pandas_udf("long")
    def _count(blobs: pd.Series, keys: pd.Series) -> pd.Series:
        def q(sk, key):
            # CMS never under-counts; a Misra-Gries state answers the same
            # point query as a lower bound (est <= true <= est + deficit)
            _expect(sk, (CountMinSketch, MisraGries), "pjs_count")
            return int(sk.query_hashes(np.array([xxhash64_any(_sql_key(key))], dtype=np.uint64))[0])

        # nullable Int64: a NULL state blob yields NULL, not a crash
        return pd.Series(_blob_cache(q)(blobs, keys), dtype="Int64")

    @F.pandas_udf("boolean")
    def _contains(blobs: pd.Series, keys: pd.Series) -> pd.Series:
        def c(sk, key):
            _expect(sk, (BloomFilter, CuckooFilter), "pjs_contains")
            return bool(sk.contains_hashes(np.array([xxhash64_any(_sql_key(key))], dtype=np.uint64))[0])

        return pd.Series(_blob_cache(c)(blobs, keys), dtype="boolean")

    @F.pandas_udf("double")
    def _quantile(blobs: pd.Series, qs: pd.Series) -> pd.Series:
        def quant(sk, q):
            _expect(sk, (TDigest, KLL), "pjs_quantile")
            if q is None or (isinstance(q, float) and q != q):
                return None  # NULL q -> NULL, not the sketch maximum
            return float(sk.quantile(float(q)))

        return pd.Series(_blob_cache(quant)(blobs, qs), dtype="Float64")

    @F.pandas_udf("binary")
    def _merge(a: pd.Series, b: pd.Series) -> pd.Series:
        # one merge per distinct blob PAIR per batch (None = identity,
        # exactly merge_blobs' contract) — no decode round-trip, so the
        # output bytes are untouched merge_blobs output
        res: dict[tuple, object] = {}
        out = []
        for x, y in zip(a, b):
            key = (None if x is None else bytes(x), None if y is None else bytes(y))
            if key not in res:
                res[key] = merge_blobs(key[0], key[1])
            out.append(res[key])
        return pd.Series(out)

    def _inter(sa, sb):
        from . import intersection_cardinality

        return float(intersection_cardinality(sa, sb))

    def _diff(sa, sb):
        from . import difference_cardinality

        return float(difference_cardinality(sa, sb))

    def _jac(sa, sb):
        _expect(sa, (KMV,), "pjs_jaccard")
        _expect(sb, (KMV,), "pjs_jaccard")
        return float(sa.jaccard(sb))

    _inter_pair, _diff_pair, _jac_pair = map(_pair_cache, (_inter, _diff, _jac))

    @F.pandas_udf("double")
    def _intersection(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(_inter_pair(a, b), dtype="Float64")

    @F.pandas_udf("double")
    def _difference(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(_diff_pair(a, b), dtype="Float64")

    @F.pandas_udf("double")
    def _jaccard(a: pd.Series, b: pd.Series) -> pd.Series:
        # per-group-PAIR overlap: join two grouped-KMV state tables and
        # score tool-set / vocabulary similarity between groups in SQL
        return pd.Series(_jac_pair(a, b), dtype="Float64")

    names = []
    for name, udf in (
        ("cardinality", _cardinality),
        ("count", _count),
        ("contains", _contains),
        ("quantile", _quantile),
        ("merge", _merge),
        ("intersection", _intersection),
        ("difference", _difference),
        ("jaccard", _jaccard),
    ):
        spark.udf.register(prefix + name, udf)
        names.append(prefix + name)
    return names
