"""Streaming "seen-before" dedup pre-filter (VERDICT r3 next-round #8).

Batch dedup (operators/dedup.py) re-reads the whole corpus; a daily-ingest
pipeline wants the incremental question instead: *which rows of this
micro-batch are new against everything already ingested?* The sketch
library already has the right primitive — a Bloom filter is a mergeable,
bounded-size "seen set" — and the streaming layer already has a
crash-safe store for sketch states (SketchStateStore). This module just
composes them:

* per micro-batch: exact-dedup the batch locally on the 64-bit content
  hash (min id per hash — one narrow aggregation, the same
  ``exact_dedup_map`` shape), then probe the RUNNING Bloom filter of
  every previously-seen content hash; rows whose hash is already present
  are dropped, new rows are delivered to the caller's sink and their
  hashes inserted into the filter;
* the filter + per-batch kept counters persist through
  ``SketchStateStore`` (Hadoop FS API, versioned snapshots), and the
  stored ``last_batch_id`` makes replayed batches no-ops — keep
  decisions are exactly-once across kill/restart as long as the sink is
  also idempotent per batch id (Spark's own foreachBatch contract).

Semantics note (the documented trade): a Bloom "seen" answer can be a
false positive, so a genuinely-new document is dropped with probability
<= the filter's FPR (sized by ``m``/``k``; zero false *keeps* of an
exact duplicate, because Bloom has no false negatives). For a training
corpus that is the right direction to err — a few lost novel docs, never
a kept duplicate. Size ``m`` for the corpus with
``probably_jl_spark.sketches.bloom.constrain`` semantics.

Scale shape: the probe broadcasts the filter and runs vectorized inside
``batch_contains``'s mapInPandas — rows never shuffle; only the batch's
*new distinct hashes* are collected to the driver to update the filter
(bounded by batch novelty, not batch size).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sketches.bloom import BloomFilter
from .stream_build import SketchStateStore


def seen_before_stream(
    sdf: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    sink,
    id_col: str = "doc_id",
    text_col: str = "text",
    bloom_m: int = 1 << 24,
    bloom_k: int = 5,
    trigger: dict | None = None,
):
    """Start the streaming pre-filter; returns the StreamingQuery.

    ``sink(new_rows_df, batch_id)`` receives each batch's surviving rows
    (first occurrence of each never-before-seen text; columns unchanged).
    It must be idempotent per batch id — with the store's own batch-id
    guard that makes keep decisions exactly-once end-to-end.

    Inspect progress any time via ``seen_stats(state_dir, spark)``.
    """
    store = SketchStateStore(state_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        store._spark = batch_df.sparkSession
        states, last = store.load()
        if batch_id <= last:
            return  # replayed batch: keep decisions already made
        blobs = states.get((), {})
        bf = (
            BloomFilter.from_bytes(blobs["seen"])
            if "seen" in blobs
            else BloomFilter(bloom_m, bloom_k)
        )
        # batch-local exact dedup on the content hash: min id per hash,
        # a narrow (hash, id) aggregation — full rows stay put
        hashed = batch_df.withColumn("__h", F.xxhash64(F.col(text_col)))
        reps = hashed.groupBy("__h").agg(F.min(id_col).alias("__rep"))
        # probe the running filter executor-side (broadcast, vectorized)
        from ..functions import batch_contains

        probed = batch_contains(reps, ["__h"], bf, out_col="__seen", hashed=True)
        new_reps = probed.filter(~F.col("__seen")).select("__h", "__rep")
        picked = new_reps.collect()  # new distinct hashes only
        new_rows = hashed.join(
            F.broadcast(
                batch_df.sparkSession.createDataFrame(
                    [(int(r["__rep"]),) for r in picked], f"{id_col} long"
                )
            ),
            id_col,
            "leftsemi",
        ).drop("__h")
        sink(new_rows, batch_id)
        if picked:
            hs = np.array([r["__h"] for r in picked], dtype=np.int64).view(np.uint64)
            bf.update_hashes(hs)
        blobs["seen"] = bf.to_bytes()
        kept = dict(blobs.get("kept_per_batch", {}))
        kept[batch_id] = len(picked)
        blobs["kept_per_batch"] = kept
        blobs["n_rows"] = blobs.get("n_rows", 0) + batch_df.count()
        states[()] = blobs
        store.save(states, batch_id)

    writer = sdf.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def seen_stats(state_dir: str, spark=None) -> dict:
    """{'n_rows', 'kept_per_batch', 'seen_cardinality_est'} from the
    persisted state (cardinality via the Bloom estimator, bloom.py)."""
    store = SketchStateStore(state_dir, spark)
    states, last = store.load()
    blobs = states.get((), {})
    out = {
        "last_batch_id": last,
        "n_rows": blobs.get("n_rows", 0),
        "kept_per_batch": dict(blobs.get("kept_per_batch", {})),
    }
    if "seen" in blobs:
        out["seen_cardinality_est"] = BloomFilter.from_bytes(blobs["seen"]).cardinality()
    return out
