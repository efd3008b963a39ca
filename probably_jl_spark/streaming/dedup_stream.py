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
* the filter + keep counters persist through ``SketchStateStore``
  (Hadoop FS API, versioned snapshots), and the stored
  ``last_batch_id`` makes replayed batches no-ops — keep decisions are
  exactly-once across kill/restart as long as the sink is also
  idempotent per batch id (Spark's own foreachBatch contract).

Checkpoint resets (code-review r4): Spark's batch ids are scoped to the
query CHECKPOINT, so after a checkpoint loss/reset the re-delivered data
arrives renumbered from 0. The state records which checkpoint its batch
ids belong to; on a mismatch the batch-id guard resets instead of
silently discarding renumbered NEW data, and dedup correctness falls
back to the Bloom filter itself (content-based: previously-ingested
texts are "seen" and drop, genuinely-new ones keep). Within one
checkpoint lineage keep decisions are exactly-once; across a checkpoint
reset they are at-least-once for any batch that sank rows but crashed
before the state committed.

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
        from pyspark.sql.types import StructType

        store._spark = batch_df.sparkSession
        states, last = store.load()
        blobs = states.get((), {})
        # batch ids are scoped to the query checkpoint: on a checkpoint
        # reset the stored ids are from a different numbering, so the
        # guard must reset too (replayed OLD texts still drop — the Bloom
        # filter is content-based), else renumbered NEW data is silently
        # discarded (code-review r4)
        if blobs.get("lineage") == checkpoint_dir and batch_id <= last:
            return  # same lineage, replayed batch: decisions already made
        bf = (
            BloomFilter.from_bytes(blobs["seen"])
            if "seen" in blobs
            else BloomFilter(bloom_m, bloom_k)
        )
        # one source read for the batch's several actions below
        batch_df.persist()
        try:
            # batch-local exact dedup on the content hash: min id per
            # hash + multiplicity, a narrow (hash, id, count) aggregation
            hashed = batch_df.withColumn("__h", F.xxhash64(F.col(text_col)))
            reps = hashed.groupBy("__h").agg(
                F.min(id_col).alias("__rep"), F.count(F.lit(1)).alias("__cnt")
            )
            # probe the running filter executor-side (broadcast, vectorized)
            from ..functions import batch_contains

            probed = batch_contains(reps, ["__h"], bf, out_col="__seen", hashed=True)
            # driver receives only the batch's NEW distinct hashes (bounded
            # by batch novelty) plus one scalar row-count — both jobs read
            # the persisted batch, not the source
            picked = probed.filter(~F.col("__seen")).select("__h", "__rep").collect()
            n_batch_rows = probed.agg(F.sum("__cnt").alias("n")).collect()[0]["n"] or 0
            keep_schema = StructType([batch_df.schema[id_col]])
            new_rows = hashed.join(
                F.broadcast(
                    batch_df.sparkSession.createDataFrame(
                        [(r["__rep"],) for r in picked], keep_schema
                    )
                ),
                id_col,
                "leftsemi",
            ).drop("__h")
            sink(new_rows, batch_id)
        finally:
            batch_df.unpersist()
        if picked:
            hs = np.array([r["__h"] for r in picked], dtype=np.int64).view(np.uint64)
            bf.update_hashes(hs)
        blobs["seen"] = bf.to_bytes()
        blobs["n_kept"] = blobs.get("n_kept", 0) + len(picked)
        blobs["n_rows"] = blobs.get("n_rows", 0) + n_batch_rows
        blobs["lineage"] = checkpoint_dir
        states[()] = blobs
        store.save(states, batch_id)

    writer = sdf.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def seen_stats(state_dir: str, spark=None) -> dict:
    """{'n_rows', 'n_kept', 'seen_cardinality_est'} from the persisted
    state (cardinality via the Bloom estimator, bloom.py)."""
    store = SketchStateStore(state_dir, spark)
    states, last = store.load()
    blobs = states.get((), {})
    out = {
        "last_batch_id": last,
        "n_rows": blobs.get("n_rows", 0),
        "n_kept": blobs.get("n_kept", 0),
    }
    if "seen" in blobs:
        out["seen_cardinality_est"] = BloomFilter.from_bytes(blobs["seen"]).cardinality()
    return out
