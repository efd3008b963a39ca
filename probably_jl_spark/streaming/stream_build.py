"""Structured-Streaming sketch build.

Sketches are CRDT-ish mergeable states, so streaming ingestion is
foreachBatch + merge: every micro-batch runs the same fused vectorized
partition-local build as the batch path (operators/build.py), and the
resulting per-batch states merge into a persisted running state. Restart
safety comes from Spark's checkpointed batchId: a replayed batch with an
already-applied id is skipped (idempotent sink), so states are
exactly-once even though the merge itself is at-least-once-safe for HLL /
Bloom (idempotent) and guarded by the id for CMS / quantiles (which are
not idempotent under re-merge).

``windowed_sketch_stream`` keys the same machinery by an event-time
window (tumbling), giving per-window sketch states — late data merges
into its window's state whenever it arrives, watermark-free (sketch
merge is order-independent, unlike exact windowed aggregation).
"""

from __future__ import annotations

import os
import pickle
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.build import sketch_table
from ..operators.grouped import grouped_sketch
from ..operators.specs import SketchSpec, merge_blobs, sketch_from_bytes


class SketchStateStore:
    """Tiny atomic file store for running sketch states keyed by group
    (() for global). Lives on local disk here; the same layout works on
    any fuse-mounted or object-store path."""

    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)
        self._path = os.path.join(state_dir, "state.pkl")

    def load(self) -> tuple[dict, int]:
        if not os.path.exists(self._path):
            return {}, -1
        with open(self._path, "rb") as f:
            snapshot = pickle.load(f)
        return snapshot["states"], snapshot["last_batch_id"]

    def save(self, states: dict, batch_id: int) -> None:
        # single atomic replace: states and the batch id must commit
        # together or a crash between them double-merges the replayed batch
        fd, tmp = tempfile.mkstemp(dir=self.state_dir)
        with os.fdopen(fd, "wb") as f:
            pickle.dump({"states": states, "last_batch_id": batch_id}, f)
        os.replace(tmp, self._path)

    def sketches(self, specs: list[SketchSpec], group: tuple = ()) -> dict:
        states, _ = self.load()
        blobs = states.get(group, {})
        return {s.name: sketch_from_bytes(blobs[s.state_col]) for s in specs if s.state_col in blobs}

    def groups(self) -> list[tuple]:
        states, _ = self.load()
        return sorted(states.keys())


def sketch_stream(
    sdf: DataFrame,
    specs: list[SketchSpec],
    state_dir: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
):
    """Global streaming sketch build: returns the started StreamingQuery.
    Final/running states via SketchStateStore(state_dir).sketches(specs)."""
    store = SketchStateStore(state_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        states, last = store.load()
        if batch_id <= last:
            return  # replayed batch: idempotent skip
        res = sketch_table(batch_df, specs)
        blobs = states.get((), {})
        for s in specs:
            blobs[s.state_col] = merge_blobs(blobs.get(s.state_col), res.sketches[s.name].to_bytes())
        blobs["n_rows"] = blobs.get("n_rows", 0) + res.n_rows
        states[()] = blobs
        store.save(states, batch_id)

    writer = sdf.writeStream.foreachBatch(process).option("checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def windowed_sketch_stream(
    sdf: DataFrame,
    specs: list[SketchSpec],
    state_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    trigger: dict | None = None,
):
    """Per-event-time-window sketch states (tumbling windows). Late rows
    merge into their window's state on arrival — no watermark needed
    because sketch merge is order-independent."""
    store = SketchStateStore(state_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        states, last = store.load()
        if batch_id <= last:
            return
        win = batch_df.withColumn(
            "__win", F.date_trunc("hour", F.col(ts_col)) if window == "1 hour" else F.window(ts_col, window)["start"]
        )
        rows = grouped_sketch(win, ["__win"], specs).collect()
        for r in rows:
            key = (str(r["__win"]),)
            blobs = states.get(key, {})
            for s in specs:
                blobs[s.state_col] = merge_blobs(blobs.get(s.state_col), r[s.state_col])
            blobs["n_rows"] = blobs.get("n_rows", 0) + r["n_rows"]
            states[key] = blobs
        store.save(states, batch_id)

    writer = sdf.writeStream.foreachBatch(process).option("checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def stateful_grouped_stream_df(
    sdf: DataFrame,
    group_cols: list[str],
    specs: list[SketchSpec],
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Per-key sketch states as a *native Spark stateful operator*:
    ``applyInPandasWithState`` keeps each group's serialized sketch blobs
    in the state store (RocksDB/HDFS-backed on a cluster, so state
    survives restarts via the query checkpoint — unlike the foreachBatch
    path, which owns its own store). Every trigger emits the group's
    updated running states + estimates.

    Returns the (streaming) DataFrame; caller attaches the sink. Update
    semantics: each emitted row supersedes the previous row for its key.
    Restart note (verified): the state store recovers across query
    restarts when the sink supports checkpoint recovery — use foreachBatch
    or a transactional sink; Spark's memory sink does not recover.
    """
    import pandas as pd

    from ..operators.build import batch_arrays, plan_columns
    from ..operators.specs import sketch_from_bytes

    spec_cols, col_map = plan_columns(specs)
    prepared = sdf.select(*[F.col(c) for c in group_cols], *spec_cols)

    group_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    out_schema = ", ".join(
        [f"{c} {group_types[c]}" for c in group_cols]
        + ["n_rows long"]
        + [f"{s.state_col} binary" for s in specs]
    )
    state_schema = ", ".join(["n_rows long"] + [f"{s.state_col} binary" for s in specs])

    def fn(key, pdfs, state):
        if state.exists:
            stored = state.get
            n_rows = stored[0]
            sketches = {
                s.name: sketch_from_bytes(stored[1 + i]) for i, s in enumerate(specs)
            }
        else:
            n_rows = 0
            sketches = {s.name: s.new() for s in specs}
        for pdf in pdfs:
            n_rows += len(pdf)
            arrays = batch_arrays(pdf, specs, col_map)
            for s in specs:
                h, v, c = arrays[s.name]
                s.update(sketches[s.name], h, v, c)
        blobs = tuple(sketches[s.name].to_bytes() for s in specs)
        state.update((n_rows, *blobs))
        yield pd.DataFrame(
            [{**{c: k for c, k in zip(group_cols, key)}, "n_rows": n_rows,
              **{s.state_col: blobs[i] for i, s in enumerate(specs)}}]
        )

    return prepared.groupBy(*group_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "update", timeout
    )
