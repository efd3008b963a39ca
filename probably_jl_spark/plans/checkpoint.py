"""Checkpoint-resumable sketch build with per-bucket lineage + metrics
(north_rule; SURVEY.md §2.6 sink / §4.2 checkpoint convention).

The input is split into ``n_buckets`` deterministic hash buckets
(``pmod(xxhash64(bucket_cols, seed), n_buckets)``). Each run:

1. reads the checkpoint table (parquet dir) and collects finished bucket
   ids;
2. processes **only the missing buckets** in a single Spark job
   (filter pushes into the scan; one shuffle on the bucket id);
3. appends one state row per bucket — bucket id, n_rows, build_ms,
   serialized state per spec, attempt id — the per-partition lineage;
4. merges all bucket rows into the final sketches.

Because every sketch merge is commutative/associative and the per-bucket
build is deterministic (hash contract + counter-based randomness), a
resumed run produces **byte-identical** final states to an uninterrupted
one — the law tested in tests/test_checkpoint.py.

At cluster scale the checkpoint dir lives on the object store /
Iceberg; a restarted spark-submit picks up where the dead one stopped.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.build import BuildResult
from ..operators.grouped import grouped_sketch
from ..operators.specs import SketchSpec, merge_blobs, sketch_from_bytes

BUCKET_COL = "__bucket"


class CheckpointedSketchBuild:
    def __init__(
        self,
        spark: SparkSession,
        specs: list[SketchSpec],
        ckpt_dir: str,
        n_buckets: int = 64,
        bucket_cols: tuple[str, ...] = ("conv_id",),
        seed: int = 0xC0DE,
    ):
        self.spark = spark
        self.specs = specs
        self.ckpt_dir = ckpt_dir
        self.n_buckets = n_buckets
        self.bucket_cols = bucket_cols
        self.seed = seed

    # ------------------------------------------------------------ state
    def _read_ckpt_eager(self, materialize):
        """Run ``materialize(df)`` on the state table under a tiny columnar
        batch size: state rows are MBs each (a 2^26-bit Bloom is 8 MB), and
        the default 4096-row vectorized-reader batch tries to reserve
        rows x size bytes of heap at once (observed OOM at the 1 GB default
        driver heap via spark-submit). The conf must stay small until the
        *action* runs — reads are lazy — hence the eager wrapper."""
        key = "spark.sql.parquet.columnarReaderBatchSize"
        prev = self.spark.conf.get(key, None)
        self.spark.conf.set(key, "8")
        try:
            return materialize(self.spark.read.parquet(self.ckpt_dir))
        finally:
            if prev is None:
                self.spark.conf.unset(key)
            else:
                self.spark.conf.set(key, prev)

    def done_buckets(self) -> set[int]:
        try:
            rows = self._read_ckpt_eager(
                lambda df: df.select(BUCKET_COL).distinct().collect()
            )
        except Exception:
            return set()
        return {r[BUCKET_COL] for r in rows}

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            BUCKET_COL,
            F.pmod(F.xxhash64(*self.bucket_cols, F.lit(self.seed)), F.lit(self.n_buckets)),
        )

    # -------------------------------------------------------------- run
    def run(self, df: DataFrame, limit_buckets: set[int] | None = None) -> BuildResult:
        """Process missing buckets (optionally capped to ``limit_buckets``
        to simulate/control partial progress), append their state rows,
        then merge everything finished so far."""
        t0 = time.perf_counter()
        self._check_manifest()
        done = self.done_buckets()
        missing = set(range(self.n_buckets)) - done
        if limit_buckets is not None:
            missing &= set(limit_buckets)

        built_now = 0
        if missing:
            bucketed = self._with_bucket(df).filter(
                F.col(BUCKET_COL).isin([int(b) for b in missing])
            )
            per_bucket = grouped_sketch(bucketed, [BUCKET_COL], self.specs)
            attempt = uuid.uuid4().hex[:12]
            out = per_bucket.withColumn("attempt", F.lit(attempt))
            out.write.mode("append").parquet(self.ckpt_dir)
            # groupBy drops empty buckets: mark them done with empty states.
            # Derive which buckets actually had rows from the INPUT, not
            # from reading the checkpoint back — a transient read error
            # there must not spawn empty markers shadowing real rows.
            produced = {
                r[BUCKET_COL]
                for r in bucketed.select(BUCKET_COL).distinct().collect()
            }
            empty = sorted(missing - produced)
            if empty:
                rows = []
                for b in empty:
                    row = {BUCKET_COL: b, "n_rows": 0, "attempt": attempt}
                    for s in self.specs:
                        row[s.state_col] = s.new().to_bytes()
                    rows.append(row)
                import pandas as pd

                self.spark.createDataFrame(pd.DataFrame(rows)).write.mode("append").parquet(
                    self.ckpt_dir
                )
            built_now = len(missing)

        # ------------------------------------------------------- merge
        ckpt = self._read_ckpt_eager(lambda df: df.toPandas())
        # dedupe re-appended buckets (concurrent/retried runs): non-empty
        # rows outrank empty markers, then first attempt wins — real states
        # are deterministic so any non-empty attempt is the same bytes
        ckpt = (
            ckpt.assign(_empty=ckpt["n_rows"] == 0)
            .sort_values(["_empty", "attempt"])
            .drop_duplicates(subset=[BUCKET_COL], keep="first")
            .drop(columns="_empty")
        )
        sketches = {}
        for s in self.specs:
            acc = None
            for blob in ckpt[s.state_col]:
                acc = merge_blobs(acc, blob)
            sketches[s.name] = sketch_from_bytes(acc)
        n_rows = int(ckpt["n_rows"].sum())
        wall = time.perf_counter() - t0
        metrics = {
            "n_rows": n_rows,
            "wall_sec": wall,
            "buckets_total": self.n_buckets,
            "buckets_done": int(ckpt[BUCKET_COL].nunique()),
            "buckets_built_this_run": built_now,
            "lineage": ckpt[[BUCKET_COL, "n_rows", "attempt"]].to_dict("records"),
        }
        return BuildResult(sketches=sketches, n_rows=n_rows, metrics=metrics)

    def is_complete(self) -> bool:
        return len(self.done_buckets()) >= self.n_buckets

    def _check_manifest(self) -> None:
        """A checkpoint dir is bound to one build config: resuming with a
        different bucketing/spec set would silently double-count rows, so
        it's a hard error instead."""
        import json
        import os

        config = {
            "n_buckets": self.n_buckets,
            "bucket_cols": list(self.bucket_cols),
            "seed": self.seed,
            "specs": sorted(s.name for s in self.specs),
        }
        os.makedirs(self.ckpt_dir, exist_ok=True)
        path = os.path.join(self.ckpt_dir, "_build_manifest.json")
        if os.path.exists(path):
            with open(path) as f:
                existing = json.load(f)
            if existing != config:
                raise ValueError(
                    f"checkpoint dir {self.ckpt_dir} was built with config "
                    f"{existing}, cannot resume with {config}"
                )
        else:
            with open(path, "w") as f:
                json.dump(config, f)
