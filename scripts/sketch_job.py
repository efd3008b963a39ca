#!/usr/bin/env python
"""spark-submit entry point: fused sketch build over a transcripts table.

Cluster usage (north_rule: spark-submit --py-files at N and 4N executors):

    zip -r probably_jl_spark.zip probably_jl_spark
    spark-submit --master yarn --deploy-mode cluster \
        --num-executors $N --executor-cores 4 \
        $(python -c "from probably_jl_spark.conf import sketch_build_conf;
                     print(' '.join(f'--conf {k}={v}' for k,v in sketch_build_conf().items()))") \
        --py-files probably_jl_spark.zip \
        scripts/sketch_job.py --input <iceberg-table-or-parquet-path> \
        --checkpoint s3://bucket/ckpt/run1 --output metrics.json

Local sandbox proxy (verified in this repo):

    spark-submit --master local[8] --driver-memory 8g \
        --py-files probably_jl_spark.zip scripts/sketch_job.py \
        --input <parquet-path> --checkpoint /tmp/ckpt --buckets 32

Local mode runs everything in the driver JVM, so give it real memory —
the bare 1 GB default OOMs writing MB-sized Bloom state rows. (See
bench.py for the N vs 4N scaling-efficiency measurement.)

The job is checkpoint-resumable: rerunning with the same --checkpoint
processes only missing buckets (plans/checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="Iceberg table name or parquet path")
    ap.add_argument("--checkpoint", default=None, help="checkpoint dir (enables resume)")
    ap.add_argument("--output", default="-", help="metrics JSON path or - for stdout")
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--hll-p", type=int, default=14)
    ap.add_argument("--bloom-bits", type=int, default=1 << 26)
    args = ap.parse_args()

    from probably_jl_spark.conf import apply_conf, sketch_build_conf
    from probably_jl_spark.operators.build import sketch_table
    from probably_jl_spark.operators.specs import SketchSpec
    from probably_jl_spark.plans.checkpoint import CheckpointedSketchBuild
    from probably_jl_spark.sources.transcripts import read_transcripts

    builder = SparkSession.builder.appName("probably-jl-spark-sketch-job")
    spark = apply_conf(builder, {
        k: v for k, v in sketch_build_conf("cluster").items()
        if not k.startswith(("spark.executor", "spark.driver"))  # resource knobs come from submit
    }).getOrCreate()

    tr = read_transcripts(spark, args.input).withColumn(
        "text_len", F.length("text").cast("double")
    )
    specs = [
        SketchSpec("convs", "hll", key_cols=("conv_id",), params={"p": args.hll_p}),
        SketchSpec("conv_tool", "hll", key_cols=("conv_id", "tool"), params={"p": args.hll_p}),
        SketchSpec("role_freq", "cms", key_cols=("role",), params={"width": 2048, "depth": 5}),
        SketchSpec("tool_freq", "cms", key_cols=("tool",), params={"width": 2048, "depth": 5}),
        SketchSpec("conv_member", "bloom", key_cols=("conv_id",), params={"m": args.bloom_bits, "k": 5}),
        SketchSpec("turn_len_td", "tdigest", value_col="text_len"),
        SketchSpec("turn_len_kll", "kll", value_col="text_len"),
    ]

    if args.checkpoint:
        build = CheckpointedSketchBuild(
            spark, specs, args.checkpoint, n_buckets=args.buckets, bucket_cols=("conv_id",)
        )
        res = build.run(tr)
    else:
        res = sketch_table(tr, specs)

    metrics = {
        "n_turns": res.n_rows,
        "distinct_convs_hll": res.sketches["convs"].cardinality(),
        "distinct_conv_tool_hll": res.sketches["conv_tool"].cardinality(),
        "turn_len_p50": res.sketches["turn_len_td"].quantile(0.5),
        "turn_len_p99": res.sketches["turn_len_kll"].quantile(0.99),
        "bloom_loadfactor": res.sketches["conv_member"].loadfactor(),
        **{k: v for k, v in res.metrics.items() if k != "lineage"},
    }
    out = json.dumps(metrics, default=str)
    if args.output == "-":
        print(out)
    else:
        with open(args.output, "w") as f:
            f.write(out)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
