#!/usr/bin/env python
"""spark-submit entry point: build the full sketch family over a transcript
table with checkpoint/resume, per the north rule's deployment contract.

    spark-submit --py-files bloomfilter_spark.zip jobs/build_sketches_job.py \\
        --input '/data/transcripts/*.parquet' \\
        --checkpoint-dir /data/ckpt/run1 \\
        --fpr 0.01 [--capacity N] [--buckets 64]

Package the library with:  python tools/make_pyfiles_zip.py
(produces bloomfilter_spark.zip for --py-files).

On the sandbox this runs with a local master; on a cluster, pass
--master/--deploy-mode to spark-submit as usual — nothing here assumes
local mode. When the plan exceeds the broadcast budget the job switches
to the checkpointed SHARDED build and writes the final shard table to
<checkpoint-dir>/bloom/final_shard_table (query with
operators.sharded.sharded_membership); size --driver-memory for
n_shards x 64 MiB of concurrent shard state in local smoke runs.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet glob of transcripts")
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--fpr", type=float, default=0.01)
    ap.add_argument("--capacity", type=int, default=None,
                    help="expected distinct keys; derived by counting if absent")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--hll-p", type=int, default=14)
    ap.add_argument("--dd-alpha", type=float, default=0.01,
                    help="relative value error of the per-tool turn-length"
                         " quantile table")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    from bloomfilter_spark.checkpoint import checkpointed_build, read_lineage
    from bloomfilter_spark.plans import plan_bloom
    from bloomfilter_spark.sizing import suggest_sizing
    from bloomfilter_spark.sketches import (BloomFilter, CountMinSketch,
                                            HyperLogLog)

    spark = SparkSession.builder.appName("build_sketches").getOrCreate()

    capacity = args.capacity
    if capacity is None:
        capacity = spark.read.parquet(args.input).count()
    plan = plan_bloom(capacity, args.fpr)
    print(f"plan: {plan}", file=sys.stderr)
    m, k = suggest_sizing(capacity, args.fpr)

    t0 = time.time()
    if plan.broadcastable:
        bloom, rep = checkpointed_build(
            spark, args.input, ["conv_id", "text"], lambda: BloomFilter(m, k),
            checkpoint_dir=f"{args.checkpoint_dir}/bloom",
            n_buckets=args.buckets)
        bloom_bits = bloom.bit_count()
    else:
        # beyond the broadcast budget: build the DISTRIBUTED filter with
        # per-bucket shard-table checkpoints; query via sharded_membership
        from bloomfilter_spark.checkpoint import checkpointed_sharded_build
        shard_table, rep = checkpointed_sharded_build(
            spark, args.input, ["conv_id", "text"], capacity=capacity,
            checkpoint_dir=f"{args.checkpoint_dir}/bloom",
            fpr=args.fpr, n_shards=plan.n_shards, n_buckets=args.buckets)
        out = f"{args.checkpoint_dir}/bloom/final_shard_table"
        shard_table.write.mode("overwrite").parquet(out)
        print(f"sharded filter written to {out}", file=sys.stderr)
        bloom_bits = -1  # distributed; per-shard bits live in the table
    hll, _ = checkpointed_build(
        spark, args.input, ["conv_id"], lambda: HyperLogLog(args.hll_p),
        checkpoint_dir=f"{args.checkpoint_dir}/hll", n_buckets=args.buckets)
    cms, _ = checkpointed_build(
        spark, args.input, ["tool"], lambda: CountMinSketch(eps=1e-4, delta=1e-3),
        checkpoint_dir=f"{args.checkpoint_dir}/cms", n_buckets=args.buckets)
    # per-tool heavy-conversation table (grouped JVM-reduced Misra-Gries):
    # persisted through the warehouse so later jobs answer
    # mg_count_lo/mg_error_bound probes from SQL without re-scanning
    from bloomfilter_spark.jvm_build import mg_grouped_build_preagg
    from bloomfilter_spark.sketches import MisraGries
    from bloomfilter_spark.warehouse import save_sketch_table
    mg_k = 64
    mg_table = mg_grouped_build_preagg(
        spark.read.parquet(args.input).where(F.col("tool").isNotNull()),
        ["tool"], ["conv_id"], k=mg_k)
    save_sketch_table(mg_table, f"{args.checkpoint_dir}/mg_tool_convs",
                      keys=["tool"], factory=lambda: MisraGries(k=mg_k))
    mg_keys = spark.read.parquet(
        f"{args.checkpoint_dir}/mg_tool_convs/data").count()

    # per-tool turn-length DDSketch table: latency-SLO quantiles with the
    # relative-VALUE-error guarantee, answered later from SQL
    # (sketch_quantile / sketch_error_bound) without re-scanning; the
    # whole build is codegen groupBy(log-bucket).count()
    from bloomfilter_spark.jvm_build import ddsketch_grouped_build_jvm
    from bloomfilter_spark.sketches import DDSketch
    dd_alpha = args.dd_alpha
    dd_table = ddsketch_grouped_build_jvm(
        spark.read.parquet(args.input).where(F.col("tool").isNotNull())
             .withColumn("__len", F.length("text").cast("double")),
        ["tool"], "__len", alpha=dd_alpha)
    save_sketch_table(dd_table, f"{args.checkpoint_dir}/dd_tool_turnlen",
                      keys=["tool"], factory=lambda: DDSketch(dd_alpha))
    dd_keys = spark.read.parquet(
        f"{args.checkpoint_dir}/dd_tool_turnlen/data").count()
    elapsed = time.time() - t0

    rows = sum(e["rows"] for e in read_lineage(f"{args.checkpoint_dir}/bloom"))
    print(json.dumps({
        "elapsed_sec": round(elapsed, 1),
        "buckets_completed": rep.completed,
        "buckets_resumed": rep.skipped,
        "rows": rows,
        "bloom_bits_set": bloom_bits,
        "hll_distinct_convs": round(hll.estimate(), 1),
        "cms_total": cms.total,
        "mg_tool_keys": mg_keys,
        "dd_tool_keys": dd_keys,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
