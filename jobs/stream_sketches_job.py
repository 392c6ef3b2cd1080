#!/usr/bin/env python
"""spark-submit entry point: STREAMING sketch maintenance over a growing
transcript directory — the streaming tier of the deployment contract that
`build_sketches_job.py` covers for batch.

    spark-submit --py-files bloomfilter_spark.zip jobs/stream_sketches_job.py \\
        --input-dir /data/transcripts_stream \\
        --checkpoint-dir /data/ckpt/stream1 \\
        [--cms-eps 1e-4] [--cms-delta 1e-3] [--hll-p 14]

Each invocation processes every file not yet seen (Trigger.AvailableNow)
and exits — a cron-style incremental runner. Two queries, both resumable:

1. Per-tool Count-Min blobs via ``stateful_grouped_cms`` (conv_id
   frequencies per tool). Spark's state store under <checkpoint-dir>/q_cms
   holds the per-key sketches across restarts; a foreachBatch sink
   maintains a warehouse SNAPSHOT table at <checkpoint-dir>/cms_tool_convs
   (load_sketch_table-compatible, O(#tools) rows) that downstream batch /
   SQL-surface jobs read without touching the stream. The snapshot
   bootstrap re-reads the previous snapshot on restart, so the table stays
   complete even though update mode emits only changed keys per epoch.

2. Whole-stream distinct conversations via ``SketchAccumulator`` (HLL):
   per-batch partial built DISTRIBUTED (build_sketch's two-level merge —
   only the O(state) partial crosses to the driver), folded into a
   persisted running sketch with epoch-replay no-ops.

Driver traffic per epoch is O(#tools) + O(sketch state), never O(rows) —
the same bounded-collect discipline as the batch builds. On a cluster,
pass --master/--deploy-mode to spark-submit as usual; nothing here
assumes local mode.

Crash safety: the snapshot is republished via
`warehouse.publish_sketch_table` — each epoch writes a COMPLETE table
into a fresh versioned subdir and commits it with a marker file created
last, and every reader (including this job's own bootstrap) resolves
only committed versions. A job that dies mid-write therefore leaves the
previous snapshot fully intact and readable; the uncommitted epoch is
replayed by AvailableNow on restart and simply republishes. The state
store remains canonical for per-key sketch state (keys are never lost
from it); the snapshot table is now crash-consistent rather than a
tearable cache."""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-dir", required=True,
                    help="directory of transcript parquet files (stream source)")
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--cms-eps", type=float, default=1e-4)
    ap.add_argument("--cms-delta", type=float, default=1e-3)
    ap.add_argument("--hll-p", type=int, default=14)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from bloomfilter_spark.sketches import CountMinSketch, HyperLogLog
    from bloomfilter_spark.sources.transcripts import TRANSCRIPT_SCHEMA
    from bloomfilter_spark.streaming import (SketchAccumulator,
                                             stateful_grouped_cms)
    from bloomfilter_spark.warehouse import (load_sketch_table,
                                             publish_sketch_table,
                                             sketch_table_exists)

    spark = SparkSession.builder.appName("stream_sketches").getOrCreate()
    t0 = time.time()

    def cms_factory():
        return CountMinSketch(eps=args.cms_eps, delta=args.cms_delta)

    snapshot_path = f"{args.checkpoint_dir}/cms_tool_convs"
    # bootstrap the snapshot dict from the previous run, if any — the
    # loader resolves the newest COMMITTED version, so a torn write from
    # a crashed run is invisible here by construction; the geometry guard
    # refuses a snapshot built with different eps/delta instead of
    # silently mixing incompatible sketches
    snapshot: dict = {}
    if sketch_table_exists(spark, snapshot_path):
        prev, _meta = load_sketch_table(spark, snapshot_path,
                                        expected_factory=cms_factory)
        snapshot = {r["tool"]: (bytes(r["sketch"]), r["n_updates"])
                    for r in prev.collect()}  # O(#tools)

    def upsert_snapshot(batch_df, epoch_id):
        # update mode emits only keys CHANGED this epoch — O(#tools) rows
        for r in batch_df.select("tool", "sketch", "n_updates").collect():
            snapshot[r["tool"]] = (bytes(r["sketch"]), int(r["n_updates"]))
        if not snapshot:
            return
        tbl = spark.createDataFrame(
            [(t, s, n) for t, (s, n) in sorted(snapshot.items())],
            "tool string, sketch binary, n_updates long")
        publish_sketch_table(tbl, snapshot_path, keys=["tool"],
                             factory=cms_factory)

    stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
              .parquet(args.input_dir))
    cms_q = (stateful_grouped_cms(
                 stream.where("tool IS NOT NULL"), "tool", "conv_id",
                 eps=args.cms_eps, delta=args.cms_delta)
             .writeStream.outputMode("update")
             .option("checkpointLocation", f"{args.checkpoint_dir}/q_cms")
             .foreachBatch(upsert_snapshot)
             .trigger(availableNow=True).start())
    cms_q.awaitTermination()

    acc = SketchAccumulator(["conv_id"], lambda: HyperLogLog(args.hll_p),
                            state_dir=f"{args.checkpoint_dir}/hll_state")
    hll_stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
                  .parquet(args.input_dir))
    hll_q = (hll_stream.writeStream
             .option("checkpointLocation", f"{args.checkpoint_dir}/q_hll")
             .foreachBatch(acc)
             .trigger(availableNow=True).start())
    hll_q.awaitTermination()

    print(json.dumps({
        "elapsed_sec": round(time.time() - t0, 1),
        "tools_in_snapshot": len(snapshot),
        "cms_total_turns": sum(n for _, n in snapshot.values()),
        "hll_distinct_convs": round(acc.sketch.estimate(), 1),
        "hll_epochs_folded": acc.last_epoch + 1,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
