#!/usr/bin/env python
"""spark-submit entry point: fsck-gated rollup of warehoused sketch tables
to a coarser key, republished crash-safe.

The operational capstone of the warehouse story: daily/per-shard sketch
tables are built incrementally (build_sketches_job, stream_sketches_job);
answering "weekly distinct users per tool" or "per-tool frequency over the
quarter" is then a MERGE over O(keys) sketch rows — never a re-scan of the
10^12-turn corpus. This job packages that merge with the operational
guards the docs promise around it:

  1. every input table passes the distributed integrity sweep
     (warehouse.verify_sketch_table: wire CRC + merge-probe geometry
     check) BEFORE any of its blobs reach the rollup — a quarter job
     must fail on the one corrupt row up front, not 40 minutes in;
  2. multiple input tables (e.g. 90 daily builds) are union-merged after
     a metadata-compatibility check (same sketch params, same hash seed
     — mixing seeds would silently produce garbage estimates);
  3. optional derived grouping columns (``--derive "week=substring(day,
     1, 7)"``) so calendar coarsenings need no pre-processing job;
  4. the result is published through the versioned commit protocol
     (publish_sketch_table), so readers holding the previous rollup open
     never see a torn table, and the output is fsck'd after commit —
     the rollup is born audited.

    spark-submit --py-files bloomfilter_spark.zip jobs/rollup_sketches_job.py \\
        --table /wh/daily_tool_users [--table /wh/daily_tool_users_2 ...] \\
        --output /wh/weekly_tool_users \\
        --group-by week,tool \\
        [--derive "week=substring(day, 1, 7)"] \\
        [--no-fsck] [--keep 2]

Scale shape: inputs are sketch TABLES (one row per fine-grained key), so
the whole job is O(keys) — one shuffle of serialized blobs by the coarse
key, one pass per fsck sweep. Python touches each blob once per row
(parse + merge inside applyInPandas); nothing is O(turns).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", action="append", required=True,
                    help="warehoused sketch table root (flat or versioned);"
                         " repeat to union-merge compatible tables")
    ap.add_argument("--output", required=True,
                    help="versioned publish root for the rolled-up table")
    ap.add_argument("--group-by", required=True,
                    help="comma-separated coarse key columns (existing key"
                         " columns and/or --derive names)")
    ap.add_argument("--derive", action="append", default=[],
                    help="name=SQL_EXPR derived grouping column, e.g."
                         " week=substring(day, 1, 7); repeatable")
    ap.add_argument("--fold-to", type=int, default=None,
                    help="fold every input blob to this primary size param"
                         " (HLL p, Bloom num_bits, theta/MG/KLL k, t-digest"
                         " delta, CMS width) before merging — lets tables"
                         " built at different geometries roll up together"
                         " (exact for Bloom/HLL/plain-CMS/theta; see the"
                         " kernel fold() docstrings)")
    ap.add_argument("--no-fsck", action="store_true",
                    help="skip the input integrity sweeps (trusted inputs)")
    ap.add_argument("--keep", type=int, default=2,
                    help="committed output versions to retain")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    from bloomfilter_spark.agg import merge_grouped_sketches
    from bloomfilter_spark.warehouse import (load_sketch_table,
                                             publish_sketch_table,
                                             resolve_sketch_table,
                                             sketch_factory_from_meta,
                                             verify_sketch_table)

    group_keys = [c.strip() for c in args.group_by.split(",") if c.strip()]
    if not group_keys:
        raise SystemExit("--group-by names no columns")
    derives: list[tuple[str, str]] = []
    for d in args.derive:
        name, sep, expr = d.partition("=")
        if not sep or not name.strip() or not expr.strip():
            raise SystemExit(f"--derive needs name=SQL_EXPR, got {d!r}")
        derives.append((name.strip(), expr.strip()))

    spark = SparkSession.builder.appName("rollup_sketches").getOrCreate()
    t0 = time.time()

    # 1) load + compatibility check; 2) fsck gate per input table
    frames, metas, fsck_in = [], [], []
    for p in args.table:
        df, meta = load_sketch_table(spark, p)
        frames.append(df)
        metas.append(meta)
        if not args.no_fsck:
            resolved = resolve_sketch_table(spark, p)
            rep = verify_sketch_table(spark, resolved, strict=True, meta=meta)
            fsck_in.append({"table": p, "rows": rep["rows"],
                            "state_bytes": rep["state_bytes"]})
            print(f"fsck {p}: {rep['rows']} rows clean", file=sys.stderr)
    if args.fold_to is not None:
        # geometry migration path: fold every input's blobs to the target
        # BEFORE the union, so the compat check below compares FOLDED
        # geometry. The fsck gate above already validated each table as
        # stored. Folding a table already at the target is the identity
        # fold (canonical re-serialization, byte-preserving). Seeds still
        # must match — folding changes geometry, never the hash salt.
        from pyspark.sql.functions import lit, pandas_udf

        from bloomfilter_spark.sql import sketch_fold
        from bloomfilter_spark.warehouse import _sketch_params
        fold_udf = pandas_udf(sketch_fold, "binary")
        for i, (df, m) in enumerate(zip(frames, metas)):
            proto = sketch_factory_from_meta(m)()
            folded_proto = proto.fold(args.fold_to)  # raises on upfold
            frames[i] = df.withColumn(
                "sketch", fold_udf(F.col("sketch"), lit(args.fold_to)))
            metas[i] = {**m, "sketch": _sketch_params(folded_proto)}
    for p, m in zip(args.table[1:], metas[1:]):
        if m["sketch"] != metas[0]["sketch"] or m["seed"] != metas[0]["seed"]:
            raise SystemExit(
                f"sketch table {p} ({m['sketch']}, seed {m['seed']}) is "
                f"incompatible with {args.table[0]} ({metas[0]['sketch']}, "
                f"seed {metas[0]['seed']}) — refusing to merge"
                + ("" if args.fold_to is not None else
                   " (different geometries of one family can roll up via"
                   " --fold-to)"))
    meta = metas[0]
    fine = frames[0]
    for f in frames[1:]:
        fine = fine.unionByName(f)

    # 3) derived grouping columns, then validate the coarse key set
    for name, expr in derives:
        fine = fine.withColumn(name, F.expr(expr))
    missing = [k for k in group_keys if k not in fine.columns]
    if missing:
        raise SystemExit(
            f"--group-by columns {missing} not in table columns "
            f"{[c for c in fine.columns if c != 'sketch']} (add --derive?)")
    if "sketch" in group_keys:
        raise SystemExit("cannot group by the sketch column itself")

    # 4) the rollup: one blob shuffle by coarse key, executor-side merges
    factory = sketch_factory_from_meta(meta)
    coarse = merge_grouped_sketches(fine, group_keys, factory)
    committed = publish_sketch_table(coarse, args.output, keys=group_keys,
                                     factory=factory, seed=meta["seed"],
                                     keep=args.keep)

    # 5) the output is born audited: sweep what was actually committed
    out_rep = verify_sketch_table(spark, args.output, strict=True)

    print(json.dumps({
        "elapsed_sec": round(time.time() - t0, 1),
        "input_tables": len(args.table),
        "input_rows": sum(f["rows"] for f in fsck_in) if fsck_in else None,
        "group_by": group_keys,
        "output_keys": out_rep["rows"],
        "output_state_bytes": out_rep["state_bytes"],
        "committed_version": committed,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
