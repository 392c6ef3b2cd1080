#!/usr/bin/env python
"""spark-submit entry point: IBLT snapshot reconciliation — list and
materialize the rows that differ between two corpus snapshots from O(d)
sketch state (operators/reconcile.py; Eppstein et al. SIGCOMM 2011).

The operational shape of "did yesterday's re-ingest change anything?" at
10^12 rows: the exact alternative (full-outer anti-join) shuffles both
snapshots; this job scans each snapshot ONCE into an O(max_diff)-cell
digest (all per-row arithmetic in codegen — jvm_build.iblt_build_jvm),
subtracts the digests on the driver, peels out the differing key hashes,
and materializes the actual rows with a broadcast semi-join per side.
With --save-digests, each snapshot's digest is also persisted as a
sketch table through the versioned commit protocol, so FUTURE
reconciliations against this snapshot skip its scan entirely (the
SIGCOMM "no prior context" property: any two saved digests of the same
geometry/seed subtract, whenever they were built).

    spark-submit --py-files bloomfilter_spark.zip \\
        jobs/reconcile_snapshots_job.py \\
        --left /data/snapshots/2026-08-19 \\
        --right /data/snapshots/2026-08-20 \\
        --key conv_id,turn_idx --max-diff 100000 \\
        --output /audit/drift_0820 \\
        [--assume-distinct] [--num-hashes 4] [--on-incomplete fail|partial] \\
        [--save-digests /wh/snapshot_digests]

Output layout: <output>/only_in_left/ and <output>/only_in_right/
(parquet, full rows of the differing keys) plus <output>/summary.json;
the same summary prints to stdout as one JSON line. Exit codes: 0 =
complete reconciliation (or an empty difference); 1 = decode incomplete
under --on-incomplete fail (resize guidance in the message; nothing is
written).

Scale shape: two corpus scans (codegen aggregations, shuffle bounded by
O(cells·tasks) with --assume-distinct on primary-key snapshots, else one
distinct exchange per side), one O(d) driver peel, two broadcast
semi-joins. Python never sees corpus rows.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--left", required=True,
                    help="parquet path of the left snapshot")
    ap.add_argument("--right", required=True,
                    help="parquet path of the right snapshot")
    ap.add_argument("--key", required=True,
                    help="comma-separated key columns (the row identity"
                         " being reconciled, e.g. conv_id,turn_idx)")
    ap.add_argument("--max-diff", type=int, required=True,
                    help="sizing budget: upper bound on the expected"
                         " |symmetric difference| (state ~42 bytes per"
                         " budgeted key — over-provision freely)")
    ap.add_argument("--num-hashes", type=int, default=4)
    ap.add_argument("--assume-distinct", action="store_true",
                    help="the key IS each snapshot's primary key: skip"
                         " the per-side dedup shuffle (the only exchange"
                         " that scales with key count)")
    ap.add_argument("--on-incomplete", choices=("fail", "partial"),
                    default="fail",
                    help="fail (exit 1, nothing written) or write the"
                         " verified subset flagged complete=false")
    ap.add_argument("--output", required=True,
                    help="output dir: only_in_left/ only_in_right/"
                         " parquet + summary.json")
    ap.add_argument("--save-digests", default=None,
                    help="also publish the two digests as a versioned"
                         " sketch table (key column 'side') for future"
                         " scan-free reconciliations")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from bloomfilter_spark.jvm_build import iblt_build_jvm
    from bloomfilter_spark.operators.reconcile import reconcile_digests

    keys = [c.strip() for c in args.key.split(",") if c.strip()]
    if not keys:
        raise SystemExit("--key names no columns")

    spark = SparkSession.builder.appName("reconcile_snapshots").getOrCreate()
    t0 = time.time()
    left = spark.read.parquet(args.left)
    right = spark.read.parquet(args.right)

    digests = {}
    for side, df in (("left", left), ("right", right)):
        digests[side] = iblt_build_jvm(
            df, keys, max_diff=args.max_diff, num_hashes=args.num_hashes,
            assume_distinct=args.assume_distinct)
        print(f"digest {side}: {digests[side].num_cells} cells, "
              f"net {digests[side].estimate():.0f} keys", file=sys.stderr)

    try:
        res = reconcile_digests(
            digests["left"], digests["right"], left=left, right=right,
            cols=keys,
            on_incomplete="raise" if args.on_incomplete == "fail"
            else "partial")
    except ValueError as e:
        print(f"reconcile failed: {e}", file=sys.stderr)
        return 1

    if args.save_digests:
        from bloomfilter_spark.warehouse import publish_sketch_table
        from bloomfilter_spark.config import DEFAULT_SEED
        tbl = spark.createDataFrame(
            [(s, d.to_bytes()) for s, d in digests.items()],
            "side string, sketch binary")
        publish_sketch_table(
            tbl, args.save_digests, keys=["side"],
            factory=lambda: type(digests["left"])(
                digests["left"].num_cells, digests["left"].num_hashes),
            seed=DEFAULT_SEED)
        print(f"digests published to {args.save_digests}", file=sys.stderr)

    out_l = f"{args.output.rstrip('/')}/only_in_left"
    out_r = f"{args.output.rstrip('/')}/only_in_right"
    res.only_in_left.write.mode("overwrite").parquet(out_l)
    res.only_in_right.write.mode("overwrite").parquet(out_r)
    n_l = spark.read.parquet(out_l).count()
    n_r = spark.read.parquet(out_r).count()

    summary = {
        "complete": res.complete,
        "net_keys": res.net,
        "left_only_keys": int(res.left_only_hashes.size),
        "right_only_keys": int(res.right_only_hashes.size),
        "left_only_rows": n_l,
        "right_only_rows": n_r,
        "key": keys,
        "max_diff": args.max_diff,
        "assume_distinct": bool(args.assume_distinct),
        "seconds": round(time.time() - t0, 2),
    }
    try:  # local-FS convenience copy; the stdout line is the contract
        with open(f"{args.output.rstrip('/')}/summary.json", "w") as f:
            json.dump(summary, f)
    except OSError as e:
        print(f"summary.json not written ({e}); stdout carries it",
              file=sys.stderr)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
