"""End-to-end spark-submit tests for jobs/reconcile_snapshots_job.py —
the IBLT snapshot-drift audit.

Pins the operational promises: (1) the job finds EXACTLY the drifted
rows between two snapshots and writes them + a machine-readable summary;
(2) --save-digests publishes a versioned sketch table whose blobs
reconcile later without rescanning; (3) an undersized budget under
--on-incomplete fail exits 1 with nothing committed to the output."""

import glob
import json
import os
import shutil
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _zip(tmp_path) -> str:
    import zipfile
    zpath = str(tmp_path / "bloomfilter_spark.zip")
    pkg = os.path.join(ROOT, "bloomfilter_spark")
    with zipfile.ZipFile(zpath, "w") as zf:
        for dirpath, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, ROOT))
    return zpath


def _submit(tmp_path, job_args, timeout=420):
    env = dict(os.environ,
               PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    return subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", _zip(tmp_path),
         os.path.join(ROOT, "jobs", "reconcile_snapshots_job.py"),
         *job_args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=ROOT)


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_reconcile_job_end_to_end_with_digest_publish(tmp_path, spark):
    from bloomfilter_spark.sketches import IBLT
    from bloomfilter_spark.warehouse import (load_sketch_table,
                                             verify_sketch_table)

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    drop = [r["o_orderkey"] for r in
            orders.select("o_orderkey").orderBy("o_orderkey")
                  .limit(11).collect()]
    snap_l = str(tmp_path / "snap_left")
    snap_r = str(tmp_path / "snap_right")
    orders.write.parquet(snap_l)
    (orders.where(~F.col("o_orderkey").isin(drop))
           .unionByName(orders.limit(6).withColumn(
               "o_orderkey", F.col("o_orderkey") + 10**9))
           .write.parquet(snap_r))

    out = str(tmp_path / "drift")
    wh = str(tmp_path / "digests")
    r = _submit(tmp_path, [
        "--left", snap_l, "--right", snap_r,
        "--key", "o_orderkey", "--max-diff", "500",
        "--assume-distinct", "--output", out, "--save-digests", wh])
    assert r.returncode == 0, r.stdout + r.stderr
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["complete"] is True
    assert summary["left_only_keys"] == 11
    assert summary["right_only_keys"] == 6
    assert summary["net_keys"] == 5.0
    assert summary["left_only_rows"] == 11  # o_orderkey is the PK
    assert summary["right_only_rows"] == 6
    # written rows are exactly the drifted keys
    got_l = {row["o_orderkey"] for row in
             spark.read.parquet(f"{out}/only_in_left").collect()}
    assert got_l == set(drop)
    got_r = spark.read.parquet(f"{out}/only_in_right")
    assert got_r.where(F.col("o_orderkey") < 10**9).count() == 0
    # summary.json copy matches the stdout line
    with open(f"{out}/summary.json") as f:
        assert json.load(f) == summary

    # published digests: versioned, fsck-clean, and they reconcile
    # SCAN-FREE to the same difference
    assert glob.glob(f"{wh}/v_*/_COMMITTED")
    tbl, meta = load_sketch_table(spark, wh)
    rep = verify_sketch_table(spark, wh, strict=True)
    assert rep["corrupt"] == 0 and rep["rows"] == 2
    blobs = {row["side"]: bytes(row["sketch"]) for row in tbl.collect()}
    diff = IBLT.from_bytes(blobs["left"]).subtract(
        IBLT.from_bytes(blobs["right"]))
    pos, neg, complete = diff.decode()
    assert complete and pos.size == 11 and neg.size == 6


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_reconcile_job_undersized_budget_fails_loudly(tmp_path, spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    snap_l = str(tmp_path / "l")
    snap_r = str(tmp_path / "r")
    orders.write.parquet(snap_l)
    # right = empty snapshot: the difference is EVERY order key, far
    # beyond a max_diff=1 floor table
    orders.limit(0).write.parquet(snap_r)
    out = str(tmp_path / "nope")
    r = _submit(tmp_path, [
        "--left", snap_l, "--right", snap_r,
        "--key", "o_orderkey", "--max-diff", "1",
        "--output", out])
    assert r.returncode == 1
    assert "decode incomplete" in (r.stdout + r.stderr)
    assert not os.path.exists(f"{out}/summary.json")
    assert not os.path.exists(f"{out}/only_in_left")
