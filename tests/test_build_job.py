"""End-to-end spark-submit test for jobs/build_sketches_job.py — the
north-rule deployment entry (checkpointed family build + warehoused
grouped tables). Previously witnessed only by ad-hoc runs in commit
history; this pins the contract: (1) one run builds Bloom/HLL/CMS +
per-tool MG and DDSketch warehouse tables and prints a machine-readable
summary; (2) the DDSketch table answers per-tool p99 within its alpha
against the exact items; (3) a rerun over the same checkpoint dir
RESUMES every bloom bucket instead of rebuilding."""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
         os.path.join(ROOT, "jobs", "build_sketches_job.py"),
         *job_args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=ROOT)


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_build_job_end_to_end_then_resume(tmp_path, spark):
    from bloomfilter_spark.sources.transcripts import load_transcripts
    from bloomfilter_spark.warehouse import (load_sketch_table,
                                             verify_sketch_table)
    from bloomfilter_spark.sketches import DDSketch

    n = 20_000
    t = load_transcripts(spark, n)
    src = str(tmp_path / "transcripts")
    t.repartition(3).write.parquet(src)
    ckpt = str(tmp_path / "ckpt")

    # the job takes a file GLOB (checkpoint buckets are file-assigned)
    r = _submit(tmp_path, ["--input", f"{src}/*.parquet",
                           "--checkpoint-dir", ckpt,
                           "--buckets", "3", "--dd-alpha", "0.02"])
    assert r.returncode == 0, r.stdout + r.stderr
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["rows"] == n
    assert summary["buckets_completed"] == 3
    assert summary["buckets_resumed"] == 0
    n_tools = t.where(F.col("tool").isNotNull()) \
               .select("tool").distinct().count()
    assert summary["mg_tool_keys"] == n_tools
    assert summary["dd_tool_keys"] == n_tools
    n_convs = t.select("conv_id").distinct().count()
    assert abs(summary["hll_distinct_convs"] - n_convs) <= 0.05 * n_convs

    # the DDSketch warehouse table answers per-tool p99 within alpha of
    # the exact rank item, straight from the persisted blobs
    tbl, meta = load_sketch_table(spark, f"{ckpt}/dd_tool_turnlen")
    rep = verify_sketch_table(spark, f"{ckpt}/dd_tool_turnlen", strict=True)
    assert rep["corrupt"] == 0 and rep["rows"] == n_tools
    lens = {row["tool"]: row["lens"] for row in
            (t.where(F.col("tool").isNotNull())
              .withColumn("len", F.length("text").cast("double"))
              .groupBy("tool").agg(F.collect_list("len").alias("lens"))
              .collect())}
    for row in tbl.collect():
        sk = DDSketch.from_bytes(bytes(row["sketch"]))
        xs = np.sort(np.array(lens[row["tool"]]))
        exact = xs[int(np.floor(0.99 * (len(xs) - 1)))]
        assert abs(sk.quantile(0.99) - exact) <= 0.02 * exact * (1 + 1e-9)
        assert sk.n == len(xs)

    # rerun over the same checkpoint dir: every bloom bucket resumes
    r2 = _submit(tmp_path, ["--input", f"{src}/*.parquet",
                            "--checkpoint-dir", ckpt,
                            "--buckets", "3", "--dd-alpha", "0.02"])
    assert r2.returncode == 0, r2.stdout + r2.stderr
    summary2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary2["buckets_resumed"] == 3
    assert summary2["buckets_completed"] == 0
    assert summary2["bloom_bits_set"] == summary["bloom_bits_set"]
