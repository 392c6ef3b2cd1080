"""End-to-end spark-submit test for jobs/stream_sketches_job.py — the
streaming deployment entry point: incremental AvailableNow runs over a
growing transcript directory, per-tool CMS state restored from Spark's
state store across job RESTARTS (byte-exact vs a batch build over the
full history), warehouse snapshot completeness for keys not touched in
the second run, and epoch-replay-safe HLL accumulation."""

import json
import os
import shutil
import subprocess
import sys
import zipfile
from datetime import datetime

import pytest
from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip(tmp_path) -> str:
    zpath = str(tmp_path / "bloomfilter_spark.zip")
    pkg = os.path.join(ROOT, "bloomfilter_spark")
    with zipfile.ZipFile(zpath, "w") as zf:
        for dirpath, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, ROOT))
    return zpath


def _rows(batch: int, tools):
    ts = datetime(2026, 1, 1, 12, 0, 0)
    return [(f"c{batch}_{i}", j, "assistant", f"text {batch} {i} {j}",
             tools[(i + j) % len(tools)], ts)
            for i in range(40) for j in range(3)]


def _run(tmp_path, in_dir, ckpt):
    env = dict(os.environ,
               PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    proc = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", _zip(tmp_path),
         os.path.join(ROOT, "jobs", "stream_sketches_job.py"),
         "--input-dir", in_dir, "--checkpoint-dir", ckpt,
         "--cms-eps", "1e-3", "--cms-delta", "1e-3"],
        capture_output=True, text=True, timeout=600, env=env, cwd=ROOT)
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith('{"elapsed_sec"')]
    assert line, proc.stdout[-2000:]
    return json.loads(line[-1])


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_stream_sketches_job_incremental_restart(tmp_path, spark):
    from bloomfilter_spark.jvm_build import cms_build_jvm
    from bloomfilter_spark.sketches import CountMinSketch
    from bloomfilter_spark.sources.transcripts import TRANSCRIPT_SCHEMA
    from bloomfilter_spark.warehouse import load_sketch_table

    in_dir = str(tmp_path / "stream_in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    # run 1: file A only; 'grep' appears ONLY in this batch
    a = spark.createDataFrame(_rows(0, ["search", "grep"]), TRANSCRIPT_SCHEMA)
    a.coalesce(1).write.mode("append").parquet(in_dir)
    m1 = _run(tmp_path, in_dir, ckpt)
    assert m1["tools_in_snapshot"] == 2
    assert m1["cms_total_turns"] == 120

    # run 2 (RESTART): file B adds different tools; 'grep' is untouched
    b = spark.createDataFrame(_rows(1, ["search", "browse"]),
                              TRANSCRIPT_SCHEMA)
    b.coalesce(1).write.mode("append").parquet(in_dir)
    m2 = _run(tmp_path, in_dir, ckpt)
    assert m2["cms_total_turns"] == 240  # run 2 state folded on top of run 1
    assert m2["tools_in_snapshot"] == 3  # 'grep' survived via the bootstrap
    assert m2["hll_epochs_folded"] > m1["hll_epochs_folded"]

    # distinct convs over the FULL history (80 convs across both files)
    assert abs(m2["hll_distinct_convs"] - 80) / 80 < 0.05

    # per-tool snapshot blobs == batch builds over the full history,
    # byte for byte — the state store genuinely resumed across restarts
    hist = spark.read.parquet(in_dir)
    tbl, _meta = load_sketch_table(
        spark, f"{ckpt}/cms_tool_convs",
        expected_factory=lambda: CountMinSketch(eps=1e-3, delta=1e-3))
    blobs = {r["tool"]: bytes(r["sketch"]) for r in tbl.collect()}
    assert set(blobs) == {"search", "grep", "browse"}
    for tool in blobs:
        batch = cms_build_jvm(hist.where(F.col("tool") == tool),
                              ["conv_id"], eps=1e-3, delta=1e-3)
        assert blobs[tool] == batch.to_bytes(), tool
