"""End-to-end spark-submit tests for jobs/rollup_sketches_job.py — the
fsck-gated coarser-key rollup over warehoused sketch tables.

Pins the three operational promises: (1) rolling up N compatible input
tables with a derived calendar-style key produces sketches BYTE-EQUAL to
a direct build at the coarse key over the full input (mergeability is
lossless, so rollups never rescan the corpus); (2) the output is
published through the versioned commit protocol; (3) a corrupt blob in
any input fails the job up front via the fsck gate."""

import glob
import json
import os
import shutil
import subprocess
import sys

import pytest

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
         os.path.join(ROOT, "jobs", "rollup_sketches_job.py"), *job_args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=ROOT)


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_rollup_job_multi_table_derived_key(tmp_path, spark):
    from pyspark.sql import functions as F
    from bloomfilter_spark.agg import grouped_sketch_table
    from bloomfilter_spark.sketches import HyperLogLog
    from bloomfilter_spark.warehouse import (load_sketch_table,
                                             save_sketch_table)

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    factory = lambda: HyperLogLog(12)  # noqa: E731

    # two "daily-build" halves of the corpus, fine key (flag, status)
    fine_keys = ["l_returnflag", "l_linestatus"]
    tables = []
    for i, half in enumerate((li.where("l_orderkey % 2 = 0"),
                              li.where("l_orderkey % 2 = 1"))):
        fine = grouped_sketch_table(half, fine_keys, ["l_orderkey"], factory)
        p = str(tmp_path / f"fine_{i}")
        save_sketch_table(fine, p, keys=fine_keys, factory=factory)
        tables.append(p)

    out = str(tmp_path / "coarse")
    derive = "pair=concat(l_returnflag, '_', l_linestatus)"
    proc = _submit(tmp_path, [
        "--table", tables[0], "--table", tables[1],
        "--output", out,
        "--derive", derive,
        "--group-by", "pair"])
    assert proc.returncode == 0, proc.stderr[-4000:]

    # metrics line: fsck'd input rows, committed version, output keys
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith('{"elapsed_sec"')]
    assert line, proc.stdout[-2000:]
    metrics = json.loads(line[-1])
    assert metrics["input_tables"] == 2
    assert metrics["group_by"] == ["pair"]
    assert metrics["committed_version"].startswith(out)

    # versioned commit protocol on disk
    assert glob.glob(f"{out}/v_*/_COMMITTED")

    # rolled-up sketches are byte-equal to a direct coarse build over the
    # FULL corpus: the rollup lost nothing and rescanned nothing
    rolled, meta = load_sketch_table(spark, out)
    assert meta["keys"] == ["pair"]
    direct = grouped_sketch_table(
        li.withColumn("pair", F.expr(derive.split("=", 1)[1])),
        ["pair"], ["l_orderkey"], factory)
    got = {r["pair"]: bytes(r["sketch"]) for r in rolled.collect()}
    want = {r["pair"]: bytes(r["sketch"]) for r in direct.collect()}
    assert got == want
    assert metrics["output_keys"] == len(want)


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_rollup_job_fsck_gate_rejects_corrupt_input(tmp_path, spark):
    from bloomfilter_spark.agg import grouped_sketch_table
    from bloomfilter_spark.sketches import HyperLogLog
    from bloomfilter_spark.warehouse import save_sketch_table

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    factory = lambda: HyperLogLog(10)  # noqa: E731
    fine = grouped_sketch_table(li, ["l_returnflag"], ["l_orderkey"], factory)
    p = str(tmp_path / "fine")
    save_sketch_table(fine, p, keys=["l_returnflag"], factory=factory)

    # flip one byte inside a stored blob's body
    import pyarrow as pa
    import pyarrow.parquet as pq
    f = sorted(glob.glob(f"{p}/data/*.parquet"))[0]
    t = pq.read_table(f)
    col = t.column("sketch").to_pylist()
    b = bytearray(col[0])
    b[len(b) // 2] ^= 0xFF
    col[0] = bytes(b)
    arrs = [t.column(c) if c != "sketch" else pa.array(col, type=pa.binary())
            for c in t.column_names]
    pq.write_table(pa.table(dict(zip(t.column_names, arrs))), f)
    for crc in glob.glob(f"{p}/data/.*.crc"):
        os.remove(crc)  # hadoop sidecar now stale; the sketch CRC is the gate

    proc = _submit(tmp_path, [
        "--table", p, "--output", str(tmp_path / "coarse"),
        "--group-by", "l_returnflag"])
    assert proc.returncode != 0
    # spark-submit routes the python app's traceback to STDOUT
    blame = proc.stdout + proc.stderr
    assert "integrity" in blame or "CRC32" in blame
    # nothing was committed
    assert not glob.glob(str(tmp_path / "coarse" / "v_*" / "_COMMITTED"))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_rollup_job_fold_to_merges_mixed_geometries(tmp_path, spark):
    """Geometry-migration rollup: one table built at HLL p=14 (post-
    migration) and one at p=12 (legacy) refuse a plain rollup but merge
    under --fold-to 12, and the result is BYTE-EQUAL to a direct p=12
    build over the full corpus — the fold is exact, so a migrated
    warehouse loses nothing vs rebuilding the old tables."""
    from bloomfilter_spark.agg import grouped_sketch_table
    from bloomfilter_spark.sketches import HyperLogLog
    from bloomfilter_spark.warehouse import load_sketch_table, save_sketch_table

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    halves = (li.where("l_orderkey % 2 = 0"), li.where("l_orderkey % 2 = 1"))
    tables = []
    for i, (half, p_bits) in enumerate(zip(halves, (14, 12))):
        fac = lambda pb=p_bits: HyperLogLog(pb)  # noqa: E731
        fine = grouped_sketch_table(half, ["l_returnflag"], ["l_orderkey"], fac)
        path = str(tmp_path / f"geom_{i}")
        save_sketch_table(fine, path, keys=["l_returnflag"], factory=fac)
        tables.append(path)

    # without --fold-to: incompatible, and the error teaches the fix
    out_plain = str(tmp_path / "coarse_plain")
    proc = _submit(tmp_path, [
        "--table", tables[0], "--table", tables[1],
        "--output", out_plain, "--group-by", "l_returnflag", "--no-fsck"])
    assert proc.returncode != 0
    assert "--fold-to" in (proc.stdout + proc.stderr)

    out = str(tmp_path / "coarse_folded")
    proc = _submit(tmp_path, [
        "--table", tables[0], "--table", tables[1],
        "--output", out, "--group-by", "l_returnflag", "--fold-to", "12"])
    assert proc.returncode == 0, proc.stderr[-4000:]

    rolled, meta = load_sketch_table(spark, out)
    direct = grouped_sketch_table(li, ["l_returnflag"], ["l_orderkey"],
                                  lambda: HyperLogLog(12))
    got = {r["l_returnflag"]: bytes(r["sketch"]) for r in rolled.collect()}
    want = {r["l_returnflag"]: bytes(r["sketch"]) for r in direct.collect()}
    assert got == want
    # the published meta records the FOLDED geometry
    assert HyperLogLog.from_bytes(
        bytes(next(iter(got.values())))).p == 12

    # folding UP fails loudly instead of pretending precision exists
    proc = _submit(tmp_path, [
        "--table", tables[0], "--table", tables[1],
        "--output", str(tmp_path / "coarse_up"),
        "--group-by", "l_returnflag", "--fold-to", "16", "--no-fsck"])
    assert proc.returncode != 0
    assert "fold target" in (proc.stdout + proc.stderr)
