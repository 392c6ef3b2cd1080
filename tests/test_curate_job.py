"""End-to-end spark-submit smoke test for jobs/curate_corpus_job.py —
the composed curation pipeline (quality -> lang -> dedup cap ->
decontaminate -> mix) through the real deployment entry point."""

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_curate_corpus_job_spark_submit(tmp_path, spark, documents):
    out = str(tmp_path / "curated")
    # reference = the doc_id%5==0 slice: those docs are full copies of the
    # reference and must be dropped; everything else shares no 8-gram
    ref_path = str(tmp_path / "reference")
    documents.where("doc_id % 5 = 0").select("doc_id", "text") \
             .write.parquet(ref_path)
    env = dict(os.environ,
               PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    proc = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", _zip(tmp_path),
         os.path.join(ROOT, "jobs", "curate_corpus_job.py"),
         "--input", f"{SF}/documents.parquet",
         "--output", out,
         "--reference", ref_path,
         "--contamination-threshold", "0.5",
         "--min-quality", "0.0",
         "--redact-pii",
         "--max-dup-ngram-frac", "0.99",
         "--line-dedup-cap", "100000",
         "--mix", "source=src0:1.0,src1:0.5"],
        capture_output=True, text=True, timeout=600, env=env, cwd=ROOT)
    assert proc.returncode == 0, proc.stderr[-4000:]

    # metrics line on stdout, monotone non-increasing stage counts
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith('{"stages"')]
    assert line, proc.stdout[-2000:]
    stages = json.loads(line[-1])["stages"]
    assert stages["input"] >= stages["quality"] >= stages["repetition"] \
        >= stages["line_dedup"] >= stages["dedup_cap"] \
        >= stages["decontaminated"] >= stages["mixed"]
    # the reference slice's own copies are contaminated and dropped
    assert stages["decontaminated"] < stages["dedup_cap"]

    # curated corpus exists and respects the mixture (only src0/src1 remain,
    # since absent strata default to fraction 0)
    corpus = spark.read.parquet(f"{out}/corpus")
    assert corpus.count() > 0
    srcs = {r["source"] for r in corpus.select("source").distinct().collect()}
    assert srcs <= {"src0", "src1"}


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
