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


def _curate_stages(df, cap=2):
    """The job's stages 2-6 (quality -> repetition -> lang -> line dedup
    -> fingerprint cap) as one in-process composition — the same operator
    calls curate_corpus_job.py makes, without its SparkSession lifecycle."""
    from pyspark.sql import functions as F
    from bloomfilter_spark.functions.text import (lang_id,
                                                  normalized_fingerprint,
                                                  quality_score,
                                                  repetition_ratios)
    from bloomfilter_spark.operators.dedup import dedup_lines, keep_first_n
    kept = df.where(quality_score("text") >= 0.0)
    reps = repetition_ratios(kept, "doc_id", "text", n=2)
    kept = kept.join(reps.where(F.col("dup_ngram_frac") <= 0.999)
                         .select("doc_id"), "doc_id", "left_semi")
    kept = kept.withColumn("lang", lang_id("text"))
    kept = dedup_lines(kept, "doc_id", "text", max_occurrences=cap) \
        .where(F.col("text") != "")
    kept = keep_first_n(
        kept.withColumn("__fp", normalized_fingerprint("text")),
        ["__fp"], cap, ["doc_id"]).drop("__fp")
    return kept


def test_curate_pipeline_skew_within_2x_of_uniform(spark, tmp_path):
    """Skew hardening (VERDICT r2 #10): a corpus where ONE boilerplate
    line and ONE hot fingerprint each carry ~30% of all mass must curate
    within ~2x the wall-clock of a uniform corpus of EQUAL rows — the
    hot line can no longer serialize into a single task now that
    dedup_lines partial-aggregates map-side. Interleaved min-of-3 reps
    (this host's steal-time bursts make single-shot ratios meaningless)."""
    import time
    from pyspark.sql import functions as F
    n = 30_000
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique line "), F.col("id"), F.lit("\nbody text "),
                 F.col("id"), F.lit(" tail")).alias("text"))
    # 30% of docs share one boilerplate line; a (disjoint) 30% share one
    # exact fingerprint (identical text)
    skewed = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 3,
               F.concat(F.lit("COOKIE BANNER boilerplate\nreal content "),
                        F.col("id")))
         .when(F.col("id") % 10 < 6, F.lit("hot duplicate document body"))
         .otherwise(F.concat(F.lit("unique line "), F.col("id"),
                             F.lit("\nbody text "), F.col("id"))).alias("text"))
    up = str(tmp_path / "uniform"); sp = str(tmp_path / "skewed")
    base.coalesce(8).write.parquet(up)
    skewed.coalesce(8).write.parquet(sp)
    u = spark.read.parquet(up)
    s = spark.read.parquet(sp)
    t_u, t_s = [], []
    for _ in range(3):  # interleave arms
        t0 = time.time(); _curate_stages(u).count(); t_u.append(time.time() - t0)
        t0 = time.time(); _curate_stages(s).count(); t_s.append(time.time() - t0)
    assert min(t_s) <= 2.0 * min(t_u) + 1.0, (t_u, t_s)
