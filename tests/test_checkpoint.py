"""Checkpoint/resume: interrupted builds resume without re-scanning
completed buckets and produce a byte-identical final sketch (SURVEY.md §5
item 5; north rule)."""

import os

import pytest

from bloomfilter_spark.agg import build_sketch
from bloomfilter_spark.checkpoint import (checkpointed_build, read_lineage,
                                          _partial_path)
from bloomfilter_spark.sketches import BloomFilter, HyperLogLog
from bloomfilter_spark.sources.transcripts import load_transcripts


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt_corpus"))
    df = load_transcripts(spark, 20000, root=root, partitions=8)
    path = os.path.join(root, "transcripts_20000_s42.parquet")
    return df, os.path.join(path, "*.parquet")


def test_checkpointed_equals_oneshot(spark, corpus, tmp_path):
    df, pattern = corpus
    ck = str(tmp_path / "ck1")
    final, report = checkpointed_build(
        spark, pattern, ["conv_id", "text"], lambda: BloomFilter(1 << 16, 5),
        checkpoint_dir=ck, n_buckets=4)
    oneshot = build_sketch(df, ["conv_id", "text"], lambda: BloomFilter(1 << 16, 5))
    assert final.to_bytes() == oneshot.to_bytes()
    assert report.completed == 4 and report.skipped == 0
    lineage = read_lineage(ck)
    assert len(lineage) == 4
    assert sum(e["rows"] for e in lineage) == df.count()
    assert all(e["sketch"] == "BloomFilter" and e["files"] for e in lineage)


def test_resume_skips_completed_buckets(spark, corpus, tmp_path):
    df, pattern = corpus
    ck = str(tmp_path / "ck2")
    full, _ = checkpointed_build(
        spark, pattern, ["conv_id"], lambda: HyperLogLog(12),
        checkpoint_dir=ck, n_buckets=4)
    # simulate a crash after 2 of 4 buckets: delete two partials
    for i in (2, 3):
        os.remove(_partial_path(ck, i))
    resumed, report = checkpointed_build(
        spark, pattern, ["conv_id"], lambda: HyperLogLog(12),
        checkpoint_dir=ck, n_buckets=4)
    assert report.skipped == 2 and report.completed == 2
    assert resumed.to_bytes() == full.to_bytes()
    # lineage now has the original 4 + the 2 re-done buckets
    assert len(read_lineage(ck)) == 6


def test_checkpointed_sharded_build_resume_and_parity(spark, corpus, tmp_path):
    """The DISTRIBUTED filter's resume story: per-bucket shard tables
    persist as parquet; a resumed build skips completed buckets; the
    merged table is byte-identical per shard to a one-shot sharded build
    (OR commutes) and preserves zero false negatives."""
    import shutil

    from pyspark.sql import functions as F

    from bloomfilter_spark.checkpoint import checkpointed_sharded_build
    from bloomfilter_spark.operators.sharded import (build_sharded_bloom,
                                                     sharded_membership)

    df, pattern = corpus
    n = df.count()
    ck = str(tmp_path / "ck_sharded")
    tbl, report = checkpointed_sharded_build(
        spark, pattern, ["conv_id", "text"], capacity=n,
        checkpoint_dir=ck, fpr=0.01, n_shards=8, n_buckets=4)
    assert report.completed == 4 and report.skipped == 0
    oneshot = {r["shard"]: bytes(r["sketch"]) for r in
               build_sharded_bloom(df, ["conv_id", "text"], capacity=n,
                                   fpr=0.01, n_shards=8).collect()}
    merged = {r["shard"]: bytes(r["sketch"]) for r in tbl.collect()}
    assert merged == oneshot
    # crash after 3 of 4 buckets -> resume redoes exactly one
    shutil.rmtree(os.path.join(ck, "shards", "bucket-0002"))
    tbl2, report2 = checkpointed_sharded_build(
        spark, pattern, ["conv_id", "text"], capacity=n,
        checkpoint_dir=ck, fpr=0.01, n_shards=8, n_buckets=4)
    assert report2.skipped == 3 and report2.completed == 1
    mem = sharded_membership(df, tbl2, ["conv_id", "text"])
    assert mem.where(~F.col("is_member")).count() == 0
    lineage = [e for e in read_lineage(ck) if e["sketch"] == "ShardedBloom"]
    assert len(lineage) == 5 and all(e["rows"] > 0 for e in lineage)


def test_resume_noop_when_complete(spark, corpus, tmp_path):
    df, pattern = corpus
    ck = str(tmp_path / "ck3")
    first, _ = checkpointed_build(
        spark, pattern, ["conv_id"], lambda: BloomFilter(1 << 14, 4),
        checkpoint_dir=ck, n_buckets=3)
    again, report = checkpointed_build(
        spark, pattern, ["conv_id"], lambda: BloomFilter(1 << 14, 4),
        checkpoint_dir=ck, n_buckets=3)
    assert report.skipped == 3 and report.completed == 0
    assert again.to_bytes() == first.to_bytes()
