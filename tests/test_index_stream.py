"""Streaming file-index maintenance: each micro-batch lands as parquet
and only its own files get indexed; the accumulated index prunes exactly
like a from-scratch rebuild; replayed epochs are no-ops."""

import pandas as pd
from pyspark.sql import functions as F

from bloomfilter_spark.operators.file_index import (build_file_bloom_index,
                                                    prune_files, pruned_read)
from bloomfilter_spark.streaming.index_stream import StreamingFileIndexer


def _mk_source(spark, tmp_path, n_files=3):
    src = str(tmp_path / "src")
    for i in range(n_files):
        spark.range(i * 1000, (i + 1) * 1000).select(
            F.col("id").alias("user_id"),
            F.concat(F.lit("p"), F.col("id")).alias("payload")) \
            .coalesce(1).write.mode("append").parquet(src)
    return src


def test_streaming_index_matches_full_rebuild(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    table = str(tmp_path / "table")
    index = str(tmp_path / "index")
    indexer = StreamingFileIndexer(table, index, ["user_id"], fpr=0.001,
                                   state_path=str(tmp_path / "state.json"))
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = stream.writeStream.foreachBatch(indexer).trigger(availableNow=True).start()
    q.awaitTermination(120)

    assert indexer.files_indexed >= 3          # one file per micro-batch
    assert indexer.rows_indexed == 3000
    assert spark.read.parquet(table).count() == 3000

    idx = spark.read.parquet(index)
    # every data file is covered exactly once
    data_files = {r["file"] for r in
                  spark.read.parquet(table)
                  .select(F.input_file_name().alias("file"))
                  .distinct().collect()}
    idx_files = [r["file"] for r in idx.select("file").collect()]
    assert sorted(idx_files) == sorted(data_files)

    # pruned lookup == full-scan filter, and it skips files
    probe = spark.createDataFrame([(5,), (2500,)], "user_id long")
    got = (pruned_read(spark, table, idx, ["user_id"], probe)
           .join(probe, "user_id").select("user_id", "payload"))
    want = (spark.read.parquet(table)
            .join(probe, "user_id").select("user_id", "payload"))
    assert sorted(got.collect()) == sorted(want.collect())
    assert len(prune_files(idx, ["user_id"], probe)) <= 3


def test_streaming_index_replayed_epoch_is_noop(spark, tmp_path):
    table = str(tmp_path / "t2")
    index = str(tmp_path / "i2")
    state = str(tmp_path / "s2.json")
    batch = spark.range(100).select(F.col("id").alias("user_id"),
                                    F.lit("x").alias("payload"))
    a = StreamingFileIndexer(table, index, ["user_id"], state_path=state)
    a(batch, 0)
    a(batch, 1)
    n_table = spark.read.parquet(table).count()
    n_index = spark.read.parquet(index).count()

    # restart: state restores; replaying epochs 0/1 must change nothing
    b = StreamingFileIndexer(table, index, ["user_id"], state_path=state)
    assert b.last_epoch == 1 and b.files_indexed == a.files_indexed
    b(batch, 0)
    b(batch, 1)
    assert spark.read.parquet(table).count() == n_table
    assert spark.read.parquet(index).count() == n_index
    # a NEW epoch still lands
    b(batch, 2)
    assert spark.read.parquet(table).count() == n_table + 100
    assert spark.read.parquet(index).count() > n_index


def test_streaming_index_sweeps_orphan_files(spark, tmp_path):
    """Files that landed in the table without making it into the index
    (crash between append and state persist) are picked up by the next
    batch's sweep — pruned reads never silently miss table rows."""
    from bloomfilter_spark.operators.file_index import pruned_read
    table = str(tmp_path / "t3")
    index = str(tmp_path / "i3")
    state = str(tmp_path / "s3.json")
    # orphan: rows in the table that no indexer run has seen
    spark.range(500).select(F.col("id").alias("user_id"),
                            F.lit("orphan").alias("payload")) \
        .coalesce(1).write.mode("append").parquet(table)
    ix = StreamingFileIndexer(table, index, ["user_id"], state_path=state)
    batch = spark.range(1000, 1100).select(
        F.col("id").alias("user_id"), F.lit("new").alias("payload"))
    ix(batch, 0)
    idx = spark.read.parquet(index)
    probe = spark.createDataFrame([(42,), (1050,)], "user_id long")
    got = (pruned_read(spark, table, idx, ["user_id"], probe)
           .join(probe, "user_id").count())
    assert got == 2  # both the orphan row and the streamed row are found


def test_streaming_index_refuses_mismatched_params(spark, tmp_path):
    import pytest
    table = str(tmp_path / "t4")
    index = str(tmp_path / "i4")
    state = str(tmp_path / "s4.json")
    batch = spark.range(10).select(F.col("id").alias("user_id"))
    StreamingFileIndexer(table, index, ["user_id"], state_path=state)(batch, 0)
    with pytest.raises(ValueError, match="refusing to resume"):
        StreamingFileIndexer(table, index, ["other_col"], state_path=state)


def test_streaming_index_stateless_restart_bootstraps_from_table(spark, tmp_path):
    """With state_path=None, a restarted indexer must bootstrap its
    indexed set from the index table itself instead of re-indexing every
    existing file and growing the index without bound."""
    table = str(tmp_path / "t5")
    index = str(tmp_path / "i5")
    batch = spark.range(100).select(F.col("id").alias("user_id"),
                                    F.lit("x").alias("payload"))
    a = StreamingFileIndexer(table, index, ["user_id"])
    a(batch, 0)
    n_index = spark.read.parquet(index).count()
    assert n_index >= 1

    # stateless restart: epoch counter resets (no epoch info survives),
    # but the already-indexed files must NOT be re-indexed
    b = StreamingFileIndexer(table, index, ["user_id"])
    b(batch, 0)  # new process's epoch 0 — appends data, indexes only it
    idx = spark.read.parquet(index)
    files = [r["file"] for r in idx.select("file").collect()]
    assert len(files) == len(set(files))  # no duplicate index rows
    assert spark.read.parquet(table).count() == 200
    # the bootstrap recognized every previously indexed file
    assert b.files_indexed == len(files)


def test_streaming_index_with_zone_maps(spark, tmp_path):
    """Zone-map (min/max) upkeep rides the same epoch sweep as the Bloom
    index: both tables cover every data file, a replayed epoch is a no-op
    for both, a crash window that indexed only the Bloom side self-heals
    (the file is re-swept into BOTH; duplicate rows dedup at probe time),
    and a pruned range read equals the full scan."""
    from bloomfilter_spark.operators.file_index import (prune_files_range,
                                                        pruned_read_range)

    src = _mk_source(spark, tmp_path)
    table = str(tmp_path / "tz")
    index = str(tmp_path / "iz")
    minmax = str(tmp_path / "mz")
    state = str(tmp_path / "sz.json")

    def mk():
        return StreamingFileIndexer(table, index, ["user_id"],
                                    state_path=state,
                                    range_cols=["user_id"],
                                    minmax_index_path=minmax)

    indexer = mk()
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = stream.writeStream.foreachBatch(indexer) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)

    data_files = {r["file"] for r in
                  spark.read.parquet(table)
                  .select(F.input_file_name().alias("file"))
                  .distinct().collect()}
    mm = spark.read.parquet(minmax)
    assert {r["file"] for r in mm.select("file").collect()} == data_files

    # range prune: only files overlapping [1000, 1500] survive, read is
    # row-identical to the full-scan filter
    kept = prune_files_range(mm, "user_id", 1000, 1500)
    assert 1 <= len(kept) < len(data_files)
    got = (pruned_read_range(spark, table, mm, "user_id", 1000, 1500)
           .where(F.col("user_id").between(1000, 1500)))
    assert got.count() == 501

    # replayed epoch after restart: no-op for BOTH tables
    n_idx = spark.read.parquet(index).count()
    n_mm = mm.count()
    b = mk()
    b(spark.read.parquet(src).limit(1), 0)
    assert spark.read.parquet(index).count() == n_idx
    assert spark.read.parquet(minmax).count() == n_mm

    # crash window: a data file present in the bloom index but NOT the
    # zone maps (simulated by deleting the minmax table) is re-swept
    # into both on a stateless restart
    import shutil
    shutil.rmtree(minmax)
    c = StreamingFileIndexer(table, index, ["user_id"],
                             range_cols=["user_id"],
                             minmax_index_path=minmax)
    c(spark.range(3000, 3100).select(F.col("id").alias("user_id"),
                                     F.lit("y").alias("payload")), 0)
    mm2 = spark.read.parquet(minmax)
    data_files2 = {r["file"] for r in
                   spark.read.parquet(table)
                   .select(F.input_file_name().alias("file"))
                   .distinct().collect()}
    assert {r["file"] for r in mm2.select("file").collect()} == data_files2
    # bloom table now holds duplicate rows for the re-swept files;
    # prune_files dedups, so pruning still returns each file once
    probe = spark.createDataFrame([(5,)], "user_id long")
    idx2 = spark.read.parquet(index)
    assert len(prune_files(idx2, ["user_id"], probe)) == \
        len(set(prune_files(idx2, ["user_id"], probe)))


def test_streaming_index_zone_map_param_validation(tmp_path):
    import pytest
    with pytest.raises(ValueError, match="go together"):
        StreamingFileIndexer(str(tmp_path / "t"), str(tmp_path / "i"),
                             ["user_id"], range_cols=["user_id"])
