"""Spark-native session windows (operators/interval.session_window_agg):
strict-gap boundary semantics, batch/streaming parity."""

from pyspark.sql import functions as F

from bloomfilter_spark.operators.interval import session_window_agg


def _mk(spark, rows):
    return spark.createDataFrame(rows, "user string, sec long").select(
        "user", F.timestamp_seconds("sec").alias("ts"))


def test_session_window_gap_boundary(spark):
    # gap=100s: an event at exactly prev+100 lands ON the window end and
    # EXTENDS the session (merge when diff <= gap, same rule as
    # sessionize's `> gap` new-session test); 101 s later opens a new one
    df = _mk(spark, [("a", 0), ("a", 50), ("a", 150), ("a", 251),
                     ("b", 0), (None, 5)])
    out = session_window_agg(df, "user", "ts", "100 seconds",
                             F.count("*").alias("n"))
    got = sorted((r["user"], r["session_window"]["start"].second
                  + r["session_window"]["start"].minute * 60,
                  r["n"]) for r in out.collect())
    assert got == [("a", 0, 3), ("a", 251, 1), ("b", 0, 1)]


def test_session_window_streaming_equals_batch(spark, tmp_path):
    import random
    rows = [(f"u{i % 7}", random.Random(i).randrange(0, 3600))
            for i in range(500)]
    df = _mk(spark, rows)
    src = str(tmp_path / "src")
    df.write.parquet(src)

    want = sorted(
        (r["user"], r["session_window"]["start"], r["session_window"]["end"],
         r["n"]) for r in
        session_window_agg(spark.read.parquet(src), "user", "ts",
                           "5 minutes", F.count("*").alias("n")).collect())

    stream = spark.readStream.schema("user string, ts timestamp") \
                  .parquet(src).withWatermark("ts", "10 seconds")
    out = session_window_agg(stream, "user", "ts", "5 minutes",
                             F.count("*").alias("n"))
    # session windows reject update mode (STREAMING_OUTPUT_MODE error);
    # complete re-emits every merged session, which is exactly the batch
    # result for a finite source
    q = (out.writeStream.outputMode("complete").format("memory")
            .queryName("sess_par").trigger(availableNow=True).start())
    q.awaitTermination()
    got = sorted(
        (r["user"], r["session_window"]["start"], r["session_window"]["end"],
         r["n"]) for r in spark.sql("SELECT * FROM sess_par").collect())
    assert got == want and len(want) > 0


def test_session_window_watermarked_multi_epoch_replay(spark, tmp_path):
    """Incremental-state semantics across epochs (separate start()s
    sharing one checkpoint, append mode): a session is emitted exactly
    when the checkpoint-restored watermark passes its end, a late row
    WITHIN the watermark merges into still-open session state, and a row
    BEYOND the watermark is dropped — it can neither resurrect an
    emitted session nor change its count."""
    src = str(tmp_path / "replay_src")
    cp = str(tmp_path / "replay_cp")
    sink = str(tmp_path / "replay_sink")

    def write(rows):
        _mk(spark, rows).write.mode("append").parquet(src)

    def run():
        # file sink: the append-mode sink that supports checkpoint
        # RECOVERY (memory sink refuses to restart from a checkpoint),
        # so each run() is a genuine restart of the same logical query
        stream = (spark.readStream.schema("user string, ts timestamp")
                       .parquet(src).withWatermark("ts", "50 seconds"))
        out = session_window_agg(stream, "user", "ts", "100 seconds",
                                 F.count("*").alias("n"))
        q = (out.select("user", "session_window.start", "session_window.end",
                        "n")
                .writeStream.outputMode("append").format("parquet")
                .option("path", sink).option("checkpointLocation", cp)
                .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return sorted((r["user"], int(r["start"].timestamp()),
                       int(r["end"].timestamp()), r["n"])
                      for r in spark.read.parquet(sink).collect())

    # epoch 1: session a=[0,150) + a watermark-driver event at 1000.
    # availableNow runs a finalize batch after the data batch, so the
    # watermark (1000 - 50 = 950) already flushes a's session here.
    write([("a", 0), ("a", 50), ("mark", 1000)])
    assert run() == [("a", 0, 150, 2)]

    # epoch 2 (fresh start(), checkpoint-restored watermark 950): the
    # late ("a", 120) row is BEYOND the watermark -> dropped — it neither
    # resurrects a's emitted session nor re-emits it (n stayed 2);
    # ("mark", 1040) is WITHIN -> merges mark's still-open session to
    # [1000, 1140); ("b", 2000) then drives the watermark to 1950, which
    # flushes the MERGED mark session in this epoch's finalize batch
    write([("a", 120), ("mark", 1040), ("b", 2000)])
    assert run() == [("a", 0, 150, 2), ("mark", 1000, 1140, 2)]

    # epoch 3: watermark 4950 -> b emits, c (end 5100) stays open
    write([("c", 5000)])
    assert run() == [("a", 0, 150, 2), ("b", 2000, 2100, 1),
                     ("mark", 1000, 1140, 2)]

    # epoch 4: watermark 8950 -> c emits
    write([("d", 9000)])
    assert run() == [("a", 0, 150, 2), ("b", 2000, 2100, 1),
                     ("c", 5000, 5100, 1), ("mark", 1000, 1140, 2)]
