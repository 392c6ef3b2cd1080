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
