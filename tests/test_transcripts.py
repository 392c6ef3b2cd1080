"""Transcript-corpus invariants (FIXTURES.md §1, BASELINE.json input_hint):
primary-key density, skew shape, duplicate injection rate, timestamp
monotonicity, and the per-row text-equality invariant under stable
(conv_id, turn_idx) ordering across materializations."""

import pytest
from pyspark.sql import Window, functions as F

from bloomfilter_spark.operators.quantiles import grouped_quantiles
from bloomfilter_spark.sources.transcripts import load_transcripts

N = 30000


@pytest.fixture(scope="module")
def transcripts(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tr"))
    return load_transcripts(spark, N, root=root, partitions=8).persist()


def test_schema_matches_input_hint(transcripts):
    want = {"conv_id": "string", "turn_idx": "int", "role": "string",
            "text": "string", "tool": "string", "ts": "timestamp"}
    got = dict(transcripts.dtypes)
    assert got == want


def test_primary_key_unique_and_dense(transcripts):
    n = transcripts.count()
    assert n == N
    assert transcripts.select("conv_id", "turn_idx").distinct().count() == n
    # dense 0..len-1 per conversation: max(turn_idx) == count-1
    bad = (transcripts.groupBy("conv_id")
           .agg(F.max("turn_idx").alias("mx"), F.count("*").alias("cnt"))
           .where(F.col("mx") != F.col("cnt") - 1).count())
    assert bad == 0


def test_conv_skew_is_zipfian(transcripts):
    """A few hot conversations dominate (exercises salting): top conv must
    hold >1% of all turns while the median conv is tiny."""
    sizes = (transcripts.groupBy("conv_id").count()
             .orderBy(F.desc("count")).limit(1).collect())
    assert sizes[0]["count"] > N * 0.01


def test_duplicate_injection_rate(transcripts):
    n = transcripts.count()
    dups = n - transcripts.select("text").distinct().count()
    assert 0.01 < dups / n < 0.04  # ~2% injected


def test_ts_monotone_within_conversation(transcripts):
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    bad = (transcripts
           .withColumn("prev_ts", F.lag("ts").over(w))
           .where(F.col("prev_ts").isNotNull() & (F.col("ts") <= F.col("prev_ts")))
           .count())
    assert bad == 0


def test_tool_only_on_tool_turns(transcripts):
    assert transcripts.where((F.col("role") != "tool")
                             & F.col("tool").isNotNull()).count() == 0
    assert transcripts.where((F.col("role") == "tool")
                             & F.col("tool").isNull()).count() == 0


def test_per_row_text_equality_invariant(spark, transcripts, tmp_path):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering between the source and any materialized /
    repartitioned view."""
    out = str(tmp_path / "materialized")
    (transcripts.repartition(13, "conv_id")
                .write.mode("overwrite").parquet(out))
    back = spark.read.parquet(out)
    mismatches = (transcripts.alias("s")
                  .join(back.alias("m"), ["conv_id", "turn_idx"], "full")
                  .where((F.col("s.text") != F.col("m.text"))
                         | F.col("s.text").isNull() | F.col("m.text").isNull())
                  .count())
    assert mismatches == 0


def test_generation_deterministic(spark, tmp_path_factory):
    from bloomfilter_spark.sources.transcripts import generate_pandas
    a = generate_pandas(5000)
    b = generate_pandas(5000)
    assert a.equals(b)


def test_generation_conv_budget_param():
    """The distributed generator splits the GLOBAL conv budget across
    chunks via the n_convs override, so a 10M-turn corpus keeps ~10k convs
    instead of n_chunks x 10k."""
    from bloomfilter_spark.sources.transcripts import (_default_n_convs,
                                                       generate_pandas)
    assert _default_n_convs(10_000_000) == 10_000
    pdf = generate_pandas(20_000, n_convs=50)
    assert pdf["conv_id"].nunique() <= 50
    # and the default is unchanged
    assert generate_pandas(20_000)["conv_id"].nunique() > 1_000


def test_grouped_quantiles_on_transcripts(spark, transcripts):
    """Per-role text-length quantiles via the salted grouped sketch path vs
    exact percentiles."""
    df = transcripts.select("role", F.length("text").alias("len"))
    got = grouped_quantiles(df, ["role"], "len", [0.5, 0.9], method="kll",
                            salt=4)
    est = {r["role"]: (r["q50"], r["q90"]) for r in got.collect()}
    exact = {r["role"]: r["p"] for r in
             df.groupBy("role").agg(F.expr(
                 "percentile(len, array(0.5, 0.9))").alias("p")).collect()}
    import bisect
    for role, (e50, e90) in est.items():
        lens = sorted(r["len"] for r in
                      df.where(F.col("role") == role).collect())
        n = len(lens)
        for q, est_v in ((0.5, e50), (0.9, e90)):
            # lengths are heavily tied, so a value covers a rank *interval*;
            # the estimate is correct if q falls in that span (+/- eps)
            lo = bisect.bisect_left(lens, est_v) / n
            hi = bisect.bisect_right(lens, est_v) / n
            assert lo - 0.05 <= q <= hi + 0.05, (role, q, est_v, lo, hi)
    assert set(est) == set(exact)


def test_read_transcripts_jsonl_csv_parity(spark, tmp_path):
    """The same corpus read back from jsonl and csv equals the parquet
    rows exactly (schema imposed, not inferred: turn_idx stays int32, ts
    stays timestamp), and FAILFAST raises on a malformed row instead of
    silently nulling it."""
    import pytest
    from pyspark.sql import functions as F

    from bloomfilter_spark.sources.transcripts import (TRANSCRIPT_SCHEMA,
                                                       generate_pandas,
                                                       read_transcripts)

    pdf = generate_pandas(500)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    base = spark.createDataFrame(pdf)
    pq = str(tmp_path / "t.parquet")
    base.write.parquet(pq)

    jl = str(tmp_path / "t.jsonl")
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    (base.withColumn("ts", F.date_format("ts", ts_fmt))
         .write.json(jl))
    cv = str(tmp_path / "t.csv")
    (base.withColumn("ts", F.date_format("ts", ts_fmt))
         .write.option("header", "true").csv(cv))
    oc = str(tmp_path / "t.orc")
    base.withColumn("turn_idx", F.col("turn_idx").cast("int")) \
        .write.orc(oc)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    want = rows(read_transcripts(spark, pq))
    got_o = read_transcripts(spark, oc, format="orc")
    assert [f.dataType.simpleString() for f in got_o.schema.fields] == \
        ["string", "int", "string", "string", "string", "timestamp"]
    assert rows(got_o) == want
    got_j = read_transcripts(spark, jl, format="jsonl",
                             timestampFormat=ts_fmt)
    got_c = read_transcripts(spark, cv, format="csv", header=True,
                             timestampFormat=ts_fmt)
    assert [f.name for f in got_j.schema.fields] == \
        [f.split()[0] for f in TRANSCRIPT_SCHEMA.split(", ")]
    assert [f.dataType.simpleString() for f in got_j.schema.fields] == \
        ["string", "int", "string", "string", "string", "timestamp"]
    assert rows(got_j) == want
    assert rows(got_c) == want

    bad = str(tmp_path / "bad.jsonl")
    with open(f"{bad}", "w") as fh:
        fh.write('{"conv_id": "c1", "turn_idx": "NOT_AN_INT", '
                 '"role": "user", "text": "x", "tool": null, '
                 '"ts": "2024-01-01T00:00:00.000000Z"}\n')
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        read_transcripts(spark, bad, format="jsonl",
                         timestampFormat=ts_fmt).collect()

    with pytest.raises(ValueError, match="unsupported transcript format"):
        read_transcripts(spark, pq, format="xml")


def test_read_transcripts_parquet_schema_imposed(spark, tmp_path):
    """The parquet branch enforces TRANSCRIPT_SCHEMA too: a drifted corpus
    (turn_idx stored as long) fails loudly at read instead of flowing
    through; extra columns are pruned to the exact contract schema."""
    from bloomfilter_spark.sources.transcripts import read_transcripts
    drifted = str(tmp_path / "drifted.parquet")
    spark.createDataFrame(
        [("c1", 2**40, "user", "x", None, "2024-01-01 00:00:00")],
        "conv_id string, turn_idx long, role string, text string, "
        "tool string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp")) \
        .write.parquet(drifted)
    with pytest.raises(Exception,
                       match="(?i)parquet|convert|schema|cast"):
        read_transcripts(spark, drifted).collect()

    extra = str(tmp_path / "extra.parquet")
    spark.createDataFrame(
        [("c1", 0, "user", "x", None, "2024-01-01 00:00:00", 7)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string, junk int") \
        .withColumn("ts", F.col("ts").cast("timestamp")) \
        .write.parquet(extra)
    got = read_transcripts(spark, extra)
    assert [f.dataType.simpleString() for f in got.schema.fields] == \
        ["string", "int", "string", "string", "string", "timestamp"]
    assert got.count() == 1 and "junk" not in got.columns


def test_read_transcripts_avro(spark, tmp_path):
    """Avro ingestion under the same imposed schema. Env-gated: when a
    deployment lacks the spark-avro connector the branch raises a clear
    RuntimeError naming the artifact; with it (this Spark build bundles
    it) the corpus round-trips with exact types (avro stores timestamps
    as micros — read back as timestamp, turn_idx stays int)."""
    import pytest
    from bloomfilter_spark.sources.transcripts import (generate_pandas,
                                                       read_transcripts)
    pdf = generate_pandas(300)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    base = spark.createDataFrame(pdf)
    av = str(tmp_path / "t.avro")
    try:
        base.write.format("avro").save(av)
    except Exception:  # connector not deployable: assert the clear error
        with pytest.raises(RuntimeError, match="spark-avro"):
            read_transcripts(spark, str(tmp_path / "x.avro"), format="avro")
        return
    got = read_transcripts(spark, av, format="avro")
    assert [f.dataType.simpleString() for f in got.schema.fields] == \
        ["string", "int", "string", "string", "string", "timestamp"]
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, base.collect()))
