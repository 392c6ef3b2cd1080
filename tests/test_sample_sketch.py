"""Bottom-k sample sketch (sketches/sample.py + the JVM-reduced builds +
SQL/streaming/warehouse surfaces): a mergeable uniform sample of distinct
keys with example payloads.

The family is DETERMINISTIC (bottom-k by keyed hash, payload ties broken
by smallest bytes), so unlike classic reservoir sampling every test here
is byte-exact: builds are invariant to partitioning and arrival order,
merge is associative/commutative/idempotent, streamed state equals the
batch build, and SQL folds equal direct builds."""

import collections

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.agg import hash_col
from bloomfilter_spark.config import DEFAULT_SEED
from bloomfilter_spark.jvm_build import (sample_build_jvm,
                                         sample_grouped_build_jvm)
from bloomfilter_spark.sketches import SampleSketch, sketch_from_bytes
from bloomfilter_spark.sql import register_sketch_sql


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_sketch_sql(spark)


@pytest.fixture(scope="module")
def hp():
    rng = np.random.default_rng(0x5A11)
    h = rng.integers(0, 2 ** 64, 40_000, dtype=np.uint64)
    p = [f"payload-{int(x)}".encode() for x in h]
    return h, p


# --- kernel ---------------------------------------------------------------

def test_kernel_bottom_k_is_deterministic_uniform_sample(hp):
    h, p = hp
    sk = SampleSketch(128)
    sk.update(h, p)
    uniq = np.unique(h)
    # the sample IS the k smallest distinct hashes' payloads, in order
    assert sk.sample() == [f"payload-{int(x)}".encode() for x in uniq[:128]]
    assert int(sk.theta) == int(uniq[128])
    assert len(sk) == 128


def test_kernel_merge_laws_and_order_invariance(hp):
    h, p = hp
    full = SampleSketch(64)
    full.update(h, p)
    thirds = []
    bounds = [0, 13_000, 26_000, len(h)]
    for lo, hi in zip(bounds, bounds[1:]):
        s = SampleSketch(64)
        s.update(h[lo:hi], p[lo:hi])
        thirds.append(s.to_bytes())

    def parse(b):
        return SampleSketch.from_bytes(b)

    a, b, c = (parse(x) for x in thirds)
    left = parse(thirds[0]).merge(parse(thirds[1])).merge(parse(thirds[2]))
    right = parse(thirds[0]).merge(
        SampleSketch(64).merge(parse(thirds[1])).merge(parse(thirds[2])))
    rev = parse(thirds[2]).merge(parse(thirds[1])).merge(parse(thirds[0]))
    assert (left.to_bytes() == right.to_bytes() == rev.to_bytes()
            == full.to_bytes())
    # identity + idempotence
    assert SampleSketch(64).merge(full).to_bytes() == full.to_bytes()
    assert parse(full.to_bytes()).merge(full).to_bytes() == full.to_bytes()


def test_kernel_min_payload_tiebreak_and_null(hp):
    h, _ = hp
    a = SampleSketch(32)
    a.update(h[:500], [b"zzz"] * 500)
    b = SampleSketch(32)
    b.update(h[:500], [b"aaa"] * 500)
    m1 = SampleSketch(32).merge(a).merge(b).to_bytes()
    m2 = SampleSketch(32).merge(b).merge(a).to_bytes()
    assert m1 == m2
    assert set(SampleSketch.from_bytes(m1).sample()) == {b"aaa"}
    # None payload ranks as empty bytes and beats everything
    c = SampleSketch(32)
    c.update(h[:500], [None] * 500)
    m3 = SampleSketch(32).merge(a).merge(c)
    assert set(m3.sample()) == {b""}


def test_kernel_estimate_and_wire(hp):
    h, p = hp
    sk = SampleSketch(1024)
    sk.update(h, p)
    n = len(np.unique(h))
    assert abs(sk.estimate() - n) <= 4 * sk.rse() * n
    rt = sketch_from_bytes(sk.to_bytes())
    assert type(rt) is SampleSketch and rt.to_bytes() == sk.to_bytes()
    # exact mode below k
    small = SampleSketch(1024)
    small.update(h[:100], p[:100])
    assert small.estimate() == len(np.unique(h[:100]))
    # corruption: truncating payload bytes fails loudly
    blob = sk.to_bytes()
    with pytest.raises(ValueError):
        SampleSketch.from_bytes(blob[:-3])


def test_kernel_fold_byte_equal_direct(hp):
    h, p = hp
    big = SampleSketch(512)
    big.update(h, p)
    direct = SampleSketch(32)
    direct.update(h, p)
    assert big.fold(32).to_bytes() == direct.to_bytes()
    with pytest.raises(ValueError, match="fold target"):
        big.fold(1024)


# --- JVM-reduced builds ------------------------------------------------------

def _kernel_reference(spark, df, keys, value_cols, payload_col, k):
    """Kernel ground truth fed with SPARK's salted hashes (the same
    hash_col the build uses), per key."""
    cs = [F.col(c) for c in value_cols]
    cond = cs[0].isNotNull()
    for c in cs[1:]:
        cond = cond & c.isNotNull()
    rows = (df.where(cond)
              .select(*keys, hash_col(cs).alias("h"),
                      F.coalesce(F.col(payload_col).cast("binary"),
                                 F.lit(b"")).alias("pl"))
              .collect())
    per_key = collections.defaultdict(lambda: ([], []))
    for r in rows:
        kk = tuple(r[c] for c in keys)
        per_key[kk][0].append(r["h"])
        per_key[kk][1].append(bytes(r["pl"]))
    out = {}
    for kk, (hs, pls) in per_key.items():
        sk = SampleSketch(k)
        sk.update(np.array(hs, dtype=np.int64).view(np.uint64), pls)
        out[kk] = sk.to_bytes()
    return out


def test_grouped_build_jvm_byte_identical_and_partition_invariant(
        spark, events):
    ev = events.withColumn(
        "pl", F.concat_ws(":", F.col("user_id"), F.col("event_id")))
    want = _kernel_reference(spark, ev, ["event_type"], ["event_id"],
                             "pl", 64)
    got = {(r["event_type"],): bytes(r["sketch"])
           for r in sample_grouped_build_jvm(
               ev, ["event_type"], ["event_id"], "pl", k=64).collect()}
    assert got == want and len(got) > 1
    # trimming engaged for at least one key, small keys exact
    sizes = {len(SampleSketch.from_bytes(b)) for b in got.values()}
    assert 64 in sizes
    got2 = {(r["event_type"],): bytes(r["sketch"])
            for r in sample_grouped_build_jvm(
                ev.repartition(7), ["event_type"], ["event_id"],
                "pl", k=64).collect()}
    assert got2 == got


def test_grouped_build_payloads_are_real_rows(spark, events):
    """Every sampled payload is an actual payload of its key — joined
    back against the corpus, zero fabrications."""
    ev = events.withColumn("pl", F.col("user_id").cast("string"))
    tbl = sample_grouped_build_jvm(ev, ["event_type"], ["event_id"],
                                   "pl", k=32)
    corpus = {(r["event_type"], r["pl"]) for r in
              ev.where(F.col("event_id").isNotNull() & F.col("pl").isNotNull())
                .select("event_type", "pl").distinct().collect()}
    n_checked = 0
    for r in tbl.collect():
        for payload in SampleSketch.from_bytes(bytes(r["sketch"])).sample():
            assert (r["event_type"], payload.decode()) in corpus
            n_checked += 1
    assert n_checked > 50


def test_global_build_jvm_byte_identical(spark, events):
    ev = events.withColumn("pl", F.col("user_id").cast("string"))
    got = sample_build_jvm(ev, ["event_id"], "pl", k=128)
    want = _kernel_reference(spark, ev, [], ["event_id"], "pl", 128)
    # single pseudo-key: empty tuple
    assert got.to_bytes() == want[()]


def test_grouped_build_null_payloads(spark, events):
    """NULL payloads flow as empty bytes, not crashes or dropped keys."""
    ev = events.withColumn("pl", F.lit(None).cast("string"))
    tbl = sample_grouped_build_jvm(ev, ["event_type"], ["event_id"],
                                   "pl", k=32).collect()
    assert len(tbl) > 1
    for r in tbl:
        sk = SampleSketch.from_bytes(bytes(r["sketch"]))
        assert set(sk.sample()) <= {b""}
        assert len(sk) > 0


# --- SQL surface --------------------------------------------------------------

def test_sql_sample_values_estimate_bound_fold(spark, events):
    ev = events.withColumn("pl", F.col("user_id").cast("string"))
    tbl = sample_grouped_build_jvm(ev, ["event_type"], ["event_id"],
                                   "pl", k=64)
    tbl.createOrReplaceTempView("sample_tbl")
    rows = spark.sql("""
        SELECT event_type,
               transform(sample_values(sketch), x -> string(x)) AS examples,
               sketch_estimate(sketch) AS est,
               sketch_error_bound(sketch) AS rse,
               sketch_describe(sketch) AS d,
               sketch_fold(sketch, 16) AS folded
        FROM sample_tbl""").collect()
    assert len(rows) > 1
    exact = {r["event_type"]: r["d"] for r in
             ev.where(F.col("event_id").isNotNull())
               .groupBy("event_type")
               .agg(F.countDistinct("event_id").alias("d")).collect()}
    import json
    for r in rows:
        kern = SampleSketch.from_bytes(bytes(spark.sql(
            f"SELECT sketch FROM sample_tbl WHERE event_type = "
            f"'{r['event_type']}'").collect()[0]["sketch"]))
        assert r["examples"] == [b.decode() for b in kern.sample()]
        assert r["est"] == kern.estimate()
        n = exact[r["event_type"]]
        assert abs(r["est"] - n) <= 5 * r["rse"] * n
        d = json.loads(r["d"])
        assert d["family"] == "SampleSketch" and d["k"] == 64
        folded = sketch_from_bytes(bytes(r["folded"]))
        assert folded.to_bytes() == kern.fold(16).to_bytes()

    # wrong family rejected with the family name
    spark.sql("SELECT sketch_fold(sketch, 16) AS f FROM sample_tbl") \
         .collect()  # sample folds fine
    from bloomfilter_spark.sketches import HyperLogLog
    hll = HyperLogLog(10)
    spark.createDataFrame([(hll.to_bytes(),)], "sketch binary") \
         .createOrReplaceTempView("not_sample")
    with pytest.raises(Exception, match="sample-family"):
        spark.sql("SELECT sample_values(sketch) FROM not_sample").collect()


def test_sql_group_merge_of_sample_blobs(spark, events):
    """sketch_merge re-aggregates sample tables from SQL: merging the
    per-type samples equals one direct whole-corpus build."""
    ev = events.withColumn("pl", F.col("user_id").cast("string"))
    tbl = sample_grouped_build_jvm(ev, ["event_type"], ["event_id"],
                                   "pl", k=64)
    tbl.createOrReplaceTempView("sample_tbl2")
    merged = bytes(spark.sql(
        "SELECT sketch_merge(sketch) AS s FROM sample_tbl2"
    ).collect()[0]["s"])
    direct = sample_build_jvm(ev, ["event_id"], "pl", k=64)
    assert merged == direct.to_bytes()


# --- warehouse ----------------------------------------------------------------

def test_warehouse_roundtrip_and_fsck(spark, events, tmp_path):
    from bloomfilter_spark.warehouse import (load_sketch_table,
                                             save_sketch_table,
                                             verify_sketch_table)
    ev = events.withColumn("pl", F.col("user_id").cast("string"))
    tbl = sample_grouped_build_jvm(ev, ["event_type"], ["event_id"],
                                   "pl", k=32)
    p = str(tmp_path / "sample_wh")
    save_sketch_table(tbl, p, keys=["event_type"],
                      factory=lambda: SampleSketch(32))
    loaded, meta = load_sketch_table(spark, p)
    assert meta["sketch"]["class"] == "SampleSketch"
    assert ({(r["event_type"], bytes(r["sketch"])) for r in loaded.collect()}
            == {(r["event_type"], bytes(r["sketch"])) for r in tbl.collect()})
    rep = verify_sketch_table(spark, p, strict=True)
    assert rep["corrupt"] == 0 and rep["rows"] > 1


# --- streaming ------------------------------------------------------------------

def test_stateful_sample_stream_equals_batch_build(spark, tmp_path, events):
    """Streamed per-key sample state is BYTE-IDENTICAL to the batch JVM
    build over the same corpus — determinism makes the sample family
    chunking/order-invariant end to end."""
    from bloomfilter_spark.streaming import stateful_grouped_sample

    ev = events.withColumn("pl", F.col("user_id").cast("string"))
    src = str(tmp_path / "sample_src")
    ev.repartition(3).write.parquet(src)
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = stateful_grouped_sample(stream, "event_type", "event_id",
                                  "pl", k=64)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("sample_stream").trigger(availableNow=True).start())
    q.awaitTermination(120)
    final = {r["event_type"]: r for r in spark.sql("""
        SELECT event_type, sketch, approx_distinct FROM (
          SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY n_updates DESC) AS rk
          FROM sample_stream) WHERE rk = 1""").collect()}
    batch = {r["event_type"]: bytes(r["sketch"])
             for r in sample_grouped_build_jvm(
                 ev, ["event_type"], ["event_id"], "pl", k=64).collect()}
    assert set(final) == set(batch)
    for et, row in final.items():
        assert bytes(row["sketch"]) == batch[et]
        assert row["approx_distinct"] == SampleSketch.from_bytes(
            batch[et]).estimate()
