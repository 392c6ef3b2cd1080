"""Weighted bottom-k sample sketch (sketches/wsample.py + the
JVM-reduced builds + SQL/streaming/warehouse/sizing surfaces): a
mergeable weight-proportional sample of distinct keys with example
payloads, plus the rank-conditioned Horvitz-Thompson total-weight
estimator (Efraimidis-Spirakis / Cohen-Kaplan ppswor).

Like the uniform sample family, the state is DETERMINISTIC (exponential
ranks derived from the keyed hash; per-hash max-weight/min-payload
canonicalization), so every structural test is byte-exact: builds are
invariant to partitioning and arrival order, merge is associative/
commutative/idempotent, streamed state equals the batch build, and
folds equal direct builds."""

import collections
import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.agg import hash_col
from bloomfilter_spark.jvm_build import (wsample_build_jvm,
                                         wsample_grouped_build_jvm)
from bloomfilter_spark.sketches import WeightedSampleSketch, sketch_from_bytes
from bloomfilter_spark.sketches.wsample import _rank
from bloomfilter_spark.sql import register_sketch_sql


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_sketch_sql(spark)


@pytest.fixture(scope="module")
def hwp():
    rng = np.random.default_rng(0x3E1)
    h = np.unique(rng.integers(0, 2 ** 64, 40_000, dtype=np.uint64))
    w = rng.pareto(1.5, h.size) + 0.1          # heavy-tailed weights
    p = [f"payload-{int(x)}".encode() for x in h]
    return h, w, p


# --- kernel ---------------------------------------------------------------

def test_kernel_retains_k_smallest_ranks(hwp):
    h, w, p = hwp
    sk = WeightedSampleSketch(128)
    sk.update(h, w, p)
    r = _rank(h, w)
    order = np.lexsort((h, r))
    want = [p[i] for i in order[:128]]
    assert sk.sample() == want
    assert sk.tau == float(r[order[128]])
    assert len(sk) == 128
    # weights ride along, aligned
    assert sk.sample_weights() == [float(w[i]) for i in order[:128]]


def test_kernel_merge_laws_and_order_invariance(hwp):
    h, w, p = hwp
    full = WeightedSampleSketch(64)
    full.update(h, w, p)
    thirds = []
    bounds = [0, 13_000, 26_000, h.size]
    for lo, hi in zip(bounds, bounds[1:]):
        s = WeightedSampleSketch(64)
        s.update(h[lo:hi], w[lo:hi], p[lo:hi])
        thirds.append(s.to_bytes())

    def parse(b):
        return WeightedSampleSketch.from_bytes(b)

    left = parse(thirds[0]).merge(parse(thirds[1])).merge(parse(thirds[2]))
    right = parse(thirds[0]).merge(
        WeightedSampleSketch(64).merge(parse(thirds[1]))
                                .merge(parse(thirds[2])))
    rev = parse(thirds[2]).merge(parse(thirds[1])).merge(parse(thirds[0]))
    assert (left.to_bytes() == right.to_bytes() == rev.to_bytes()
            == full.to_bytes())
    # identity + idempotence
    assert WeightedSampleSketch(64).merge(full).to_bytes() == full.to_bytes()
    assert parse(full.to_bytes()).merge(full).to_bytes() == full.to_bytes()


def test_kernel_per_hash_canonicalization(hwp):
    h, _, _ = hwp
    # same hash, larger weight wins regardless of arrival/merge order
    a = WeightedSampleSketch(32)
    a.update(h[:200], np.full(200, 1.0), [b"light"] * 200)
    b = WeightedSampleSketch(32)
    b.update(h[:200], np.full(200, 9.0), [b"heavy"] * 200)
    m1 = WeightedSampleSketch(32).merge(a).merge(b).to_bytes()
    m2 = WeightedSampleSketch(32).merge(b).merge(a).to_bytes()
    assert m1 == m2
    got = WeightedSampleSketch.from_bytes(m1)
    assert set(got.sample()) == {b"heavy"}
    assert set(got.sample_weights()) == {9.0}
    # equal weights: min payload wins; None ranks as empty bytes
    c = WeightedSampleSketch(32)
    c.update(h[:200], np.full(200, 9.0), [None] * 200)
    m3 = WeightedSampleSketch(32).merge(b).merge(c)
    assert set(m3.sample()) == {b""}


def test_kernel_weight_exclusion_rule(hwp):
    h, _, _ = hwp
    sk = WeightedSampleSketch(16)
    sk.update(h[:5], np.array([2.0, 0.0, -3.0, np.nan, np.inf]),
              [b"a", b"b", b"c", b"d", b"e"])
    assert sk.sample() == [b"a"]  # only the finite positive weight survives
    with pytest.raises(ValueError, match="length mismatch"):
        sk.update(h[:3], np.array([1.0, 2.0]))


def test_kernel_estimator_exact_and_bounded(hwp):
    h, w, p = hwp
    # exact mode below k: estimate == sum of distinct weights, exactly
    small = WeightedSampleSketch(1024)
    small.update(h[:300], w[:300], p[:300])
    assert small.estimate() == pytest.approx(w[:300].sum(), rel=1e-12)
    assert np.isinf(small.tau)
    # trimmed mode: HT estimate within 5 CV bounds of the true total
    sk = WeightedSampleSketch(1024)
    sk.update(h, w, p)
    total = w.sum()
    assert abs(sk.estimate() - total) <= 5 * sk.rse() * total
    # a key holding 40% of the total mass is essentially always retained
    w2 = w.copy()
    w2[123] = total * 0.66  # ~40% of the new total
    s2 = WeightedSampleSketch(256)
    s2.update(h, w2, p)
    assert p[123] in s2.sample()
    # equal weights degenerate to the uniform/KMV case: estimate ~ n * w
    eq = WeightedSampleSketch(512)
    eq.update(h, np.full(h.size, 3.0), p)
    assert abs(eq.estimate() - 3.0 * h.size) <= 5 * eq.rse() * 3.0 * h.size


def test_kernel_wire_roundtrip_and_corruption(hwp):
    h, w, p = hwp
    sk = WeightedSampleSketch(128)
    sk.update(h, w, p)
    blob = sk.to_bytes()
    rt = sketch_from_bytes(blob)
    assert type(rt) is WeightedSampleSketch and rt.to_bytes() == blob
    assert rt.sample_weights() == sk.sample_weights()
    for cut in (len(blob) - 3, 10, 4):
        with pytest.raises(ValueError):
            WeightedSampleSketch.from_bytes(blob[:cut])
    # params-only zero (warehouse factory path)
    zero = WeightedSampleSketch(128)
    again = WeightedSampleSketch._from_payload(zero._payload()[0], b"")
    assert again.k == 128 and len(again) == 0 and np.isinf(again.tau)
    with pytest.raises(ValueError, match="k mismatch"):
        sk.merge(WeightedSampleSketch(64))
    with pytest.raises(ValueError, match="k must be"):
        WeightedSampleSketch(8)


def test_kernel_fold_byte_equal_direct(hwp):
    h, w, p = hwp
    big = WeightedSampleSketch(512)
    big.update(h, w, p)
    direct = WeightedSampleSketch(32)
    direct.update(h, w, p)
    assert big.fold(32).to_bytes() == direct.to_bytes()
    # fold never mutates its source
    assert big.fold(32).k == 32 and big.k == 512
    with pytest.raises(ValueError, match="fold target"):
        big.fold(1024)


# --- JVM-reduced builds -----------------------------------------------------

def _weight_expr():
    # a pure function of the key column, so duplicate occurrences agree
    return (F.pmod(F.col("event_id"), F.lit(97)) + F.lit(1)).cast("double")


def _kernel_reference(spark, df, keys, value_cols, weight_col, payload_col,
                      k):
    """Kernel ground truth fed with SPARK's salted hashes, per key."""
    cs = [F.col(c) for c in value_cols]
    cond = cs[0].isNotNull()
    for c in cs[1:]:
        cond = cond & c.isNotNull()
    rows = (df.where(cond)
              .select(*keys, hash_col(cs).alias("h"),
                      F.col(weight_col).cast("double").alias("w"),
                      F.coalesce(F.col(payload_col).cast("binary"),
                                 F.lit(b"")).alias("pl"))
              .collect())
    per_key = collections.defaultdict(lambda: ([], [], []))
    for r in rows:
        kk = tuple(r[c] for c in keys)
        per_key[kk][0].append(r["h"])
        per_key[kk][1].append(r["w"])
        per_key[kk][2].append(bytes(r["pl"]))
    out = {}
    for kk, (hs, ws, pls) in per_key.items():
        sk = WeightedSampleSketch(k)
        sk.update(np.array(hs, dtype=np.int64).view(np.uint64),
                  np.array(ws, dtype=np.float64), pls)
        out[kk] = sk.to_bytes()
    return out


def test_grouped_build_jvm_byte_identical_and_partition_invariant(
        spark, events):
    ev = (events.withColumn("w", _weight_expr())
                .withColumn("pl", F.concat_ws(":", "user_id", "event_id")))
    want = _kernel_reference(spark, ev, ["event_type"], ["event_id"],
                             "w", "pl", 64)
    got = {(r["event_type"],): bytes(r["sketch"])
           for r in wsample_grouped_build_jvm(
               ev, ["event_type"], ["event_id"], "w", "pl", k=64).collect()}
    assert got == want and len(got) > 1
    # trimming engaged for at least one key
    sizes = {len(WeightedSampleSketch.from_bytes(b)) for b in got.values()}
    assert max(sizes) >= 63
    got2 = {(r["event_type"],): bytes(r["sketch"])
            for r in wsample_grouped_build_jvm(
                ev.repartition(7), ["event_type"], ["event_id"],
                "w", "pl", k=64).collect()}
    assert got2 == got


def test_global_build_jvm_byte_identical_and_estimates(spark, events):
    ev = (events.withColumn("w", _weight_expr())
                .withColumn("pl", F.col("user_id").cast("string")))
    got = wsample_build_jvm(ev, ["event_id"], "w", "pl", k=256)
    want = _kernel_reference(spark, ev, [], ["event_id"], "w", "pl", 256)
    assert got.to_bytes() == want[()]
    # estimator against the exact distinct-key weight total
    true = (ev.where(F.col("event_id").isNotNull())
              .select("event_id", "w").distinct()
              .agg(F.sum("w")).collect()[0][0])
    assert abs(got.estimate() - true) <= 5 * got.rse() * true


def test_grouped_build_excludes_bad_weights(spark, events):
    """NULL/NaN/<=0 weights are excluded rows, same as NULL keys — the
    kernel rule, enforced in codegen before the shuffle."""
    ev = (events.withColumn(
              "w", F.when(F.pmod("event_id", F.lit(3)) == 0, F.lit(None))
                    .when(F.pmod("event_id", F.lit(3)) == 1, F.lit(-1.0))
                    .otherwise(_weight_expr()))
          .withColumn("pl", F.col("user_id").cast("string")))
    good = ev.where(F.col("w").isNotNull() & (F.col("w") > 0))
    got = {r["event_type"]: bytes(r["sketch"])
           for r in wsample_grouped_build_jvm(
               ev, ["event_type"], ["event_id"], "w", "pl", k=32).collect()}
    want = {r["event_type"]: bytes(r["sketch"])
            for r in wsample_grouped_build_jvm(
                good, ["event_type"], ["event_id"], "w", "pl",
                k=32).collect()}
    assert got == want and len(got) > 1


def test_grouped_build_payloads_are_real_rows(spark, events):
    ev = (events.withColumn("w", _weight_expr())
                .withColumn("pl", F.col("user_id").cast("string")))
    tbl = wsample_grouped_build_jvm(ev, ["event_type"], ["event_id"],
                                    "w", "pl", k=32)
    corpus = {(r["event_type"], r["pl"]) for r in
              ev.where(F.col("event_id").isNotNull()
                       & F.col("pl").isNotNull())
                .select("event_type", "pl").distinct().collect()}
    n_checked = 0
    for r in tbl.collect():
        sk = WeightedSampleSketch.from_bytes(bytes(r["sketch"]))
        for payload in sk.sample():
            assert (r["event_type"], payload.decode()) in corpus
            n_checked += 1
    assert n_checked > 50


# --- SQL surface ------------------------------------------------------------

def test_sql_weighted_sample_functions(spark, events):
    ev = (events.withColumn("w", _weight_expr())
                .withColumn("pl", F.col("user_id").cast("string")))
    tbl = wsample_grouped_build_jvm(ev, ["event_type"], ["event_id"],
                                    "w", "pl", k=64)
    tbl.createOrReplaceTempView("wsample_tbl")
    rows = spark.sql("""
        SELECT event_type,
               transform(sample_values(sketch), x -> string(x)) AS examples,
               sample_weights(sketch) AS weights,
               sketch_estimate(sketch) AS est,
               sketch_error_bound(sketch) AS rse,
               sketch_describe(sketch) AS d,
               sketch_fold(sketch, 16) AS folded
        FROM wsample_tbl""").collect()
    assert len(rows) > 1
    true_w = {r["event_type"]: r["tw"] for r in
              ev.where(F.col("event_id").isNotNull())
                .select("event_type", "event_id", "w").distinct()
                .groupBy("event_type")
                .agg(F.sum("w").alias("tw")).collect()}
    kern = {r["event_type"]: WeightedSampleSketch.from_bytes(
        bytes(r["sketch"])) for r in tbl.collect()}
    for r in rows:
        sk = kern[r["event_type"]]
        assert r["examples"] == [b.decode() for b in sk.sample()]
        assert r["weights"] == sk.sample_weights()
        assert r["est"] == sk.estimate()
        tw = true_w[r["event_type"]]
        assert abs(r["est"] - tw) <= 5 * r["rse"] * tw
        d = json.loads(r["d"])
        assert d["family"] == "WeightedSampleSketch" and d["k"] == 64
        assert sketch_from_bytes(bytes(r["folded"])).to_bytes() \
            == sk.fold(16).to_bytes()
    # sketch_merge re-aggregation == direct whole-corpus build
    merged = bytes(spark.sql(
        "SELECT sketch_merge(sketch) AS s FROM wsample_tbl"
    ).collect()[0]["s"])
    direct = wsample_build_jvm(ev, ["event_id"], "w", "pl", k=64)
    assert merged == direct.to_bytes()
    # sample_weights rejects other families with the family name
    from bloomfilter_spark.sketches import HyperLogLog
    spark.createDataFrame([(HyperLogLog(10).to_bytes(),)], "sketch binary") \
         .createOrReplaceTempView("not_wsample")
    with pytest.raises(Exception, match="WeightedSampleSketch"):
        spark.sql("SELECT sample_weights(sketch) FROM not_wsample").collect()
    # but sample_values accepts BOTH sample families
    spark.sql("SELECT sample_values(sketch) FROM wsample_tbl").collect()


# --- sizing ------------------------------------------------------------------

def test_sizing_weighted_sample():
    from bloomfilter_spark.sizing import suggest_sketch
    out = suggest_sketch("weighted_sample", rel_std_error=0.02,
                         avg_payload_bytes=40)
    th = suggest_sketch("theta", rel_std_error=0.02)
    assert out["params"]["k"] == th["params"]["k"]  # shared CV inversion
    assert out["state_bytes"] == out["params"]["k"] * (20 + 40)
    sk = WeightedSampleSketch(**out["params"])
    assert sk.rse() <= 0.02


# --- warehouse ----------------------------------------------------------------

def test_warehouse_roundtrip_and_fsck(spark, events, tmp_path):
    from bloomfilter_spark.warehouse import (load_sketch_table,
                                             save_sketch_table,
                                             verify_sketch_table)
    ev = (events.withColumn("w", _weight_expr())
                .withColumn("pl", F.col("user_id").cast("string")))
    tbl = wsample_grouped_build_jvm(ev, ["event_type"], ["event_id"],
                                    "w", "pl", k=32)
    p = str(tmp_path / "wsample_wh")
    save_sketch_table(tbl, p, keys=["event_type"],
                      factory=lambda: WeightedSampleSketch(32))
    loaded, meta = load_sketch_table(spark, p)
    assert meta["sketch"]["class"] == "WeightedSampleSketch"
    assert ({(r["event_type"], bytes(r["sketch"])) for r in loaded.collect()}
            == {(r["event_type"], bytes(r["sketch"])) for r in tbl.collect()})
    rep = verify_sketch_table(spark, p, strict=True)
    assert rep["corrupt"] == 0 and rep["rows"] > 1


# --- streaming ------------------------------------------------------------------

def test_stateful_weighted_sample_stream_equals_batch_build(
        spark, tmp_path, events):
    """Streamed per-key weighted-sample state is BYTE-IDENTICAL to the
    batch JVM build over the same corpus — determinism makes the family
    chunking/order-invariant end to end."""
    from bloomfilter_spark.streaming import stateful_grouped_weighted_sample

    ev = (events.withColumn("w", _weight_expr())
                .withColumn("pl", F.col("user_id").cast("string")))
    src = str(tmp_path / "wsample_src")
    ev.repartition(3).write.parquet(src)
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = stateful_grouped_weighted_sample(stream, "event_type", "event_id",
                                           "w", "pl", k=64)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("wsample_stream").trigger(availableNow=True).start())
    q.awaitTermination(120)
    final = {r["event_type"]: r for r in spark.sql("""
        SELECT event_type, sketch, approx_total_weight FROM (
          SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY n_updates DESC) AS rk
          FROM wsample_stream) WHERE rk = 1""").collect()}
    batch = {r["event_type"]: bytes(r["sketch"])
             for r in wsample_grouped_build_jvm(
                 ev, ["event_type"], ["event_id"], "w", "pl",
                 k=64).collect()}
    assert set(final) == set(batch)
    for et, row in final.items():
        assert bytes(row["sketch"]) == batch[et]
        assert row["approx_total_weight"] == WeightedSampleSketch.from_bytes(
            batch[et]).estimate()
