"""Scale-path features: sharded bloom (beyond-broadcast filters), scalable
bloom (unknown capacity), streaming accumulation, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.operators.sharded import (build_sharded_bloom,
                                                 shard_geometry,
                                                 sharded_membership)
from bloomfilter_spark.sketches.scalable import ScalableBloomFilter
from bloomfilter_spark.util import splitmix64


# --- sharded bloom -------------------------------------------------------

def test_shard_geometry_preserves_total_bits():
    m_shard, k = shard_geometry(100000, 0.01, 16)
    assert m_shard * 16 >= 1048576  # total >= sized m
    assert k == 7


def test_sharded_bloom_zero_fn_and_fpr(spark, lineitem):
    n = lineitem.count()
    shards = build_sharded_bloom(lineitem, ["l_orderkey", "l_linenumber"],
                                 capacity=n, fpr=0.01, n_shards=8).persist()
    assert shards.count() == 8
    mem = sharded_membership(lineitem, shards, ["l_orderkey", "l_linenumber"])
    assert mem.where(~F.col("is_member")).count() == 0  # zero false negatives
    probes = spark.range(50000).select(
        F.concat(F.lit("absent:"), "id").alias("l_orderkey"),
        F.lit(1).alias("l_linenumber"))
    fp = sharded_membership(probes, shards, ["l_orderkey", "l_linenumber"]) \
        .where("is_member").count()
    assert fp / 50000 <= 0.02
    shards.unpersist()


def test_sharded_membership_small_corpus_empty_top_shards(spark):
    """Routing must use the PERSISTED build-time shard count: these five
    keys all hash into shards <= 13 of 64 (deterministic xxhash64), so the
    old max(shard)+1 inference would round to 16 shards and mis-route every
    probe — breaking zero false negatives."""
    df = spark.createDataFrame([(k,) for k in (6, 12, 14, 15, 23)], "k long")
    shards = build_sharded_bloom(df, ["k"], capacity=5, fpr=0.01,
                                 n_shards=64).persist()
    tbl = shards.collect()
    assert all(r["n_shards"] == 64 for r in tbl)
    assert max(r["shard"] for r in tbl) < 16  # inference WOULD have diverged
    mem = sharded_membership(df, shards, ["k"])
    assert mem.where(~F.col("is_member")).count() == 0
    shards.unpersist()


def test_sharded_bloom_pre_dedup_identical(spark, lineitem):
    """Map-side duplicate collapse must not change the built filter: a
    duplicate-heavy corpus (every key x8) builds byte-identical shards
    with and without pre_dedup."""
    dup = lineitem.select("l_orderkey").crossJoin(
        spark.range(8).select(F.lit(1).alias("__x"))).drop("__x")
    plain = {r["shard"]: bytes(r["sketch"])
             for r in build_sharded_bloom(dup, ["l_orderkey"], capacity=2000,
                                          n_shards=8).collect()}
    deduped = {r["shard"]: bytes(r["sketch"])
               for r in build_sharded_bloom(dup, ["l_orderkey"], capacity=2000,
                                            n_shards=8,
                                            pre_dedup=True).collect()}
    assert plain == deduped


def test_merge_shard_tables_intersect(spark, lineitem):
    """Distributed intersect: common keys stay members (zero FN on the true
    intersection); keys unique to one side mostly drop (AND of independent
    bit sets)."""
    from bloomfilter_spark.operators.sharded import merge_shard_tables
    lo = lineitem.where(F.col("l_orderkey") % 3 != 0)   # keys 1,2 mod 3
    hi = lineitem.where(F.col("l_orderkey") % 3 != 1)   # keys 0,2 mod 3
    n = lineitem.count()
    t1 = build_sharded_bloom(lo, ["l_orderkey"], capacity=n, fpr=0.01,
                             n_shards=8)
    t2 = build_sharded_bloom(hi, ["l_orderkey"], capacity=n, fpr=0.01,
                             n_shards=8)
    both = merge_shard_tables([t1, t2], mode="intersect").persist()
    common = lineitem.where(F.col("l_orderkey") % 3 == 2)
    mem = sharded_membership(common, both, ["l_orderkey"])
    assert mem.where(~F.col("is_member")).count() == 0  # zero FN on A∩B
    only_lo = lineitem.where(F.col("l_orderkey") % 3 == 1) \
                      .select("l_orderkey").distinct()
    fp = sharded_membership(only_lo, both, ["l_orderkey"]) \
        .where("is_member").count()
    assert fp <= max(0.05 * only_lo.count(), 5)
    both.unpersist()


def test_merge_shard_tables_rejects_mismatched_shard_counts(spark, lineitem):
    """Tables built with different n_shards must fail LOUDLY: shard id s
    covers a different top-bits hash range under each count, and per-shard
    (m, k) can coincide across counts (capacity and shards both halved
    give the same shard geometry), so the byte-level geometry check can't
    catch it — silent acceptance would break zero-false-negatives on the
    merged table."""
    import pytest
    from bloomfilter_spark.operators.sharded import merge_shard_tables
    n = lineitem.count()
    t1 = build_sharded_bloom(lineitem, ["l_orderkey"], capacity=n,
                             fpr=0.01, n_shards=8)
    # half the capacity over half the shards -> identical per-shard (m, k)
    t2 = build_sharded_bloom(lineitem, ["l_orderkey"], capacity=n // 2,
                             fpr=0.01, n_shards=4)
    merged = merge_shard_tables([t1, t2], mode="union")
    with pytest.raises(Exception, match="different[\\s\\S]*n_shards"):
        merged.collect()


def test_shard_table_parquet_roundtrip(spark, tmp_path, lineitem):
    """The distributed filter persists as a plain parquet table (shard,
    sketch, n_shards) and reloads with routing intact — the resume story
    for the beyond-broadcast path."""
    shards = build_sharded_bloom(lineitem, ["l_orderkey"], capacity=2000,
                                 fpr=0.01, n_shards=8)
    path = str(tmp_path / "shard_table")
    shards.write.parquet(path)
    back = spark.read.parquet(path)
    mem = sharded_membership(lineitem, back, ["l_orderkey"])
    assert mem.where(~F.col("is_member")).count() == 0


def test_sharded_membership_preserves_columns(spark, lineitem):
    shards = build_sharded_bloom(lineitem, ["l_orderkey"], capacity=2000,
                                 n_shards=4)
    out = sharded_membership(lineitem.select("l_orderkey", "l_quantity"),
                             shards, ["l_orderkey"])
    assert set(out.columns) == {"l_orderkey", "l_quantity", "is_member"}
    assert out.count() == lineitem.count()


# --- scalable bloom ------------------------------------------------------

def test_scalable_bloom_grows_and_never_forgets(rng):
    sbf = ScalableBloomFilter(0.01, initial_capacity=256)
    h = rng.integers(0, 2**63, 10000, dtype=np.int64).view(np.uint64)
    for chunk in np.array_split(h, 13):
        sbf.update(chunk)
    assert sbf.contains(h).all()
    assert len(sbf.filters) > 1  # actually grew
    assert sbf.count == 10000
    probes = rng.integers(0, 2**63, 50000, dtype=np.int64).view(np.uint64)
    probes = np.setdiff1d(probes, h)
    fpr = sbf.contains(probes).mean()
    assert fpr <= sbf.compound_error_bound() * 2 + 0.001


def test_scalable_bloom_roundtrip_and_schedule(rng):
    sbf = ScalableBloomFilter(0.05, initial_capacity=128, tightening=0.4)
    h = rng.integers(0, 2**63, 3000, dtype=np.int64).view(np.uint64)
    sbf.update(h)
    r2 = ScalableBloomFilter.from_bytes(sbf.to_bytes())
    assert r2.contains(h).all()
    assert r2.count == sbf.count
    assert len(r2.filters) == len(sbf.filters)
    with pytest.raises(ValueError):
        ScalableBloomFilter(0.5, tightening=1.5)


def test_scalable_compound_bound_converges():
    sbf = ScalableBloomFilter(0.01, tightening=0.5)
    for _ in range(6):
        sbf._grow()
    assert sbf.compound_error_bound() < 0.01 / (1 - 0.5)


# --- streaming -----------------------------------------------------------

def test_stream_accumulator_matches_batch(spark, tmp_path, lineitem):
    from bloomfilter_spark.agg import build_sketch
    from bloomfilter_spark.sketches import HyperLogLog
    from bloomfilter_spark.streaming import SketchAccumulator

    src = str(tmp_path / "stream_src")
    lineitem.repartition(4).write.parquet(src)

    acc = SketchAccumulator(["l_orderkey"], lambda: HyperLogLog(12),
                            state_dir=str(tmp_path / "state"))
    stream = (spark.readStream.schema(lineitem.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    q = stream.writeStream.foreachBatch(acc).trigger(availableNow=True).start()
    q.awaitTermination(120)

    batch = build_sketch(spark.read.parquet(src), ["l_orderkey"],
                         lambda: HyperLogLog(12))
    # streaming fold == batch build, byte-exact (chunking invariance)
    assert acc.sketch.to_bytes() == batch.to_bytes()
    assert len(acc.batches_seen) >= 2  # actually saw multiple micro-batches

    # resume from persisted state
    acc2 = SketchAccumulator(["l_orderkey"], lambda: HyperLogLog(12),
                             state_dir=str(tmp_path / "state"))
    assert acc2.sketch.to_bytes() == batch.to_bytes()


def test_stream_accumulator_replay_idempotent_for_cms(spark, tmp_path, events):
    """A replayed micro-batch after a driver restart must NOT re-merge:
    CMS counters would double-count (Bloom/HLL would merely re-OR). The
    restored accumulator skips epochs <= the persisted last epoch and the
    final state is byte-identical to a one-shot batch build."""
    from bloomfilter_spark.agg import build_sketch
    from bloomfilter_spark.sketches import CountMinSketch
    from bloomfilter_spark.streaming import SketchAccumulator

    factory = lambda: CountMinSketch(width=4096, depth=5)  # noqa: E731
    parts = [events.where(F.col("event_id") % 3 == i) for i in range(3)]
    state = str(tmp_path / "cms_state")

    acc = SketchAccumulator(["event_type"], factory, state_dir=state)
    acc(parts[0], 0)
    acc(parts[1], 1)
    # driver restart: epoch 1 is replayed (at-least-once), then epoch 2
    acc2 = SketchAccumulator(["event_type"], factory, state_dir=state)
    assert acc2.last_epoch == 1
    acc2(parts[1], 1)   # replay — must be skipped
    acc2(parts[2], 2)
    batch = build_sketch(events, ["event_type"], factory)
    assert acc2.sketch.to_bytes() == batch.to_bytes()


def test_stateful_grouped_hll_skips_null_values(spark, tmp_path):
    """Streaming per-key HLL must drop NULL values before hashing (batch
    builds do): estimates over a nullable column equal the batch build."""
    from bloomfilter_spark.agg import build_sketch
    from bloomfilter_spark.sketches import HyperLogLog
    from bloomfilter_spark.streaming import stateful_grouped_hll

    rows = [("a", i if i % 3 else None) for i in range(300)]
    df = spark.createDataFrame(rows, "k string, v long")
    src = str(tmp_path / "null_src")
    df.repartition(2).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = stateful_grouped_hll(stream, "k", "v", p=12)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("hll_null_stream").trigger(availableNow=True).start())
    q.awaitTermination(120)
    est = spark.sql("SELECT max(approx_distinct) AS e FROM hll_null_stream") \
               .first()["e"]
    batch = build_sketch(df, ["v"], lambda: HyperLogLog(12))
    assert est == batch.estimate()


def test_stateful_grouped_hll_stream(spark, tmp_path, events):
    from bloomfilter_spark.streaming import stateful_grouped_hll

    src = str(tmp_path / "ev_src")
    events.repartition(2).write.parquet(src)
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = stateful_grouped_hll(stream, "event_type", "user_id", p=12)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("hll_stream").trigger(availableNow=True).start())
    q.awaitTermination(120)
    res = spark.sql("""
        SELECT event_type, max(n_updates) AS n, max(approx_distinct) AS est
        FROM hll_stream GROUP BY event_type""").collect()
    exact = {r["event_type"]: (r["n"], r["d"]) for r in
             events.groupBy("event_type")
                   .agg(F.count("*").alias("n"),
                        F.countDistinct("user_id").alias("d")).collect()}
    assert len(res) == len(exact)
    for r in res:
        n_exact, d_exact = exact[r["event_type"]]
        assert r["n"] == n_exact
        assert abs(r["est"] - d_exact) / max(d_exact, 1) < 0.15

    # streaming state hashes JVM-side with the engine's standard salted
    # xxhash64, so it is merge-compatible with batch builds: the final
    # streaming estimate must EQUAL the batch-built HLL's estimate exactly
    from bloomfilter_spark.agg import build_sketch
    from bloomfilter_spark.sketches import HyperLogLog
    for r in res:
        batch_sk = build_sketch(
            events.where(F.col("event_type") == r["event_type"]),
            ["user_id"], lambda: HyperLogLog(12))
        assert r["est"] == batch_sk.estimate()


# --- multimodal ----------------------------------------------------------

def test_multimodal_featurize_plumbing(spark):
    from bloomfilter_spark.operators.multimodal import (decode_and_featurize,
                                                        make_demo_media_df)
    media = make_demo_media_df(spark, 30)
    feats = decode_and_featurize(media, target=(8, 8))
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["features"]) == 3
        assert 0 <= r["mean_intensity"] <= 255
    # determinism across repartitions (stub decode is seeded by payload)
    again = decode_and_featurize(media.repartition(7), target=(8, 8)).collect()
    a = {r["media_id"]: r["mean_intensity"] for r in rows}
    b = {r["media_id"]: r["mean_intensity"] for r in again}
    assert a == b


def test_multimodal_video_frame_sampling(spark):
    from bloomfilter_spark.operators.multimodal import (make_demo_media_df,
                                                        sample_video_frames)
    media = make_demo_media_df(spark, 30)
    frames = sample_video_frames(media, every_ms=1000)
    n_videos = media.where(F.col("meta")["media_type"] == "video").count()
    assert frames.count() == n_videos * 3  # 3000ms / 1000ms
    assert frames.select("media_id").distinct().count() == n_videos


def test_multimodal_strict_raises(spark):
    from bloomfilter_spark.operators.multimodal import (HAVE_REAL_CODECS,
                                                        decode_and_featurize,
                                                        make_demo_media_df)
    if HAVE_REAL_CODECS:
        pytest.skip("real codecs present")
    media = make_demo_media_df(spark, 3)
    with pytest.raises(Exception, match="NotImplementedError|decoding"):
        decode_and_featurize(media, strict=True).collect()


def test_bloom_dedup_stream_exact_on_sized_filter(spark, tmp_path, events):
    """Streaming Bloom dedup over micro-batches with cross-batch
    duplicates: with the filter sized for the key cardinality, the emitted
    set equals the exact first-seen dedup (zero false negatives means every
    duplicate is caught; at this size no false positive fired)."""
    from bloomfilter_spark.streaming import BloomDedupStream

    # duplicate every key 3x across separate files so dupes cross batches
    src = str(tmp_path / "dedup_src")
    keyed = events.select("event_id", "event_type").where(
        F.col("event_id").isNotNull())
    for i in range(3):
        keyed.write.mode("append").parquet(src)

    out: list = []
    dedup = BloomDedupStream(["event_id"], capacity=100_000, fpr=0.001,
                             sink=lambda df, e: out.append(df.toPandas()),
                             state_dir=str(tmp_path / "dstate"))
    stream = (spark.readStream.schema(keyed.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = stream.writeStream.foreachBatch(dedup).trigger(availableNow=True).start()
    q.awaitTermination(120)

    import pandas as pd
    emitted = pd.concat(out, ignore_index=True)
    exact_ids = {r["event_id"] for r in keyed.distinct().collect()}
    assert set(emitted["event_id"]) == exact_ids
    assert len(emitted) == len(exact_ids)  # no duplicate emitted
    assert dedup.rows_emitted == len(exact_ids)
    assert dedup.rows_in == keyed.count() * 3  # every input row counted


def test_bloom_dedup_stream_restart_skips_replayed_epoch(spark, tmp_path,
                                                         events):
    """After a restart the replayed epoch must not re-emit or re-count:
    state (filter + epoch + metrics) restores from disk and the union of
    both runs' emissions is still duplicate-free."""
    from bloomfilter_spark.streaming import BloomDedupStream

    parts = [events.where(F.col("event_id") % 2 == i)
                   .select("event_id", "event_type") for i in range(2)]
    state = str(tmp_path / "dstate2")
    out: list = []
    sink = lambda df, e: out.append(df.toPandas())  # noqa: E731

    d1 = BloomDedupStream(["event_id"], capacity=100_000, fpr=0.001,
                          sink=sink, state_dir=state)
    d1(parts[0], 0)
    n_after_0 = d1.rows_emitted
    # restart: epoch 0 replays (must be skipped), then epoch 1 with overlap
    d2 = BloomDedupStream(["event_id"], capacity=100_000, fpr=0.001,
                          sink=sink, state_dir=state)
    assert d2.last_epoch == 0 and d2.rows_emitted == n_after_0
    d2(parts[0], 0)                              # replay -> no-op
    assert d2.rows_emitted == n_after_0
    d2(parts[0].unionByName(parts[1]), 1)        # half dupes, half new
    import pandas as pd
    emitted = pd.concat(out, ignore_index=True)
    assert emitted["event_id"].is_unique
    assert set(emitted["event_id"]) == {
        r["event_id"] for r in events.where(F.col("event_id").isNotNull())
                                     .select("event_id").distinct().collect()}


def test_bloom_dedup_stream_null_keys_pass_through(spark, tmp_path):
    """NULL-keyed rows are never 'seen': each occurrence passes through
    (SQL semantics, matching prepare_input's NULL skip)."""
    from bloomfilter_spark.streaming import BloomDedupStream

    df = spark.createDataFrame(
        [(None, "a"), (None, "b"), (1, "c"), (1, "d")], "k int, v string")
    out: list = []
    dedup = BloomDedupStream(["k"], capacity=1000,
                             sink=lambda d, e: out.append(d.toPandas()))
    dedup(df, 0)
    dedup(df, 1)
    import pandas as pd
    emitted = pd.concat(out, ignore_index=True)
    assert len(emitted[emitted["k"].isna()]) == 4   # 2 per epoch, kept
    assert len(emitted[emitted["k"].notna()]) == 1  # key 1 exactly once


def test_stateful_grouped_quantile_stream(spark, tmp_path, events):
    """Streaming per-key KLL: final streamed quantiles satisfy the
    published rank bound against the exact per-key values, and n_updates
    matches the exact row counts."""
    from bloomfilter_spark.sketches import KLL
    from bloomfilter_spark.streaming import stateful_grouped_quantile

    src = str(tmp_path / "q_src")
    ev = events.where(F.col("value").isNotNull())
    ev.repartition(2).write.parquet(src)
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = stateful_grouped_quantile(stream, "event_type", "value",
                                    quantiles=(0.5, 0.9))
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("kll_stream").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # keep each key's LAST emission (max n_updates = full stream folded)
    res = spark.sql("""
        SELECT event_type, q, est, n_updates FROM (
          SELECT *, row_number() OVER (PARTITION BY event_type, q
                                       ORDER BY n_updates DESC) AS rn
          FROM kll_stream) WHERE rn = 1""").collect()
    assert res
    bound = 4 * KLL(200).rank_error_bound()
    exact_n = {r["event_type"]: r["n"] for r in
               ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert {r["event_type"] for r in res} == set(exact_n)
    for r in res:
        assert r["n_updates"] == exact_n[r["event_type"]]
        vals = [x["value"] for x in
                ev.where(F.col("event_type") == r["event_type"])
                  .select(F.col("value").cast("double").alias("value"))
                  .collect()]
        rank = sum(v <= r["est"] for v in vals) / len(vals)
        assert abs(rank - r["q"]) <= bound, (r["event_type"], r["q"], rank)


def test_stateful_grouped_quantile_rejects_hash_keyed(spark):
    import pytest
    from bloomfilter_spark.sketches import HyperLogLog
    from bloomfilter_spark.streaming import stateful_grouped_quantile
    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="value sketch"):
        stateful_grouped_quantile(df, "value", "value",
                                  factory=lambda: HyperLogLog(12))


def test_stateful_grouped_heavy_hitters_stream(spark, tmp_path, events):
    """Streaming per-key CMS heavy hitters: at sf0.001 eps*N < 1, so the
    final emission's top-k and est_counts must EQUAL the exact per-key
    top items, and n_updates the exact non-null row counts."""
    from bloomfilter_spark.streaming import stateful_grouped_heavy_hitters

    src = str(tmp_path / "hh_src")
    ev = (events.where(F.col("user_id").isNotNull())
                .select("event_type", F.col("user_id").cast("string")
                        .alias("user_id")))
    ev.repartition(3).write.parquet(src)
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = stateful_grouped_heavy_hitters(stream, "event_type", "user_id",
                                         k=5, n_candidates=64)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("hh_stream").trigger(availableNow=True).start())
    q.awaitTermination(120)
    res = spark.sql("""
        SELECT event_type, user_id, est_count, n_updates FROM (
          SELECT *, dense_rank() OVER (PARTITION BY event_type
                                       ORDER BY n_updates DESC) AS rk
          FROM hh_stream) WHERE rk = 1""").toPandas()
    assert len(res)

    exact = (ev.groupBy("event_type", "user_id")
               .agg(F.count("*").alias("cnt")).toPandas())
    totals = exact.groupby("event_type")["cnt"].sum().to_dict()
    for etype, grp in res.groupby("event_type"):
        ex = (exact[exact["event_type"] == etype]
              .sort_values(["cnt", "user_id"], ascending=[False, True]))
        top = grp.sort_values(["est_count", "user_id"],
                              ascending=[False, True])
        assert len(top) == min(5, len(ex))
        # eps=1e-4, N_key ~ 1e3 at sf0.001 -> estimates are exact
        assert list(top["user_id"]) == list(ex.head(len(top))["user_id"])
        assert list(top["est_count"]) == list(ex.head(len(top))["cnt"])
        assert (top["n_updates"] == totals[etype]).all()


def test_stateful_grouped_mg_stream(spark, tmp_path, events):
    """Streaming per-key Misra-Gries: deterministic sandwich
    count_lo <= exact <= count_hi for every emitted item of the final
    emission, n_updates exact, and with k ABOVE the per-key distinct
    cardinality the bounds collapse (dec == 0) so counts are exact."""
    from bloomfilter_spark.streaming import stateful_grouped_mg

    src = str(tmp_path / "mg_src")
    ev = (events.where(F.col("user_id").isNotNull())
                .select("event_type", F.col("user_id").cast("string")
                        .alias("user_id")))
    ev.repartition(3).write.parquet(src)

    exact = (ev.groupBy("event_type", "user_id")
               .agg(F.count("*").alias("cnt")).toPandas())
    totals = exact.groupby("event_type")["cnt"].sum().to_dict()
    ex_map = {(r.event_type, r.user_id): r.cnt
              for r in exact.itertuples(index=False)}

    # small k: trimming engages; bounds must still sandwich every emission
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = stateful_grouped_mg(stream, "event_type", "user_id",
                              k=8, emit_k=5)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("mg_stream").trigger(availableNow=True).start())
    q.awaitTermination(120)
    res = spark.sql("""
        SELECT * FROM (
          SELECT *, dense_rank() OVER (PARTITION BY event_type
                                       ORDER BY n_updates DESC) AS rk
          FROM mg_stream) WHERE rk = 1""").toPandas()
    assert len(res)
    for r in res.itertuples(index=False):
        cnt = ex_map[(r.event_type, r.user_id)]
        assert r.count_lo <= cnt <= r.count_hi, r
        assert r.n_updates == totals[r.event_type]

    # k above distinct per-key users: dec stays 0, counts exact
    big_k = int(exact.groupby("event_type")["user_id"].nunique().max()) + 8
    stream2 = (spark.readStream.schema(ev.schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
    out2 = stateful_grouped_mg(stream2, "event_type", "user_id",
                               k=big_k, emit_k=3)
    q2 = (out2.writeStream.outputMode("update").format("memory")
          .queryName("mg_stream_exact").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    res2 = spark.sql("""
        SELECT * FROM (
          SELECT *, dense_rank() OVER (PARTITION BY event_type
                                       ORDER BY n_updates DESC) AS rk
          FROM mg_stream_exact) WHERE rk = 1""").toPandas()
    assert len(res2)
    for r in res2.itertuples(index=False):
        cnt = ex_map[(r.event_type, r.user_id)]
        assert r.count_lo == cnt == r.count_hi, r


def test_stateful_grouped_theta_stream(spark, tmp_path, events):
    """Per-key streaming theta: estimates track exact distincts, the final
    streaming state EQUALS the batch JVM build's estimate exactly (same
    salted hash + k), and the emitted blobs support cross-key set algebra
    (intersection of two keys' streamed sketches vs exact overlap)."""
    from bloomfilter_spark.jvm_build import theta_build_jvm
    from bloomfilter_spark.sketches import ThetaSketch, theta_intersect
    from bloomfilter_spark.streaming import stateful_grouped_theta

    src = str(tmp_path / "th_src")
    events.repartition(2).write.parquet(src)
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = stateful_grouped_theta(stream, "event_type", "user_id", k=1024)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("theta_stream").trigger(availableNow=True).start())
    q.awaitTermination(120)
    final = {r["event_type"]: r for r in spark.sql("""
        SELECT event_type, sketch, approx_distinct FROM (
          SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY n_updates DESC) AS rk
          FROM theta_stream) WHERE rk = 1""").collect()}
    exact = {r["event_type"]: r["d"] for r in
             events.where(F.col("user_id").isNotNull())
                   .groupBy("event_type")
                   .agg(F.countDistinct("user_id").alias("d")).collect()}
    assert set(final) == set(exact)
    for et, row in final.items():
        # streaming == batch, exactly (merge-compatible state)
        batch = theta_build_jvm(
            events.where(F.col("event_type") == et), ["user_id"], k=1024)
        assert row["approx_distinct"] == batch.estimate()
        assert abs(row["approx_distinct"] - exact[et]) / max(exact[et], 1) < 0.2

    # cross-key set algebra on the STREAMED blobs
    ets = sorted(final)[:2]
    a = ThetaSketch.from_bytes(bytes(final[ets[0]]["sketch"]))
    b = ThetaSketch.from_bytes(bytes(final[ets[1]]["sketch"]))
    inter = theta_intersect(a, b).estimate()
    exact_i = (events.where(F.col("event_type") == ets[0])
               .select("user_id").distinct()
               .intersect(events.where(F.col("event_type") == ets[1])
                          .select("user_id").distinct()).count())
    import math
    exact_u = (events.where(F.col("event_type").isin(ets))
               .select("user_id").distinct().count())
    assert abs(inter - exact_i) <= 4 * math.sqrt(max(exact_i, 1) * exact_u / 1024) + 1


def test_stateful_grouped_cms_stream(spark, tmp_path, events):
    """Per-key streaming CMS blobs: the final streamed state is
    BYTE-IDENTICAL to the batch JVM build over the same slice (plain CMS is
    chunking/order insensitive — the streaming analog of the batch
    chunking-invariance property), point queries respect the one-sided
    never-undercount guarantee plus the eps*N overcount bound, and the
    emitted blobs estimate cross-key join sizes via inner_product."""
    import numpy as np

    from bloomfilter_spark.config import DEFAULT_SEED
    from bloomfilter_spark.jvm_build import cms_build_jvm
    from bloomfilter_spark.sketches.cms import CountMinSketch
    from bloomfilter_spark.streaming import stateful_grouped_cms
    from bloomfilter_spark.util import to_u64

    src = str(tmp_path / "cms_src")
    events.repartition(3).write.parquet(src)
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = stateful_grouped_cms(stream, "event_type", "user_id",
                               eps=1e-3, delta=1e-3)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("cms_stream").trigger(availableNow=True).start())
    q.awaitTermination(120)
    final = {r["event_type"]: r for r in spark.sql("""
        SELECT event_type, sketch, n_updates, error_bound FROM (
          SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY n_updates DESC) AS rk
          FROM cms_stream) WHERE rk = 1""").collect()}

    nn = events.where(F.col("user_id").isNotNull())
    exact = (nn.select("event_type", "user_id",
                       F.xxhash64(F.lit(DEFAULT_SEED), "user_id").alias("h"))
               .groupBy("event_type", "user_id", "h")
               .agg(F.count("*").alias("cnt")).toPandas())
    totals = exact.groupby("event_type")["cnt"].sum().to_dict()
    assert set(final) == set(totals)

    sks = {}
    for et, row in final.items():
        # streaming state == batch JVM build, byte for byte
        batch = cms_build_jvm(events.where(F.col("event_type") == et),
                              ["user_id"], eps=1e-3, delta=1e-3)
        assert bytes(row["sketch"]) == batch.to_bytes()
        assert row["n_updates"] == totals[et]
        sk = CountMinSketch.from_bytes(bytes(row["sketch"]))
        assert row["error_bound"] == sk.error_bound()
        sks[et] = sk
        # point queries over EVERY user of this key: never undercounts
        # (deterministic); overcount beyond eps*N only with prob ~delta
        sub = exact[exact.event_type == et]
        est = sk.query(to_u64(sub["h"].to_numpy(dtype=np.int64)))
        cnt = sub["cnt"].to_numpy()
        assert (est >= cnt).all()
        over = (est > cnt + sk.error_bound()).sum()
        assert over <= max(1, int(0.01 * len(sub)))

    # cross-key join-size estimation on the STREAMED blobs
    ets = sorted(sks)[:2]
    a, b = sks[ets[0]], sks[ets[1]]
    fa = exact[exact.event_type == ets[0]].set_index("user_id")["cnt"]
    fb = exact[exact.event_type == ets[1]].set_index("user_id")["cnt"]
    exact_dot = int((fa * fb).dropna().sum())
    est_dot = a.inner_product(b)
    assert est_dot >= exact_dot
    assert est_dot <= exact_dot + a.inner_product_bound(b)

    # streamed blobs are first-class in the SQL surface: GROUP BY
    # re-aggregation (sketch_merge) + point query (cms_count) on the merged
    from bloomfilter_spark.sql import register_sketch_sql
    register_sketch_sql(spark)
    spark.createDataFrame(
        [(et, bytes(final[et]["sketch"])) for et in final],
        "event_type string, sketch binary").createOrReplaceTempView(
        "streamed_cms")
    u = int(exact["user_id"].iloc[0])  # BIGINT column: hash the native type
    got = spark.sql(f"""
        SELECT cms_count(sketch_merge(sketch),
                         xxhash64(sketch_seed(), {u}L)) AS est
        FROM streamed_cms""").collect()[0]["est"]
    true_all = int(exact[exact.user_id == u]["cnt"].sum())
    assert got >= true_all
    assert got <= true_all + sum(sk.error_bound() for sk in sks.values())


def test_scalable_bloom_dedup_stream_grows_and_dedups(spark, tmp_path,
                                                      events):
    """Unknown-capacity streaming dedup: with initial_capacity far below
    the key cardinality the state must GROW across micro-batches (multiple
    levels), still emit exactly the first-seen set (zero FN across levels;
    no FP fired at this size), and report the honest analytic compound
    bound."""
    from bloomfilter_spark.streaming import ScalableBloomDedupStream

    src = str(tmp_path / "sc_src")
    keyed = events.select("event_id", "event_type").where(
        F.col("event_id").isNotNull())
    for _ in range(2):  # every key duplicated across batches
        keyed.repartition(8).write.mode("append").parquet(src)

    out: list = []
    dedup = ScalableBloomDedupStream(
        ["event_id"], err_rate=0.001, initial_capacity=256,
        sink=lambda df, e: out.append(df.toPandas()),
        state_dir=str(tmp_path / "sc_state"))
    stream = (spark.readStream.schema(keyed.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = stream.writeStream.foreachBatch(dedup) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)

    import pandas as pd
    emitted = pd.concat(out, ignore_index=True)
    exact_ids = {r["event_id"] for r in keyed.distinct().collect()}
    got = set(emitted["event_id"])
    # zero FN across levels: no key emitted twice, nothing outside exact
    assert emitted["event_id"].is_unique
    assert got <= exact_ids
    # FP drops are the documented trade: bounded by the honest compound
    # bound (with slack for the small-n binomial tail)
    misses = len(exact_ids) - len(got)
    bound = dedup.compound_bound()
    assert misses <= max(5, 4 * bound * len(exact_ids)), (misses, bound)
    assert len(dedup.sbf.filters) > 1          # capacity was unknown: grew
    assert dedup.sbf.count == len(got)
    assert 0.0 < bound < 1.0


def test_scalable_bloom_dedup_stream_restart_and_levels(spark, tmp_path,
                                                        events):
    """Restart restores the multi-level state byte-exactly: the replayed
    epoch is a no-op, later overlapping epochs emit only genuinely new
    keys, and levels keep growing on the restored schedule."""
    from bloomfilter_spark.streaming import ScalableBloomDedupStream

    parts = [events.where(F.col("event_id") % 2 == i)
                   .select("event_id", "event_type") for i in range(2)]
    state = str(tmp_path / "sc_state2")
    out: list = []
    sink = lambda df, e: out.append(df.toPandas())  # noqa: E731

    d1 = ScalableBloomDedupStream(["event_id"], err_rate=0.001,
                                  initial_capacity=1024, sink=sink,
                                  state_dir=state)
    d1(parts[0], 0)
    levels_after_0 = len(d1.sbf.filters)
    d2 = ScalableBloomDedupStream(["event_id"], err_rate=0.001,
                                  initial_capacity=1024, sink=sink,
                                  state_dir=state)
    assert d2.last_epoch == 0
    assert d2.sbf.to_bytes() == d1.sbf.to_bytes()  # byte-exact restore
    d2(parts[0], 0)                                # replay -> no-op
    assert d2.sbf.to_bytes() == d1.sbf.to_bytes()
    d2(parts[0].unionByName(parts[1]), 1)          # half dupes, half new
    assert len(d2.sbf.filters) >= levels_after_0
    import pandas as pd
    emitted = pd.concat(out, ignore_index=True)
    exact = {r["event_id"] for r in events.where(F.col("event_id").isNotNull())
                                          .select("event_id").distinct().collect()}
    got = set(emitted["event_id"])
    assert emitted["event_id"].is_unique       # no duplicate emission
    assert got <= exact
    misses = len(exact) - len(got)
    assert misses <= max(5, 4 * d2.compound_bound() * len(exact))


def test_stateful_grouped_quantile_tdigest_factory(spark, tmp_path, events):
    """The factory parameter genuinely swaps the state kernel: a t-digest
    folded over the stream gives per-key quantiles whose empirical rank is
    close to the requested q (t-digest has no distribution-free worst-case
    bound like KLL, so the check is a loose rank tolerance)."""
    from bloomfilter_spark.sketches import TDigest
    from bloomfilter_spark.streaming import stateful_grouped_quantile

    src = str(tmp_path / "td_src")
    ev = events.where(F.col("value").isNotNull())
    ev.repartition(2).write.parquet(src)
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = stateful_grouped_quantile(stream, "event_type", "value",
                                    factory=lambda: TDigest(200.0),
                                    quantiles=(0.5, 0.9))
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("td_stream").trigger(availableNow=True).start())
    q.awaitTermination(120)
    res = spark.sql("""
        SELECT event_type, q, est, n_updates FROM (
          SELECT *, row_number() OVER (PARTITION BY event_type, q
                                       ORDER BY n_updates DESC) AS rn
          FROM td_stream) WHERE rn = 1""").collect()
    assert res
    exact_n = {r["event_type"]: r["n"] for r in
               ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert {r["event_type"] for r in res} == set(exact_n)
    for r in res:
        assert r["n_updates"] == exact_n[r["event_type"]]
        vals = [x["value"] for x in
                ev.where(F.col("event_type") == r["event_type"])
                  .select(F.col("value").cast("double").alias("value"))
                  .collect()]
        rank = sum(v <= r["est"] for v in vals) / len(vals)
        assert abs(rank - r["q"]) <= 0.05, (r["event_type"], r["q"], rank)


def test_stateful_decayed_heavy_hitters_stream(spark, tmp_path, events):
    """Streaming time-decayed heavy hitters over real event timestamps:
    the final emission's est_decayed equals (to fp, at eps=1e-4 over
    ~1e3 rows/key) the exact per-key decayed counts at the key's own
    max event time, and the top-k order matches the exact order."""
    from bloomfilter_spark.streaming import stateful_decayed_heavy_hitters

    half_life = 7 * 86400.0
    src = str(tmp_path / "dhh_src")
    ev = (events.where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
                .select("event_type",
                        F.col("user_id").cast("string").alias("user_id"),
                        "ts"))
    ev.repartition(3).write.parquet(src)
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = stateful_decayed_heavy_hitters(stream, "event_type", "user_id",
                                         "ts", half_life, k=5,
                                         n_candidates=64)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("dhh_stream").trigger(availableNow=True).start())
    q.awaitTermination(120)
    res = spark.sql("""
        SELECT * FROM (
          SELECT *, dense_rank() OVER (PARTITION BY event_type
                                       ORDER BY n_updates DESC) AS rk
          FROM dhh_stream) WHERE rk = 1""").toPandas()
    assert len(res)

    import math
    exact_rows = (ev.select("event_type", "user_id",
                            F.col("ts").cast("timestamp").cast("double")
                             .alias("sec")).toPandas())
    lam = math.log(2.0) / half_life
    t_ref = exact_rows.groupby("event_type")["sec"].max()
    exact_rows["w"] = np.exp(-lam * (exact_rows["event_type"].map(t_ref)
                                     - exact_rows["sec"]))
    exact = (exact_rows.groupby(["event_type", "user_id"])["w"].sum()
             .reset_index())
    n_exact = exact_rows.groupby("event_type").size().to_dict()
    for etype, grp in res.groupby("event_type"):
        assert (grp["n_updates"] == n_exact[etype]).all()
        assert np.allclose(grp["t_ref"], t_ref[etype])
        ex = (exact[exact["event_type"] == etype]
              .sort_values(["w", "user_id"], ascending=[False, True]))
        top = grp.sort_values(["est_decayed", "user_id"],
                              ascending=[False, True])
        assert len(top) == min(5, len(ex))
        # eps=1e-4 at ~1e3 distinct/key: collision mass is zero here,
        # so estimates are exact decayed counts up to float association
        assert list(top["user_id"]) == list(ex.head(len(top))["user_id"])
        assert np.allclose(top["est_decayed"],
                           ex.head(len(top))["w"], rtol=1e-9)
        assert (top["est_decayed"] <= top["err_bound"]
                + ex.head(len(top))["w"].to_numpy() + 1e-9).all()


def test_stateful_decayed_hh_recency_beats_history_and_chunking(spark,
                                                                tmp_path):
    """Decay semantics: an item with 10x the historical count loses the
    top spot to a currently-spiking one after six half-lives — the exact
    query the undecayed operator cannot answer — and the fold is
    chunking-invariant: 1-file and 3-file replays of the same rows give
    identical est_decayed (up to float association)."""
    from bloomfilter_spark.streaming import stateful_decayed_heavy_hitters

    rows = ([("k", "old", 0.0)] * 100 + [("k", "new", 3600.0)] * 10)
    df = spark.createDataFrame(rows, "key string, item string, sec double")

    def run(n_files: int, name: str):
        src = str(tmp_path / f"src_{name}")
        df.repartition(n_files).write.parquet(src)
        stream = (spark.readStream.schema(df.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = stateful_decayed_heavy_hitters(stream, "key", "item", "sec",
                                             half_life_s=600.0, k=2)
        q = (out.writeStream.outputMode("update").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination(120)
        return (spark.sql(f"SELECT * FROM {name} WHERE n_updates = 110")
                .toPandas().sort_values("item").reset_index(drop=True))

    one, three = run(1, "dhh_one"), run(3, "dhh_three")
    assert list(one["item"]) == list(three["item"]) == ["new", "old"]
    assert np.allclose(one["est_decayed"], three["est_decayed"], rtol=1e-12)
    got = one.set_index("item")["est_decayed"]
    # exact decayed counts at t_ref=3600: new = 10, old = 100 * 2^-6
    assert np.isclose(got["new"], 10.0, rtol=1e-9)
    assert np.isclose(got["old"], 100.0 * 2 ** -6, rtol=1e-9)
    assert got["new"] > got["old"]  # recency wins despite 10x history
    assert np.allclose(one["t_ref"], 3600.0)

    with pytest.raises(ValueError, match="half_life_s"):
        stateful_decayed_heavy_hitters(df, "key", "item", "sec", 0.0)


def test_stateful_decayed_quantile_tracks_current_distribution(spark,
                                                               tmp_path):
    """Decayed quantiles follow the CURRENT distribution: after ten
    half-lives, p50 sits in the new regime's range even though the old
    regime has 2x the row count (the undecayed operator's p50 stays in
    the old range); estimates are rank-accurate against the exact
    decayed-weighted empirical distribution; w_total equals the exact
    surviving decayed mass."""
    import math

    from bloomfilter_spark.streaming import (stateful_decayed_quantile,
                                             stateful_grouped_quantile)

    half_life = 60.0
    old = [("k", float(v), 0.0) for v in range(100, 300)]      # 200 rows
    new = [("k", float(v), 600.0) for v in range(0, 100)]      # 100 rows
    df = spark.createDataFrame(old + new,
                               "key string, v double, sec double")
    src = str(tmp_path / "dq_src")
    df.repartition(3).write.parquet(src)

    def start(qname, op, **kw):
        stream = (spark.readStream.schema(df.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = op(stream, "key", "v", **kw)
        q = (out.writeStream.outputMode("update").format("memory")
             .queryName(qname).trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.sql(f"SELECT * FROM {qname} WHERE n_updates = 300") \
                    .toPandas()

    dec = start("dq_dec", stateful_decayed_quantile, ts_col="sec",
                half_life_s=half_life, quantiles=(0.5, 0.9))
    und = start("dq_und", stateful_grouped_quantile,
                quantiles=(0.5,))

    lam = math.log(2.0) / half_life
    rows = np.array([(v, s) for _, v, s in old + new])
    w = np.exp(-lam * (600.0 - rows[:, 1]))
    order = np.argsort(rows[:, 0], kind="stable")
    vals, ws = rows[order, 0], w[order]
    cdf = np.cumsum(ws) / ws.sum()

    got = dec.set_index("q")["est"]
    # old mass: 200 * 2^-10 ~ 0.2 vs 100 new -> p50 must be in [0, 100)
    assert got[0.5] < 100.0
    und_p50 = und["est"].iloc[0]
    assert und_p50 >= 100.0  # the all-time operator stays in the old range
    for q in (0.5, 0.9):
        # exact weighted CDF at the estimate must be near q
        at = np.interp(got[q], vals, cdf)
        assert abs(at - q) <= 0.05
    assert np.allclose(dec["w_total"], ws.sum(), rtol=1e-9)
    assert np.allclose(dec["t_ref"], 600.0)

    with pytest.raises(ValueError, match="half_life_s"):
        stateful_decayed_quantile(df, "key", "v", "sec", -1.0)


def test_decayed_operators_drop_nan_timestamps(spark, tmp_path):
    """A NaN in a NUMERIC ts column passes isNotNull; without the casted
    NaN filter one poisoned row made ts.max() NaN, pinned t_ref at -inf,
    and every weight became +inf — corrupting the key's state forever.
    Both decayed streaming operators and the batch dual must ignore such
    rows and produce the same finite results as the clean input."""
    import math

    from bloomfilter_spark.operators.topk import decayed_top_items
    from bloomfilter_spark.streaming import (
        stateful_decayed_heavy_hitters, stateful_decayed_quantile)

    rows = [("k", float(v), float(v % 7)) for v in range(1, 101)]
    poisoned = rows + [("k", 42.0, float("nan")), ("k", float("nan"), 3.0)]
    df = spark.createDataFrame(poisoned, "key string, v double, sec double")
    src = str(tmp_path / "nan_src")
    df.repartition(2).write.parquet(src)

    def run(qname, op, **kw):
        stream = (spark.readStream.schema(df.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = op(stream, "key", **kw)
        q = (out.writeStream.outputMode("update").format("memory")
             .queryName(qname).trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.sql(
            f"SELECT * FROM {qname} ORDER BY n_updates DESC").toPandas()

    dq = run("nan_dq", stateful_decayed_quantile, value_col="v",
             ts_col="sec", half_life_s=30.0, quantiles=(0.5,))
    assert dq["n_updates"].iloc[0] == 100     # both poisoned rows dropped
    assert np.isfinite(dq["est"].iloc[0]) and np.isfinite(
        dq["w_total"].iloc[0])
    assert dq["t_ref"].iloc[0] == 6.0

    hh = run("nan_hh", stateful_decayed_heavy_hitters, item_col="v",
             ts_col="sec", half_life_s=30.0, k=5)
    assert hh["n_updates"].iloc[0] == 101     # NaN item is a valid string
    assert np.isfinite(hh["est_decayed"]).all()
    assert float(hh["t_ref"].iloc[0]) == 6.0

    batch = decayed_top_items(df, "key", "v", "sec",
                              half_life_s=30.0, k=5)
    pdf = batch.toPandas().sort_values("decayed_count", ascending=False)
    assert np.isfinite(pdf["decayed_count"]).all()
    lam = math.log(2.0) / 30.0
    # every item occurs once; the top decayed count is the exact NaN-free
    # oracle's max weight (v % 7 == 6 -> landmark-age zero -> weight 1)
    assert abs(pdf["decayed_count"].iloc[0]
               - max(math.exp(-lam * (6.0 - (v % 7)))
                     for v in range(1, 101))) < 1e-9


def test_stateful_grouped_iblt_stream(spark, tmp_path, events):
    """Per-key streaming reconciliation digests: the final streamed state
    is BYTE-IDENTICAL to the batch fast-path build over the same slice
    (IBLT cell algebra is linear, so micro-batch boundaries are
    invisible), and a streamed digest reconciles against a batch digest
    of a DRIFTED snapshot, listing exactly the differing event_ids."""
    import numpy as np

    from bloomfilter_spark.config import DEFAULT_SEED
    from bloomfilter_spark.jvm_build import iblt_build_jvm
    from bloomfilter_spark.sketches import IBLT
    from bloomfilter_spark.streaming import stateful_grouped_iblt

    src = str(tmp_path / "iblt_src")
    events.repartition(3).write.parquet(src)
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = stateful_grouped_iblt(stream, "event_type", "event_id",
                                max_diff=2000)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("iblt_stream").trigger(availableNow=True).start())
    q.awaitTermination(120)
    final = {r["event_type"]: r for r in spark.sql("""
        SELECT event_type, sketch, net_keys FROM (
          SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY net_keys DESC) AS rk
          FROM iblt_stream) WHERE rk = 1""").collect()}

    nn = events.where(F.col("event_id").isNotNull())
    counts = {r["event_type"]: r["n"] for r in
              nn.groupBy("event_type").agg(F.count("*").alias("n"))
                .collect()}
    assert set(final) == set(counts)
    for et, row in final.items():
        # streaming state == batch assume_distinct JVM build, byte for byte
        batch = iblt_build_jvm(nn.where(F.col("event_type") == et),
                               ["event_id"], max_diff=2000,
                               assume_distinct=True)
        assert bytes(row["sketch"]) == batch.to_bytes()
        assert row["net_keys"] == float(counts[et])  # event_id is a PK

    # reconcile a streamed digest against a batch digest of a drifted
    # snapshot of the same key: the 25 removed event_ids peel out exactly
    et = sorted(final)[0]
    slice_et = nn.where(F.col("event_type") == et)
    removed = slice_et.orderBy("event_id").limit(25)
    drifted = slice_et.join(removed, "event_id", "left_anti")
    d_drift = iblt_build_jvm(drifted, ["event_id"], max_diff=2000,
                             assume_distinct=True)
    diff = IBLT.from_bytes(bytes(final[et]["sketch"])).subtract(d_drift)
    pos, neg, complete = diff.decode()
    assert complete and neg.size == 0 and pos.size == 25
    truth = {r["h"] for r in removed.select(
        F.xxhash64(F.lit(DEFAULT_SEED).cast("long"),
                   "event_id").alias("h")).collect()}
    assert {int(np.int64(np.uint64(p))) for p in pos.tolist()} == truth
