"""Cross-geometry sketch folds (kernel fold() methods + the sketch_fold /
cms_fold SQL functions): the warehouse escape hatch for geometry
migrations — tables built at different precisions/sizes become mergeable
by folding the finer one down.

Exactness contract (proved in each kernel's fold() docstring, pinned
here byte-for-byte): HLL precision fold, Bloom size fold, plain-CMS
width/depth fold, and theta k-fold of a directly-built sketch each equal
a DIRECT build at the target geometry over the same input. MG / KLL /
t-digest folds carry published additive error instead (order-dependent
or randomized-compaction state), asserted against their bounds."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.sketches import (BloomFilter, CountMinSketch,
                                        HyperLogLog, KLL, MisraGries,
                                        ThetaSketch)
from bloomfilter_spark.sketches.scalable import ScalableBloomFilter
from bloomfilter_spark.sketches.tdigest import TDigest
from bloomfilter_spark.sql import register_sketch_sql


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_sketch_sql(spark)


@pytest.fixture(scope="module")
def hashes():
    return np.random.default_rng(0xF01D).integers(
        0, 2 ** 64, 100_000, dtype=np.uint64)


# --- exact folds: byte-identical to a direct build at the target ---------

def test_hll_fold_byte_equal_direct_build(hashes):
    src = HyperLogLog(14)
    src.update(hashes)
    before = src.to_bytes()
    for p in (12, 10, 6, 4):
        direct = HyperLogLog(p)
        direct.update(hashes)
        assert src.fold(p).to_bytes() == direct.to_bytes()
    assert src.fold(14).to_bytes() == before        # identity fold
    assert src.to_bytes() == before                 # source unmutated


def test_hll_fold_chain_equals_single_fold(hashes):
    src = HyperLogLog(14)
    src.update(hashes)
    assert (src.fold(12).fold(8).to_bytes()
            == src.fold(8).to_bytes())


def test_bloom_fold_byte_equal_and_zero_fn(hashes):
    for variant in ("km64", "shift32"):
        src = BloomFilter(1 << 17, 5, variant=variant)
        src.update(hashes)
        direct = BloomFilter(1 << 13, 5, variant=variant)
        direct.update(hashes)
        folded = src.fold(1 << 13)
        assert folded.to_bytes() == direct.to_bytes()
        # exactness implies membership is preserved, but pin it anyway:
        # zero false negatives is THE contract
        assert folded.contains(hashes).all()
        # degraded FPR is visible through the observed-fill formula
        assert folded.fpp() > src.fpp()


def test_cms_plain_fold_byte_equal(hashes):
    src = CountMinSketch(width=1024, depth=5)
    src.update(hashes)
    direct = CountMinSketch(width=256, depth=3)
    direct.update(hashes)
    assert src.fold(width=256, depth=3).to_bytes() == direct.to_bytes()
    # non-pow-2 divisor widths fold exactly too (mod-w nesting needs
    # divisibility, not a power of two)
    src2 = CountMinSketch(width=900, depth=4)
    src2.update(hashes)
    direct2 = CountMinSketch(width=300, depth=4)
    direct2.update(hashes)
    assert src2.fold(width=300).to_bytes() == direct2.to_bytes()


def test_cms_conservative_fold_keeps_bounds(hashes):
    import collections
    true = collections.Counter(hashes.tolist())
    src = CountMinSketch(width=2048, depth=5, conservative=True)
    src.update(hashes)
    folded = src.fold(width=512, depth=3)
    plain = CountMinSketch(width=512, depth=3)
    plain.update(hashes)
    probe = hashes[:500]
    tv = np.array([true[int(x)] for x in probe])
    est = folded.query(probe)
    assert (est >= tv).all()                        # never undercounts
    assert (est <= plain.query(probe)).all()        # <= the plain fold
    assert folded.total == src.total


def test_theta_fold_byte_equal_direct_build(hashes):
    src = ThetaSketch(4096)
    src.update(hashes)
    direct = ThetaSketch(128)
    direct.update(hashes)
    folded = src.fold(128)
    assert folded.to_bytes() == direct.to_bytes()
    assert folded.rse() == direct.rse()
    assert src.fold(4096).to_bytes() == src.to_bytes()


def test_theta_fold_of_merged_sketch_estimates_within_bound(hashes):
    a, b = ThetaSketch(2048), ThetaSketch(2048)
    a.update(hashes[:60_000])
    b.update(hashes[40_000:])
    merged = a.merge(b)
    folded = merged.fold(256)
    n_true = len(np.unique(hashes))
    assert abs(folded.estimate() - n_true) <= 5 * folded.rse() * n_true


# --- bounded folds: MG / KLL / t-digest -----------------------------------

def test_mg_fold_bounds_hold_at_new_k():
    import collections
    rng = np.random.default_rng(7)
    stream = rng.zipf(1.3, 200_000).astype(np.uint64)
    true = collections.Counter(stream.tolist())
    src = MisraGries(512)
    src.update(stream)
    folded = src.fold(64)
    assert folded.n == src.n
    assert folded.dec <= folded.n / (64 + 1)        # Agarwal et al. bound
    probe = stream[:200]
    tv = np.array([true[int(x)] for x in probe])
    lo = folded.query(probe)
    assert (lo <= tv).all()                         # never overcounts
    assert (lo + folded.dec >= tv).all()            # sandwich upper arm


def test_kll_fold_rank_error_within_double_bound():
    rng = np.random.default_rng(9)
    vals = rng.normal(0.0, 1.0, 300_000)
    sv = np.sort(vals)
    src = KLL(400)
    src.update(vals)
    folded = src.fold(100)
    assert folded.n == src.n
    eps = 2 * 1.7 / 100                             # eps(old k) + eps(new k)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        r = np.searchsorted(sv, folded.quantile(q)) / sv.size
        assert abs(r - q) <= eps + 0.005
    # deterministic: same source folds to the same bytes
    assert src.fold(100).to_bytes() == folded.to_bytes()


def test_tdigest_fold_carries_extremes_and_error_bound():
    rng = np.random.default_rng(21)
    vals = rng.lognormal(0.0, 1.0, 200_000)
    sv = np.sort(vals)
    src = TDigest(500)
    src.update(vals)
    folded = src.fold(50)
    assert folded.vmin == src.vmin and folded.vmax == src.vmax
    assert len(folded.means) <= len(src.means)
    for q in (0.05, 0.5, 0.95):
        r = np.searchsorted(sv, folded.quantile(q)) / sv.size
        assert abs(r - q) <= 3 * folded.rank_error_bound(q) + 0.005


# --- fold-then-merge: the cross-geometry migration scenario ---------------

def test_fold_enables_cross_geometry_merge(hashes):
    """Two warehoused tables built at different precisions: folding the
    finer one makes them mergeable, and the result is byte-identical to
    a single direct build at the coarse precision."""
    old = HyperLogLog(12)
    old.update(hashes[:50_000])
    new = HyperLogLog(14)                           # migrated precision
    new.update(hashes[50_000:])
    with pytest.raises(ValueError, match="precision mismatch"):
        HyperLogLog(12).merge(new)
    merged = old.merge(new.fold(12))
    direct = HyperLogLog(12)
    direct.update(hashes)
    assert merged.to_bytes() == direct.to_bytes()


# --- error cases -----------------------------------------------------------

def test_fold_up_and_invalid_targets_raise(hashes):
    hll = HyperLogLog(10)
    with pytest.raises(ValueError, match="fold target"):
        hll.fold(12)
    with pytest.raises(ValueError, match="fold target"):
        BloomFilter(1 << 10, 3).fold(1 << 12)
    cms = CountMinSketch(width=1000, depth=4)
    with pytest.raises(ValueError, match="divisor"):
        cms.fold(width=300)
    with pytest.raises(ValueError, match="depth"):
        cms.fold(depth=5)
    with pytest.raises(ValueError, match="fold target"):
        ThetaSketch(64).fold(128)
    with pytest.raises(ValueError, match=">= 16"):
        ThetaSketch(64).fold(8)
    with pytest.raises(ValueError, match="fold target"):
        MisraGries(16).fold(32)
    with pytest.raises(ValueError, match="fold target"):
        KLL(100).fold(200)
    with pytest.raises(ValueError, match="fold target"):
        TDigest(100).fold(200)


# --- SQL surface -----------------------------------------------------------

def test_sql_sketch_fold_all_families(spark, hashes):
    from bloomfilter_spark.sketches.counting import CountingBloomFilter
    rows = [
        ("hll", HyperLogLog(14), 10),
        ("bloom", BloomFilter(1 << 16, 5), 1 << 12),
        ("counting_bloom", CountingBloomFilter(1 << 16, 5), 1 << 12),
        ("cms", CountMinSketch(width=1024, depth=4), 256),
        ("theta", ThetaSketch(1024), 64),
        ("mg", MisraGries(256), 32),
    ]
    data = []
    for name, sk, target in rows:
        sk.update(hashes)
        data.append((name, sk.to_bytes(), target))
    kll = KLL(400)
    kll.update(hashes.astype(np.float64))
    data.append(("kll", kll.to_bytes(), 100))
    td = TDigest(400)
    td.update(hashes.astype(np.float64))
    data.append(("tdigest", td.to_bytes(), 100))
    from bloomfilter_spark.sketches import SampleSketch, WeightedSampleSketch
    sp = SampleSketch(256)
    sp.update(hashes, [f"p{i}".encode() for i in range(len(hashes))])
    data.append(("sample", sp.to_bytes(), 64))
    ws = WeightedSampleSketch(256)
    ws.update(hashes, (hashes % np.uint64(97)).astype(np.float64) + 1.0,
              [f"p{i}".encode() for i in range(len(hashes))])
    data.append(("weighted_sample", ws.to_bytes(), 64))
    from bloomfilter_spark.sketches import IBLT
    ib = IBLT(1 << 12, 4)
    ib.update(np.unique(hashes))
    data.append(("iblt", ib.to_bytes(), 1 << 10))
    spark.createDataFrame(data, "family string, sketch binary, target int") \
         .createOrReplaceTempView("fold_src")
    got = {r["family"]: bytes(r["folded"]) for r in spark.sql(
        "SELECT family, sketch_fold(sketch, target) AS folded FROM fold_src"
    ).collect()}
    # SQL fold == kernel fold, byte for byte, for every family
    from bloomfilter_spark.sketches import sketch_from_bytes
    for name, blob, target in data:
        assert got[name] == sketch_from_bytes(blob).fold(target).to_bytes()
    # and the exact families match a direct build
    direct_hll = HyperLogLog(10)
    direct_hll.update(hashes)
    assert got["hll"] == direct_hll.to_bytes()


def test_sql_fold_then_merge_and_probe(spark, hashes):
    """End-to-end migration in SQL: fold a fine filter, merge with a
    coarse one, probe membership — zero false negatives throughout."""
    fine = BloomFilter(1 << 16, 5)
    fine.update(hashes[:50_000])
    coarse = BloomFilter(1 << 12, 5)
    coarse.update(hashes[50_000:])
    spark.createDataFrame(
        [(fine.to_bytes(), coarse.to_bytes())], "fine binary, coarse binary"
    ).createOrReplaceTempView("mig")
    blob = bytes(spark.sql(
        f"SELECT sketch_merge_pair(sketch_fold(fine, {1 << 12}), coarse) "
        "AS m FROM mig").collect()[0]["m"])
    merged = BloomFilter.from_bytes(blob)
    assert merged.contains(hashes).all()
    direct = BloomFilter(1 << 12, 5)
    direct.update(hashes)
    assert blob == direct.to_bytes()


def test_sql_cms_fold_width_and_depth(spark, hashes):
    src = CountMinSketch(width=2048, depth=6)
    src.update(hashes)
    spark.createDataFrame([(src.to_bytes(),)], "sketch binary") \
         .createOrReplaceTempView("cms_fold_src")
    blob = bytes(spark.sql(
        "SELECT cms_fold(sketch, 512, 3) AS f FROM cms_fold_src"
    ).collect()[0]["f"])
    direct = CountMinSketch(width=512, depth=3)
    direct.update(hashes)
    assert blob == direct.to_bytes()


def test_sql_fold_scalable_bloom_raises(spark, hashes):
    sb = ScalableBloomFilter()
    sb.update(hashes[:1000])
    spark.createDataFrame([(sb.to_bytes(),)], "sketch binary") \
         .createOrReplaceTempView("sb_fold_src")
    with pytest.raises(Exception, match="not foldable"):
        spark.sql("SELECT sketch_fold(sketch, 64) AS f FROM sb_fold_src") \
             .collect()


def test_sql_fold_null_passthrough(spark):
    spark.createDataFrame([(None,)], "sketch binary") \
         .createOrReplaceTempView("null_fold_src")
    row = spark.sql(
        "SELECT sketch_fold(sketch, 8) AS f FROM null_fold_src"
    ).collect()[0]
    assert row["f"] is None


# --- shard-table folds (operators/sharded.py) -------------------------------

def _shard_map(tbl):
    return {r["shard"]: bytes(r["sketch"]) for r in tbl.collect()}


def test_fold_shard_table_byte_equal_both_routes(spark, events):
    """Fold-shards(64->16) == direct 16-shard build bit-folded per shard:
    routing (top bits) and probing (masked bits) use disjoint hash bits,
    so the two routes to '16 shards at the 64-build geometry' coincide
    byte-for-byte."""
    from bloomfilter_spark.operators.sharded import (build_sharded_bloom,
                                                     fold_shard_table)
    cols, cap, fpr = ["event_id"], 60_000, 0.01
    t64 = build_sharded_bloom(events, cols, capacity=cap, fpr=fpr,
                              n_shards=64).persist()
    left = _shard_map(fold_shard_table(t64, 16))
    m64 = BloomFilter.from_bytes(next(iter(left.values()))).num_bits
    t16 = build_sharded_bloom(events, cols, capacity=cap, fpr=fpr,
                              n_shards=16)
    right = _shard_map(fold_shard_table(t16, 16, num_bits=m64))
    assert left == right and len(left) > 1
    # identity fold: same count, no bit fold -> byte-identical table
    assert _shard_map(fold_shard_table(t64, 64)) == _shard_map(t64)
    t64.unpersist()


def test_fold_shard_table_zero_fn_and_routing(spark, events):
    from bloomfilter_spark.operators.sharded import (build_sharded_bloom,
                                                     fold_shard_table,
                                                     sharded_membership)
    t = build_sharded_bloom(events, ["event_id"], capacity=60_000,
                            fpr=0.01, n_shards=32)
    folded = fold_shard_table(t, 8).persist()
    assert folded.select("n_shards").distinct().collect()[0][0] == 8
    probe = events.select("event_id").where(F.col("event_id").isNotNull())
    res = sharded_membership(probe, folded, ["event_id"])
    assert res.where(~F.col("is_member")).count() == 0  # zero FN
    folded.unpersist()


def test_fold_shard_table_migration_merge(spark, events):
    """The guard's migration path, end to end: a 64-shard table and a
    16-shard table (different builds) refuse a direct merge, but fold
    both to a common (count, bits) geometry and merge_shard_tables
    unions them — zero FN over BOTH corpora."""
    from bloomfilter_spark.operators.sharded import (build_sharded_bloom,
                                                     fold_shard_table,
                                                     merge_shard_tables,
                                                     sharded_membership)
    half_a = events.where("event_id % 2 = 0")
    half_b = events.where("event_id % 2 = 1")
    ta = build_sharded_bloom(half_a, ["event_id"], capacity=30_000,
                             fpr=0.01, n_shards=64)
    tb = build_sharded_bloom(half_b, ["event_id"], capacity=30_000,
                             fpr=0.01, n_shards=16)
    with pytest.raises(Exception, match="different"):
        merge_shard_tables([ta, tb]).collect()
    fa = fold_shard_table(ta, 16).persist()
    m_common = min(
        BloomFilter.from_bytes(bytes(fa.first()["sketch"])).num_bits,
        BloomFilter.from_bytes(bytes(tb.first()["sketch"])).num_bits)
    fa2 = fold_shard_table(fa, 16, num_bits=m_common)
    fb = fold_shard_table(tb, 16, num_bits=m_common)
    merged = merge_shard_tables([fa2, fb]).persist()
    probe = events.select("event_id").where(F.col("event_id").isNotNull())
    res = sharded_membership(probe, merged, ["event_id"])
    assert res.where(~F.col("is_member")).count() == 0
    fa.unpersist()
    merged.unpersist()


def test_fold_shard_table_guards(spark, events):
    from bloomfilter_spark.operators.sharded import (build_sharded_bloom,
                                                     fold_shard_table)
    t = build_sharded_bloom(events, ["event_id"], capacity=10_000,
                            fpr=0.01, n_shards=8)
    with pytest.raises(ValueError, match="power of two"):
        fold_shard_table(t, 3)
    with pytest.raises(Exception, match="divide the build count"):
        fold_shard_table(t, 16).collect()   # upfold
    # mixed build counts in one input refuse the fold
    t2 = build_sharded_bloom(events, ["event_id"], capacity=10_000,
                             fpr=0.01, n_shards=16)
    with pytest.raises(Exception, match="mixed build n_shards"):
        fold_shard_table(t.unionByName(t2), 4).collect()
