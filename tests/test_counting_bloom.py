"""Counting Bloom filter (sketches/counting.py): the delete-capable
membership family. Contract under test:

  - zero false negatives for any insert/delete/merge schedule where
    deletes only remove inserted keys
  - insert→delete round-trips back to the EXACT empty state (byte-equal)
  - membership and wire bytes line up with the plain BloomFilter built
    over the same keys (same geometry/probes), via to_bloom()
  - merge is associative/commutative with empty identity, partition- and
    order-invariant (the property the distributed two-level build needs)
  - fold() is byte-identical to a direct build at the smaller geometry
  - unsafe deletes (underflow within a batch) fail loudly, state intact
  - saturated cells are sticky: never decremented, never false-negative
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.agg import build_sketch, hash_col
from bloomfilter_spark.config import DEFAULT_SEED
from bloomfilter_spark.sizing import suggest_sketch
from bloomfilter_spark.sketches import (BloomFilter, CountingBloomFilter,
                                        sketch_from_bytes)
from bloomfilter_spark.sql import register_sketch_sql


@pytest.fixture()
def rng():
    return np.random.default_rng(0xCB10)


def hashes(rng, n):
    return rng.integers(0, 2 ** 64, n, dtype=np.uint64)


# --- kernel ---------------------------------------------------------------

def test_zero_false_negatives_and_fpr(rng):
    members = hashes(rng, 20_000)
    probes = hashes(rng, 50_000)
    cbf = CountingBloomFilter.for_capacity(20_000, 0.01)
    cbf.update(members)
    assert cbf.contains(members).all()  # the hard guarantee
    disjoint = probes[~np.isin(probes, members)]
    observed = cbf.contains(disjoint).mean()
    assert observed <= 0.015  # sized bound + slack for sampling noise


def test_insert_delete_roundtrip_is_byte_exact_empty(rng):
    keys = hashes(rng, 5_000)
    cbf = CountingBloomFilter(1 << 14, 5)
    empty_bytes = cbf.to_bytes()
    cbf.update(keys)
    assert cbf.contains(keys).all()
    deleted = cbf.delete(keys)
    assert deleted.all()
    assert cbf.to_bytes() == empty_bytes
    assert cbf.estimate() == 0.0 and cbf.fpp() == 0.0


def test_partial_delete_keeps_remaining_members(rng):
    keys = hashes(rng, 8_000)
    gone, kept = keys[:4_000], keys[4_000:]
    cbf = CountingBloomFilter.for_capacity(8_000, 0.01)
    cbf.update(keys)
    assert cbf.delete(gone).all()
    # zero FN on the survivors — the whole point of counters over bits
    assert cbf.contains(kept).all()
    # and the filter got emptier, not just different
    direct = CountingBloomFilter.for_capacity(8_000, 0.01)
    direct.update(kept)
    assert cbf.to_bytes() == direct.to_bytes()  # multiset-exact deletes


def test_delete_absent_key_is_noop_with_false_mask(rng):
    keys = hashes(rng, 1_000)
    absent = hashes(rng, 1_000)
    absent = absent[~np.isin(absent, keys)]
    cbf = CountingBloomFilter(1 << 16, 7)  # oversized: ~no false positives
    cbf.update(keys)
    before = cbf.to_bytes()
    mask = cbf.delete(absent)
    assert not mask.any()
    assert cbf.to_bytes() == before


def test_double_delete_in_one_batch_raises_and_preserves_state(rng):
    key = hashes(rng, 1)
    cbf = CountingBloomFilter(1 << 10, 4)
    cbf.update(key)
    before = cbf.to_bytes()
    with pytest.raises(ValueError, match="underflow"):
        cbf.delete(np.concatenate([key, key]))
    assert cbf.to_bytes() == before
    assert cbf.contains(key).all()


def test_weighted_update_equals_repeated_and_validates(rng):
    keys = hashes(rng, 300)
    w = rng.integers(1, 9, 300)
    a = CountingBloomFilter(1 << 12, 3)
    a.update(keys, w)
    b = CountingBloomFilter(1 << 12, 3)
    b.update(np.repeat(keys, w))
    assert a.to_bytes() == b.to_bytes()
    assert np.all(a.query(keys) >= w)  # never undercounts multiplicity
    with pytest.raises(ValueError, match="non-negative integers"):
        a.update(keys[:2], np.array([1.5, 2.0]))
    with pytest.raises(ValueError, match="shape"):
        a.update(keys[:2], np.array([1]))


def test_merge_laws_partition_and_order_invariance(rng):
    keys = hashes(rng, 30_000)
    full = CountingBloomFilter(1 << 15, 5)
    full.update(keys)
    parts = []
    for chunk in np.array_split(rng.permutation(keys), 7):
        s = CountingBloomFilter(1 << 15, 5)
        s.update(chunk)
        parts.append(s)
    # left fold and right fold both equal the single-pass build
    lf = CountingBloomFilter(1 << 15, 5)
    for p in parts:
        lf.merge(p)
    rf = CountingBloomFilter(1 << 15, 5)
    for p in reversed(parts):
        rf.merge(p)
    assert lf.to_bytes() == rf.to_bytes() == full.to_bytes()
    with pytest.raises(ValueError, match="geometry"):
        full.merge(CountingBloomFilter(1 << 14, 5))


def test_fold_byte_equals_direct_build(rng):
    keys = hashes(rng, 10_000)
    big = CountingBloomFilter(1 << 16, 4)
    big.update(keys)
    small = CountingBloomFilter(1 << 12, 4)
    small.update(keys)
    assert big.fold(1 << 12).to_bytes() == small.to_bytes()
    assert big.num_cells == 1 << 16  # source not mutated
    with pytest.raises(ValueError, match="exceeds"):
        small.fold(1 << 16)


def test_to_bloom_byte_equals_direct_bloom(rng):
    keys = hashes(rng, 10_000)
    cbf = CountingBloomFilter(1 << 14, 5)
    cbf.update(keys)
    bf = BloomFilter(1 << 14, 5)
    bf.update(keys)
    assert cbf.to_bloom().to_bytes() == bf.to_bytes()
    probes = hashes(rng, 5_000)
    assert np.array_equal(cbf.contains(probes), bf.contains(probes))


def test_saturation_is_sticky_and_never_false_negative():
    cbf = CountingBloomFilter(64, 1)
    key = np.array([12345], dtype=np.uint64)
    cbf.update(key, np.array([0xFFFFFFFF], dtype=np.int64))
    cbf.update(key)  # would overflow without saturation
    assert int(cbf.cells.max()) == 0xFFFFFFFF
    cbf.delete(key)  # sticky: saturated cell is not decremented
    assert cbf.contains(key).all()
    # merge of two saturated states stays saturated (assoc/comm safe)
    cbf.merge(cbf)
    assert int(cbf.cells.max()) == 0xFFFFFFFF


def test_wire_roundtrip_dense_sparse_and_registry(rng):
    sparse = CountingBloomFilter(1 << 14, 5)
    sparse.update(hashes(rng, 50))  # few cells of many: sparse mode
    dense = CountingBloomFilter(64, 2)
    dense.update(hashes(rng, 500))  # most cells set: dense mode
    for sk in (sparse, dense):
        back = sketch_from_bytes(sk.to_bytes())
        assert isinstance(back, CountingBloomFilter)
        assert back.to_bytes() == sk.to_bytes()
        assert np.array_equal(back.cells, sk.cells)
    # mode byte sits after the 10B header + 4B CRC + 13B params
    assert sparse.to_bytes()[10 + 4 + 13] == 1
    assert dense.to_bytes()[10 + 4 + 13] == 0
    # params-only zero reconstruction (warehouse factory path)
    proto = CountingBloomFilter._from_payload(
        sparse._payload()[0], b"")
    assert proto.num_cells == sparse.num_cells and proto.cells.sum() == 0


def test_sizing_dispatcher_counting_bloom():
    plan = suggest_sketch("counting_bloom", capacity=100_000, err_rate=0.01)
    built = CountingBloomFilter(**plan["params"])
    bloom_plan = suggest_sketch("bloom", capacity=100_000, err_rate=0.01)
    assert plan["params"]["num_cells"] == bloom_plan["params"]["num_bits"]
    assert plan["state_bytes"] == built.state_nbytes  # 4 bytes per cell
    assert plan["predicted_error"] <= 0.01


# --- distributed build + SQL surface ---------------------------------------

def test_spark_build_partition_invariance_and_sql(spark, rng):
    register_sketch_sql(spark)
    df = spark.range(0, 20_000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"))
    factory = lambda: CountingBloomFilter(1 << 20, 5)
    a = build_sketch(df.repartition(1), "k", factory)
    b = build_sketch(df.repartition(13), "k", factory)
    assert a.to_bytes() == b.to_bytes()  # merge path invariant
    # kernel-parity: the distributed build equals a local build over the
    # same xxhash64 stream
    local = factory()
    hs = np.array([r[0] for r in df.select(
        hash_col([F.col("k")], DEFAULT_SEED)).collect()],
        dtype=np.int64).view(np.uint64)
    local.update(hs)
    assert local.to_bytes() == a.to_bytes()
    # SQL surface: generic estimate/error-bound/describe/contains all
    # dispatch on the new family
    sdf = spark.createDataFrame([(bytearray(a.to_bytes()),)], "s binary")
    sdf.createOrReplaceTempView("cbf_t")
    row = spark.sql("""
        SELECT sketch_estimate(s) AS est,
               sketch_error_bound(s) AS fpp,
               sketch_describe(s) AS d,
               bloom_contains(s, xxhash64(sketch_seed(), 'key-7')) AS hit,
               cms_count(s, xxhash64(sketch_seed(), 'key-7')) AS mult
        FROM cbf_t""").first()
    assert abs(row["est"] - 20_000) / 20_000 < 0.05
    assert 0.0 < row["fpp"] < 0.01
    assert '"family": "CountingBloomFilter"' in row["d"]
    assert row["hit"] is True and row["mult"] >= 1
    # sketch_fold through SQL equals the kernel fold
    folded = spark.sql(
        f"SELECT sketch_fold(s, {1 << 12}) AS f FROM cbf_t").first()["f"]
    assert bytes(folded) == a.fold(1 << 12).to_bytes()
