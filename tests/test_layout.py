"""Data-layout operators: Z-order clustering, equi-depth bucketing, and
sketch-driven range-partitioned writes (operators/layout.py)."""

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.operators.file_index import (build_file_bloom_index,
                                                    prune_files)
from bloomfilter_spark.operators.layout import (equidepth_bucket,
                                                hash_bucket,
                                                kll_cut_points,
                                                write_range_partitioned,
                                                zorder_key, zorder_write)
from bloomfilter_spark.sketches.kll import KLL


def _morton_py(vals, bits):
    """Reference interleave: bit i of column j -> output bit i*d + j."""
    d = len(vals)
    out = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * d + j)
    return out


# --- zorder_key ----------------------------------------------------------

def test_zorder_key_matches_reference_interleave(spark):
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 1 << 10, 200)
    ys = rng.integers(0, 1 << 10, 200)
    zs = rng.integers(0, 1 << 10, 200)
    df = spark.createDataFrame(
        [(int(x), int(y), int(z)) for x, y, z in zip(xs, ys, zs)],
        "x long, y long, z long")
    got = df.select(zorder_key(["x", "y", "z"], bits=10).alias("zk"),
                    "x", "y", "z").collect()
    for r in got:
        assert r["zk"] == _morton_py([r["x"], r["y"], r["z"]], 10)


def test_zorder_key_validation():
    with pytest.raises(ValueError):
        zorder_key([], bits=8)
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], bits=16)  # 64 > 62


def test_zorder_key_is_codegen_expression(spark):
    """The interleave must stay a pure Catalyst projection — no UDF, no
    exchange of its own."""
    df = spark.range(100).select(F.col("id").alias("x"),
                                 (F.col("id") * 3).alias("y"))
    plan = df.select(zorder_key(["x", "y"], bits=8)) \
             ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- equi-depth bucketing ------------------------------------------------

def test_equidepth_bucket_matches_searchsorted(spark):
    rng = np.random.default_rng(11)
    vals = rng.normal(50, 20, 500)
    cuts = np.quantile(vals, [0.25, 0.5, 0.75])
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = {r["v"]: r["b"]
           for r in df.select("v", equidepth_bucket("v", cuts).alias("b"))
                      .collect()}
    for v in vals:
        assert got[float(v)] == int(np.searchsorted(cuts, v, side="right"))


def test_kll_cut_points_balance_skewed_data(spark):
    """Equi-depth buckets from a KLL sketch stay balanced on Zipf-ish
    data where uniform-width buckets would collapse into one."""
    rng = np.random.default_rng(3)
    vals = rng.zipf(1.5, 20000).astype(np.float64)  # heavy tail
    sk = KLL(k=200)
    sk.update(vals)
    n_buckets = 8
    cuts = kll_cut_points(sk, n_buckets)
    ids = np.searchsorted(cuts, vals, side="right")
    counts = np.bincount(ids, minlength=n_buckets)
    # KLL rank error ~1.7%/k=200 -> every bucket within a loose 3x of fair
    # share EXCEPT buckets squeezed empty by duplicate cut points (heavy
    # single values) — those merge into their neighbour, which then holds
    # the combined share.
    nonzero = counts[counts > 0]
    fair = len(vals) / n_buckets
    assert nonzero.max() <= 4 * fair


# --- clustering actually helps skipping ----------------------------------

@pytest.fixture(scope="module")
def tmpdir_mod():
    d = tempfile.mkdtemp(prefix="layout_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_zorder_write_improves_bloom_pruning(spark, lineitem, tmpdir_mod):
    """Equality probes against the Bloom file index must open FEWER files
    on a Z-clustered layout than on a random one: clustering by
    hash_bucket(l_partkey) x hash_bucket(l_suppkey) confines each key to
    few files on BOTH dimensions at once."""
    n_files = 8
    random_path = f"{tmpdir_mod}/random"
    zpath = f"{tmpdir_mod}/zorder"
    cols = ["l_orderkey", "l_partkey", "l_suppkey"]
    src = lineitem.select(*cols)
    src.repartition(n_files, "l_orderkey").write.mode("overwrite") \
       .parquet(random_path)
    zorder_write(src, zpath,
                 [hash_bucket("l_partkey", 10), hash_bucket("l_suppkey", 10)],
                 n_files=n_files, bits=10)

    # same rows both layouts
    assert (spark.read.parquet(zpath).count() ==
            spark.read.parquet(random_path).count())

    # few probe keys: a perfectly clustered layout opens <= |probe| files,
    # a scattered one opens ~all of them (each key's rows land everywhere)
    probe = src.select("l_partkey").distinct().limit(3)
    opened = {}
    for name, path in [("random", random_path), ("zorder", zpath)]:
        idx = build_file_bloom_index(spark, path, ["l_partkey"], fpr=0.001)
        opened[name] = len(prune_files(idx, ["l_partkey"], probe))
    # the z-ordered layout clusters each partkey into few files; the
    # orderkey-partitioned layout scatters it across most of them
    assert opened["zorder"] < opened["random"]

    # and the OTHER interleaved dimension prunes too (the point of Z-order)
    sprobe = src.select("l_suppkey").distinct().limit(2)
    idx_z = build_file_bloom_index(spark, zpath, ["l_suppkey"], fpr=0.001)
    idx_r = build_file_bloom_index(spark, random_path, ["l_suppkey"],
                                   fpr=0.001)
    assert (len(prune_files(idx_z, ["l_suppkey"], sprobe)) <=
            len(prune_files(idx_r, ["l_suppkey"], sprobe)))


def test_write_range_partitioned_balanced_and_ordered(spark, tmpdir_mod):
    """Sketch-driven range write: near-equal bucket sizes on skewed data
    and non-overlapping value ranges across bucket directories."""
    rng = np.random.default_rng(5)
    vals = np.concatenate([rng.exponential(10, 30000),
                           rng.normal(200, 5, 10000)])  # bimodal + skew
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    sk = KLL(k=200)
    sk.update(vals)
    path = f"{tmpdir_mod}/ranged"
    n_buckets = 8
    write_range_partitioned(df, path, "v", sk, n_buckets)

    out = spark.read.parquet(path)
    assert out.count() == len(vals)
    stats = (out.groupBy("__bucket")
                .agg(F.count("*").alias("n"), F.min("v").alias("lo"),
                     F.max("v").alias("hi"))
                .orderBy("__bucket").collect())
    fair = len(vals) / n_buckets
    assert all(r["n"] <= 2.5 * fair for r in stats)
    for a, b in zip(stats, stats[1:]):
        assert a["hi"] <= b["lo"] + 1e-9  # order-preserving buckets


# --- bucketed co-located joins -------------------------------------------

def test_bucketed_join_no_exchange(spark, tmp_path):
    """Both sides bucketed by the join key with equal bucket counts:
    the join plans with ZERO Exchange (the shuffle was paid once at
    write time), and results are identical to the plain shuffled join."""
    from bloomfilter_spark.operators import (bucketed_join, has_exchange,
                                             write_bucketed)
    left = spark.range(10_000).selectExpr(
        "id AS k", "id * 2 AS lv")
    right = spark.range(5_000).selectExpr(
        "id * 2 AS k", "id AS rv")
    write_bucketed(left, "t_bkt_left", "k", 8,
                   path=str(tmp_path / "left"))
    write_bucketed(right, "t_bkt_right", "k", 8,
                   path=str(tmp_path / "right"))
    try:
        joined = bucketed_join(spark, "t_bkt_left", "t_bkt_right", "k")
        assert not has_exchange(joined)
        got = sorted(joined.collect())
        want = sorted(left.join(right, "k").collect())
        assert got == want
        # sanity: the same join WITHOUT bucketing does shuffle
        assert has_exchange(left.join(right, "k"))
        # groupBy on the bucket key also skips its shuffle
        agg = spark.table("t_bkt_left").groupBy("k").count()
        assert not has_exchange(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_left")
        spark.sql("DROP TABLE IF EXISTS t_bkt_right")


def test_bucketed_join_composite_key(spark, tmp_path):
    from bloomfilter_spark.operators import (bucketed_join, has_exchange,
                                             write_bucketed)
    df = spark.range(2_000).selectExpr(
        "id % 50 AS a", "id % 7 AS b", "id AS v")
    other = spark.range(500).selectExpr(
        "id % 50 AS a", "id % 7 AS b", "id AS w")
    write_bucketed(df, "t_bkt_c1", ["a", "b"], 4,
                   path=str(tmp_path / "c1"))
    write_bucketed(other, "t_bkt_c2", ["a", "b"], 4,
                   path=str(tmp_path / "c2"))
    try:
        joined = bucketed_join(spark, "t_bkt_c1", "t_bkt_c2", ["a", "b"])
        assert not has_exchange(joined)
        assert joined.count() == df.join(other, ["a", "b"]).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_c1")
        spark.sql("DROP TABLE IF EXISTS t_bkt_c2")


def test_equidepth_bucket_null_values_get_null_buckets(spark):
    """Regression: the higher-order fold evaluates (NULL >= cut) to NULL
    and when(NULL).otherwise(0) to 0, so without the explicit null guard
    every NULL row silently landed in bucket 0 — skewing the lowest
    equi-depth bucket. NULLs must get NULL buckets, as documented."""
    from bloomfilter_spark.operators.layout import equidepth_bucket

    df = spark.createDataFrame([(1.0,), (5.0,), (None,)], "v double")
    got = (df.select("v", equidepth_bucket("v", [2.0, 4.0]).alias("b"))
             .toPandas().set_index("v", drop=False))
    assert got.loc[1.0, "b"] == 0
    assert got.loc[5.0, "b"] == 2
    assert got[got["v"].isna()]["b"].isna().all()
