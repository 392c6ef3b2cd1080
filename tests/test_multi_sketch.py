"""multi_sketch_build: the whole family in one scan must equal the
per-sketch builds (byte-exact for Bloom/HLL/CMS, estimate-equivalent for
KLL), and per-spec NULL semantics must hold."""

from pyspark.sql import functions as F

from bloomfilter_spark.agg import build_sketch, multi_sketch_build
from bloomfilter_spark.sketches import KLL, BloomFilter, CountMinSketch, HyperLogLog


def test_multi_sketch_equals_individual_builds(spark, lineitem):
    specs = {
        "bloom": (["l_orderkey", "l_linenumber"], lambda: BloomFilter(1 << 16, 5)),
        "hll": (["l_orderkey"], lambda: HyperLogLog(12)),
        "cms": (["l_returnflag"], lambda: CountMinSketch(width=1024, depth=4)),
        "kll": (["l_extendedprice"], lambda: KLL(200)),
    }
    combined = multi_sketch_build(lineitem, specs)
    for name in ("bloom", "hll", "cms"):
        single = build_sketch(lineitem, specs[name][0], specs[name][1])
        assert combined[name].to_bytes() == single.to_bytes(), name
    single_kll = build_sketch(lineitem, ["l_extendedprice"], lambda: KLL(200))
    for q in (0.1, 0.5, 0.9):
        a, b = combined["kll"].quantile(q), single_kll.quantile(q)
        n = single_kll.n
        assert abs(combined["kll"].rank(b) - q) <= 4 * 1.7 / 200
        assert abs(single_kll.rank(a) - q) <= 4 * 1.7 / 200
        del n


def test_multi_sketch_per_spec_null_handling(spark):
    rows = [(1, None), (2, 10.0), (None, 20.0), (4, None)]
    df = spark.createDataFrame(rows, "k long, v double")
    out = multi_sketch_build(df, {
        "hll": (["k"], lambda: HyperLogLog(12)),
        "kll": (["v"], lambda: KLL(50)),
    })
    # 3 non-null keys; 2 non-null values — each spec skips only its own nulls
    assert round(out["hll"].estimate()) == 3
    assert out["kll"].n == 2


def test_multi_sketch_empty_input(spark):
    df = spark.createDataFrame([], "k long")
    out = multi_sketch_build(df.where(F.col("k") > 0),
                             {"hll": (["k"], lambda: HyperLogLog(12))})
    assert out["hll"].estimate() == 0.0
