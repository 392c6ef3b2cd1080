"""salted_join: row-identical to the plain equi-join under every
supported join type, with the hot key's rows spread across salt buckets
(operators/skewjoin.py)."""

import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.operators.skewjoin import salted_join


def _sorted_rows(df, cols=None):
    cols = cols or df.columns
    rows = [tuple(r[c] for c in cols) for r in df.select(*cols).collect()]
    return sorted(rows, key=lambda t: tuple(str(v) for v in t))


@pytest.fixture()
def skewed(spark):
    """Fact with one key at ~70% of rows + NULL keys; dim missing some
    fact keys and holding some fact-less keys (exercises every join
    type's edge)."""
    fact = spark.range(10000).select(
        F.when(F.col("id") % 10 < 7, F.lit("hot"))
         .when(F.col("id") % 10 == 7, F.lit(None))
         .otherwise(F.concat(F.lit("k"), (F.col("id") % 37).cast("string")))
         .alias("k"),
        F.col("id").alias("v"))
    dim = spark.createDataFrame(
        [("hot", 1.0), ("k1", 2.0), ("k2", 3.0), ("absent", 9.0)],
        "k string, w double")
    return fact, dim


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_equals_plain(spark, skewed, how):
    fact, dim = skewed
    plain = fact.join(dim, ["k"], how)
    salted = salted_join(fact, dim, "k", salt=5, how=how)
    assert salted.columns == plain.columns
    assert _sorted_rows(salted) == _sorted_rows(plain)


@pytest.mark.parametrize("how", ["inner", "left_anti"])
def test_salted_join_hot_keys_mode(spark, skewed, how):
    """Salting only the diagnosed hot key replicates just its dim rows;
    results stay identical to the plain join."""
    fact, dim = skewed
    plain = fact.join(dim, ["k"], how)
    salted = salted_join(fact, dim, "k", salt=7, how=how, hot_keys=["hot"])
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_composite_keys(spark):
    fact = spark.range(2000).select(
        (F.col("id") % 3).cast("int").alias("a"),
        F.when(F.col("id") % 2 == 0, "x").otherwise("y").alias("b"),
        F.col("id").alias("v"))
    dim = spark.createDataFrame(
        [(0, "x", 10), (1, "y", 20), (2, "z", 30)], "a int, b string, d int")
    plain = fact.join(dim, ["a", "b"], "inner")
    full = salted_join(fact, dim, ["a", "b"], salt=4)
    hot = salted_join(fact, dim, ["a", "b"], salt=4,
                      hot_keys=[(0, "x"), (1, "y")])
    assert _sorted_rows(full) == _sorted_rows(plain)
    assert _sorted_rows(hot) == _sorted_rows(plain)


def test_salted_join_partition_invariance(spark, skewed):
    fact, dim = skewed
    a = salted_join(fact.repartition(13), dim, "k", salt=3)
    b = salted_join(fact.coalesce(1), dim.repartition(5), "k", salt=3)
    assert _sorted_rows(a) == _sorted_rows(b)


def test_salted_join_spreads_hot_key(spark, skewed):
    """The point of the operator: the hot key's fact rows occupy ALL salt
    buckets (reconstructed with the operator's own salt formula), so no
    single shuffle key carries the whole hot key."""
    from bloomfilter_spark.config import DEFAULT_SEED
    fact, _ = skewed
    salt = 5
    # the operator's salt formula: join keys + per-row monotonic id, so
    # even byte-identical duplicate rows of the hot key spread out
    s = F.pmod(F.xxhash64(F.lit(DEFAULT_SEED ^ 0x5A17), F.col("k"),
                          F.monotonically_increasing_id()),
               F.lit(salt)).cast("int")
    buckets = (fact.where(F.col("k") == "hot").select(s.alias("s"))
               .distinct().count())
    assert buckets == salt


def test_salted_join_rejects_bad_args(spark, skewed):
    fact, dim = skewed
    with pytest.raises(ValueError, match="not supported"):
        salted_join(fact, dim, "k", how="full")
    with pytest.raises(ValueError, match="salt must be"):
        salted_join(fact, dim, "k", salt=0)
    with pytest.raises(ValueError, match="join key"):
        salted_join(fact, dim, [])


def test_salted_join_salt_deterministic(spark, skewed):
    """The salt feeds a shuffle/join key, so it must contain NO
    non-deterministic expression: a monotonically_increasing_id or rand
    term can re-evaluate differently when a map stage is recomputed after
    a fetch failure, double-counting/dropping rows across reducers."""
    fact, dim = skewed
    for out in (salted_join(fact, dim, "k", salt=8),
                salted_join(fact, dim, "k", salt=8, hot_keys=["hot"])):
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "monotonically_increasing_id" not in plan
        assert "rand(" not in plan


def test_salted_join_map_typed_payload(spark):
    """Map/array payload columns must not break the salt derivation
    (xxhash64 rejects maps; the join keys + map-free payload columns are
    hashed)."""
    from pyspark.sql import functions as F

    fact = spark.createDataFrame(
        [(1, {"a": 1}, [1, 2]), (1, {"b": 2}, [3]), (2, {}, [])],
        "k int, m map<string,int>, arr array<int>")
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k int, name string")
    canon = lambda r: (r["k"], r["name"],  # noqa: E731
                       sorted(dict(r["m"]).items()), list(r["arr"]))
    got = sorted(canon(r)
                 for r in salted_join(fact, dim, "k", salt=4).collect())
    want = sorted(canon(r) for r in fact.join(dim, "k").collect())
    assert got == want

    # hot_keys mode too
    got_hot = salted_join(fact, dim, "k", salt=4, hot_keys=[1]).count()
    assert got_hot == 3
