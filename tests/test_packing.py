"""Sequence packing (operators/packing.py): conservation, budget
invariant, provable pack-count bound, determinism across partitionings."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.operators.packing import (_next_fit_packs,
                                                 pack_sequences, pack_stats)


# --- kernel --------------------------------------------------------------

def test_next_fit_kernel_basic():
    toks = np.array([9, 7, 5, 4, 3, 2], dtype=np.int64)
    packs = _next_fit_packs(toks, budget=10)
    fills = np.bincount(packs, weights=toks)
    assert (fills <= 10).all()
    # next-fit on this input: [9], [7], [5,4], [3,2] -> never worse than
    # one pack per doc, and consecutive packs overflow pairwise
    for a, b in zip(fills, fills[1:]):
        assert a + b > 10 or b == fills[-1]


def test_next_fit_kernel_oversize_singletons():
    toks = np.array([25, 12, 3, 2], dtype=np.int64)
    packs = _next_fit_packs(toks, budget=10)
    assert packs[0] != packs[1] != packs[2]
    fills = np.bincount(packs, weights=toks)
    assert fills[0] == 25 and fills[1] == 12  # oversize docs pack alone


def test_next_fit_pack_count_bound():
    rng = np.random.default_rng(0)
    toks = np.sort(rng.integers(1, 100, 5000))[::-1].astype(np.int64)
    budget = 512
    packs = _next_fit_packs(toks, budget)
    n_packs = packs.max() + 1
    assert n_packs <= 2 * toks.sum() / budget + 1


# --- Spark operator ------------------------------------------------------

@pytest.fixture(scope="module")
def packed(spark, documents):
    df = documents.select("doc_id", F.col("n_chars").alias("toks"))
    out = pack_sequences(df, "doc_id", "toks", budget=2000,
                         n_buckets=4).persist()
    yield out, df
    out.unpersist()


def test_pack_conservation(packed):
    out, src = packed
    assert out.count() == src.count()
    assert out.select("doc_id").distinct().count() == src.count()
    assert (out.agg(F.sum("tokens")).first()[0] ==
            src.agg(F.sum("toks")).first()[0])


def test_pack_budget_invariant(packed):
    out, _ = packed
    fills = out.groupBy("pack_id").agg(
        F.sum("tokens").alias("fill"), F.first("pack_tokens").alias("rep"),
        F.first("oversize").alias("oversize"), F.count("*").alias("n"))
    rows = fills.collect()
    for r in rows:
        assert r["fill"] == r["rep"]  # pack_tokens is the true fill
        if r["oversize"]:
            assert r["n"] == 1 and r["fill"] > 2000
        else:
            assert r["fill"] <= 2000


def test_pack_stats_flags(packed, spark):
    out, src = packed
    row = pack_stats(out, budget=2000, n_buckets=4).first()
    assert row["n_docs"] == src.count()
    assert row["within_budget"] and row["packs_bounded"]
    assert row["n_oversize"] == 0  # sf0.001 docs are all under 2000 chars


def test_pack_determinism_across_partitionings(spark, documents):
    df = documents.select("doc_id", F.col("n_chars").alias("toks"))
    a = pack_sequences(df.repartition(1), "doc_id", "toks", 2000,
                       n_buckets=4).orderBy("doc_id").collect()
    b = pack_sequences(df.repartition(13, "toks"), "doc_id", "toks", 2000,
                       n_buckets=4).orderBy("doc_id").collect()
    assert a == b


def test_pack_null_and_zero_tokens(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 0), (4, 7)], "id long, toks int")
    out = pack_sequences(df, "id", "toks", budget=8, n_buckets=1)
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2]["tokens"] == 0 and rows[3]["tokens"] == 0
    assert rows[1]["oversize"]  # 10 > 8 packs alone
    assert not rows[4]["oversize"]


def test_pack_validation(spark, documents):
    df = documents.select("doc_id", F.col("n_chars").alias("toks"))
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "toks", budget=0)
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "missing", budget=10)
