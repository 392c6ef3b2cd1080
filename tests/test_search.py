"""Inverted index + BM25 (operators/search.py): index exactness, BM25
Python-reference parity, df-cap pruning, top-k tie-breaks, partition
invariance."""

import math

import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.operators.search import (bm25_scores, bm25_topk,
                                                build_inverted_index)

CORPUS = [
    (0, "spark join merge join JOIN"),
    (1, "merge sort merge sort scan"),
    (2, "spark scan scan vector"),
    (3, "the the the the the spark"),
    (4, ""),                      # 0-token doc: counts toward N/avgdl
    (5, None),                    # NULL text: excluded entirely
    (6, "vector vector join"),
]


def _py_bm25(queries, k1=1.2, b=0.75, max_df_fraction=1.0):
    docs = {i: t.lower().split() for i, t in CORPUS
            if t is not None}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {}
    for toks in docs.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, qtext in queries:
        for term in set(qtext.lower().split()):
            if term not in df or df[term] / n > max_df_fraction:
                continue
            idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            for d, toks in docs.items():
                tf = toks.count(term)
                if not tf:
                    continue
                dl = len(toks)
                s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
                out[(qid, d)] = out.get((qid, d), 0.0) + s
    return out


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    return build_inverted_index(docs, "doc_id", "text")


def test_index_exact(spark, index):
    postings, stats, doclens = index
    got = {(r["term"], r["id"]): r["tf"] for r in postings.collect()}
    assert got[("join", 0)] == 3          # case-folded
    assert got[("merge", 1)] == 2
    assert ("spark", 1) not in got
    sdf = {r["term"]: r["df"] for r in stats.collect()}
    assert sdf["spark"] == 3 and sdf["the"] == 1 and sdf["vector"] == 2
    dls = {r["id"]: r["dl"] for r in doclens.collect()}
    assert dls == {0: 5, 1: 5, 2: 4, 3: 6, 4: 0, 6: 3}  # 5 (NULL) absent


def test_bm25_matches_reference(spark, index):
    queries = [(0, "spark join"), (1, "merge vector unknownterm")]
    got = {(r["query_id"], r["doc_id"]): r["score"] for r in
           bm25_scores(*index, queries).collect()}
    want = _py_bm25(queries)
    assert set(got) == set(want)
    for key in want:
        assert got[key] == pytest.approx(want[key], rel=1e-12), key


def test_bm25_df_cap_prunes_hot_terms(spark, index):
    # 'spark' is in 3/6 docs; cap at 0.4 leaves only 'join' scorable
    queries = [(0, "spark join")]
    got = {(r["query_id"], r["doc_id"]): r["score"] for r in
           bm25_scores(*index, queries, max_df_fraction=0.4).collect()}
    want = _py_bm25(queries, max_df_fraction=0.4)
    assert set(got) == set(want) and len(got) == 2  # docs 0 and 6
    for key in want:
        assert got[key] == pytest.approx(want[key], rel=1e-12)


def test_bm25_topk_rank_and_ties(spark, index):
    top = bm25_topk(*index, [(0, "merge")], k=2).collect()
    assert [r["rank"] for r in sorted(top, key=lambda r: r["rank"])] == [1, 2]
    # doc 1 has tf=2, doc 0 tf=1 -> doc 1 first
    ranked = {r["rank"]: r["doc_id"] for r in top}
    assert ranked[1] == 1 and ranked[2] == 0


def test_bm25_partition_invariant(spark):
    docs = (spark.createDataFrame(CORPUS, "doc_id long, text string")
                 .repartition(7))
    idx = build_inverted_index(docs, "doc_id", "text")
    got = {(r["query_id"], r["doc_id"]): round(r["score"], 9) for r in
           bm25_scores(*idx, [(0, "spark join merge")]).collect()}
    docs1 = (spark.createDataFrame(CORPUS, "doc_id long, text string")
                  .coalesce(1))
    idx1 = build_inverted_index(docs1, "doc_id", "text")
    want = {(r["query_id"], r["doc_id"]): round(r["score"], 9) for r in
            bm25_scores(*idx1, [(0, "spark join merge")]).collect()}
    assert got == want


def test_bm25_stopword_guard_on_by_default(spark):
    """A term in more than half the corpus never reaches the score join
    under the DEFAULT max_df_fraction=0.5: with a one-stopword query the
    result is empty (no scorable terms at all), and a mixed query scores
    identically to the explicit-cap reference."""
    corpus = [
        (0, "the quick fox"),
        (1, "the lazy dog"),
        (2, "the fox again"),
        (3, "the dog sleeps"),
        (4, "quick quick run"),
        (5, "run dog run"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    idx = build_inverted_index(docs, "doc_id", "text")
    # 'the' is in 4/6 docs (df/N = 0.667 > 0.5): zero rows may score
    assert bm25_scores(*idx, [(0, "the")]).count() == 0
    # mixed query: 'the' contributes nothing, 'fox' (2/6) scores normally
    got = {(r["query_id"], r["doc_id"]): r["score"] for r in
           bm25_scores(*idx, [(0, "the fox")]).collect()}
    explicit = {(r["query_id"], r["doc_id"]): r["score"] for r in
                bm25_scores(*idx, [(0, "fox")],
                            max_df_fraction=1.0).collect()}
    assert got == explicit and set(d for _, d in got) == {0, 2}
