"""n-gram decontamination (operators/decontaminate.py): codegen n-gram
hashing, zero-under-reporting of overlap, FPR-bounded clean scores."""

import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.operators.decontaminate import (
    build_reference_ngram_bloom, contamination_scores, decontaminate,
    word_ngram_hashes)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_ngram_hashes_counts_and_normalization(spark):
    df = spark.createDataFrame(
        [("a b c d e",), ("a  b \t c   d e",), ("a b",), ("",), (None,)],
        "text string")
    out = df.select(F.size(word_ngram_hashes("text", n=3)).alias("m"),
                    word_ngram_hashes("text", n=3).alias("g")).collect()
    assert out[0]["m"] == 3            # 5 words -> 3 trigrams
    assert out[1]["g"] == out[0]["g"]  # whitespace runs normalize
    assert out[2]["m"] == 0            # too short
    assert out[3]["m"] == 0            # empty
    assert out[4]["g"] is None         # NULL text stays NULL


def test_contamination_never_under_reports(spark):
    """The copied sentence's n-grams MUST all hit (zero FN): a doc that is
    half reference text scores >= its true overlap fraction."""
    ref_sent = " ".join(f"ref{i}" for i in range(16))     # 16 words
    new_sent = " ".join(f"new{i}" for i in range(16))
    ref = _df(spark, [(1, ref_sent)])
    bloom = build_reference_ngram_bloom(ref, "text", n=8, fpr=1e-3)
    eval_docs = _df(spark, [(10, ref_sent),                  # full copy
                            (11, ref_sent + " " + new_sent),  # half copy
                            (12, new_sent)])                  # clean
    s = {r["doc_id"]: r for r in
         contamination_scores(eval_docs, bloom, "doc_id", "text", n=8).collect()}
    assert s[10]["contamination"] == 1.0
    # 32-word doc: 25 8-grams, the 9 fully inside the copied half must hit
    assert s[11]["n_ngrams"] == 25
    assert s[11]["contamination"] >= 9 / 25
    assert s[12]["contamination"] <= 0.1  # clean: ~fpr, never a miss-driven 1


def test_contamination_short_and_empty_docs(spark):
    ref = _df(spark, [(1, "w1 w2 w3 w4 w5 w6 w7 w8 w9")])
    bloom = build_reference_ngram_bloom(ref, "text", n=8)
    docs = _df(spark, [(2, "too short"), (3, "")])
    s = {r["doc_id"]: r for r in
         contamination_scores(docs, bloom, "doc_id", "text", n=8).collect()}
    for d in (2, 3):
        assert s[d]["n_ngrams"] == 0 and s[d]["contamination"] == 0.0


def test_decontaminate_drops_contaminated_keeps_clean(spark, documents):
    """End-to-end on the documents table: injected full copies of the
    reference slice are all dropped, documents disjoint from the
    reference survive."""
    ref = documents.where(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    eligible = ref.where(
        F.size(F.split(F.trim("text"), r"\s+")) >= 8)
    injected = eligible.select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                               "text")
    clean = documents.where(F.col("doc_id") % 5 == 3).select("doc_id", "text")
    corpus = injected.unionByName(clean)
    kept = decontaminate(corpus, ref, "doc_id", "text", n=8, threshold=0.5)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert not any(i >= 1_000_000 for i in kept_ids)      # all copies dropped
    n_clean = clean.count()
    assert len(kept_ids) >= 0.9 * n_clean                 # FPR can't mass-flag


def test_ngram_bloom_capacity_param_skips_count(spark):
    ref = _df(spark, [(1, " ".join(f"w{i}" for i in range(50)))])
    b1 = build_reference_ngram_bloom(ref, "text", n=8, capacity=100)
    b2 = build_reference_ngram_bloom(ref, "text", n=8, capacity=100)
    assert b1.to_bytes() == b2.to_bytes()


def test_word_ngram_hashes_rejects_bad_n(spark):
    with pytest.raises(ValueError, match="n must be"):
        word_ngram_hashes("text", n=0)
