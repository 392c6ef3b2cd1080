"""Benchmark decontamination: flag training documents that overlap a
reference corpus (eval/benchmark sets) by word n-gram membership against a
Bloom filter of the reference's n-grams.

This is the standard "n-gram overlap" decontamination of LLM training
pipelines (e.g. the 8-gram / 13-gram checks described in the GPT-3 and
PaLM dataset reports), built on the engine's core guarantee: the Bloom has
ZERO false negatives, so a document sharing any indexed n-gram with the
reference can never score below its true overlap fraction — contamination
is never under-reported. False positives only inflate scores, bounded by
the configured FPR (choose the flag threshold above it).

Pipeline shape (all JVM-side until the final bit test):

  reference:  split -> sliding word n-grams -> xxhash64  (codegen,
              `transform(sequence, slice)`) -> explode -> prehashed Bloom
              build (one 8-byte column over the pipe)
  candidates: same n-gram hash expression -> explode -> broadcast-Bloom
              membership (vectorized bit test per Arrow batch) ->
              groupBy(doc) mean -> contamination fraction

The shuffle carries (doc_id, bool) pairs — partial-aggregated map-side —
never documents or n-gram strings.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from ..agg import _broadcast_sketch, _cached_sketch, build_sketch
from ..config import DEFAULT_SEED
from ..sizing import suggest_sizing
from ..sketches.bloom import BloomFilter
from ..util import to_u64


def word_ngram_hashes(text_col, n: int = 8,
                      seed: int = DEFAULT_SEED) -> Column:
    """array<long> of xxhash64 values of the sliding word n-grams of a
    text column — entirely in codegen (split / sequence / transform /
    slice / concat_ws). Documents with fewer than n words yield an empty
    array. The hash is over the space-joined n-gram, so differing
    whitespace runs normalize to one separator."""
    if n < 1:
        raise ValueError("n must be >= 1")
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.split(F.trim(c), r"\s+")
    m = F.size(words) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(0), m - 1),
        lambda i: F.xxhash64(F.lit(seed).cast("long"),
                             F.concat_ws(" ", F.slice(words, i + 1, n))))
    empty = F.array().cast("array<bigint>")
    return F.when((F.length(F.trim(c)) == 0) | (m <= 0), empty) \
            .otherwise(grams)


def build_reference_ngram_bloom(ref_df: DataFrame, text_col: str,
                                n: int = 8, fpr: float = 1e-3,
                                capacity: int | None = None,
                                seed: int = DEFAULT_SEED) -> BloomFilter:
    """Bloom over the reference corpus's word n-gram hashes. `capacity`
    defaults to an extra counting pass (easyList-style, Easy.hs:48-52);
    pass it explicitly to keep the build single-scan."""
    grams = (ref_df.where(F.col(text_col).isNotNull())
             .select(F.explode(word_ngram_hashes(text_col, n, seed))
                     .alias("__g")))
    if capacity is None:
        # the counting pass and the build both need every gram hash;
        # persist so the O(words x n) codegen n-gram hashing runs once
        # (cache holds 8 B/gram, freed before returning)
        grams = grams.persist()
        try:
            capacity = grams.count()
            m, k = suggest_sizing(max(capacity, 1), fpr)
            return build_sketch(grams, ["__g"], lambda: BloomFilter(m, k),
                                prehashed=True)
        finally:
            grams.unpersist()
    m, k = suggest_sizing(max(capacity, 1), fpr)
    return build_sketch(grams, ["__g"], lambda: BloomFilter(m, k),
                        prehashed=True)


def contamination_scores(docs: DataFrame, bloom: BloomFilter, id_col: str,
                         text_col: str, n: int = 8,
                         seed: int = DEFAULT_SEED) -> DataFrame:
    """Per-document contamination fraction: share of the document's word
    n-grams present in the reference Bloom. Returns
    (id_col, n_ngrams long, contamination double); documents with fewer
    than n words score 0.0 over 0 n-grams.

    Zero false negatives ⇒ `contamination` >= the true overlap fraction,
    always; it exceeds it by at most ~fpr on average."""
    bc = _broadcast_sketch(docs, bloom)

    @F.pandas_udf("int")
    def hit(h: pd.Series) -> pd.Series:
        sk = _cached_sketch(bc, BloomFilter)
        return pd.Series(sk.contains(to_u64(h.to_numpy())).astype("int32"))

    grams = docs.select(
        F.col(id_col),
        F.explode_outer(word_ngram_hashes(text_col, n, seed)).alias("__g"))
    scored = grams.withColumn(
        "__hit", F.when(F.col("__g").isNull(), F.lit(None)).otherwise(hit("__g")))
    return (scored.groupBy(id_col)
            .agg(F.count("__g").alias("n_ngrams"),
                 F.coalesce(F.avg("__hit"), F.lit(0.0)).alias("contamination")))


def decontaminate(docs: DataFrame, ref_df: DataFrame, id_col: str,
                  text_col: str, n: int = 8, threshold: float = 0.2,
                  fpr: float = 1e-3, capacity: int | None = None,
                  seed: int = DEFAULT_SEED) -> DataFrame:
    """One-call pipeline: build the reference n-gram Bloom, score `docs`,
    and return only documents with contamination < `threshold` (plus the
    score columns for auditing). Set threshold above `fpr` — clean
    documents score ~fpr on average, contaminated ones at least their true
    overlap."""
    bloom = build_reference_ngram_bloom(ref_df, text_col, n, fpr, capacity,
                                        seed)
    scores = contamination_scores(docs, bloom, id_col, text_col, n, seed)
    return (docs.join(scores, id_col, "left")
            .where(F.coalesce(F.col("contamination"), F.lit(0.0))
                   < F.lit(float(threshold))))
