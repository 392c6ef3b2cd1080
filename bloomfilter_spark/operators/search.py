"""Lexical search: distributed inverted index + BM25 ranking.

The retrieval counterpart to the embedding ANN path
(`operators/similarity.py`): build a term -> (doc, tf) posting table and
score queries with Okapi BM25 (Robertson & Walker, SIGIR'94; the
``ln(1 + (N-df+0.5)/(df+0.5))`` idf is the Lucene non-negative variant).

Scale shape — everything is Catalyst-native, one pass each:

* `build_inverted_index`: explode(split) runs in codegen; postings are
  ``groupBy(term, doc)`` with map-side partial aggregation (a doc's
  repeated term collapses before the shuffle), so the shuffle carries
  (distinct term, doc) pairs, not token occurrences. Term stats reduce
  the postings again (one row per distinct term).
* `bm25_scores`: the query-term side (a few dozen rows) joins idf and is
  BROADCAST against the postings scan — no shuffle of postings except
  the final per-(query, doc) sum, whose cardinality is candidate docs,
  not tokens.
* Hot terms are the skew: a stopword's posting list is O(corpus). The
  ``max_df_fraction`` knob drops terms appearing in more than that
  fraction of docs from scoring (standard stopword pruning — they carry
  ~no idf weight anyway), bounding every posting list that reaches the
  join.

Determinism: scores are sums of <= |query terms| doubles; callers who
need cross-engine-comparable output should quantize (see q71) or rank
with an explicit (score, doc_id) tie-break as `bm25_topk` does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

DEFAULT_TOKEN_PATTERN = r"\s+"


def tokenize_terms(col, pattern: str = DEFAULT_TOKEN_PATTERN) -> Column:
    """Lowercased term array (codegen split + empty-token filter)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), pattern), lambda t: t != F.lit(""))


def build_inverted_index(docs: DataFrame, id_col: str, text_col: str,
                         pattern: str = DEFAULT_TOKEN_PATTERN,
                         ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns ``(postings, stats, doclens)``:

    * postings: (term, id, tf) — term frequency per document;
    * stats: (term, df) — document frequency per term;
    * doclens: (id, dl) — token count per document, INCLUDING 0-token
      docs (they belong to N and avgdl even though they match nothing).

    Persist all three as parquet/bucketed tables for a reusable index;
    bucketing postings by term makes every query join co-located."""
    docs = docs.where(F.col(text_col).isNotNull())
    toks = docs.select(F.col(id_col).alias("id"),
                       F.explode(tokenize_terms(text_col, pattern))
                        .alias("term"))
    postings = toks.groupBy("term", "id").agg(F.count("*").alias("tf"))
    stats = postings.groupBy("term").agg(F.count("*").alias("df"))
    doclens = docs.select(
        F.col(id_col).alias("id"),
        F.size(tokenize_terms(text_col, pattern)).alias("dl"))
    return postings, stats, doclens


def bm25_scores(postings: DataFrame, stats: DataFrame, doclens: DataFrame,
                queries, k1: float = 1.2, b: float = 0.75,
                max_df_fraction: float = 0.5,
                pattern: str = DEFAULT_TOKEN_PATTERN,
                log_pruned: bool = False) -> DataFrame:
    """BM25 score for every (query, doc) pair sharing at least one
    scorable term. ``queries`` is a list of (query_id, text) tuples or an
    equivalent DataFrame with columns (query_id, qtext); each DISTINCT
    query term scores once (query-side tf is ignored, the common IR
    simplification). Returns (query_id, doc_id, score).

    Corpus constants N and avgdl come from `doclens` (one tiny agg).
    Terms with df/N > max_df_fraction are excluded from scoring — ON BY
    DEFAULT (0.5): a stopword's posting list is O(corpus) at 10^12 docs
    and would otherwise flow into the score join; such terms carry
    near-zero IDF anyway, so dropping them is the standard IR stopword
    cut, applied from the df stats rather than a fixed word list. Pass
    max_df_fraction=1.0 to score every term regardless of frequency
    (the pre-guard behavior — a query whose only shared terms are common
    returns no rows under the default; see log_pruned).

    ``log_pruned=True`` makes the cut observable: runs one small agg over
    the query terms and logs how many DISTINCT query terms were pruned by
    the df guard (opt-in — it costs an extra job, so the hot path stays
    one-pass)."""
    spark = postings.sparkSession
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(list(queries),
                                        "query_id long, qtext string")
    c = doclens.agg(F.count("*").alias("n"),
                    F.avg("dl").alias("avgdl")).first()
    n_docs, avgdl = int(c["n"]), float(c["avgdl"] or 0.0)
    if n_docs == 0:
        return spark.createDataFrame(
            [], "query_id long, doc_id long, score double")

    qterms = (queries.select("query_id",
                             F.explode(tokenize_terms("qtext", pattern))
                              .alias("term"))
                     .distinct())
    idf = F.log(F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    df_ok = (F.col("df") / F.lit(float(n_docs))
             <= F.lit(float(max_df_fraction)))
    if log_pruned:
        import logging
        pruned = (qterms.join(stats, "term").where(~df_ok)
                        .select("term").distinct().count())
        logging.getLogger(__name__).info(
            "bm25_scores: %d distinct query term(s) pruned by "
            "max_df_fraction=%s", pruned, max_df_fraction)
    scorable = (qterms.join(stats, "term")
                      .where(df_ok)
                      .select("query_id", "term", idf.alias("idf")))
    tf = F.col("tf").cast("double")
    dl_norm = F.lit(k1) * (F.lit(1.0 - b)
                           + F.lit(b) * F.col("dl") / F.lit(avgdl))
    contrib = F.col("idf") * tf * F.lit(k1 + 1.0) / (tf + dl_norm)
    return (postings.join(F.broadcast(scorable), "term")
                    .join(doclens, "id")
                    .groupBy("query_id", F.col("id").alias("doc_id"))
                    .agg(F.sum(contrib).alias("score")))


def bm25_topk(postings: DataFrame, stats: DataFrame, doclens: DataFrame,
              queries, k: int = 10, **kw) -> DataFrame:
    """Top-k BM25 results per query, rank 1-based, ties broken by doc_id
    ascending (deterministic given exact score equality)."""
    scored = bm25_scores(postings, stats, doclens, queries, **kw)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k))


def tfidf_top_terms(postings: DataFrame, stats: DataFrame,
                    doclens: DataFrame, k: int) -> DataFrame:
    """Per-document top-k TF-IDF terms (keyword extraction — the
    signature-term stage of clustering / topic-labeling / near-dup
    triage pipelines), from the same three reusable index tables
    `build_inverted_index` emits.

        tfidf = tf * ln(N / df)

    Returns (id, term, tf, tfidf, rank) with rank 1-based and the
    deterministic (tfidf desc, term asc) tie-break — equal-(tf, df)
    terms are bit-equal doubles, so ordering is engine-independent.

    Scale shape: N is one tiny agg; (df -> idf) is a broadcast join
    against the postings scan (the term-stats table is the dimension);
    the per-doc top-k is a rank-limited window partitioned by doc id —
    Spark's WindowGroupLimit pushes the k-filter below the sort, so
    each task keeps k rows per doc, never a doc's full term list."""
    n_docs = int(doclens.count())
    idf = F.log(F.lit(float(n_docs)) / F.col("df"))
    scored = (postings.join(F.broadcast(stats.select(
                                "term", idf.alias("idf"))), "term")
                      .select("id", "term", "tf",
                              (F.col("tf").cast("double")
                               * F.col("idf")).alias("tfidf")))
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k))
