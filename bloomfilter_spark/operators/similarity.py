"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: per-partition numpy matrix multiply against the
  broadcast query matrix, local top-k, then a tiny global ordered limit —
  the exact baseline; shuffle volume is O(P * k), never O(rows)
- LSH-bucketed ANN (random hyperplanes, Charikar 2002): sign-bit signature
  -> equi-join on bucket -> exact rerank inside buckets — the scale path
  when even one pass of full dot products is too hot
- embedding near-dup: all-pairs cosine >= threshold via the same LSH
  bucketing, for embedding-level dedup
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..config import DEFAULT_SEED
from ..util import U64, splitmix64


def _as_matrix(series: pd.Series) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float32) for v in series])


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def brute_force_topk(df: DataFrame, id_col: str, vec_col: str,
                     queries: np.ndarray, k: int = 10) -> DataFrame:
    """Exact cosine top-k of every query against the corpus.

    queries: (q, d) float matrix (driver-side, broadcast). Output:
    (query_id int, id, cosine double), k rows per query. Local top-k per
    partition bounds the shuffle to P*q*k rows."""
    qmat = _normalize(np.asarray(queries, dtype=np.float32))
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(qmat)
    id_field = df.schema[id_col]
    schema = (f"query_id int, {id_col} {id_field.dataType.simpleString()}, "
              f"cosine double")

    def fn(it: Iterable[pd.DataFrame]):
        q = bc.value
        best: list[pd.DataFrame] = []
        for pdf in it:
            if not len(pdf):
                continue
            mat = _normalize(_as_matrix(pdf[vec_col]))
            sims = mat @ q.T  # (n, q)
            nq = sims.shape[1]
            kk = min(k, sims.shape[0])
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (k, q)
            rows = {
                "query_id": np.repeat(np.arange(nq, dtype=np.int32)[None, :], kk, 0).ravel(),
                id_col: pdf[id_col].to_numpy()[top.ravel()],
                "cosine": sims[top.ravel(), np.repeat(np.arange(nq)[None, :], kk, 0).ravel()],
            }
            best.append(pd.DataFrame(rows))
        if best:
            yield pd.concat(best, ignore_index=True)

    local = df.select(id_col, vec_col).mapInPandas(fn, schema=schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (local.withColumn("__rn", F.row_number().over(w))
                 .where(F.col("__rn") <= k).drop("__rn"))


def hyperplane_signatures(df: DataFrame, id_col: str, vec_col: str,
                          n_bits: int = 16, dim: int | None = None,
                          seed: int = DEFAULT_SEED) -> DataFrame:
    """(id, bucket int) random-hyperplane LSH signature: sign bits of
    projections onto n_bits seeded gaussian directions."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    rng = np.random.default_rng(int(splitmix64(np.array([seed], dtype=U64))[0]) & 0x7FFFFFFF)
    planes = rng.standard_normal((n_bits, dim)).astype(np.float32)
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(planes)
    id_field = df.schema[id_col]
    schema = f"{id_col} {id_field.dataType.simpleString()}, bucket int"

    def fn(it: Iterable[pd.DataFrame]):
        pl = bc.value
        weights = (1 << np.arange(pl.shape[0], dtype=np.int64))
        for pdf in it:
            if not len(pdf):
                continue
            mat = _as_matrix(pdf[vec_col])
            bits = (mat @ pl.T) > 0
            bucket = (bits * weights[None, :]).sum(axis=1).astype(np.int32)
            yield pd.DataFrame({id_col: pdf[id_col], "bucket": bucket})

    return df.select(id_col, vec_col).mapInPandas(fn, schema=schema)


def _table_planes(dim: int, n_bits: int, n_tables: int,
                  seed: int) -> np.ndarray:
    """(n_tables, n_bits, dim) seeded gaussian hyperplanes — one
    deterministic stack shared by corpus and query sides."""
    out = np.empty((n_tables, n_bits, dim), dtype=np.float32)
    for t in range(n_tables):
        s = seed + 7919 * t
        rng = np.random.default_rng(
            int(splitmix64(np.array([s], dtype=U64))[0]) & 0x7FFFFFFF)
        out[t] = rng.standard_normal((n_bits, dim)).astype(np.float32)
    return out


def lsh_ann_topk(df: DataFrame, id_col: str, vec_col: str,
                 queries: np.ndarray, k: int = 10, n_bits: int = 12,
                 n_tables: int = 4, seed: int = DEFAULT_SEED) -> DataFrame:
    """Approximate top-k: union candidates from n_tables independent LSH
    tables (bucket equality with the query's bucket), exact-rerank only the
    candidates. Recall grows with n_tables; cost ~ bucket occupancy.

    ALL tables' buckets come from ONE corpus pass — one (n, bits*tables)
    matmul against the stacked plane tensor, one explode to (table_id,
    bucket) rows — instead of one scan per table; the candidate join key
    is (table_id, bucket)."""
    qmat = np.asarray(queries, dtype=np.float32)
    dim = qmat.shape[1]
    planes = _table_planes(dim, n_bits, n_tables, seed)
    flat_planes = planes.reshape(n_tables * n_bits, dim)
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    bc = df.sparkSession.sparkContext.broadcast(flat_planes)
    id_field = df.schema[id_col]
    sig_schema = (f"{id_col} {id_field.dataType.simpleString()}, "
                  f"table_id int, bucket int")

    def all_buckets(it: Iterable[pd.DataFrame]):
        pl = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            mat = _as_matrix(pdf[vec_col])
            bits = (mat @ pl.T) > 0                       # (n, tables*bits)
            bits = bits.reshape(len(pdf), n_tables, n_bits)
            buckets = (bits * weights[None, None, :]).sum(axis=2) \
                .astype(np.int32)                          # (n, tables)
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].to_numpy(), n_tables),
                "table_id": np.tile(np.arange(n_tables, dtype=np.int32),
                                    len(pdf)),
                "bucket": buckets.ravel()})

    sigs = df.select(id_col, vec_col).mapInPandas(all_buckets, schema=sig_schema)

    qbits = (qmat @ flat_planes.T) > 0
    qbuckets = (qbits.reshape(len(qmat), n_tables, n_bits)
                * weights[None, None, :]).sum(axis=2).astype(int)
    qdf = df.sparkSession.createDataFrame(
        [(int(i), int(t), int(qbuckets[i, t]))
         for i in range(len(qmat)) for t in range(n_tables)],
        "query_id int, table_id int, bucket int")
    cands = (sigs.join(F.broadcast(qdf), ["table_id", "bucket"])
                 .select("query_id", id_col).distinct())
    corpus = df.select(id_col, vec_col)
    cand_vecs = cands.join(corpus, id_col)

    qn = _normalize(qmat)
    bc = df.sparkSession.sparkContext.broadcast(qn)
    id_field = df.schema[id_col]
    schema = (f"query_id int, {id_col} {id_field.dataType.simpleString()}, "
              f"cosine double")

    def rerank(it: Iterable[pd.DataFrame]):
        q = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            mat = _normalize(_as_matrix(pdf[vec_col]))
            qi = pdf["query_id"].to_numpy()
            cos = np.einsum("ij,ij->i", mat, q[qi])
            yield pd.DataFrame({"query_id": qi, id_col: pdf[id_col],
                                "cosine": cos})

    scored = cand_vecs.mapInPandas(rerank, schema=schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (scored.withColumn("__rn", F.row_number().over(w))
                  .where(F.col("__rn") <= k).drop("__rn"))


def embedding_near_dups(df: DataFrame, id_col: str, vec_col: str,
                        threshold: float = 0.95, n_bits: int = 12,
                        seed: int = DEFAULT_SEED) -> DataFrame:
    """All-pairs cosine >= threshold, candidates restricted to shared LSH
    buckets (high-threshold pairs collide with high probability)."""
    sigs = hyperplane_signatures(df, id_col, vec_col, n_bits, seed=seed)
    a, b = sigs.alias("a"), sigs.alias("b")
    pairs = (a.join(b, on=[F.col("a.bucket") == F.col("b.bucket"),
                           F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
              .select(F.col(f"a.{id_col}").alias("id_a"),
                      F.col(f"b.{id_col}").alias("id_b")).distinct())
    corpus = df.select(F.col(id_col), F.col(vec_col))
    va = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    vb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    joined = pairs.join(va, "id_a").join(vb, "id_b")
    dot = F.aggregate(F.zip_with("v_a", "v_b", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(F.col(c), lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    cos = dot / (norm("v_a") * norm("v_b"))
    return (joined.withColumn("cosine", cos)
                  .where(F.col("cosine") >= threshold)
                  .select("id_a", "id_b", "cosine"))
