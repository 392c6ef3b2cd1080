"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: per-partition numpy matrix multiply against the
  broadcast query matrix, local top-k, then a tiny global ordered limit —
  the exact baseline; shuffle volume is O(P * k), never O(rows)
- LSH-bucketed ANN (random hyperplanes, Charikar 2002): sign-bit signature
  -> equi-join on bucket -> exact rerank inside buckets — the scale path
  when even one pass of full dot products is too hot
- embedding near-dup: all-pairs cosine >= threshold via the same LSH
  bucketing, for embedding-level dedup
- IVF (inverted-file) ANN: spherical k-means coarse quantizer trained on a
  bounded deterministic sample, one-pass corpus assignment to Voronoi lists,
  search probes only the n_probes lists nearest each query — the classic
  coarse-quantizer index (Sivic & Zisserman 2003 / FAISS IVF-Flat layout),
  complementary to LSH when the corpus is genuinely clustered
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


def suggest_lsh_bits(n_rows: int, target_occupancy: int = 8) -> int:
    """Bucket width for ~linear near-dup candidate growth: with
    ``n_bits = log2(n / target_occupancy)`` expected bucket occupancy is
    a CONSTANT (~target_occupancy) as the corpus grows, so per-table
    candidate pairs stay ~n * occupancy / 2 instead of n^2 / 2^n_bits.
    Raise n_tables (not occupancy) to buy recall back at larger n_bits."""
    import math
    return max(4, min(30, math.ceil(math.log2(max(n_rows, 2)
                                              / max(target_occupancy, 1)))))


def _neardup_candidates(df: DataFrame, id_col: str, vec_col: str,
                        n_bits: int, n_tables: int, seed: int,
                        max_bucket: int | None = None) -> DataFrame:
    """(id_a, id_b) distinct candidate pairs from the union of n_tables
    independent hyperplane tables — one corpus pass computes ALL tables'
    buckets (stacked-plane matmul, like lsh_ann_topk), the self-join key
    is (table_id, bucket). ``max_bucket`` drops buckets above that
    occupancy before pairing (degenerate buckets — zero vectors, dense
    clusters — would otherwise go quadratic; dropping trades bounded
    recall on exactly those buckets, and the other tables usually still
    catch their true pairs)."""
    dim = len(df.select(vec_col).first()[0])
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
            bits = (mat @ pl.T) > 0
            bits = bits.reshape(len(pdf), n_tables, n_bits)
            buckets = (bits * weights[None, None, :]).sum(axis=2) \
                .astype(np.int32)
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].to_numpy(), n_tables),
                "table_id": np.tile(np.arange(n_tables, dtype=np.int32),
                                    len(pdf)),
                "bucket": buckets.ravel()})

    sigs = df.select(id_col, vec_col).mapInPandas(all_buckets,
                                                  schema=sig_schema)
    # the bucket matmul is self-joined (2 consumers) and the cap adds a
    # third (the over-cap count agg): persist so the corpus crosses the
    # Arrow pipe once, like minhash_lsh_dedup persists its signatures
    sigs = sigs.persist()
    if max_bucket is not None:
        # over-cap bucket keys via map-side-combined agg + broadcast
        # anti-join — shuffles count partials, not the bucket table
        # (shared topology + rationale: dedup._cap_band_buckets)
        from .dedup import _cap_band_buckets
        sigs = _cap_band_buckets(sigs, max_bucket,
                                 bucket_cols=("table_id", "bucket"))
    a, b = sigs.alias("a"), sigs.alias("b")
    return (a.join(b, on=[F.col("a.table_id") == F.col("b.table_id"),
                          F.col("a.bucket") == F.col("b.bucket"),
                          F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b")).distinct())


def embedding_near_dups(df: DataFrame, id_col: str, vec_col: str,
                        threshold: float = 0.95, n_bits: int = 12,
                        n_tables: int = 4, seed: int = DEFAULT_SEED,
                        max_bucket: int | None = None) -> DataFrame:
    """All-pairs cosine >= threshold, candidates restricted to the UNION
    of ``n_tables`` independent LSH tables (banded, like
    minhash_lsh_candidates): high-threshold pairs collide in at least one
    table with probability 1-(1-p^n_bits)^n_tables where
    p = 1 - acos(cos)/pi, while random pairs stay apart.

    Scale sizing: per-table candidate pairs grow ~n^2 / 2^n_bits, so
    n_bits must track log2(n) — use ``suggest_lsh_bits(n)`` for constant
    bucket occupancy (~linear candidates), and raise n_tables to recover
    the recall the narrower buckets cost. ``max_bucket`` caps degenerate
    buckets. Exactness: candidates are reranked with exact JVM-side
    cosine, so extra candidates never add false positives."""
    pairs = _neardup_candidates(df, id_col, vec_col, n_bits, n_tables,
                                seed, max_bucket)
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


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN
# --------------------------------------------------------------------------

def _spherical_kmeans(sample: np.ndarray, n_lists: int, max_iter: int,
                      seed: int) -> np.ndarray:
    """Driver-side spherical k-means (cosine Lloyd's) with k-means++ init.

    The sample is small by construction (``ivf_train`` caps it), so the
    O(sample * n_lists * d) iterations run in-core; determinism comes from
    the seeded rng and a fixed tie-break (lowest index wins in argmax)."""
    x = _normalize(np.asarray(sample, dtype=np.float32))
    n = len(x)
    n_lists = min(n_lists, n)
    rng = np.random.default_rng(
        int(splitmix64(np.array([seed ^ 0x1BF5], dtype=U64))[0]) & 0x7FFFFFFF)

    # k-means++ seeding on cosine distance (1 - dot)
    centroids = np.empty((n_lists, x.shape[1]), dtype=np.float32)
    centroids[0] = x[rng.integers(n)]
    d2 = 1.0 - x @ centroids[0]
    for i in range(1, n_lists):
        p = np.maximum(d2, 0)
        tot = p.sum()
        idx = int(rng.integers(n)) if tot <= 0 else int(
            rng.choice(n, p=p / tot))
        centroids[i] = x[idx]
        d2 = np.minimum(d2, 1.0 - x @ centroids[i])

    assign = np.argmax(x @ centroids.T, axis=1)
    for _ in range(max_iter):
        sums = np.zeros_like(centroids, dtype=np.float64)
        np.add.at(sums, assign, x)
        counts = np.bincount(assign, minlength=n_lists)
        empty = counts == 0
        if empty.any():  # reseed dead lists to the worst-served points
            worst = np.argsort(np.max(x @ centroids.T, axis=1))
            sums[empty] = x[worst[: empty.sum()]]
            counts[empty] = 1
        new = _normalize((sums / counts[:, None]).astype(np.float32))
        new_assign = np.argmax(x @ new.T, axis=1)
        centroids = new
        if np.array_equal(new_assign, assign):
            break
        assign = new_assign
    return centroids


def ivf_train(df: DataFrame, vec_col: str, n_lists: int = 256,
              max_train: int = 100_000, max_iter: int = 20,
              seed: int = DEFAULT_SEED) -> np.ndarray:
    """Train the coarse quantizer: (n_lists, d) unit centroids.

    ONE distributed pass: an order-independent deterministic sample of
    ``max_train`` vectors (TakeOrdered on the vector hash — per-partition
    top-k then a driver merge, no shuffle of the corpus), then in-core
    spherical k-means. Training on a bounded sample is the standard IVF
    recipe (FAISS trains IVF quantizers on ~(30-256)*n_lists vectors, not
    the corpus): at 100 TB the quantizer still trains on ~100k rows."""
    rows = (df.select(vec_col)
              .orderBy(F.xxhash64(F.col(vec_col), F.lit(seed).cast("long")))
              .limit(max_train).collect())
    sample = np.vstack([np.asarray(r[0], dtype=np.float32) for r in rows])
    return _spherical_kmeans(sample, n_lists, max_iter, seed)


def ivf_assign(df: DataFrame, id_col: str, vec_col: str,
               centroids: np.ndarray) -> DataFrame:
    """(id, list_id int): nearest-centroid Voronoi assignment — the IVF
    index table. Persist it as parquet partitioned by list_id to make
    searches prune at the scan (only probed lists are read)."""
    cn = _normalize(np.asarray(centroids, dtype=np.float32))
    bc = df.sparkSession.sparkContext.broadcast(cn)
    id_field = df.schema[id_col]
    schema = f"{id_col} {id_field.dataType.simpleString()}, list_id int"

    def fn(it: Iterable[pd.DataFrame]):
        c = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            mat = _normalize(_as_matrix(pdf[vec_col]))
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "list_id": np.argmax(mat @ c.T, axis=1).astype(np.int32)})

    return df.select(id_col, vec_col).mapInPandas(fn, schema=schema)


def ivf_topk(df: DataFrame, id_col: str, vec_col: str, queries: np.ndarray,
             centroids: np.ndarray, k: int = 10,
             n_probes: int = 8) -> DataFrame:
    """IVF search: each query probes its ``n_probes`` nearest lists; exact
    cosine is computed ONLY for rows assigned to a probed list.

    Output (query_id int, id, cosine double), k rows per query. One corpus
    pass: per Arrow batch, assign rows to lists (one matmul against the
    broadcast centroids), mask to probed rows, score just those, keep a
    batch-local top-k — the shuffle is O(P * q * k) rows, like
    ``brute_force_topk``, but the scoring matmul touches only the probed
    fraction (~n_probes/n_lists of the corpus). With
    ``n_probes >= n_lists`` results equal the exact brute force."""
    cn = _normalize(np.asarray(centroids, dtype=np.float32))
    qmat = _normalize(np.asarray(queries, dtype=np.float32))
    n_lists = len(cn)
    n_probes = min(n_probes, n_lists)
    # (q, n_probes) nearest lists per query -> dense (n_lists, q) bool mask
    order = np.argsort(-(qmat @ cn.T), axis=1, kind="stable")[:, :n_probes]
    probe_mask = np.zeros((n_lists, len(qmat)), dtype=bool)
    probe_mask[order.ravel(),
               np.repeat(np.arange(len(qmat)), n_probes)] = True

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast((cn, qmat, probe_mask))
    id_field = df.schema[id_col]
    schema = (f"query_id int, {id_col} {id_field.dataType.simpleString()}, "
              f"cosine double")

    def fn(it: Iterable[pd.DataFrame]):
        c, q, probed = bc.value
        out: list[pd.DataFrame] = []
        for pdf in it:
            if not len(pdf):
                continue
            mat = _normalize(_as_matrix(pdf[vec_col]))
            lists = np.argmax(mat @ c.T, axis=1)          # (n,)
            cand = probed[lists]                          # (n, q) bool
            rows_any = cand.any(axis=1)
            if not rows_any.any():
                continue
            sub = mat[rows_any]
            sims = sub @ q.T                              # (m, q)
            sims[~cand[rows_any]] = -np.inf
            kk = min(k, sims.shape[0])
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]   # (k, q)
            qid = np.repeat(np.arange(sims.shape[1],
                                      dtype=np.int32)[None, :], kk, 0).ravel()
            cos = sims[top.ravel(), qid]
            keep = np.isfinite(cos)
            ids = pdf[id_col].to_numpy()[rows_any][top.ravel()]
            out.append(pd.DataFrame({"query_id": qid[keep],
                                     id_col: ids[keep],
                                     "cosine": cos[keep]}))
        if out:
            yield pd.concat(out, ignore_index=True)

    local = df.select(id_col, vec_col).mapInPandas(fn, schema=schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (local.withColumn("__rn", F.row_number().over(w))
                 .where(F.col("__rn") <= k).drop("__rn"))


def embedding_principal_directions(df: DataFrame, vec_col: str,
                                   ell: int = 64, k: int | None = None):
    """Top singular directions of an embedding column via a distributed
    Frequent Directions build (sketches/fd.py): one mapInPandas pass
    folds each partition's rows into an ell-row matrix sketch, the O(P)
    partial blobs (ell x d float64 each — KiBs) merge on the driver, and
    the result answers covariance-level questions with Liberty's
    deterministic bound ||A^T A - B^T B||_2 <= ||A||_F^2 / ell.

    The embedding-space diagnostic pass a curation pipeline runs before
    trusting a similarity index: spectrum decay / collapsed-space checks
    (effective rank), PCA preconditioning for IVF geometry — all from
    ONE corpus scan with O(ell*d) driver traffic, where the exact
    alternative accumulates a d x d Gram per partition (d^2 >> ell*d for
    modern embedding widths) or ships every vector.

    Returns (sketch, singular_values[:k], directions[:k] as (k, d)).
    NULL vectors are skipped; ragged dimensions raise (the sketch pins d
    on first row)."""
    from ..sketches.fd import FrequentDirections

    def partials(it: Iterable[pd.DataFrame]):
        sk = FrequentDirections(ell)
        for pdf in it:
            vecs = pdf[vec_col].dropna()
            if len(vecs):
                sk.update(_as_matrix(vecs).astype(np.float64))
        yield pd.DataFrame({"sketch": [sk.to_bytes()]})

    rows = (df.select(vec_col).where(F.col(vec_col).isNotNull())
              .mapInPandas(partials, schema="sketch binary").collect())
    out = FrequentDirections(ell)
    for r in rows:  # O(partitions) blobs, each <= ell*d float64
        out.merge(FrequentDirections.from_bytes(bytes(r["sketch"])))
    sig, vt = out.singular_directions(k)
    return out, sig, vt
