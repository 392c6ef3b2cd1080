"""Deduplication operators for training-data pipelines.

- exact: hash-groupBy keep-first (shuffle carries one row per distinct key)
- minhash + LSH: char-shingle -> minhash signature -> banded bucket join ->
  (optional) exact Jaccard verification (Broder 1997; Leskovec/Rajaraman/
  Ullman MMDS ch.3 banding analysis)
- simhash: 64-bit weighted token fingerprint, near-dup = small Hamming
  distance, candidates via 16-bit chunk banding (Charikar 2002, Manku 2007)
- n-gram Jaccard: exact verification kernel for candidate pairs

All heavy kernels are numpy-vectorized inside mapInPandas; candidate
generation is pure DataFrame ops (explode + self-join on bucket keys), so
the shuffle keys are small band hashes, never full documents.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..config import DEFAULT_SEED
from ..util import U64, splitmix64

_MERSENNE = (1 << 61) - 1


# --- exact ----------------------------------------------------------------

def dedup_exact(df: DataFrame, key_cols, order_cols=None) -> DataFrame:
    """Keep one row per key. With order_cols, keeps the first under that
    ordering (deterministic); otherwise an arbitrary-but-single survivor."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if order_cols is None:
        return df.dropDuplicates(keys)
    order = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    w = Window.partitionBy(*keys).orderBy(*[F.asc(c) for c in order])
    return (df.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") == 1).drop("__rn"))


# --- shingle/minhash kernels ---------------------------------------------

def _char_shingle_hashes(text: str, k: int) -> np.ndarray:
    """Rolling polynomial hashes of all char k-grams (numpy sliding window,
    one dot product per row — no per-shingle Python)."""
    data = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    if data.size < k:
        data = np.pad(data, (0, k - data.size), constant_values=32)
    windows = np.lib.stride_tricks.sliding_window_view(data, k).astype(U64)
    powers = np.power(U64(1099511628211), np.arange(k, dtype=U64))
    with np.errstate(over="ignore"):
        return splitmix64((windows * powers[None, :]).sum(axis=1, dtype=U64))


def _minhash_matrix(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of (a*h + b) mod 2^61-1 over the shingle set."""
    h = (shingles % U64(_MERSENNE)).astype(np.uint64)
    with np.errstate(over="ignore"):
        vals = (a[:, None] * h[None, :] + b[:, None]) % U64(_MERSENNE)
    return vals.min(axis=1)


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_perm: int = 128, shingle_k: int = 5,
                       seed: int = DEFAULT_SEED) -> DataFrame:
    """(id, signature array<long>) MinHash signatures."""
    rng_a = splitmix64(np.arange(1, num_perm + 1, dtype=U64) + U64(seed & 0x7FFFFFFF))
    a = (rng_a % U64(_MERSENNE - 1)) + U64(1)
    b = splitmix64(rng_a) % U64(_MERSENNE)

    id_field = df.schema[id_col]
    schema = f"{id_col} {id_field.dataType.simpleString()}, signature array<bigint>"

    def fn(it: Iterable[pd.DataFrame]):
        for pdf in it:
            ids, sigs = [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                sh = _char_shingle_hashes(text or "", shingle_k)
                sigs.append(_minhash_matrix(sh, a, b).astype(np.int64))
                ids.append(i)
            yield pd.DataFrame({id_col: ids, "signature": sigs})

    return df.select(id_col, text_col).mapInPandas(fn, schema=schema)


def minhash_lsh_candidates(signatures: DataFrame, id_col: str,
                           bands: int = 16, seed: int = DEFAULT_SEED) -> DataFrame:
    """Banded LSH: split each signature into `bands` bands, hash each band,
    self-join on (band_id, band_hash) -> candidate pairs (id_a < id_b).

    The join key is a small long, so the shuffle moves signatures not
    documents; Catalyst handles the equi-join strategy."""
    sig_len_row = signatures.select(F.size("signature").alias("n")).first()
    rows_per_band = max(1, sig_len_row["n"] // bands)

    banded = signatures.select(
        F.col(id_col),
        F.posexplode(F.col("signature")).alias("pos", "val"),
    ).withColumn("band", (F.col("pos") / rows_per_band).cast("int")) \
     .groupBy(id_col, "band") \
     .agg(F.xxhash64(F.lit(seed), F.concat_ws(",", F.collect_list("val"))).alias("band_hash"))

    left = banded.alias("a")
    right = banded.alias("b")
    pairs = (left.join(right, on=[F.col("a.band") == F.col("b.band"),
                                  F.col("a.band_hash") == F.col("b.band_hash"),
                                  F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
                 .select(F.col(f"a.{id_col}").alias("id_a"),
                         F.col(f"b.{id_col}").alias("id_b"))
                 .distinct())
    return pairs


def minhash_jaccard_estimates(signatures: DataFrame, pairs: DataFrame,
                              id_col: str) -> DataFrame:
    """Estimated Jaccard for candidate pairs = fraction of agreeing minhash
    coordinates (zip_with, JVM-side)."""
    sig_a = signatures.select(F.col(id_col).alias("id_a"),
                              F.col("signature").alias("sig_a"))
    sig_b = signatures.select(F.col(id_col).alias("id_b"),
                              F.col("signature").alias("sig_b"))
    joined = pairs.join(sig_a, "id_a").join(sig_b, "id_b")
    agree = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v)
    return joined.select(
        "id_a", "id_b",
        (agree / F.size("sig_a")).alias("est_jaccard"))


def minhash_lsh_dedup(df: DataFrame, id_col: str, text_col: str,
                      threshold: float = 0.8, num_perm: int = 128,
                      bands: int = 16, shingle_k: int = 5,
                      seed: int = DEFAULT_SEED) -> DataFrame:
    """Near-duplicate pairs (id_a, id_b, est_jaccard >= threshold)."""
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_k, seed)
    sigs = sigs.persist()
    pairs = minhash_lsh_candidates(sigs, id_col, bands, seed)
    est = minhash_jaccard_estimates(sigs, pairs, id_col)
    return est.where(F.col("est_jaccard") >= threshold)


# --- simhash --------------------------------------------------------------

def simhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       seed: int = DEFAULT_SEED) -> DataFrame:
    """64-bit SimHash over whitespace tokens (Charikar 2002): sum token-hash
    bit vectors (+1/-1), sign -> bits. Vectorized per batch with a token
    explosion in numpy."""
    id_field = df.schema[id_col]
    schema = f"{id_col} {id_field.dataType.simpleString()}, simhash bigint"
    seed_u = U64(seed & 0xFFFFFFFFFFFFFFFF)

    def fn(it: Iterable[pd.DataFrame]):
        bit_idx = np.arange(64, dtype=U64)
        for pdf in it:
            out = np.zeros(len(pdf), dtype=np.int64)
            tokens_per_row = pdf[text_col].fillna("").str.lower().str.split()
            lengths = tokens_per_row.str.len().to_numpy()
            flat = [t for row in tokens_per_row for t in row]
            if flat:
                # pd.util.hash_array: deterministic fixed-key siphash,
                # vectorized (Python's hash() is salted per-process — unusable)
                th = pd.util.hash_array(np.asarray(flat, dtype=object)).astype(U64)
                th = splitmix64(th ^ seed_u)
                bits = ((th[:, None] >> bit_idx[None, :]) & U64(1)).astype(np.int64)
                contrib = 2 * bits - 1
                row_id = np.repeat(np.arange(len(pdf)), lengths)
                acc = np.zeros((len(pdf), 64), dtype=np.int64)
                np.add.at(acc, row_id, contrib)
                sim_bits = (acc > 0).astype(np.uint64)
                out = (sim_bits << bit_idx[None, :]).sum(axis=1).astype(np.uint64) \
                    .view(np.int64)
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return df.select(id_col, text_col).mapInPandas(fn, schema=schema)


def simhash_near_dups(df: DataFrame, id_col: str, text_col: str,
                      max_hamming: int = 3, seed: int = DEFAULT_SEED) -> DataFrame:
    """Near-dup pairs by SimHash. Candidates share at least one of four
    16-bit chunks (any pair within Hamming distance 3 must agree on >=1
    chunk — pigeonhole); verified exactly with bit_count(xor)."""
    sigs = simhash_signatures(df, id_col, text_col, seed).persist()
    chunks = sigs.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk_id"),
                     F.shiftrightunsigned("simhash", i * 16).bitwiseAND(F.lit(0xFFFF))
                      .alias("chunk_val"))
            for i in range(4)])).alias("c")
    ).select(id_col, "simhash", "c.chunk_id", "c.chunk_val")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (a.join(b, on=[F.col("a.chunk_id") == F.col("b.chunk_id"),
                          F.col("a.chunk_val") == F.col("b.chunk_val"),
                          F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     F.col("a.simhash").alias("sh_a"),
                     F.col("b.simhash").alias("sh_b"))
             .distinct())
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.withColumn("hamming", hamming)
                .where(F.col("hamming") <= max_hamming)
                .select("id_a", "id_b", "hamming"))


# --- n-gram Jaccard (exact verifier) -------------------------------------

def ngram_jaccard_pairs(df: DataFrame, pairs: DataFrame, id_col: str,
                        text_col: str, n: int = 3) -> DataFrame:
    """Exact token n-gram Jaccard for given candidate pairs, as DataFrame
    set algebra: explode n-grams, count intersections/unions per pair."""
    grams = df.select(
        F.col(id_col).alias("gid"),
        F.explode(F.transform(
            F.sequence(F.lit(0), F.greatest(
                F.size(F.split(F.lower(F.col(text_col)), r"\s+")) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(
                F.split(F.lower(F.col(text_col)), r"\s+"), i + 1, n)),
        )).alias("gram")).distinct()

    ga = grams.select(F.col("gid").alias("id_a"), F.col("gram").alias("g_a"))
    gb = grams.select(F.col("gid").alias("id_b"), F.col("gram").alias("g_b"))
    inter = (pairs.join(ga, "id_a").join(gb, "id_b")
                  .where(F.col("g_a") == F.col("g_b"))
                  .groupBy("id_a", "id_b").agg(F.count("*").alias("n_inter")))
    counts = grams.groupBy("gid").agg(F.count("*").alias("n_grams"))
    ca = counts.select(F.col("gid").alias("id_a"), F.col("n_grams").alias("n_a"))
    cb = counts.select(F.col("gid").alias("id_b"), F.col("n_grams").alias("n_b"))
    return (pairs.join(inter, ["id_a", "id_b"], "left")
                 .na.fill({"n_inter": 0})
                 .join(ca, "id_a").join(cb, "id_b")
                 .select("id_a", "id_b",
                         (F.col("n_inter") /
                          (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
                         .alias("jaccard")))
