"""Sequence packing: assemble variable-length documents into fixed-token
training sequences (the "sample packing" step of every LLM data pipeline).

Given a corpus with a per-document token count and a sequence budget
(context length), assign every document to a pack such that no pack
exceeds the budget — maximizing pack fill so the trainer wastes few pad
tokens. Exact bin packing is NP-hard and inherently sequential; at 10^9+
documents the workable shape is two-level:

  1. scatter documents into ``n_buckets`` independent buckets by id hash
     (deterministic, uniform — a pure codegen `pmod(xxhash64)`);
  2. pack each bucket independently with next-fit-decreasing: sort by
     token count descending, walk the prefix-sum, and cut a new pack
     whenever the running fill would exceed the budget.

Step 2 runs in `applyInPandas` with vectorized numpy: the only Python
loop is one `searchsorted` per PACK (O(packs), never O(documents)).
Guarantees, independent of data distribution:

  * every document lands in exactly one pack;
  * no pack exceeds ``budget`` — except a document alone larger than the
    budget, which gets a singleton pack flagged ``oversize`` (callers
    truncate or split those downstream);
  * within each bucket, consecutive next-fit packs overflow pairwise
    (fill(p) + fill(p+1) > budget), so the total pack count is at most
    ``2 * total_tokens / budget + n_buckets`` — fill is provably ≥ 50%
    amortized, and descending order makes it ~85-95% in practice.

Determinism: bucket assignment and in-bucket order are pure functions of
(id, tokens), so the packing is identical across runs, partitionings, and
cluster sizes — the property every resumable training pipeline needs.

Scale: one shuffle (the bucket groupBy); per-bucket state is the bucket's
(id, tokens) pairs only — size n_buckets so buckets fit comfortably in a
task (e.g. 2^14 buckets for 10^10 docs ≈ 600k docs/bucket ≈ tens of MB).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..config import DEFAULT_SEED

__all__ = ["pack_sequences", "pack_stats"]

_PACKS_PER_BUCKET_BITS = 40  # pack_id = bucket << 40 | local index


def _next_fit_packs(tokens_desc: np.ndarray, budget: int) -> np.ndarray:
    """Pack ids (0, 1, ...) for a descending token-count array; one
    searchsorted per pack, vectorized fill in between."""
    c = np.cumsum(tokens_desc, dtype=np.int64)
    n = len(c)
    pack = np.empty(n, dtype=np.int64)
    start, pid, base = 0, 0, np.int64(0)
    while start < n:
        j = int(np.searchsorted(c, base + budget, side="right"))
        if j <= start:  # next doc alone exceeds budget -> singleton pack
            j = start + 1
        pack[start:j] = pid
        base = c[j - 1]
        start = j
        pid += 1
    return pack


def pack_sequences(df: DataFrame, id_col: str, token_col: str, budget: int,
                   n_buckets: int = 256,
                   seed: int = DEFAULT_SEED) -> DataFrame:
    """Assign every row a ``pack_id`` so that per-pack token totals stay
    within ``budget`` (see module docstring for guarantees).

    Returns (id_col, tokens long, pack_id long, pack_tokens long,
    oversize boolean): ``pack_tokens`` is the pack's total fill and
    ``oversize`` marks singleton packs whose one document alone exceeds
    the budget.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if not (1 <= n_buckets <= 1 << 20):
        raise ValueError("n_buckets out of range")

    id_field = df.schema[id_col]
    out_schema = T.StructType([
        id_field,
        T.StructField("tokens", T.LongType()),
        T.StructField("pack_id", T.LongType()),
        T.StructField("pack_tokens", T.LongType()),
        T.StructField("oversize", T.BooleanType()),
    ])

    def pack_bucket(key, pdf):
        bucket = int(key[0])
        # deterministic in-bucket order: tokens desc, id asc tiebreak
        pdf = pdf.sort_values(["__tok", id_col],
                              ascending=[False, True], kind="mergesort")
        toks = pdf["__tok"].to_numpy(dtype=np.int64)
        local = _next_fit_packs(toks, budget)
        fills = np.bincount(local, weights=toks).astype(np.int64)
        pack_tokens = fills[local]
        return pd.DataFrame({
            id_col: pdf[id_col].to_numpy(),
            "tokens": toks,
            "pack_id": (np.int64(bucket) << _PACKS_PER_BUCKET_BITS) | local,
            "pack_tokens": pack_tokens,
            "oversize": pack_tokens > budget,
        })

    if token_col not in df.columns:
        raise ValueError(f"missing token column {token_col}")
    src = df.select(
        F.col(id_col),
        # NULL token counts pack as 0-cost (kept, not dropped: conservation)
        F.coalesce(F.col(token_col).cast("long"), F.lit(0)).alias("__tok"),
        F.pmod(F.xxhash64(F.lit(seed).cast("long"), F.col(id_col)),
               F.lit(n_buckets)).alias("__bucket"))
    return src.groupBy("__bucket").applyInPandas(pack_bucket, out_schema)


def pack_stats(packed: DataFrame, budget: int, n_buckets: int) -> DataFrame:
    """One-row packing audit over `pack_sequences` output: document and
    token conservation inputs, the budget invariant, and the provable
    next-fit pack-count bound (≤ 2·total/budget + n_buckets)."""
    per_pack = packed.groupBy("pack_id").agg(
        F.first("pack_tokens").alias("fill"),
        F.first("oversize").alias("oversize"))
    return (packed.agg(
                F.count("*").alias("n_docs"),
                F.sum("tokens").alias("total_tokens"))
            .crossJoin(per_pack.agg(
                F.count("*").alias("n_packs"),
                F.max(F.when(~F.col("oversize"), F.col("fill"))
                      .otherwise(0)).alias("max_regular_fill"),
                F.sum(F.col("oversize").cast("long")).alias("n_oversize")))
            .select(
                "n_docs", "total_tokens",
                (F.col("max_regular_fill") <= budget).alias("within_budget"),
                (F.col("n_packs") <=
                 2 * F.col("total_tokens") / budget + n_buckets)
                .alias("packs_bounded"),
                "n_oversize"))
