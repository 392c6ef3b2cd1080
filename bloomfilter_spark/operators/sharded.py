"""Sharded (partitioned) Bloom filter — the scale path when the sized
filter exceeds the broadcast budget.

At 10^12-turn scale, n=10^10 keys at eps=1% needs m ~ 2^37 bits = 16 GiB
(SURVEY.md §4): too big to broadcast, bigger than one driver object should
be. The sharded design keeps the *filter itself* distributed:

  - routing: shard = pmod(xxhash64(seed+2, base_hash), S), JVM-side
  - state: a DataFrame (shard int, sketch binary), one row per shard, each
    an independent BloomFilter of total_bits/S bits — collectively the same
    (m, k) math, so the FPR bound is preserved per shard
  - build: groupBy(shard, salt) partials -> groupBy(shard) merge (the same
    salted two-phase topology as grouped_sketch_df; a hot shard fans out)
  - query: cogroup(probes by shard, shard table by shard) -> vectorized
    membership inside applyInPandas — probes shuffle by shard (small rows);
    each task deserializes exactly one shard once

Zero-false-negative and merge-algebra guarantees carry over shard-wise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..agg import hash_col
from ..config import DEFAULT_SEED
from ..sizing import suggest_sizing
from ..sketches.bloom import BloomFilter
from ..util import next_power_of_two, to_u64

SHARD_TABLE_SCHEMA = T.StructType([
    T.StructField("shard", T.IntegerType(), False),
    T.StructField("sketch", T.BinaryType(), True),
])


def _routed(df: DataFrame, cols, n_shards: int, seed: int) -> DataFrame:
    """(shard, h) projection: base hash + independent shard route."""
    from ..agg import _cols
    cs = _cols(cols)
    cond = cs[0].isNotNull()
    for c in cs[1:]:
        cond = cond & c.isNotNull()
    h = hash_col(cs, seed)
    return (df.where(cond)
              .select(h.alias("__h"))
              .withColumn("__shard",
                          F.pmod(F.xxhash64(F.lit(seed + 2), F.col("__h")),
                                 F.lit(n_shards)).cast("int")))


def shard_geometry(capacity: int, fpr: float, n_shards: int) -> tuple[int, int]:
    """Per-shard (m, k): size the whole filter, split bits evenly, round the
    shard up to a power of two (only lowers realized FPR)."""
    m_total, k = suggest_sizing(max(capacity, 1), fpr)
    m_shard = max(64, next_power_of_two(-(-m_total // n_shards)))
    return m_shard, k


def build_sharded_bloom(df: DataFrame, cols, capacity: int, fpr: float = 0.01,
                        n_shards: int = 32, salt: int = 4,
                        seed: int = DEFAULT_SEED) -> DataFrame:
    """Returns the shard table (shard int, sketch binary), one row per
    non-empty shard. Lazy — persist() it for repeated querying."""
    m_shard, k = shard_geometry(capacity, fpr, n_shards)
    routed = _routed(df, cols, n_shards, seed).withColumn(
        "__salt", F.pmod(F.xxhash64(F.lit(seed + 3), F.col("__h")), F.lit(salt)))

    def phase1(pdf: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(m_shard, k)
        bf.update(to_u64(pdf["__h"].to_numpy()))
        return pd.DataFrame({"shard": [int(pdf["__shard"].iloc[0])],
                             "sketch": [bf.to_bytes()]})

    partials = (routed.groupBy("__shard", "__salt")
                      .applyInPandas(phase1, schema=SHARD_TABLE_SCHEMA))

    def phase2(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = None
        for buf in pdf["sketch"]:
            s = BloomFilter.from_bytes(bytes(buf))
            merged = s if merged is None else merged.merge(s)
        return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])],
                             "sketch": [merged.to_bytes()]})

    return partials.groupBy("shard").applyInPandas(phase2, schema=SHARD_TABLE_SCHEMA)


def sharded_membership(df: DataFrame, shard_table: DataFrame, cols,
                       out_col: str = "is_member",
                       seed: int = DEFAULT_SEED) -> DataFrame:
    """Membership column against a sharded filter via cogroup-by-shard —
    no broadcast; each task touches exactly one shard's bytes."""
    n_shards = None  # routing derives from the same seed; shard ids align
    from ..agg import _cols
    cs = _cols(cols)
    # count shards from the table (cheap: one small agg) to route identically
    n_shards = shard_table.agg(F.max("shard")).first()[0] + 1

    withkeys = df.withColumn("__h", hash_col(cs, seed)).withColumn(
        "__shard", F.pmod(F.xxhash64(F.lit(seed + 2), F.col("__h")),
                          F.lit(n_shards)).cast("int"))

    out_schema = T.StructType(list(withkeys.schema.fields)
                              + [T.StructField(out_col, T.BooleanType())])

    def fn(probes: pd.DataFrame, shard: pd.DataFrame) -> pd.DataFrame:
        if len(shard):
            bf = BloomFilter.from_bytes(bytes(shard["sketch"].iloc[0]))
            member = bf.contains(to_u64(probes["__h"].to_numpy()))
        else:
            member = np.zeros(len(probes), dtype=bool)
        out = probes.copy()
        out[out_col] = member
        return out

    cg = withkeys.groupBy("__shard").cogroup(shard_table.groupBy("shard"))
    result = cg.applyInPandas(lambda key, probes, shard: fn(probes, shard),
                              schema=out_schema)
    return result.drop("__h", "__shard")
