"""Heavy hitters and top-k operators.

Exact top-k by key is a partial-aggregated groupBy + ordered limit (shuffle
carries one row per distinct key, not per input row — map-side combine is
free from Catalyst). The CMS variant answers the same question with O(d*w)
state when the key space itself is too large to shuffle: per-partition
candidate top-k (bounded) + a merged CMS to score candidates.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T_

from ..agg import build_sketch, with_cms_count
from ..config import DEFAULT_SEED
from ..sketches.cms import CountMinSketch


def exact_top_k(df: DataFrame, key_cols, k: int, weight_col=None) -> DataFrame:
    """Exact heavy hitters: groupBy(keys) count/sum, ordered limit with a
    deterministic key tie-break."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    agg = (F.count("*") if weight_col is None else
           F.sum(weight_col).cast("long")).alias("cnt")
    out = df.groupBy(*keys).agg(agg)
    return out.orderBy(F.desc("cnt"), *[F.asc(c) for c in keys]).limit(k)


def top_k_per_group(df: DataFrame, group_cols, order_col, k: int,
                    ascending: bool = False) -> DataFrame:
    """Top-k rows per group via ranked window (common OLAP pattern)."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    order = F.asc(order_col) if ascending else F.desc(order_col)
    w = Window.partitionBy(*groups).orderBy(order)
    return (df.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") <= k).drop("__rn"))


def cms_heavy_hitters(df: DataFrame, key_cols, k: int,
                      candidates_per_partition: int = 256,
                      eps: float = 1e-4, delta: float = 1e-3,
                      seed: int = DEFAULT_SEED,
                      conservative: bool = False) -> DataFrame:
    """Approximate heavy hitters at unbounded key cardinality.

    1. per-partition exact local top candidates (bounded memory, mapInPandas)
    2. global CMS over the full stream (two-level merged)
    3. estimate candidate frequencies from the CMS, take global top-k.

    A true global heavy hitter is a local heavy hitter in at least one
    partition at this candidate width, so the candidate union covers the
    answer with high probability; CMS never undercounts, so ranking errs
    only by eps*N overcounts. ``conservative=True`` uses Estan-Varghese
    conservative update in each partial (tighter overcounts at the same
    eps*N bound; merged partials keep exact <= est <= plain-CMS est).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    keyed = df.select(F.concat_ws("\x1f", *keys).alias("key")).where(
        F.col("key").isNotNull())

    cms = build_sketch(keyed, ["key"],
                       lambda: CountMinSketch(eps=eps, delta=delta,
                                              conservative=conservative),
                       seed=seed)

    def local_candidates(it: Iterable[pd.DataFrame]):
        counts = pd.Series(dtype="int64")
        for pdf in it:
            counts = counts.add(pdf["key"].value_counts(), fill_value=0)
        top = (counts.sort_index()
                     .sort_values(ascending=False, kind="stable")
                     .head(candidates_per_partition))
        yield pd.DataFrame({"key": top.index.to_numpy(dtype=object)})

    cands = keyed.mapInPandas(local_candidates, schema="key string").distinct()
    scored = with_cms_count(cands, cms, ["key"], out_col="est_cnt", seed=seed)
    return scored.orderBy(F.desc("est_cnt"), F.asc("key")).limit(k)


def cms_heavy_change(df_a: DataFrame, df_b: DataFrame, key_cols, k: int,
                     candidates_per_partition: int = 256,
                     eps: float = 1e-4, delta: float = 1e-3,
                     seed: int = DEFAULT_SEED,
                     conservative: bool = False) -> DataFrame:
    """Heavy CHANGE detection (Cormode–Muthukrishnan "what's new"):
    the keys whose frequency moved the most between two datasets /
    periods — the corpus-monitoring complement of `ks_drift` (which
    sees distribution shifts but not which key moved).

    Since ``|cnt_a - cnt_b| <= max(cnt_a, cnt_b)``, a top change key is
    a heavy hitter in at least one side, so the candidate union of both
    sides' per-partition local tops covers the answer at the same width
    guarantee as `cms_heavy_hitters`. Scoring reads both sides' merged
    CMS: each estimate errs only upward by <= eps*N of its side, so
    ``est_a - est_b`` sits within ``[change - eps*Nb, change + eps*Na]``.
    Returns (key, est_a, est_b, change) — top-k by change with a
    deterministic key tie-break. O(d*w) state per side; neither input is
    ever shuffled by key.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def prep(df: DataFrame) -> DataFrame:
        return (df.select(F.concat_ws("\x1f", *keys).alias("key"))
                  .where(F.col("key").isNotNull()))

    ka, kb = prep(df_a), prep(df_b)
    mk = lambda: CountMinSketch(eps=eps, delta=delta,  # noqa: E731
                                conservative=conservative)
    cms_a = build_sketch(ka, ["key"], mk, seed=seed)
    cms_b = build_sketch(kb, ["key"], mk, seed=seed)

    def local_candidates(it: Iterable[pd.DataFrame]):
        counts = pd.Series(dtype="int64")
        for pdf in it:
            counts = counts.add(pdf["key"].value_counts(), fill_value=0)
        top = (counts.sort_index()
                     .sort_values(ascending=False, kind="stable")
                     .head(candidates_per_partition))
        yield pd.DataFrame({"key": top.index.to_numpy(dtype=object)})

    cands = (ka.mapInPandas(local_candidates, schema="key string")
               .unionByName(kb.mapInPandas(local_candidates,
                                           schema="key string"))
               .distinct())
    scored = with_cms_count(cands, cms_a, ["key"], out_col="est_a",
                            seed=seed)
    scored = with_cms_count(scored, cms_b, ["key"], out_col="est_b",
                            seed=seed)
    change = F.abs(F.col("est_a") - F.col("est_b")).alias("change")
    return (scored.select("key", "est_a", "est_b", change)
                  .orderBy(F.desc("change"), F.asc("key")).limit(k))


def token_vocabulary(df: DataFrame, text_col: str, k: int,
                     method: str = "exact", lowercase: bool = True,
                     **cms_kwargs) -> DataFrame:
    """Top-k corpus token vocabulary (token, cnt) — the candidate list a
    tokenizer/BPE training step or stopword analysis starts from.

    method="exact": explode whitespace tokens -> groupBy(token).count()
    (HashAggregate partials map-side, so the shuffle carries one row per
    DISTINCT token per task — Zipf heads collapse before moving) ->
    ordered limit with deterministic (cnt desc, token asc) tie-break.

    method="cms": delegates to cms_heavy_hitters over the exploded
    tokens — O(d*w) state instead of a distinct-token shuffle, for when
    even the distinct vocabulary (web-scale: 10^8+ tokens across
    languages/typos) is too wide to shuffle comfortably; counts are
    eps*N-overcounted, never under."""
    c = F.col(text_col)
    toks_arr = F.split(F.trim(F.lower(c) if lowercase else c), r"\s+")
    toks = (df.where(c.isNotNull() & (F.length(F.trim(c)) > 0))
              .select(F.explode(toks_arr).alias("token")))
    if method == "exact":
        return exact_top_k(toks, "token", k)
    if method == "cms":
        out = cms_heavy_hitters(toks, "token", k, **cms_kwargs)
        return out.select(F.col("key").alias("token"),
                          F.col("est_cnt").alias("cnt"))
    raise ValueError(f"unknown method {method!r} (expected 'exact' or 'cms')")


def decayed_top_items(df: DataFrame, group_cols, item_col: str, ts_col: str,
                      half_life_s: float, k: int,
                      t_ref: str = "group") -> DataFrame:
    """Per-group top-k items by exponentially TIME-DECAYED count — the
    batch dual of ``streaming.stateful_decayed_heavy_hitters``, exact and
    entirely Catalyst-side (one shuffle on (group, item), then a
    rank-limited window that plans as WindowGroupLimit).

    Decayed count at reference time T: C_i(T) = sum over occurrences of
    exp(-lambda*(T - t_j)), lambda = ln2/half_life_s. ``t_ref`` picks T:
    ``"group"`` (default) uses each group's own max event time — what the
    streaming operator's per-key landmark converges to, so results are
    directly comparable — while ``"global"`` uses the whole input's max,
    ranking every group on one clock. NULL items/timestamps are dropped,
    matching the streaming form.

    Returns (group_cols..., item_col, decayed_count double, t_ref double,
    rank int). At 100 TB: the exp() weight is one codegen expression per
    row, the per-(group,item) sum partial-aggregates map-side, and only
    k rows per group survive the window — no driver traffic.
    """
    if half_life_s <= 0:
        raise ValueError(f"half_life_s must be > 0, got {half_life_s}")
    if t_ref not in ("group", "global"):
        raise ValueError(f"t_ref must be 'group' or 'global', got {t_ref!r}")
    import math
    lam = math.log(2.0) / float(half_life_s)
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    ts = F.col(ts_col)
    if not isinstance(df.schema[ts_col].dataType,
                      (T_.DoubleType, T_.FloatType, T_.LongType,
                       T_.IntegerType, T_.DecimalType)):
        ts = ts.cast("timestamp")
    # filter on the CASTED ts double: a NaN in a numeric ts_col passes
    # isNotNull and would poison the group's max-landmark and every
    # decayed weight downstream (exp of NaN)
    ts_d = ts.cast("double")
    rows = (df.where(F.col(item_col).isNotNull()
                     & ts_d.isNotNull() & ~F.isnan(ts_d))
              .select(*groups, item_col, ts_d.alias("__sec")))
    if t_ref == "global":
        # one scalar to the driver: the clock, not data
        t = rows.agg(F.max("__sec")).first()[0]
        rows = rows.withColumn("__tref", F.lit(float(t) if t is not None
                                               else None))
    else:
        w_all = Window.partitionBy(*groups)
        rows = rows.withColumn("__tref", F.max("__sec").over(w_all))
    per_item = (rows.groupBy(*groups, item_col)
                .agg(F.sum(F.exp(-F.lit(lam) * (F.col("__tref")
                                                - F.col("__sec"))))
                      .alias("decayed_count"),
                     F.max("__tref").alias("t_ref")))
    w = Window.partitionBy(*groups).orderBy(F.desc("decayed_count"),
                                            F.asc(item_col))
    return (per_item.withColumn("rank", F.row_number().over(w))
                    .where(F.col("rank") <= k))
