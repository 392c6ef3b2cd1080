"""Deterministic hash-threshold sampling — the corpus-mixing primitive of
a training-data pipeline (mixture weights per source/language/quality
tier, reproducible across reruns and machines).

Unlike `DataFrame.sample` (RDD-level RNG: partition-layout-dependent, not
reproducible across repartitions), these operators decide membership from
`xxhash64(seed, key)` alone, entirely in whole-stage codegen:

* same (seed, key) ⇒ same decision on every run, any partitioning, any
  cluster size — a sampled corpus is a pure function of the data;
* sampling BY KEY (e.g. conv_id / user_id) keeps or drops *all* rows of an
  entity together, across every table hashed with the same seed — the
  entity-consistent sampling a train/holdout split needs;
* disjoint seed ranges give independent samples (xxhash64 avalanche).

The uniform variate is the hash's top 32 bits scaled to [0, 1): u32/2^32.
P[u < f] deviates from f by at most 2^-32 (quantization), so observed
counts are Binomial(n, f) for any practical f — the 4-sigma acceptance
band the tests and driver query assert.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..agg import _cols, hash_col
from ..config import DEFAULT_SEED


def sample_uniform_col(cols, seed: int = DEFAULT_SEED) -> Column:
    """U[0,1) variate as a Column: top 32 bits of the salted 64-bit hash
    of `cols`, scaled. Pure codegen; NULL keys hash to the seed-only value
    (deterministic, documented — filter NULLs first if they must be
    excluded)."""
    h = hash_col(_cols(cols), seed)
    return (F.shiftrightunsigned(h, 32).cast("double")
            / F.lit(float(1 << 32)))


def hash_sample(df: DataFrame, cols, fraction: float,
                seed: int = DEFAULT_SEED) -> DataFrame:
    """Keep rows whose key-hash variate falls below `fraction`.

    Sampling on an entity key (conv_id, user_id, url-host, ...) keeps
    every row of a kept entity — apply to any number of tables with the
    same (cols, seed) for a consistent cross-table split."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.where(sample_uniform_col(cols, seed) < F.lit(float(fraction)))


def stratified_sample(df: DataFrame, strata_col: str, fractions: dict,
                      key_cols=None, default: float = 0.0,
                      seed: int = DEFAULT_SEED) -> DataFrame:
    """Per-stratum hash sampling: `fractions` maps stratum value ->
    fraction; strata absent from the map get `default`. The threshold is a
    broadcast-joined column, so the plan is scan -> broadcast hash join ->
    filter — no shuffle of `df`, works for any number of strata.

    `key_cols` defaults to the stratum column itself plus nothing — pass
    the entity key (e.g. ["doc_id"]) to decide per-document rather than
    per-stratum-constant. A mixture config like
    {"web": 0.1, "code": 1.0, "wiki": 0.5} is the training-mix use case.
    """
    spark = df.sparkSession
    if key_cols is None:
        raise ValueError("key_cols is required: the entity whose hash "
                         "decides membership (e.g. ['doc_id'])")
    for s, f in fractions.items():
        if not 0.0 <= float(f) <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0, 1]")
    # thresholds carry the stratum column's OWN type (from df's schema), so
    # equality is exact for any dtype — string-form matching would silently
    # miss booleans (str(True) vs 'true') and many floats. Mis-typed
    # fraction keys fail loudly here at createDataFrame.
    from pyspark.sql import types as T
    thr_schema = T.StructType([
        T.StructField("__stratum", df.schema[strata_col].dataType),
        T.StructField("__frac", T.DoubleType())])
    thresholds = spark.createDataFrame(
        [(s, float(f)) for s, f in fractions.items()], thr_schema)
    joined = (df.join(F.broadcast(thresholds),
                      df[strata_col] == thresholds["__stratum"], "left")
                .withColumn("__frac",
                            F.coalesce("__frac", F.lit(float(default)))))
    return (joined
            .where(sample_uniform_col(key_cols, seed) < F.col("__frac"))
            .drop("__frac", "__stratum"))


def split_train_holdout(df: DataFrame, cols, holdout_fraction: float,
                        seed: int = DEFAULT_SEED) -> tuple[DataFrame, DataFrame]:
    """Entity-consistent (train, holdout) split: an entity is in exactly
    one side, on every table hashed with the same (cols, seed)."""
    u = sample_uniform_col(cols, seed)
    thr = F.lit(float(holdout_fraction))
    return df.where(u >= thr), df.where(u < thr)


def weighted_sample_key(weight_col, cols, seed: int = DEFAULT_SEED) -> Column:
    """Efraimidis–Spirakis A-ES sampling key ``ln(u) / w`` as a pure
    codegen Column (ES, IPL 2006: taking the k LARGEST keys draws a
    weighted sample without replacement; for k=1 the inclusion
    probability is exactly ``w_i / W``).

    ``u`` is the deterministic hash variate of `cols` shifted to the open
    interval (0,1) — ``(top32 + 0.5) / 2^32`` can never be 0 or 1, so the
    log is always finite. Same (seed, key) ⇒ same key on any partitioning
    or cluster size; disjoint seeds give independent replicates."""
    w = _cols([weight_col])[0]
    u32 = F.shiftrightunsigned(hash_col(_cols(cols), seed), 32).cast("double")
    u = (u32 + F.lit(0.5)) / F.lit(float(1 << 32))
    return F.log(u) / w


def weighted_reservoir_sample(df: DataFrame, k: int, weight_col, cols,
                              seed: int = DEFAULT_SEED) -> DataFrame:
    """Deterministic weight-proportional sample of `k` rows WITHOUT
    replacement (A-ES): rank every row by `weighted_sample_key` and keep
    the top k. Heavier rows get larger keys in expectation, so the sample
    over-represents weight exactly per the A-ES distribution — the
    "sample documents proportional to token count" curation step.

    Scale shape: `orderBy(desc).limit(k)` plans as TakeOrderedAndProject —
    each task keeps only its local top-k and the driver merges P·k rows,
    so no global sort and no shuffle of the data. Rows with NULL or
    non-positive weight are excluded (they have no defined inclusion
    probability); ties are measure-zero under the 64-bit hash."""
    if k < 0:
        raise ValueError("k must be >= 0")
    w = _cols([weight_col])[0]
    key = weighted_sample_key(weight_col, cols, seed)
    return (df.where(w.isNotNull() & (w > 0))
              .withColumn("__aes_key", key)
              .orderBy(F.desc("__aes_key"))
              .limit(k)
              .drop("__aes_key"))


def grouped_weighted_sample(df: DataFrame, group_cols, k: int, weight_col,
                            cols, seed: int = DEFAULT_SEED) -> DataFrame:
    """Deterministic weight-proportional sample of AT MOST `k` rows per
    group, without replacement (A-ES per group) — the "keep a balanced
    per-domain/per-language subsample" curation step. Groups with fewer
    than k eligible rows keep them all.

    Scale shape: one shuffle by `group_cols`, then `row_number` over the
    per-group A-ES key descending with a rank<=k filter — Spark pushes
    the limit into the sort as WindowGroupLimit, so each task keeps only
    k rows per group it owns rather than sorting whole groups. The A-ES
    key depends only on (seed, cols, weight), so the selected set is
    invariant to partitioning and cluster size. Rows with NULL/non-positive
    weight or NULL group are excluded (no defined inclusion probability /
    group identity)."""
    if k < 0:
        raise ValueError("k must be >= 0")
    from pyspark.sql import Window
    groups = _cols(group_cols if isinstance(group_cols, (list, tuple))
                   else [group_cols])
    w = _cols([weight_col])[0]
    key = weighted_sample_key(weight_col, cols, seed)
    win = Window.partitionBy(*groups).orderBy(F.desc("__aes_key"))
    eligible = df.where(w.isNotNull() & (w > 0))
    for g in groups:
        eligible = eligible.where(g.isNotNull())
    return (eligible
            .withColumn("__aes_key", key)
            .withColumn("__aes_rank", F.row_number().over(win))
            .where(F.col("__aes_rank") <= k)
            .drop("__aes_key", "__aes_rank"))


def sample_to_budget(df: DataFrame, strata_col: str, cost_col, budgets: dict,
                     key_cols, seed: int = DEFAULT_SEED,
                     default: float = 1.0) -> tuple[DataFrame, dict]:
    """Downsample each stratum so its EXPECTED total `cost_col` (token
    count, bytes, F.lit(1) for rows) meets the stratum's budget:
    fraction_s = min(1, budget_s / total_s), realized by the deterministic
    hash threshold — the "mix to N tokens per source" pipeline step.

    One small codegen aggregate computes per-stratum totals (#strata rows
    to the driver, map-side combined); strata without a budget keep
    `default`. Returns (sampled_df, fractions) so callers can log the
    realized mixture. The sampled total is a sum over independently kept
    entities: var = f(1-f)·Σ cost(entity)², the acceptance band the tests
    and q44 assert."""
    c = _cols([cost_col])[0]
    totals = {r["s"]: r["t"] for r in
              df.groupBy(F.col(strata_col).alias("s"))
                .agg(F.sum(c).alias("t")).collect()}
    missing = [s for s in budgets if s not in totals]
    if missing:
        # a budget that matches nothing is almost always a typo or a type
        # mismatch (int stratum vs str key) — silently keeping the stratum
        # whole would bypass the budget, so fail loudly
        raise ValueError(
            f"budgets reference strata absent from the data: {missing!r}; "
            f"present strata: {sorted(map(repr, totals))[:20]}")
    fractions = {}
    for s, b in budgets.items():
        if float(b) < 0:
            raise ValueError(f"budget for {s!r} must be >= 0")
        t = totals[s]
        fractions[s] = 1.0 if not t or t <= 0 else min(1.0, float(b) / float(t))
    return (stratified_sample(df, strata_col, fractions, key_cols=key_cols,
                              default=default, seed=seed), fractions)
