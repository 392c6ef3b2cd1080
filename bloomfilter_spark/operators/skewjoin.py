"""Salted join for skewed keys — the explicit-partitioning complement to
AQE's skew-join splitting.

AQE (`spark.sql.adaptive.skewJoin`) splits an oversized SHUFFLE partition,
but it only helps sort-merge joins, only after a full shuffle of both
sides, and it cannot split a single hot KEY across tasks at all once that
key's rows exceed one partition (all rows of one key hash to one
partition by construction). At transcript scale the hot conv_id /
boilerplate join key IS the problem: one key holding 10% of 10^12 rows
puts 10^11 rows in one task no matter how finely AQE splits neighbors.

``salted_join`` breaks the per-key bound explicitly:

  * fact side (large, skewed): gains a salt in [0, salt) derived
    deterministically from the row's own content hash — the hot key's
    occurrences spread across ``salt`` distinct shuffle keys;
  * dim side (too big to broadcast, else you would just broadcast):
    each row is replicated ``salt`` times via a codegen
    ``explode(sequence(0, salt-1))`` — dim rows are the SMALL side by
    assumption, so the replication factor is bounded and chosen;
  * equi-join on (keys..., salt) then drop the salt: row-identical to
    the unsalted join for inner/left/left_semi/left_anti, because every
    fact row meets exactly one replica of each matching dim row.

``hot_keys`` mode salts ONLY the listed hot keys (from
``plans.planning.diagnose_skew``): cold keys keep salt 0 and the dim
replicates hot rows only — replication cost O(|hot| * salt) rows instead
of O(|dim| * salt).

Join types beyond inner/left/left_semi/left_anti are rejected: a right or
full outer join would emit one null-extended row PER REPLICA of an
unmatched dim row (salt multiplicity leaks into the result). Sizing:
``plans.planning.suggest_salt`` converts a measured hot-key share into
the salt factor.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from ..config import DEFAULT_SEED

_SALT = "__skew_salt"
_OK_HOW = {"inner", "left", "leftouter", "left_outer", "left_semi",
           "leftsemi", "left_anti", "leftanti"}


def salted_join(fact: DataFrame, dim: DataFrame, on: Sequence[str] | str,
                salt: int = 8, how: str = "inner",
                hot_keys: Sequence | None = None,
                seed: int = DEFAULT_SEED) -> DataFrame:
    """Skew-safe equi-join of a large ``fact`` against a non-broadcastable
    ``dim`` on same-named key columns ``on``.

    ``hot_keys``: optional values of the (single) join key to salt; rows
    with other keys join un-salted. For composite keys pass tuples. None
    salts everything (uniform replication of the whole dim side).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in _OK_HOW:
        raise ValueError(
            f"how={how!r} not supported: right/full outer joins would "
            "duplicate null-extended rows per salt replica")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if not keys:
        raise ValueError("need at least one join key")

    # Per-row salt from the join keys + a per-row monotonic id: which
    # bucket a row lands in is irrelevant for correctness (any value in
    # [0, salt) joins), the id term spreads a hot key's occurrences
    # ~uniformly EVEN when rows are byte-identical duplicates, and
    # hashing only the keys (always hashable — Spark rejects map-typed
    # equi-join keys anyway) keeps map/array payload columns out of
    # xxhash64, which rejects maps. The output is row-identical under
    # any salt assignment; only task placement varies.
    fact_salt = F.pmod(
        F.xxhash64(F.lit(seed ^ 0x5A17), *[F.col(c) for c in keys],
                   F.monotonically_increasing_id()),
        F.lit(salt)).cast("int")
    replicas = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias(_SALT)

    if hot_keys is None:
        f = fact.withColumn(_SALT, fact_salt)
        d = dim.select("*", replicas)
    else:
        if len(keys) == 1:
            vals = [k[0] if isinstance(k, (tuple, list)) else k
                    for k in hot_keys]
            is_hot_f = F.col(keys[0]).isin(vals)
            is_hot_d = F.col(keys[0]).isin(vals)
        else:
            tuples = {tuple(k) for k in hot_keys}
            def _hot(cols):
                conds = [
                    F.struct(*[F.col(c) for c in cols]) ==
                    F.struct(*[F.lit(v).alias(c) for c, v in zip(cols, t)])
                    for t in tuples]
                out = conds[0]
                for c in conds[1:]:
                    out = out | c
                return out
            is_hot_f = _hot(keys)
            is_hot_d = _hot(keys)
        f = fact.withColumn(
            _SALT, F.when(is_hot_f, fact_salt).otherwise(F.lit(0)))
        d = dim.select(
            "*",
            F.explode(
                F.when(is_hot_d, F.sequence(F.lit(0), F.lit(salt - 1)))
                 .otherwise(F.array(F.lit(0)))).alias(_SALT))

    joined = f.join(d, keys + [_SALT], how)
    return joined.drop(_SALT)
