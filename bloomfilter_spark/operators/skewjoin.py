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
from pyspark.sql.types import ArrayType, DataType, MapType, StructType

from ..config import DEFAULT_SEED


def _contains_map(dt: DataType) -> bool:
    """xxhash64 rejects MapType (map element order is undefined, so a map
    has no canonical hash) — anywhere in the type tree."""
    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False

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

    # Per-row salt = content hash over the join keys + every map-free
    # payload column, taken modulo `salt`. Which bucket a row lands in is
    # irrelevant for correctness (any value in [0, salt) joins), but the
    # derivation must be DETERMINISTIC: the salt feeds a shuffle/join key,
    # and a non-deterministic term (monotonically_increasing_id, rand)
    # can re-evaluate differently when a map stage is recomputed after a
    # fetch failure — reducers that consumed the old output plus ones
    # consuming the recomputed output then double-count or drop rows (the
    # classic non-deterministic-shuffle-key bug). Content hashing is
    # retry-stable by construction. Map-typed columns are excluded
    # (xxhash64 rejects maps — no canonical element order); rows identical
    # in ALL hashed columns share a salt, so byte-identical duplicates of
    # a hot key do not spread — run dedup/frequency-cap upstream if the
    # skew IS duplicates (operators.dedup), which is cheaper than joining
    # them anyway.
    payload = [f.name for f in fact.schema.fields
               if f.name not in keys and not _contains_map(f.dataType)]
    fact_salt = F.pmod(
        F.xxhash64(F.lit(seed ^ 0x5A17).cast("long"),
                   *[F.col(c) for c in keys + payload]),
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
