"""Grouping-sets / cube / rollup composition for sketch aggregates
(SURVEY.md §2.6 grouping-sets row, P3).

Our sketches are applyInPandas aggregates, not Catalyst Column aggregates,
so `df.cube(...)` can't call them directly. Composition instead runs the
salted grouped build once per grouping set and unions the results with
NULLs in the rolled-up dimensions — the same output shape `cube`/`rollup`
produce. Each grouping set reuses the same input projection; at scale the
dominant cost (the scan) is shared when `df` is cached.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, functions as F

from ..agg import grouped_sketch_df
from ..config import DEFAULT_SEED
from ..sketches.base import Sketch


def sketch_grouping_sets(df: DataFrame, grouping_sets: Sequence[Sequence[str]],
                         cols, factory: Callable[[], Sketch],
                         estimates: dict[str, Callable[[Sketch], float]],
                         seed: int = DEFAULT_SEED, salt: int = 8) -> DataFrame:
    """One grouped-sketch pass per grouping set, unioned with NULL padding
    (plus the standard grouping-id column `gid`)."""
    all_keys: list[str] = []
    for gs in grouping_sets:
        for k in gs:
            if k not in all_keys:
                all_keys.append(k)

    out = None
    for gid, gs in enumerate(grouping_sets):
        gs = list(gs)
        if gs:
            part = grouped_sketch_df(df, gs, cols, factory, estimates,
                                     seed=seed, salt=salt)
        else:
            # global set: single group via a constant key
            part = (grouped_sketch_df(df.withColumn("__all", F.lit(1)),
                                      ["__all"], cols, factory, estimates,
                                      seed=seed, salt=salt)
                    .drop("__all"))
        for k in all_keys:
            if k not in gs:
                part = part.withColumn(k, F.lit(None).cast(dict(df.dtypes)[k]))
        part = part.withColumn("gid", F.lit(gid))
        part = part.select(*all_keys, "gid", *estimates.keys())
        out = part if out is None else out.unionByName(part)
    return out


def sketch_cube(df: DataFrame, dims: Sequence[str], cols,
                factory: Callable[[], Sketch],
                estimates: dict[str, Callable[[Sketch], float]],
                seed: int = DEFAULT_SEED, salt: int = 8) -> DataFrame:
    """All 2^|dims| grouping sets (cube semantics)."""
    dims = list(dims)
    sets = []
    for mask in range(1 << len(dims)):
        sets.append([d for i, d in enumerate(dims) if mask & (1 << i)])
    return sketch_grouping_sets(df, sets, cols, factory, estimates, seed, salt)


def sketch_rollup(df: DataFrame, dims: Sequence[str], cols,
                  factory: Callable[[], Sketch],
                  estimates: dict[str, Callable[[Sketch], float]],
                  seed: int = DEFAULT_SEED, salt: int = 8) -> DataFrame:
    """Hierarchical prefixes (rollup semantics): (d1..dn), (d1..dn-1), ... ()."""
    dims = list(dims)
    sets = [dims[:i] for i in range(len(dims), -1, -1)]
    return sketch_grouping_sets(df, sets, cols, factory, estimates, seed, salt)
