"""Grouping-sets / cube / rollup composition for sketch aggregates
(SURVEY.md §2.6 grouping-sets row, P3).

Our sketches are applyInPandas aggregates, not Catalyst Column aggregates,
so `df.cube(...)` can't call them directly. Composition exploits the merge
algebra instead: ONE salted grouped build at the finest granularity
(union of all grouping-set keys) produces a (keys..., sketch) table, and
every grouping set derives from it by re-grouping + merging serialized
sketches — the input is scanned exactly once however many sets there are
(2^d for a cube), and each derivation shuffles only the tiny sketch table.
Estimates are identical to per-set builds because merge is associative and
commutative (asserted in tests/test_cube_crosscheck.py).

Caveat: the finest table holds one sketch per distinct key combination;
for jointly-high-cardinality dims prefer per-set builds (single_scan=False)
or a smaller sketch state.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, functions as F

from ..agg import (estimate_grouped, grouped_sketch_df, grouped_sketch_table,
                   merge_grouped_sketches)
from ..config import DEFAULT_SEED
from ..sketches.base import Sketch


def sketch_grouping_sets(df: DataFrame, grouping_sets: Sequence[Sequence[str]],
                         cols, factory: Callable[[], Sketch],
                         estimates: dict[str, Callable[[Sketch], float]],
                         seed: int = DEFAULT_SEED, salt: int = 8,
                         single_scan: bool = True) -> DataFrame:
    """Sketch estimates per grouping set, NULL-padded in rolled-up
    dimensions plus the standard grouping-id column `gid` (the output
    shape of `cube`/`rollup`)."""
    all_keys: list[str] = []
    for gs in grouping_sets:
        for k in gs:
            if k not in all_keys:
                all_keys.append(k)

    finest = None
    if single_scan and all_keys:
        finest = grouped_sketch_table(df, all_keys, cols, factory,
                                      seed=seed, salt=salt).persist()

    out = None
    for gid, gs in enumerate(grouping_sets):
        gs = list(gs)
        if finest is not None:
            if gs:
                merged = merge_grouped_sketches(finest, gs, factory)
            else:
                merged = merge_grouped_sketches(
                    finest.withColumn("__all", F.lit(1)), ["__all"], factory)
            part = estimate_grouped(merged, gs or ["__all"], factory, estimates)
            if not gs:
                part = part.drop("__all")
        elif gs:
            part = grouped_sketch_df(df, gs, cols, factory, estimates,
                                     seed=seed, salt=salt)
        else:
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
                seed: int = DEFAULT_SEED, salt: int = 8,
                single_scan: bool = True) -> DataFrame:
    """All 2^|dims| grouping sets (cube semantics)."""
    dims = list(dims)
    sets = []
    for mask in range(1 << len(dims)):
        sets.append([d for i, d in enumerate(dims) if mask & (1 << i)])
    return sketch_grouping_sets(df, sets, cols, factory, estimates, seed,
                                salt, single_scan)


def sketch_rollup(df: DataFrame, dims: Sequence[str], cols,
                  factory: Callable[[], Sketch],
                  estimates: dict[str, Callable[[Sketch], float]],
                  seed: int = DEFAULT_SEED, salt: int = 8,
                  single_scan: bool = True) -> DataFrame:
    """Hierarchical prefixes (rollup semantics): (d1..dn), (d1..dn-1), ... ()."""
    dims = list(dims)
    sets = [dims[:i] for i in range(len(dims), -1, -1)]
    return sketch_grouping_sets(df, sets, cols, factory, estimates, seed,
                                salt, single_scan)
