"""Quantile query operators over t-digest / KLL sketches."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from ..agg import build_sketch, grouped_sketch_df
from ..sketches.kll import KLL
from ..sketches.tdigest import TDigest


def quantiles(df: DataFrame, col, qs: Sequence[float], method: str = "tdigest",
              **kwargs) -> list[float]:
    """Distributed quantile estimates for one numeric column."""
    sk = build_sketch(df, [col], _factory(method, kwargs))
    return [float(sk.quantile(q)) for q in qs]


def grouped_quantiles(df: DataFrame, keys: Sequence[str], col,
                      qs: Sequence[float], method: str = "tdigest",
                      salt: int = 8, **kwargs) -> DataFrame:
    """Per-key quantile estimates: (keys..., q50, q90, ...) via the salted
    two-phase grouped sketch topology."""
    ests = {name: (lambda s, q=q: float(s.quantile(q)))
            for name, q in zip([f"q{int(q * 100):02d}" for q in qs], qs)}
    return grouped_sketch_df(df, keys, [col], _factory(method, kwargs), ests,
                             salt=salt)


def ks_drift(df_a: DataFrame, df_b: DataFrame, col, k: int = 200,
             max_cardinality: int = 2_000_000) -> float:
    """Distribution drift between two corpora/slices: the two-sample
    Kolmogorov–Smirnov statistic sup_x |F_a(x) - F_b(x)| estimated from
    two KLL sketches (`KLL.ks_distance`), each built JVM-reduced
    (`jvm_build.quantile_build_preagg`: codegen groupBy(value).count with
    map-side combine — distinct-value rows over the pipe, not n).

    The 100 TB monitoring primitive: is this week's document-length /
    latency / quality-score distribution the same as last week's? Cost is
    two one-scan sketch builds; nothing is joined or collected beyond the
    value histograms. |est - exact_KS| <= ~2 * 1.7/k (sum of the two rank
    errors). Falls back to the streaming kernel build above
    ``max_cardinality`` distinct values.
    """
    from ..jvm_build import quantile_build_preagg
    out = []
    for df in (df_a, df_b):
        try:
            out.append(quantile_build_preagg(df, col, lambda: KLL(k=k),
                                             max_cardinality=max_cardinality))
        except ValueError:
            out.append(build_sketch(df, [col], lambda: KLL(k=k)))
    return out[0].ks_distance(out[1])


def _factory(method: str, kwargs: dict):
    if method == "tdigest":
        return lambda: TDigest(**kwargs) if kwargs else TDigest()
    if method == "kll":
        return lambda: KLL(**kwargs) if kwargs else KLL()
    raise ValueError(f"unknown quantile method {method!r}")
