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


def _factory(method: str, kwargs: dict):
    if method == "tdigest":
        return lambda: TDigest(**kwargs) if kwargs else TDigest()
    if method == "kll":
        return lambda: KLL(**kwargs) if kwargs else KLL()
    raise ValueError(f"unknown quantile method {method!r}")
