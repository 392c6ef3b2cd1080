"""Loaders for the driver-provided parquet tables and (optionally) Iceberg.

Parquet is the default at-rest format (columnar, predicate pushdown, column
pruning). The north rule targets Iceberg tables; the sandbox image has no
Iceberg jars, so `read_table` goes through the catalog when available and
falls back to parquet paths otherwise (documented stub, SURVEY.md §2.6).
"""

from __future__ import annotations

import os

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load_tables(spark, sf_dir: str, names=TABLES) -> dict:
    return {name: spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
            for name in names}


def register_views(spark, sf_dir: str, names=TABLES) -> None:
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


def read_table(spark, identifier: str, sf_dir: str | None = None):
    """Read an Iceberg table by identifier if a catalog is configured,
    else fall back to `{sf_dir}/{identifier}.parquet`."""
    try:
        return spark.table(identifier)
    except Exception:
        if sf_dir is None:
            raise
        return spark.read.parquet(os.path.join(sf_dir, f"{identifier}.parquet"))
