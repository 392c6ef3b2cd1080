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
    """Read a catalog table by identifier (Iceberg when the catalog from
    config.iceberg_configs is wired), else fall back to
    `{sf_dir}/{identifier}.parquet`. Catalog reads keep Iceberg's partition
    pruning / snapshot isolation; the parquet fallback keeps the same
    predicate-pushdown + column-pruning behavior at file level."""
    try:
        return spark.table(identifier)
    except Exception:
        if sf_dir is None:
            raise
        return spark.read.parquet(os.path.join(sf_dir, f"{identifier}.parquet"))


def write_iceberg_table(df, identifier: str, partition_by=None,
                        mode: str = "createOrReplace") -> None:
    """Write a DataFrame as an Iceberg table (requires the runtime jar;
    see config.iceberg_configs). ``partition_by`` becomes the table's
    partition spec — for the north-rule transcript corpus use
    days(ts) or bucket(N, conv_id) so conv_id point-lookups prune files."""
    writer = df.writeTo(identifier).using("iceberg")
    if partition_by:
        from pyspark.sql import functions as F
        cols = [partition_by] if isinstance(partition_by, str) else partition_by
        writer = writer.partitionedBy(*[F.col(c) if isinstance(c, str) else c
                                        for c in cols])
    if mode == "append":
        writer.append()
    else:
        writer.createOrReplace()
