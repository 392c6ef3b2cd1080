"""Iceberg catalog integration (north-rule input format).

The sandbox image ships no Iceberg runtime jar, so the round-trip test
skips here; it runs wherever `--packages org.apache.iceberg:
iceberg-spark-runtime-*` is on the classpath (config.iceberg_configs
documents the submit-time wiring). The config/scaffolding tests below run
everywhere.
"""

import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.config import has_iceberg, iceberg_configs


def test_iceberg_configs_shape():
    conf = iceberg_configs(catalog="lake", warehouse="/tmp/wh")
    assert conf["spark.sql.catalog.lake"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.lake.warehouse"] == "/tmp/wh"
    assert conf["spark.sql.catalog.lake.type"] == "hadoop"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]


def test_read_table_falls_back_to_parquet(spark, sf_dir):
    from bloomfilter_spark.sources.tables import read_table
    df = read_table(spark, "events", sf_dir=sf_dir)
    assert df.count() > 0
    with pytest.raises(Exception):
        read_table(spark, "no_such_table_anywhere")  # no sf_dir: surface it


def test_iceberg_roundtrip_and_pruning(spark, tmp_path, events):
    """Write-partition-read round trip through a real Iceberg catalog;
    only runs when the runtime jar is present."""
    if not has_iceberg(spark):
        pytest.skip("iceberg-spark-runtime jar not on classpath in sandbox")
    from bloomfilter_spark.sources.tables import read_table, write_iceberg_table
    ident = "local.db.events_it"
    write_iceberg_table(events, ident, partition_by=["event_type"])
    back = read_table(spark, ident)
    assert back.count() == events.count()
    one = back.where(F.col("event_type") == "click")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "event_type" in plan  # partition filter reached the scan
