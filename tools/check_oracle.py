"""Self-check harness mimicking the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at sf0.01,
compare row count, sorted-column schema, and an order-insensitive value
hash. Usage: python tools/check_oracle.py [sf_dir]"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from bloomfilter_spark.config import get_spark  # noqa: E402
from bloomfilter_spark.sources.tables import TABLES  # noqa: E402


def value_hash(pdf) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(
        tuple(str(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def normalize(pdf):
    import pandas as pd
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(6)
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
    return pdf


def main(sf_dir: str, only: list[str] | None = None) -> int:
    # ORACLE_CORES / ORACLE_PARTS: sweep axis for partition-invariance —
    # every query must hash identically at ANY parallelism (odd counts
    # catch accidental order/partitioning dependence the default 8/8
    # run never exercises)
    import os
    spark = get_spark(
        "oracle-check",
        cores=int(os.environ.get("ORACLE_CORES", "8")),
        shuffle_partitions=int(os.environ.get("ORACLE_PARTS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    if only:
        qs = {k: v for k, v in qs.items()
              if any(k.startswith(p) for p in only)}
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = normalize(sdf.toPandas())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spdf)} rows, {dt:.1f}s)")
            continue
        try:
            opdf = normalize(con.execute(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = []
        if len(spdf) != len(opdf):
            problems.append(f"rowcount {len(spdf)} vs {len(opdf)}")
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(f"schema {sorted(spdf.columns)} vs {sorted(opdf.columns)}")
        elif value_hash(spdf) != value_hash(opdf):
            problems.append("value hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            mism = spdf.merge(opdf, how="outer", indicator=True)
            print(mism[mism["_merge"] != "both"].head(8).to_string())
            failures += 1
        else:
            print(f"PASS {name} ({len(spdf)} rows, {dt:.1f}s)")
    spark.stop()
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    # usage: check_oracle.py [sf_dir] [query-name-prefix ...]
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
                  sys.argv[2:] or None))
