"""Warehouse integrity sweep: re-parse + merge-probe every persisted blob.

Usage:
    python tools/fsck_warehouse.py PATH [PATH ...]

Each PATH is either a single sketch table (a directory containing
`_sketch_meta`) or a warehouse root whose immediate subdirectories are
tables. For every sketch table found, runs
`warehouse.verify_sketch_table` — a distributed executor pass that
re-checks each blob's wire CRC32 (v3: body; v4: header+body) and merge-probes it against the
table's own metadata geometry — and prints one report line. Non-sketch
tables that share the warehouse layout (e.g. `kind=ivf_centroids`) are
validated by their own loader and reported as such.

Exit status 0 iff every table is fully healthy; 1 if any blob is
corrupt, NULL, or a table is unreadable — so this can gate a rollup job
in a workflow scheduler.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bloomfilter_spark.config import get_spark  # noqa: E402
from bloomfilter_spark.warehouse import (_COMMIT_MARKER, _META_SUBDIR,  # noqa: E402
                                         load_ivf_centroids,
                                         resolve_sketch_table,
                                         verify_sketch_table)


def _is_table(p: str) -> bool:
    """Flat table (has _sketch_meta) or versioned publish root (has at
    least one committed v_NNNNNNNN); resolution to the live version
    happens in verify via resolve_sketch_table."""
    if os.path.isdir(os.path.join(p, _META_SUBDIR)):
        return True
    if not os.path.isdir(p):
        return False
    return any(
        name.startswith("v_")
        and os.path.exists(os.path.join(p, name, _COMMIT_MARKER))
        and os.path.isdir(os.path.join(p, name, _META_SUBDIR))
        for name in os.listdir(p))


def _discover(paths: list[str]) -> list[str]:
    """Expand warehouse roots into table paths (local filesystem walk;
    on a cluster store, pass table paths explicitly). Non-directory
    paths are skipped here — main() reports them as failures."""
    tables = []
    for p in paths:
        if _is_table(p):
            tables.append(p)
            continue
        if not os.path.isdir(p):
            continue
        for name in sorted(os.listdir(p)):
            sub = os.path.join(p, name)
            if _is_table(sub):
                tables.append(sub)
    return tables


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    args = sys.argv[1:]
    bad_args = [p for p in args if not os.path.isdir(p)]
    for p in bad_args:
        print(f"FAIL {p}: not a directory")
    tables = _discover([p for p in args if os.path.isdir(p)])
    if not tables and not bad_args:
        print("no sketch tables found under", args)
        return 1
    spark = get_spark("fsck-warehouse", cores=8, shuffle_partitions=8)
    failed = len(bad_args)
    for path in tables:
        try:
            resolved = resolve_sketch_table(spark, path)
            meta = json.loads(
                spark.read.parquet(
                    f"{resolved}/{_META_SUBDIR}").first()["meta"])
        except Exception as e:  # noqa: BLE001 — unreadable table = failure
            print(f"FAIL {path}: unreadable metadata ({e})")
            failed += 1
            continue
        if meta.get("kind") == "ivf_centroids":
            try:
                arr = load_ivf_centroids(spark, resolved)
                print(f"OK   {path}: ivf_centroids {arr.shape[0]}x{arr.shape[1]}")
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {path}: {e}")
                failed += 1
            continue
        try:
            rep = verify_sketch_table(spark, resolved, meta=meta)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {path}: {e}")
            failed += 1
            continue
        cls = rep["meta"]["sketch"]["class"]
        if rep["corrupt"] or rep["nulls"]:
            print(f"FAIL {path}: {cls} — {rep['corrupt']} corrupt / "
                  f"{rep['nulls']} NULL of {rep['rows']} rows; "
                  f"first errors: {rep['errors']}")
            failed += 1
        else:
            print(f"OK   {path}: {cls} — {rep['rows']} rows, "
                  f"{rep['state_bytes']} state bytes")
    total = len(tables) + len(bad_args)
    print(f"\n{total - failed}/{total} tables healthy")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
