"""Streaming maintenance of the Bloom file index.

Continuously-landing data (transcript tails, event feeds) should stay
point-lookupable without ever re-indexing history. `StreamingFileIndexer`
is a foreachBatch sink that appends each micro-batch to the data table
and indexes ONLY the files that batch created — the per-file build
(`operators/file_index.py`) makes old files immutable index rows, so
maintenance cost is O(new data) regardless of table size.

Epoch handling: the set of indexed files + last epoch persist atomically
per batch; a replayed epoch after a persisted commit is skipped outright.
A crash INSIDE the commit window (after the data append, before the state
persist) replays with at-least-once semantics on the data table — the
re-run appends its rows again, like any non-transactional parquet sink —
but index coverage self-heals: each batch sweeps ALL files absent from
the indexed set (including the crashed attempt's orphans), so a pruned
read is row-identical to a full scan of whatever the table holds.
`prune_files` de-duplicates file paths, so a file indexed twice by a
crash-replay is still scanned once.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Callable, Sequence

from pyspark.sql import DataFrame

from ..config import DEFAULT_SEED
from ..operators.file_index import (build_file_bloom_index,
                                    build_file_minmax_index)


def _local_parquet_files(path: str) -> set[str]:
    if not os.path.isdir(path):
        return set()
    return {os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))}


class StreamingFileIndexer:
    """foreachBatch sink: append batch to ``table_path``, index its new
    files into ``index_path``.

    >>> indexer = StreamingFileIndexer(table, index, ["user_id"],
    ...                                fpr=0.001, state_path=state)
    >>> q = stream.writeStream.foreachBatch(indexer).start()

    The index table accumulates one parquet append per batch; read it
    whole (`spark.read.parquet(index_path)`) and hand it to
    `prune_files`/`pruned_read` — per-file geometry may differ across
    appends (each sized for its own batch), which pruning handles.

    ``list_files`` abstracts file enumeration (default: local FS listdir).
    On an object store, pass a lister for that filesystem; everything else
    is path-string bookkeeping and works unchanged.

    ``range_cols`` + ``minmax_index_path``: also maintain the min/max
    zone-map index (`build_file_minmax_index` — the RANGE-predicate
    complement) over the SAME epoch state: both indexes cover exactly the
    not-yet-indexed file sweep each batch, so neither ever needs a batch
    rebuild for new files. The min/max agg is a second scan of ONLY the
    new files (O(batch), page-cache-hot — they were just written); the
    `indexed` set advances only after BOTH appends, so a crash between
    them re-indexes the file into both tables on replay (duplicate index
    rows are path-deduplicated by prune_files / prune_files_range).
    """

    def __init__(self, table_path: str, index_path: str,
                 cols: Sequence[str], fpr: float = 0.001,
                 seed: int = DEFAULT_SEED,
                 state_path: str | None = None,
                 list_files: Callable[[str], set[str]] = _local_parquet_files,
                 range_cols: Sequence[str] | None = None,
                 minmax_index_path: str | None = None):
        if (range_cols is None) != (minmax_index_path is None):
            raise ValueError("range_cols and minmax_index_path go together")
        self.table_path = table_path
        self.index_path = index_path
        self.cols = [cols] if isinstance(cols, str) else list(cols)
        self.fpr = fpr
        self.seed = seed
        self.state_path = state_path
        self.list_files = list_files
        self.range_cols = ([range_cols] if isinstance(range_cols, str)
                           else list(range_cols)) if range_cols else None
        self.minmax_index_path = minmax_index_path
        self.indexed: set[str] = set()
        self.last_epoch = -1
        self.files_indexed = 0  # metrics
        self.rows_indexed = 0
        self._restore()

    # --- state ----------------------------------------------------------
    def _params(self) -> dict:
        return {"cols": self.cols, "seed": self.seed, "fpr": self.fpr,
                "range_cols": self.range_cols}

    def _restore(self) -> None:
        if not self.state_path or not os.path.exists(self.state_path):
            # No JSON state (state_path=None, or first run): bootstrap the
            # indexed set from the index table itself so a restarted
            # indexer does not re-index every existing file and grow the
            # index unboundedly. Deferred to the first batch (needs a
            # SparkSession). The table carries no epoch info, so
            # last_epoch stays -1 — a replayed epoch falls through to the
            # not-yet-indexed sweep, which the bootstrap makes a no-op.
            self._needs_bootstrap = True
            return
        self._needs_bootstrap = False
        with open(self.state_path, "rb") as fh:
            st = json.load(fh)
        saved = st.get("params")
        if saved is not None:
            saved = {"range_cols": None, **saved}  # pre-zone-map states
        if saved is not None and saved != self._params():
            # resuming with different key columns / seed / fpr would append
            # incompatible filters into one index — the same silent-merge
            # hazard warehouse.load_sketch_table refuses
            raise ValueError(
                f"index state at {self.state_path} was built with {saved}, "
                f"this indexer has {self._params()} — refusing to resume")
        self.last_epoch = st["last_epoch"]
        self.indexed = set(st["indexed"])
        self.files_indexed = st.get("files_indexed", len(self.indexed))
        self.rows_indexed = st.get("rows_indexed", 0)

    def _files_already_indexed(self, spark) -> set[str]:
        """Distinct file paths already covered by EVERY maintained index
        table (empty set if a table does not exist yet). With zone maps
        on, a file is "indexed" only when present in BOTH tables — a file
        a crash left in just one gets re-swept into both (duplicates
        dedup at probe time), so a pruned range read can never silently
        miss a file the bloom table alone knows about. Index rows store
        ``input_file_name()`` URIs (file:///...); normalize back to the
        plain paths ``list_files`` yields so set subtraction works. A
        custom object-store lister must yield paths matching its
        filesystem's input_file_name scheme (e.g. s3a://) for the
        bootstrap to recognize them."""
        def norm(p: str) -> str:
            if p.startswith("file:"):
                from urllib.parse import unquote, urlparse
                return unquote(urlparse(p).path)
            return p

        def files_of(path: str) -> set[str]:
            try:
                rows = (spark.read.parquet(path)
                        .select("file").distinct().collect())
            except Exception:
                return set()  # no index yet — fresh start
            return {norm(r["file"]) for r in rows}

        covered = files_of(self.index_path)
        if self.minmax_index_path:
            covered &= files_of(self.minmax_index_path)
        return covered

    def _persist(self) -> None:
        if not self.state_path:
            return
        st = {"last_epoch": self.last_epoch, "indexed": sorted(self.indexed),
              "files_indexed": self.files_indexed,
              "rows_indexed": self.rows_indexed, "params": self._params()}
        d = os.path.dirname(self.state_path) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d)
        with os.fdopen(fd, "w") as fh:
            json.dump(st, fh)
        os.replace(tmp, self.state_path)  # atomic on POSIX

    # --- sink -----------------------------------------------------------
    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id <= self.last_epoch:
            return  # replayed epoch: rows written + files indexed already
        spark = batch_df.sparkSession
        if self._needs_bootstrap:
            self.indexed |= self._files_already_indexed(spark)
            self.files_indexed = max(self.files_indexed, len(self.indexed))
            self._needs_bootstrap = False
        batch_df.write.mode("append").parquet(self.table_path)
        # index EVERY file not yet in the index, not just this append's:
        # a crash between the data append and _persist leaves orphan files
        # from the failed attempt — the replay re-appends its rows
        # (at-least-once on the data table, as for any non-transactional
        # sink) and this sweep picks the orphans up, so the index always
        # covers the whole table and pruned reads stay full-scan-identical
        new = sorted(self.list_files(self.table_path) - self.indexed)
        if new:
            idx = build_file_bloom_index(spark, self.table_path, self.cols,
                                         fpr=self.fpr, seed=self.seed,
                                         files=new)
            # materialize ONCE: the build is a full scan of the new files,
            # don't pay it again for the parquet write + metrics
            rows = idx.collect()
            spark.createDataFrame(rows, idx.schema) \
                 .write.mode("append").parquet(self.index_path)
            if self.range_cols:
                # zone-map upkeep in the SAME epoch: one more agg over
                # only the just-indexed files (page-cache-hot)
                build_file_minmax_index(spark, self.table_path,
                                        self.range_cols, files=new) \
                    .write.mode("append").parquet(self.minmax_index_path)
            self.rows_indexed += sum(r["n_rows"] for r in rows)
            self.files_indexed += len(new)
            self.indexed.update(new)
        self.last_epoch = epoch_id
        self._persist()
