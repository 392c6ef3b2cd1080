"""Streaming deduplication with Bloom-filter state.

The north-rule question "has this conv_id/text-hash been seen?" as a
streaming operator: Spark's own `dropDuplicates` on an unbounded stream
keeps EXACT key state — at 10^12 turns that is terabytes of state store.
`BloomDedupStream` holds one sized Bloom filter instead (e.g. 10^9 keys at
1% FPR ≈ 1.2 GiB), trading an ≤ ε false-drop rate for O(m) state:

- zero false negatives ⇒ every cross-batch duplicate is caught (the hard
  guarantee, `/root/reference/Data/BloomFilter.hs:16-18`);
- a false positive drops a genuinely-new row with probability ≤ the
  configured ε — the right trade for training-data dedup, where a lost
  document is noise but a kept duplicate is a defect;
- in-batch duplicates are removed exactly (per-batch `dropDuplicates`).

Epoch handling mirrors `SketchAccumulator`: the filter + last epoch persist
atomically per batch, replayed epochs are skipped on restart (the sink saw
those rows already — at-least-once emit during the crash window, never
duplicate emission after a persisted epoch).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, functions as F

from ..agg import build_sketch, with_membership
from ..config import DEFAULT_SEED
from ..sizing import suggest_sizing
from ..sketches.bloom import BloomFilter


class BloomDedupStream:
    """foreachBatch dedup: emit only rows whose key was never seen.

    >>> dedup = BloomDedupStream(["conv_id", "text"], capacity=10**9,
    ...                          fpr=0.01, sink=lambda df, epoch: ...)
    >>> q = stream.writeStream.foreachBatch(dedup).start()

    ``sink``: callable ``(fresh_df, epoch_id)`` — receives the deduplicated
    slice of each micro-batch; or a directory path string (appended as
    parquet). Rows with a NULL in any key column are passed through
    unchanged and never inserted (SQL semantics: NULL keys compare equal to
    nothing, matching the batch builder's NULL-skip in `prepare_input`).

    The broadcast-membership probe re-ships the filter each batch; beyond
    the broadcast budget (see `plans.planning`), run the same topology with
    `operators.sharded` tables instead — this class is the in-memory tier.
    """

    def __init__(self, cols, capacity: int, fpr: float = 0.01,
                 sink: Callable[[DataFrame, int], None] | str | None = None,
                 seed: int = DEFAULT_SEED, state_dir: str | None = None):
        self.cols = [cols] if isinstance(cols, str) else list(cols)
        m, k = suggest_sizing(capacity, fpr)
        self.filter = BloomFilter(m, k)
        self.sink = sink
        self.seed = seed
        self.state_dir = state_dir
        self.last_epoch = -1
        self.rows_in = 0
        self.rows_emitted = 0
        if state_dir:
            os.makedirs(state_dir, exist_ok=True)
            self._restore()

    def _state_path(self) -> str:
        return os.path.join(self.state_dir, "dedup_state.bin")

    def _restore(self) -> None:
        path = self._state_path()
        if os.path.exists(path):
            with open(path, "rb") as fh:
                raw = fh.read()
            self.last_epoch = int.from_bytes(raw[:8], "little", signed=True)
            self.rows_in = int.from_bytes(raw[8:16], "little")
            self.rows_emitted = int.from_bytes(raw[16:24], "little")
            self.filter = BloomFilter.from_bytes(raw[24:])

    def _persist(self) -> None:
        tmp = self._state_path() + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(self.last_epoch.to_bytes(8, "little", signed=True))
            fh.write(self.rows_in.to_bytes(8, "little"))
            fh.write(self.rows_emitted.to_bytes(8, "little"))
            fh.write(self.filter.to_bytes())
        os.replace(tmp, self._state_path())

    def _emit(self, df: DataFrame, epoch_id: int) -> None:
        if self.sink is None:
            return
        if isinstance(self.sink, str):
            df.write.mode("append").parquet(self.sink)
        else:
            self.sink(df, epoch_id)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id <= self.last_epoch:
            return  # replayed epoch after restart: state already reflects it
        key_ok = F.lit(True)
        for c in self.cols:
            key_ok = key_ok & F.col(c).isNotNull()
        # one materialization of the micro-batch: the three consumers below
        # (dedup+probe pipeline, null pass-through, rows_in metric) read the
        # cache, not the source — an expensive upstream transform runs once
        batch_df = batch_df.persist()
        keyed = batch_df.where(key_ok).dropDuplicates(self.cols)
        nulls = batch_df.where(~key_ok)  # pass-through, never inserted
        seen = with_membership(keyed, self.filter, self.cols, "__seen",
                               seed=self.seed)
        fresh = seen.where(~F.col("__seen")).drop("__seen")
        fresh = fresh.persist()
        try:
            n_fresh = fresh.count()
            self._emit(fresh.unionByName(nulls), epoch_id)
            if n_fresh:
                part = build_sketch(
                    fresh, self.cols,
                    lambda: BloomFilter(self.filter.num_bits,
                                        self.filter.num_hashes,
                                        self.filter.variant),
                    seed=self.seed)
                self.filter.merge(part)
            self.rows_in += batch_df.count()
            self.rows_emitted += n_fresh
        finally:
            fresh.unpersist()
            batch_df.unpersist()
        self.last_epoch = epoch_id
        if self.state_dir:
            self._persist()


class ScalableBloomDedupStream:
    """`BloomDedupStream` without the capacity guess: state is a
    ScalableBloomFilter (Almeida et al. 2007 — the design the reference
    only sketches at Scalable/Mutable.hs:10-14) whose levels grow by the
    geometric schedule (capacity x2, error x tightening) as the stream
    outlives every estimate.

    Micro-batch adaptation of the single-writer kernel type, keeping every
    insert DISTRIBUTED: a batch's fresh keys build ONE partial filter with
    the CURRENT level's geometry (`agg.build_sketch` — JVM hash, Arrow
    partials, two-level merge) which is OR-merged into that level; the
    probe broadcasts the whole multi-level state once and tests all
    levels inside a single vectorized UDF (`with_membership` on the
    scalable sketch). Driver traffic per batch is O(level bytes), never
    O(rows).

    Batch-granularity caveat (documented deviation from element-at-a-time
    Almeida): a level can overshoot its nominal capacity by at most ONE
    batch, since a batch is never split across levels. The schedule's
    eps_i therefore understates an overshot level's true rate, so
    `compound_bound()` reports the honest union bound from each level's
    ACTUAL fill (sizing.analytic_fpr), not the schedule. Size
    ``initial_capacity`` at or above the expected batch size to keep
    levels near schedule.

    Epoch handling, NULL pass-through, and sink semantics are identical
    to BloomDedupStream (state + last epoch persist atomically; replayed
    epochs are skipped)."""

    def __init__(self, cols, err_rate: float = 0.01,
                 initial_capacity: int = 100_000, tightening: float = 0.5,
                 sink: Callable[[DataFrame, int], None] | str | None = None,
                 seed: int = DEFAULT_SEED, state_dir: str | None = None):
        from ..sketches.scalable import ScalableBloomFilter
        self.cols = [cols] if isinstance(cols, str) else list(cols)
        self.sbf = ScalableBloomFilter(err_rate, initial_capacity, tightening)
        self.sink = sink
        self.seed = seed
        self.state_dir = state_dir
        self.last_epoch = -1
        self.rows_in = 0
        self.rows_emitted = 0
        if state_dir:
            os.makedirs(state_dir, exist_ok=True)
            self._restore()

    def _state_path(self) -> str:
        return os.path.join(self.state_dir, "scalable_dedup_state.bin")

    def _restore(self) -> None:
        from ..sketches.scalable import ScalableBloomFilter
        path = self._state_path()
        if os.path.exists(path):
            with open(path, "rb") as fh:
                raw = fh.read()
            self.last_epoch = int.from_bytes(raw[:8], "little", signed=True)
            self.rows_in = int.from_bytes(raw[8:16], "little")
            self.rows_emitted = int.from_bytes(raw[16:24], "little")
            self.sbf = ScalableBloomFilter.from_bytes(raw[24:])

    def _persist(self) -> None:
        tmp = self._state_path() + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(self.last_epoch.to_bytes(8, "little", signed=True))
            fh.write(self.rows_in.to_bytes(8, "little"))
            fh.write(self.rows_emitted.to_bytes(8, "little"))
            fh.write(self.sbf.to_bytes())
        os.replace(tmp, self._state_path())

    def compound_bound(self) -> float:
        """Honest union bound over levels from ACTUAL fill (see class
        docstring); <= err_rate/(1-tightening) whenever no level overshot."""
        from ..sizing import analytic_fpr
        return sum(analytic_fpr(f.num_bits, f.num_hashes, cnt)
                   for f, cnt in zip(self.sbf.filters, self.sbf.counts))

    def _emit(self, df: DataFrame, epoch_id: int) -> None:
        if self.sink is None:
            return
        if isinstance(self.sink, str):
            df.write.mode("append").parquet(self.sink)
        else:
            self.sink(df, epoch_id)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id <= self.last_epoch:
            return  # replayed epoch after restart: state already reflects it
        key_ok = F.lit(True)
        for c in self.cols:
            key_ok = key_ok & F.col(c).isNotNull()
        batch_df = batch_df.persist()
        keyed = batch_df.where(key_ok).dropDuplicates(self.cols)
        nulls = batch_df.where(~key_ok)  # pass-through, never inserted
        if self.sbf.filters:
            seen = with_membership(keyed, self.sbf, self.cols, "__seen",
                                   seed=self.seed)
            fresh = seen.where(~F.col("__seen")).drop("__seen")
        else:
            fresh = keyed  # nothing inserted yet: everything is fresh
        fresh = fresh.persist()
        try:
            n_fresh = fresh.count()
            self._emit(fresh.unionByName(nulls), epoch_id)
            if n_fresh:
                # grow BEFORE insert when the current level is at capacity
                # (the kernel's update() growth rule at batch granularity)
                if (not self.sbf.filters
                        or self.sbf.counts[-1] >= self.sbf.capacities[-1]):
                    self.sbf._grow()
                lvl = self.sbf.filters[-1]
                part = build_sketch(
                    fresh, self.cols,
                    lambda: BloomFilter(lvl.num_bits, lvl.num_hashes,
                                        lvl.variant),
                    seed=self.seed)
                lvl.merge(part)
                self.sbf.counts[-1] += n_fresh
            self.rows_in += batch_df.count()
            self.rows_emitted += n_fresh
        finally:
            fresh.unpersist()
            batch_df.unpersist()
        self.last_epoch = epoch_id
        if self.state_dir:
            self._persist()
