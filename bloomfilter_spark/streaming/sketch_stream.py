"""Structured Streaming sketch accumulation.

Two patterns (SURVEY.md §2.6 streaming row):

1. ``SketchAccumulator`` — foreachBatch: every micro-batch is folded into a
   running sketch with the same two-level batch topology (merge is
   associative, so batch boundaries are invisible — the streaming analog of
   the chunking-invariance property, QC.hs:52-60). State is persisted per
   epoch for exactly-once-ish resume.

2. ``stateful_grouped_hll`` — applyInPandasWithState: one serialized HLL
   per key held in Spark's state store; emits (key, approx_distinct,
   n_updates) in update mode. Watermark-compatible: pass an event-time
   watermarked stream for bounded state.
"""

from __future__ import annotations

import os
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..agg import build_sketch
from ..config import DEFAULT_SEED
from ..sketches.base import Sketch
from ..sketches.hll import HyperLogLog
from ..util import to_u64


class SketchAccumulator:
    """Fold a stream into one sketch via foreachBatch.

    >>> acc = SketchAccumulator(["conv_id", "text"], lambda: BloomFilter(m, k))
    >>> q = stream.writeStream.foreachBatch(acc).start()
    """

    def __init__(self, cols, factory: Callable[[], Sketch],
                 seed: int = DEFAULT_SEED, state_dir: str | None = None):
        self.cols = cols
        self.factory = factory
        self.seed = seed
        self.state_dir = state_dir
        self.sketch = factory()
        self.batches_seen: set[int] = set()
        # last epoch folded into the PERSISTED state: replayed epochs after
        # a driver restart are skipped, which matters for counting sketches
        # (a re-merged micro-batch double-counts CMS and corrupts KLL/
        # t-digest weights; Bloom/HLL would merely re-OR/max)
        self.last_epoch = -1
        if state_dir:
            os.makedirs(state_dir, exist_ok=True)
            self._restore()

    def _state_path(self) -> str:
        return os.path.join(self.state_dir, "sketch_state.bin")

    def _restore(self) -> None:
        path = self._state_path()
        if os.path.exists(path):
            with open(path, "rb") as fh:
                raw = fh.read()
            self.last_epoch = int.from_bytes(raw[:8], "little", signed=True)
            self.sketch = type(self.factory()).from_bytes(raw[8:])

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id in self.batches_seen or epoch_id <= self.last_epoch:
            return  # replayed epoch (this process or a restart): skip
        part = build_sketch(batch_df, self.cols, self.factory, seed=self.seed)
        self.sketch.merge(part)
        self.batches_seen.add(epoch_id)
        self.last_epoch = max(self.last_epoch, epoch_id)
        if self.state_dir:
            # epoch rides WITH the sketch bytes in one atomic replace, so a
            # crash between merge and persist replays that epoch (at-least-
            # once fold) but a persisted state never re-merges it
            tmp = self._state_path() + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(self.last_epoch.to_bytes(8, "little", signed=True))
                fh.write(self.sketch.to_bytes())
            os.replace(tmp, self._state_path())


def stateful_grouped_hll(stream_df: DataFrame, key_col: str, value_col: str,
                         p: int = 12, seed: int = DEFAULT_SEED) -> DataFrame:
    """Per-key running approx-distinct over a stream: HLL state per key in
    the state store, updated vectorized per batch-group."""
    out_schema = T.StructType([
        T.StructField(key_col, T.StringType()),
        T.StructField("approx_distinct", T.DoubleType()),
        T.StructField("n_updates", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("registers", T.BinaryType()),
        T.StructField("n_updates", T.LongType()),
    ])

    def fn(key, pdfs, state: GroupState):
        import numpy as np
        sk = HyperLogLog(p)
        n = 0
        if state.exists:
            regs, n = state.get
            sk.registers = np.frombuffer(regs, dtype="uint8").copy()
        for pdf in pdfs:
            sk.update(to_u64(pdf["__h"].to_numpy()))
            n += len(pdf)
        state.update((sk.registers.tobytes(), n))
        yield pd.DataFrame({key_col: [key[0]], "approx_distinct": [sk.estimate()],
                            "n_updates": [n]})

    # hash JVM-side with the engine's standard salted xxhash64 so streaming
    # HLL state is merge-compatible with batch-built HLLs over the same
    # column; NULL values are dropped BEFORE hashing to match the batch
    # builder's prepare_input semantics (xxhash64 would otherwise hash a
    # NULL row to the seed-only value and insert a phantom element)
    hashed = (stream_df.where(F.col(value_col).isNotNull())
              .select(F.col(key_col).cast("string").alias(key_col),
                      F.xxhash64(F.lit(seed), F.col(value_col)).alias("__h")))
    return (hashed.groupBy(key_col)
                  .applyInPandasWithState(fn, out_schema, state_schema,
                                          "update", GroupStateTimeout.NoTimeout))


def stateful_grouped_quantile(stream_df: DataFrame, key_col: str,
                              value_col: str,
                              factory: Callable[[], Sketch] = None,
                              quantiles=(0.5, 0.9, 0.99)) -> DataFrame:
    """Per-key running quantiles over a stream: one serialized value
    sketch (KLL by default, any value sketch via ``factory``) per key in
    Spark's state store, updated vectorized per batch-group; emits one
    (key, q, est, n_updates) row per requested quantile in update mode —
    the streaming 'latency quantiles per group' operator. The same
    published rank bounds hold as for the batch build: the state is a
    genuine KLL/t-digest folded over the stream, not a heuristic.
    Watermark-compatible: pass an event-time watermarked stream for
    bounded state."""
    from ..sketches.kll import KLL
    factory = factory or (lambda: KLL(200))
    proto = factory()
    if proto.HASH_KEYED:
        raise ValueError("stateful_grouped_quantile needs a value sketch "
                         "(KLL/TDigest), not a hash-keyed one")
    qs = [float(q) for q in quantiles]
    out_schema = T.StructType([
        T.StructField(key_col, T.StringType()),
        T.StructField("q", T.DoubleType()),
        T.StructField("est", T.DoubleType()),
        T.StructField("n_updates", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("sketch", T.BinaryType()),
        T.StructField("n_updates", T.LongType()),
    ])

    def fn(key, pdfs, state: GroupState):
        n = 0
        if state.exists:
            blob, n = state.get
            sk = type(proto).from_bytes(bytes(blob))
        else:
            sk = factory()
        for pdf in pdfs:
            sk.update(pdf["__v"].to_numpy(dtype="float64"))
            n += len(pdf)
        state.update((sk.to_bytes(), n))
        yield pd.DataFrame({key_col: [key[0]] * len(qs), "q": qs,
                            "est": [float(sk.quantile(q)) for q in qs],
                            "n_updates": [n] * len(qs)})

    v = F.col(value_col).cast("double")
    vals = (stream_df.where(v.isNotNull() & ~F.isnan(v))
            .select(F.col(key_col).cast("string").alias(key_col),
                    v.alias("__v")))
    return (vals.groupBy(key_col)
                .applyInPandasWithState(fn, out_schema, state_schema,
                                        "update", GroupStateTimeout.NoTimeout))
