"""Deterministic synthetic agent-transcript corpus.

Materializes the authoritative input shape from BASELINE.json input_hint —
``transcripts(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)`` — per the generator spec in FIXTURES.md §1:
seed=42, Zipf-skewed conversation sizes (a few hot conv_ids dominate, to
exercise salted repartitioning), cyclic roles, deterministic per-(conv,turn)
text with ~2% injected exact duplicates, Zipf tool names on tool turns,
monotone per-conversation timestamps.

Generation is vectorized numpy/pandas; rows are written as parquet once and
cached, so tests/benchmarks re-read a stable table.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

SEED = 42
N_CONVS_BASE = 10_000
N_TOOLS = 50
DUP_RATE = 50  # 1-in-50 rows get a pooled duplicate text (~2%)

_VOCAB = np.array([
    f"tok{i:04d}" for i in range(4096)
])

ROLES = np.array(["user", "assistant", "tool", "system"])


def _default_n_convs(n_turns: int) -> int:
    return max(16, min(N_CONVS_BASE, n_turns // 8))


def generate_pandas(n_turns: int, seed: int = SEED,
                    n_convs: int | None = None) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    if n_convs is None:
        n_convs = _default_n_convs(n_turns)
    # Zipf-ish conversation popularity: sample each turn's conversation from
    # a Zipf(1.2) distribution over conv ranks -> hot conv_ids dominate.
    ranks = rng.zipf(1.2, n_turns)
    conv_num = (ranks - 1) % n_convs
    # dense turn_idx per conversation, in arrival order
    order = np.argsort(conv_num, kind="stable")
    inv = np.empty_like(order)
    inv[order] = np.arange(n_turns)
    sorted_conv = conv_num[order]
    starts = np.concatenate(([0], np.flatnonzero(sorted_conv[1:] != sorted_conv[:-1]) + 1))
    lengths = np.diff(np.concatenate((starts, [n_turns])))
    turn_in_sorted = np.arange(n_turns) - np.repeat(starts, lengths)
    turn_idx = turn_in_sorted[inv].astype(np.int32)

    conv_id = np.char.add("conv", np.char.zfill(conv_num.astype("U8"), 8))
    role = ROLES[(conv_num + turn_idx) % 4]

    # deterministic text: token sequence keyed by (conv, turn)
    h = (conv_num.astype(np.uint64) * np.uint64(1_000_003)
         + turn_idx.astype(np.uint64) * np.uint64(7919) + np.uint64(seed))
    z = h.copy()
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    n_words = (3 + (z % np.uint64(40))).astype(np.int64)  # 3..42 words
    w0 = _VOCAB[(z % np.uint64(4096)).astype(np.int64)]
    w1 = _VOCAB[((z >> np.uint64(12)) % np.uint64(4096)).astype(np.int64)]
    w2 = _VOCAB[((z >> np.uint64(24)) % np.uint64(4096)).astype(np.int64)]
    base = np.char.add(np.char.add(np.char.add(w0, " "), w1), np.char.add(" ", w2))
    # pad to varying length deterministically
    reps = np.char.multiply(np.char.add(" ", w1), (n_words // 3).astype(np.int64))
    text = np.char.add(base, reps)
    # ~2% pooled exact duplicates for dedup ground truth
    dup_mask = (z % np.uint64(DUP_RATE)) == 0
    pool = np.array([f"duplicated canary text {i}" for i in range(100)])
    text = np.where(dup_mask, pool[(z % np.uint64(100)).astype(np.int64)], text)

    # tools: only on 'tool' turns, Zipf over N_TOOLS names
    tool_rank = (rng.zipf(1.5, n_turns) - 1) % N_TOOLS
    tool = np.where(role == "tool",
                    np.char.add("tool_", np.char.zfill(tool_rank.astype("U3"), 3)),
                    None)

    # timestamps: strictly increasing within a conversation
    step = 1 + (z % np.uint64(300)).astype(np.int64)
    df = pd.DataFrame({
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "role": role,
        "text": text,
        "tool": tool,
        "step": step,
    })
    df["offset"] = df.groupby("conv_id")["step"].cumsum()
    base_ts = pd.Timestamp("2026-01-01T00:00:00")
    df["ts"] = base_ts + pd.to_timedelta(df["offset"], unit="s")
    return df.drop(columns=["step", "offset"])


def generate_distributed(spark, n_turns: int, n_chunks: int = 64,
                         seed: int = SEED):
    """Distributed corpus generation for sizes beyond driver pandas: each
    Spark task generates one deterministic chunk with a disjoint conv_id
    namespace (chunk prefix), preserving every FIXTURES.md invariant —
    dense unique (conv_id, turn_idx), Zipf skew, ~2% dups, monotone ts —
    within and across chunks."""
    import pandas as pd  # noqa: F811 (executor-side import)

    per_chunk = -(-n_turns // n_chunks)
    # preserve the single-pass corpus's GLOBAL conv cardinality: each chunk
    # owns 1/n_chunks of the conv budget in its private namespace, so 10M
    # turns still land on ~10k convs (not n_chunks x 10k)
    convs_per_chunk = max(16, -(-_default_n_convs(n_turns) // n_chunks))

    def gen(it):
        for pdf in it:
            for cid in pdf["id"]:
                n = min(per_chunk, n_turns - int(cid) * per_chunk)
                if n <= 0:
                    continue
                chunk = generate_pandas(n, seed=seed + int(cid),
                                        n_convs=convs_per_chunk)
                chunk["conv_id"] = f"c{int(cid):03d}_" + chunk["conv_id"]
                yield chunk

    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    return (spark.range(n_chunks).repartition(n_chunks)
            .mapInPandas(gen, schema=schema))


def transcripts_path(n_turns: int, root: str = "/tmp/bloomfilter_spark_data") -> str:
    return os.path.join(root, f"transcripts_{n_turns}_s{SEED}.parquet")


def load_transcripts(spark, n_turns: int, root: str = "/tmp/bloomfilter_spark_data",
                     partitions: int | None = None):
    """Generate-once-and-cache the transcript table; returns a DataFrame."""
    path = transcripts_path(n_turns, root)
    if not os.path.exists(path):
        os.makedirs(root, exist_ok=True)
        if n_turns <= 2_000_000:
            # single pandas pass: one global conv namespace
            pdf = generate_pandas(n_turns)
            sdf = spark.createDataFrame(pdf)
            sdf = sdf.withColumn("turn_idx", sdf["turn_idx"].cast("int"))
        else:
            # beyond driver pandas: distributed chunked generation. The
            # np.char text construction allocates ~1.2 GB of wide-unicode
            # temporaries per 1M rows — at 10M the driver path spends
            # >10 min thrashing 12 GB, so anything bench-sized generates
            # in parallel tasks instead (64 x ~150k-row chunks, seconds)
            sdf = generate_distributed(spark, n_turns)
        (sdf.repartition(partitions or spark.sparkContext.defaultParallelism)
            .write.mode("overwrite").parquet(path))
    return spark.read.parquet(path)


#: the authoritative input_hint shape as an explicit Spark DDL schema —
#: transcript corpora arriving as JSONL/CSV parse against THIS, never
#: against sampled inference (which silently widens int32 -> long or
#: reads ts as string and corrupts every downstream hash/window)
TRANSCRIPT_SCHEMA = ("conv_id string, turn_idx int, role string, "
                     "text string, tool string, ts timestamp")


def read_transcripts(spark, path: str, format: str = "parquet",
                     mode: str = "FAILFAST", **options):
    """Read a transcript corpus in any of the at-rest formats real
    transcript pipelines deliver — parquet (columnar default), jsonl
    (the interchange format agent frameworks emit), csv, orc, or avro
    (when the spark-avro connector is on the classpath) — always
    returning the EXACT input_hint schema (TRANSCRIPT_SCHEMA).

    Schema is imposed, not inferred: inference costs an extra pass over
    10^12 rows AND is sample-dependent (a turn_idx column of small ints
    infers long; an all-null tool chunk infers string vs void), so two
    ingests of the same corpus could disagree. ``mode`` follows Spark's
    parser modes — FAILFAST (default) raises on any malformed row so a
    corrupt corpus is caught at ingest, PERMISSIVE nulls malformed
    fields instead (pass columnNameOfCorruptRecord to keep them).

    jsonl/csv notes: timestamps parse ISO-8601 by default (override with
    timestampFormat=...); csv reads headerless files in TRANSCRIPT_SCHEMA
    column order unless header=True is passed.

    parquet reads under the SAME imposed schema (and options): a corpus
    whose embedded types drifted (turn_idx stored as long, ts as string)
    fails loudly at read instead of flowing through unchecked — exactly
    the drift this function exists to prevent; a missing column reads as
    NULL, extra columns are pruned."""
    fmt = format.lower()
    reader = spark.read.schema(TRANSCRIPT_SCHEMA).option("mode", mode)
    for k, v in options.items():
        reader = reader.option(k, v)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt in ("json", "jsonl"):
        return reader.json(path)
    if fmt == "csv":
        return reader.csv(path)
    if fmt == "orc":
        # ORC runtime ships with Spark; same imposed-schema semantics as
        # parquet (embedded types must match; missing -> NULL, extra
        # pruned)
        return reader.orc(path)
    if fmt == "avro":
        # the spark-avro connector is a separate artifact not present in
        # every deployment (absent in this sandbox); same imposed schema
        # when available
        try:
            return reader.format("avro").load(path)
        except Exception as e:  # pragma: no cover - env-dependent
            raise RuntimeError(
                "avro transcript ingestion needs the spark-avro connector "
                "jar on the classpath (org.apache.spark:spark-avro)"
            ) from e
    raise ValueError(f"unsupported transcript format {format!r} "
                     "(parquet, jsonl, csv, orc, avro)")
