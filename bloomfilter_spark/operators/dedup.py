"""Deduplication operators for training-data pipelines.

- exact: hash-groupBy keep-first (shuffle carries one row per distinct key)
- minhash + LSH: char-shingle -> minhash signature -> banded bucket join ->
  (optional) exact Jaccard verification (Broder 1997; Leskovec/Rajaraman/
  Ullman MMDS ch.3 banding analysis)
- simhash: 64-bit weighted token fingerprint, near-dup = small Hamming
  distance, candidates via 16-bit chunk banding (Charikar 2002, Manku 2007)
- n-gram Jaccard: exact verification kernel for candidate pairs

All heavy kernels are numpy-vectorized inside mapInPandas; candidate
generation is pure DataFrame ops (explode + self-join on bucket keys), so
the shuffle keys are small band hashes, never full documents.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..config import DEFAULT_SEED
from ..util import U64, splitmix64
from .decontaminate import word_ngram_hashes


def _regex_quote(s: str) -> str:
    """Java-regex literal quoting (Pattern.quote): F.split treats its
    pattern as a Java regex while F.array_join rejoins literally — without
    this a regex-special delimiter ('.', '|', '+', '(') silently mis-splits
    every document."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"

_MERSENNE = (1 << 61) - 1


# --- exact ----------------------------------------------------------------

def dedup_exact(df: DataFrame, key_cols, order_cols=None) -> DataFrame:
    """Keep one row per key. With order_cols, keeps the first under that
    ordering (deterministic); otherwise an arbitrary-but-single survivor."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if order_cols is None:
        return df.dropDuplicates(keys)
    return keep_first_n(df, keys, 1, order_cols)


def keep_first_n(df: DataFrame, key_cols, n: int,
                 order_cols) -> DataFrame:
    """Frequency cap ("soft dedup"): keep at most `n` rows per key, the
    first `n` under the given deterministic ordering. The training-mix
    middle ground between exact dedup (n=1) and keeping every duplicate —
    caps boilerplate/hot documents without erasing them. Plan: one shuffle
    on the key, per-partition window rank, filter — row_number is rank-
    limited so the state per key is O(1)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    w = Window.partitionBy(*keys).orderBy(*[F.asc(c) for c in order])
    return (df.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") <= n).drop("__rn"))


# --- shingle/minhash kernels ---------------------------------------------
#
# The signature kernel is batched ACROSS documents: all texts in a chunk are
# concatenated into one byte buffer, the rolling polynomial k-gram hash is
# computed once over the whole buffer (k shifted multiply-adds, no per-doc
# work), and boundary-crossing windows are dropped with one gather. No
# Python statement executes per document (input_hint: no per-row Python).
#
# Signatures use ONE-PERMUTATION HASHING (Li, Owen, Zhang, NIPS 2012) with
# rotation densification (Shrivastava & Li, ICML 2014): each shingle's
# single 64-bit hash is routed to bin = top log2(P) bits, the per-(doc,bin)
# minimum is one vectorized scatter-min, and empty bins borrow circularly
# from the nearest occupied bin (+distance, preserving unbiasedness). Cost
# is O(shingles + docs*P) instead of the classic k-permutation
# O(shingles*P) — ~20x faster at P=128 — with the same coordinate-collision
# Jaccard estimator and banding behavior.

# Chunk size tuned for CACHE RESIDENCY, not batch amortization: the kernel
# inflates chunk bytes 8x to u64 and makes ~k+3 passes, so temporaries are
# ~chunk*24 live bytes. At 4 MiB chunks, 32 concurrent kernels thrash the
# shared LLC and aggregate throughput COLLAPSES ~12x (measured on this
# host: 42k docs/s at 4 MiB vs ~500k at <=64 KiB, 32 procs); at 32 KiB the
# working set fits a per-core L2 slice on any modern server and throughput
# is near-flat from 1 to 32 concurrent kernels. Per-chunk Python overhead
# is ~50us — negligible beside the passes it saves.
_MINHASH_CHUNK_BYTES = 32 << 10
_EMPTY_BIN = np.uint64(0xFFFFFFFFFFFFFFFF)


def _char_shingle_hashes(text: str, k: int, seed: int = 0) -> np.ndarray:
    """Rolling polynomial hashes of all char k-grams of ONE document —
    the per-document reference semantics the batched kernel must match
    (asserted in tests/test_operators.py)."""
    data = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    if data.size < k:
        data = np.pad(data, (0, k - data.size), constant_values=32)
    windows = np.lib.stride_tricks.sliding_window_view(data, k).astype(U64)
    powers = np.power(U64(1099511628211), np.arange(k, dtype=U64))
    with np.errstate(over="ignore"):
        poly = (windows * powers[None, :]).sum(axis=1, dtype=U64)
        return splitmix64(poly ^ U64(seed & 0xFFFFFFFFFFFFFFFF))


def _concat_shingle_hashes(enc: list, lens: np.ndarray, k: int,
                           seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(hashes, counts): all documents' k-gram hashes concatenated, plus
    shingles-per-doc. Value-identical to per-doc _char_shingle_hashes."""
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(U64)
    counts = lens - (k - 1)
    total = buf.size - (k - 1)                    # windows incl. junk
    powers = np.power(U64(1099511628211), np.arange(k, dtype=U64))
    hashes = np.zeros(total, dtype=U64)
    with np.errstate(over="ignore"):
        for j in range(k):
            hashes += buf[j:j + total] * powers[j]
        hashes = splitmix64(hashes ^ U64(seed & 0xFFFFFFFFFFFFFFFF))
    # gather only within-document windows: doc i's shingles live at
    # buf offsets o_i .. o_i + counts_i - 1
    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    idx = np.repeat(offsets - starts, counts) + np.arange(int(counts.sum()))
    return hashes[idx], counts


def _oph_signatures(h: np.ndarray, counts: np.ndarray, P: int) -> np.ndarray:
    """(n_docs, P) int64 one-permutation-hashing signatures with rotation
    densification. Every doc has >= 1 shingle (inputs are padded to k)."""
    n_docs = counts.size
    if P == 1:  # degenerate: a shift by 64 is undefined (x86 wraps to 0)
        bins = np.zeros(h.size, dtype=np.int64)
    elif P & (P - 1) == 0:
        bins = (h >> np.uint64(64 - (P.bit_length() - 1))).astype(np.int64)
    else:
        bins = (h % np.uint64(P)).astype(np.int64)
    flat = np.repeat(np.arange(n_docs, dtype=np.int64) * P, counts) + bins
    sig = np.full(n_docs * P, _EMPTY_BIN, dtype=U64)
    np.minimum.at(sig, flat, h)
    sig = sig.reshape(n_docs, P)
    ne = sig != _EMPTY_BIN
    if not ne.all():
        # rotation densification: nearest occupied bin scanning leftward
        # with wraparound = running max of occupied positions over a
        # doubled index row; +distance keeps borrowed coords unbiased
        col = np.arange(P)
        big = np.concatenate([np.where(ne, col, -1),
                              np.where(ne, col + P, -1)], axis=1)
        acc = np.maximum.accumulate(big, axis=1)[:, P:]
        dist = (col + P) - acc
        rows = np.arange(n_docs)[:, None]
        with np.errstate(over="ignore"):
            dense = sig[rows, acc % P] + dist.astype(U64)
        sig = np.where(ne, sig, dense)
    return sig.view(np.int64)


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_perm: int = 128, shingle_k: int = 5,
                       seed: int = DEFAULT_SEED) -> DataFrame:
    """(id, signature array<long>) MinHash signatures via one-permutation
    hashing, batched across documents (see module kernel notes)."""
    k = shingle_k
    id_field = df.schema[id_col]
    schema = f"{id_col} {id_field.dataType.simpleString()}, signature array<bigint>"

    def fn(it: Iterable[pd.DataFrame]):
        for pdf in it:
            enc_s = pdf[text_col].fillna("").str.encode("utf-8", "ignore")
            lens = enc_s.str.len().to_numpy()
            short = np.flatnonzero(lens < k)
            enc = enc_s.tolist()
            for i in short:                       # rare: pad tiny docs to k
                enc[i] = enc[i].ljust(k, b" ")
            lens = np.maximum(lens, k)
            # sub-chunk so kernel temporaries stay O(_MINHASH_CHUNK_BYTES*8)
            # regardless of Arrow batch size
            bounds = np.searchsorted(np.cumsum(lens),
                                     np.arange(_MINHASH_CHUNK_BYTES,
                                               int(lens.sum()),
                                               _MINHASH_CHUNK_BYTES))
            sigs = []
            for lo, hi in zip(np.r_[0, bounds + 1], np.r_[bounds + 1, len(enc)]):
                if hi > lo:
                    h, counts = _concat_shingle_hashes(enc[lo:hi], lens[lo:hi],
                                                       k, seed)
                    sigs.append(_oph_signatures(h, counts, num_perm))
            sig = np.vstack(sigs) if sigs else np.empty((0, num_perm), np.int64)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "signature": list(sig)})

    return df.select(id_col, text_col).mapInPandas(fn, schema=schema)


def _band_table(signatures: DataFrame, id_col: str, bands: int, seed: int,
                sig_len: int | None) -> DataFrame:
    """(id, band, band_hash) — one row per band per signature.

    Band hashes come straight from order-preserving F.slice on the
    signature array (one narrow projection + explode) — NOT from
    groupBy + collect_list, whose element order is not guaranteed after a
    shuffle (nondeterministic band hashes silently drop candidates) and
    which costs an extra shuffle."""
    if sig_len is None:
        sig_len = signatures.select(F.size("signature").alias("n")).first()["n"]
    rows_per_band = max(1, sig_len // bands)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(F.lit(seed).cast("long"),
                       F.slice("signature", b * rows_per_band + 1,
                               rows_per_band)).alias("band_hash"))
        for b in range(bands)]
    return (signatures
            .select(F.col(id_col), F.explode(F.array(*band_structs)).alias("bh"))
            .select(id_col, "bh.band", "bh.band_hash"))


def _cap_band_buckets(banded: DataFrame, max_bucket: int | None,
                      bucket_cols: tuple = ("band", "band_hash")) -> DataFrame:
    """Drop (band, band_hash) buckets above ``max_bucket`` occupancy BEFORE
    any pairing join — the degenerate-bucket guard. A bucket of B members
    yields O(B^2) candidate pairs inside ONE join task; on a
    boilerplate-heavy corpus (millions of identical/empty documents
    sharing every band hash) that single task goes quadratic at 100 TB.

    Topology (same as the C4 line dedup's over-cap set): a map-side-
    combined groupBy-count finds the over-cap bucket KEYS — a small,
    anomalous set by definition — and a broadcast anti-join removes their
    rows. This shuffles only per-partition count partials, NOT the band
    table itself (a window count would re-shuffle every band row; measured
    plans: +2 full-table exchanges). If an adversarial corpus ever pushed
    the hot-key set past the broadcast budget, Catalyst/AQE degrades the
    anti-join to a shuffled join on the 8-byte keys — slower, never wrong.

    Recall trade (documented, bounded): identical documents collide in ALL
    bands, so a cluster larger than the cap loses its pairs entirely —
    run exact dedup (dedup_exact / line dedup) upstream, which removes
    identical texts for free; near-identical (non-equal) clusters collide
    in different band subsets, so the other bands usually still catch a
    dropped bucket's true pairs (MMDS ch.3 banding analysis)."""
    if max_bucket is None:
        return banded
    if max_bucket < 2:
        raise ValueError("max_bucket must be >= 2 (a pair needs 2 rows)")
    # NOTE: `banded` gains one extra consumer (the count agg) on top of
    # the pairing join's two — derive it from a persisted signatures/
    # buckets DataFrame so the expensive kernel runs once (the high-level
    # ops all do).
    cols = list(bucket_cols)
    hot = (banded.groupBy(*cols).agg(F.count("*").alias("__occ"))
                 .where(F.col("__occ") > max_bucket)
                 .select(*cols))
    return banded.join(F.broadcast(hot), cols, "left_anti")


def minhash_lsh_candidates(signatures: DataFrame, id_col: str,
                           bands: int = 16, seed: int = DEFAULT_SEED,
                           sig_len: int | None = None,
                           max_bucket: int | None = None) -> DataFrame:
    """Banded LSH: split each signature into `bands` bands, hash each band
    (see _band_table), self-join on (band_id, band_hash) -> candidate
    pairs (id_a < id_b).

    The join key is a small long, so the candidate shuffle moves band
    hashes, not documents; Catalyst handles the equi-join strategy. Pass
    ``sig_len`` (= num_perm) to keep the plan fully lazy; it is probed
    with one tiny job otherwise. ``max_bucket`` drops degenerate buckets
    before the self-join (see _cap_band_buckets for the scale rationale
    and recall trade)."""
    banded = _cap_band_buckets(
        _band_table(signatures, id_col, bands, seed, sig_len), max_bucket)
    left = banded.alias("a")
    right = banded.alias("b")
    pairs = (left.join(right, on=[F.col("a.band") == F.col("b.band"),
                                  F.col("a.band_hash") == F.col("b.band_hash"),
                                  F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
                 .select(F.col(f"a.{id_col}").alias("id_a"),
                         F.col(f"b.{id_col}").alias("id_b"))
                 .distinct())
    return pairs


def minhash_jaccard_estimates(signatures: DataFrame, pairs: DataFrame,
                              id_col: str) -> DataFrame:
    """Estimated Jaccard for candidate pairs = fraction of agreeing minhash
    coordinates (zip_with, JVM-side)."""
    sig_a = signatures.select(F.col(id_col).alias("id_a"),
                              F.col("signature").alias("sig_a"))
    sig_b = signatures.select(F.col(id_col).alias("id_b"),
                              F.col("signature").alias("sig_b"))
    joined = pairs.join(sig_a, "id_a").join(sig_b, "id_b")
    agree = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v)
    return joined.select(
        "id_a", "id_b",
        (agree / F.size("sig_a")).alias("est_jaccard"))


def minhash_lsh_dedup(df: DataFrame, id_col: str, text_col: str,
                      threshold: float = 0.8, num_perm: int = 128,
                      bands: int = 16, shingle_k: int = 5,
                      seed: int = DEFAULT_SEED,
                      max_bucket: int | None = 4096) -> DataFrame:
    """Near-duplicate pairs (id_a, id_b, est_jaccard >= threshold).

    ``max_bucket`` (default 4096 — generous: healthy near-dup buckets hold
    tens of rows, and 4096 is still only ~8M pairs in one task) guards the
    quadratic degenerate-bucket case; see _cap_band_buckets. Pass None to
    disable (exact pre-r5 behavior)."""
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_k, seed)
    sigs = sigs.persist()
    pairs = minhash_lsh_candidates(sigs, id_col, bands, seed,
                                   sig_len=num_perm, max_bucket=max_bucket)
    est = minhash_jaccard_estimates(sigs, pairs, id_col)
    return est.where(F.col("est_jaccard") >= threshold)


def minhash_lsh_join_candidates(query_sigs: DataFrame, corpus_sigs: DataFrame,
                                id_col: str, bands: int = 16,
                                seed: int = DEFAULT_SEED,
                                sig_len: int | None = None,
                                max_bucket: int | None = None) -> DataFrame:
    """Cross-table banded LSH: (query_id, corpus_id) pairs whose signatures
    collide in at least one band. Both signature tables MUST come from
    minhash_signatures with the same (num_perm, shingle_k, seed) — band
    hashes are only comparable under identical parameters.

    Scale shape: the incremental-dedup case is a small-ish query batch
    (today's crawl) against a huge corpus (everything kept so far). The
    equi-join on (band, band_hash) lets Catalyst/AQE broadcast the query
    side's band table when it fits, so the corpus is streamed once with
    no shuffle of corpus rows; otherwise it degrades to a hash join on
    8-byte keys, never on documents. No id_a<id_b predicate applies —
    the two id namespaces are independent. ``max_bucket`` caps EACH side's
    degenerate buckets independently before the join (see
    _cap_band_buckets): a hot corpus bucket of B rows times a hot query
    bucket of Q rows is a B*Q blowup in one task otherwise."""
    qb = _cap_band_buckets(
        _band_table(query_sigs, id_col, bands, seed, sig_len),
        max_bucket).alias("q")
    cb = _cap_band_buckets(
        _band_table(corpus_sigs, id_col, bands, seed,
                    sig_len if sig_len is not None
                    else corpus_sigs.select(
                        F.size("signature").alias("n")).first()["n"]),
        max_bucket).alias("c")
    return (qb.join(cb, on=[F.col("q.band") == F.col("c.band"),
                            F.col("q.band_hash") == F.col("c.band_hash")])
              .select(F.col(f"q.{id_col}").alias("query_id"),
                      F.col(f"c.{id_col}").alias("corpus_id"))
              .distinct())


def minhash_join(query_df: DataFrame, corpus_df: DataFrame, id_col: str,
                 text_col: str, threshold: float = 0.8, num_perm: int = 128,
                 bands: int = 16, shingle_k: int = 5,
                 seed: int = DEFAULT_SEED,
                 max_bucket: int | None = 4096) -> DataFrame:
    """Fuzzy join of a new document batch against an existing corpus:
    (query_id, corpus_id, est_jaccard) for every cross pair with estimated
    char-shingle Jaccard >= threshold. The incremental near-dup primitive —
    'which of today's documents already exist (approximately) in the
    corpus?' — so a 100 TB corpus is never self-joined again for each new
    increment. Jaccard is re-estimated coordinate-wise on the full
    signatures (zip_with, JVM-side), so band-collision false positives are
    filtered by the same estimator minhash_lsh_dedup uses."""
    q_sigs = minhash_signatures(query_df, id_col, text_col, num_perm,
                                shingle_k, seed).persist()
    c_sigs = minhash_signatures(corpus_df, id_col, text_col, num_perm,
                                shingle_k, seed).persist()
    pairs = minhash_lsh_join_candidates(q_sigs, c_sigs, id_col, bands, seed,
                                        sig_len=num_perm,
                                        max_bucket=max_bucket)
    joined = (pairs
              .join(q_sigs.select(F.col(id_col).alias("query_id"),
                                  F.col("signature").alias("sig_q")),
                    "query_id")
              .join(c_sigs.select(F.col(id_col).alias("corpus_id"),
                                  F.col("signature").alias("sig_c")),
                    "corpus_id"))
    agree = F.aggregate(
        F.zip_with("sig_q", "sig_c", lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v)
    est = joined.select("query_id", "corpus_id",
                        (agree / F.size("sig_q")).alias("est_jaccard"))
    return est.where(F.col("est_jaccard") >= threshold)


def duplicated_span_stats(df: DataFrame, id_col: str, text_col: str,
                          n: int = 8, min_count: int = 2,
                          seed: int = DEFAULT_SEED) -> DataFrame:
    """Corpus-global duplicated-span statistics — the substring-level dedup
    signal of Lee et al. 2021 ("Deduplicating Training Data Makes Language
    Models Better"): for each document, how much of it is covered by word
    n-gram spans that occur >= min_count times ANYWHERE in the corpus
    (including repeats within the same document).

    Returns (id, n_tokens, n_grams, n_dup_grams, dup_gram_fraction,
    covered_tokens, coverage_fraction). coverage_fraction is the exact
    union of the duplicated [pos, pos+n-1] spans over the doc's tokens —
    the natural threshold for a "mostly boilerplate" document gate.

    Scale shape (no Python anywhere):
      1. posexplode of codegen word-n-gram hashes -> (doc, pos, gram) —
         grams are 8-byte xxhash64 values, never strings.
      2. corpus counts: groupBy(gram).count() — HashAggregate partial
         map-side, so a 10^9-occurrence boilerplate gram ships one row
         per task to its reducer, not every occurrence.
      3. occurrences join counts>=min_count on the 8-byte gram key —
         AQE skew-join splits hot grams' probe side.
      4. per-doc: dup positions -> sort_array(collect_set(pos)) (bounded
         by the doc's own length, the same O(doc) state any per-doc
         aggregation carries) -> interval-union coverage via one codegen
         F.aggregate over the sorted positions.

    Duplication is decided on gram HASHES (a 64-bit collision between two
    distinct grams in one corpus could over-count by one gram); the same
    documented assumption as repetition_ratios/q54."""
    c = F.col(text_col)
    grams = word_ngram_hashes(c, n, seed)
    base = df.select(
        F.col(id_col),
        F.when(F.length(F.trim(c)) == 0, F.lit(0))
         .otherwise(F.size(F.split(F.trim(c), r"\s+"))).alias("n_tokens"),
        F.size(grams).alias("n_grams"))

    occ = df.select(F.col(id_col),
                    F.posexplode(grams).alias("pos", "gram"))
    counts = occ.groupBy("gram").agg(F.count("*").alias("cnt"))
    dup = occ.join(counts.where(F.col("cnt") >= min_count).select("gram"),
                   "gram")
    per_doc = dup.groupBy(id_col).agg(
        F.count("*").alias("n_dup_grams"),
        F.sort_array(F.collect_set("pos")).alias("dps"))
    # union of [p, p+n-1] spans over strictly-increasing positions:
    # each new p adds min(n, p - prev) newly-covered tokens
    cov = F.aggregate(
        "dps",
        F.struct(F.lit(-n).cast("int").alias("prev"),
                 F.lit(0).cast("long").alias("cov")),
        lambda acc, p: F.struct(
            p.alias("prev"),
            (acc["cov"] + F.least(F.lit(n), p - acc["prev"])).alias("cov")),
        lambda acc: acc["cov"])
    per_doc = per_doc.select(id_col, "n_dup_grams", cov.alias("covered_tokens"))

    out = (base.join(per_doc, id_col, "left")
           .na.fill({"n_dup_grams": 0, "covered_tokens": 0}))
    return out.select(
        id_col, "n_tokens", "n_grams", "n_dup_grams",
        F.when(F.col("n_grams") > 0,
               F.col("n_dup_grams") / F.col("n_grams"))
         .otherwise(F.lit(0.0)).alias("dup_gram_fraction"),
        "covered_tokens",
        F.when(F.col("n_tokens") > 0,
               F.col("covered_tokens") / F.col("n_tokens"))
         .otherwise(F.lit(0.0)).alias("coverage_fraction"))


# --- simhash --------------------------------------------------------------

def simhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       seed: int = DEFAULT_SEED) -> DataFrame:
    """64-bit SimHash over whitespace tokens (Charikar 2002): sum token-hash
    bit vectors (+1/-1), sign -> bits.

    Tokenization AND token hashing run JVM-side (lower -> split -> xxhash64
    per array element, whole-stage codegen) so no string object ever crosses
    into Python; the kernel only accumulates signed bit contributions over
    flat int64 hash arrays, with per-document sums via np.add.reduceat on
    the contiguous token ranges (no per-token Python, no scatter-add)."""
    id_field = df.schema[id_col]
    schema = f"{id_col} {id_field.dataType.simpleString()}, simhash bigint"

    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    toks = F.filter(toks, lambda t: F.length(t) > 0)
    th_arr = F.transform(toks, lambda t: F.xxhash64(F.lit(seed).cast("long"), t))
    th_arr = F.coalesce(th_arr, F.array().cast("array<bigint>"))  # NULL text
    prepped = df.select(id_col, th_arr.alias("__th"))

    # Cache residency bound (same lesson as _MINHASH_CHUNK_BYTES): the bit
    # plane is 64 bytes/token, so a whole 65k-row Arrow batch (~1M tokens)
    # materializes ~70 MB and thrashes the shared LLC under concurrent
    # kernels — measured 100-300x slower than L2-resident chunks. 8192
    # tokens -> 512 KiB bit plane.
    tok_chunk = 8192

    def fn(it: Iterable[pd.DataFrame]):
        bit_idx = np.arange(64, dtype=U64)
        for pdf in it:
            out = np.zeros(len(pdf), dtype=np.int64)
            lengths = pdf["__th"].str.len().to_numpy()
            nz = np.flatnonzero(lengths)
            if nz.size:
                flat = np.concatenate(
                    [np.asarray(a, dtype=np.int64) for a in pdf["__th"].iloc[nz]])
                lens_nz = lengths[nz]
                ends = np.cumsum(lens_nz)
                starts = ends - lens_nz
                # doc-aligned token chunks of <= tok_chunk tokens (>= 1 doc)
                cuts = np.searchsorted(ends, np.arange(tok_chunk, ends[-1],
                                                       tok_chunk))
                edges = np.r_[0, cuts + 1, nz.size]
                sims = np.empty(nz.size, dtype=np.int64)
                for lo, hi in zip(edges[:-1], edges[1:]):
                    if hi <= lo:
                        continue
                    seg = flat[starts[lo]:ends[hi - 1]]
                    # unpackbits on raw LE bytes: one uint8 plane, ~12x
                    # cheaper than 64 shift-and-mask passes;
                    # sign(sum(+/-1)) == 2*popcount-sum > n_tokens
                    bits = np.unpackbits(seg.view(np.uint8).reshape(-1, 8),
                                         axis=1, bitorder="little")
                    st = starts[lo:hi] - starts[lo]
                    bitsum = np.add.reduceat(bits, st, axis=0, dtype=np.int64)
                    sim_bits = (2 * bitsum > lens_nz[lo:hi, None]).astype(np.uint64)
                    sims[lo:hi] = (sim_bits << bit_idx[None, :]).sum(axis=1) \
                        .astype(np.uint64).view(np.int64)
                out[nz] = sims
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return prepped.mapInPandas(fn, schema=schema)


def simhash_near_dups(df: DataFrame, id_col: str, text_col: str,
                      max_hamming: int = 3, seed: int = DEFAULT_SEED,
                      max_bucket: int | None = 4096) -> DataFrame:
    """Near-dup pairs by SimHash. Candidates share at least one of four
    16-bit chunks (any pair within Hamming distance 3 must agree on >=1
    chunk — pigeonhole); verified exactly with bit_count(xor).

    ``max_bucket`` (default 4096; None disables) drops (chunk_id,
    chunk_val) buckets above that occupancy before the self-join — the
    same degenerate-bucket guard as the MinHash path (_cap_band_buckets),
    and MORE important here: the bucket space is only 2^16 values per
    chunk, so bucket occupancy grows LINEARLY with corpus size even on
    benign data (10^9 docs -> ~15k docs per bucket -> quadratic single
    tasks). At that scale prefer more/longer chunks (Manku et al. 2007's
    table/permutation trade) — this guard keeps the 4x16 default from
    melting down meanwhile. Same recall caveat: identical documents share
    ALL chunks, so over-cap identical clusters must be exact-deduped
    upstream."""
    sigs = simhash_signatures(df, id_col, text_col, seed).persist()
    chunks = sigs.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk_id"),
                     F.shiftrightunsigned("simhash", i * 16).bitwiseAND(F.lit(0xFFFF))
                      .alias("chunk_val"))
            for i in range(4)])).alias("c")
    ).select(id_col, "simhash", "c.chunk_id", "c.chunk_val")
    chunks = _cap_band_buckets(chunks, max_bucket,
                               bucket_cols=("chunk_id", "chunk_val"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (a.join(b, on=[F.col("a.chunk_id") == F.col("b.chunk_id"),
                          F.col("a.chunk_val") == F.col("b.chunk_val"),
                          F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     F.col("a.simhash").alias("sh_a"),
                     F.col("b.simhash").alias("sh_b"))
             .distinct())
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.withColumn("hamming", hamming)
                .where(F.col("hamming") <= max_hamming)
                .select("id_a", "id_b", "hamming"))


# --- n-gram Jaccard (exact verifier) -------------------------------------

def ngram_jaccard_pairs(df: DataFrame, pairs: DataFrame, id_col: str,
                        text_col: str, n: int = 3,
                        seed: int = DEFAULT_SEED) -> DataFrame:
    """Exact token n-gram Jaccard for given candidate pairs, as DataFrame
    set algebra: explode n-grams, count intersections/unions per pair.

    Grams are hashed to int64 JVM-side before the distinct/joins, so every
    shuffle carries 8-byte keys instead of gram strings; 64-bit collisions
    (~|grams|^2 / 2^64) are beneath any realistic corpus's noise floor."""
    grams = df.select(
        F.col(id_col).alias("gid"),
        F.explode(F.transform(
            F.sequence(F.lit(0), F.greatest(
                F.size(F.split(F.lower(F.col(text_col)), r"\s+")) - n, F.lit(0))),
            lambda i: F.xxhash64(F.lit(seed).cast("long"), F.concat_ws(" ", F.slice(
                F.split(F.lower(F.col(text_col)), r"\s+"), i + 1, n))),
        )).alias("gram")).distinct()

    ga = grams.select(F.col("gid").alias("id_a"), F.col("gram").alias("g_a"))
    gb = grams.select(F.col("gid").alias("id_b"), F.col("gram").alias("g_b"))
    inter = (pairs.join(ga, "id_a").join(gb, "id_b")
                  .where(F.col("g_a") == F.col("g_b"))
                  .groupBy("id_a", "id_b").agg(F.count("*").alias("n_inter")))
    counts = grams.groupBy("gid").agg(F.count("*").alias("n_grams"))
    ca = counts.select(F.col("gid").alias("id_a"), F.col("n_grams").alias("n_a"))
    cb = counts.select(F.col("gid").alias("id_b"), F.col("n_grams").alias("n_b"))
    return (pairs.join(inter, ["id_a", "id_b"], "left")
                 .na.fill({"n_inter": 0})
                 .join(ca, "id_a").join(cb, "id_b")
                 .select("id_a", "id_b",
                         (F.col("n_inter") /
                          (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
                         .alias("jaccard")))


def dedup_lines(df: DataFrame, id_col: str, text_col: str,
                max_occurrences: int = 1, delimiter: str = "\n",
                out_col: str | None = None,
                seed: int = DEFAULT_SEED,
                broadcast_over_cap: bool = True) -> DataFrame:
    """Global line-level deduplication (the C4 'discard any line that
    appears more than K times in the corpus' rule, Raffel et al. 2020):
    split each document on ``delimiter``, drop every unit whose total
    occurrence count across the WHOLE corpus exceeds ``max_occurrences``,
    and reassemble the survivors in original order.

    Fully relational — no Python touches text — and skew-safe: web corpora
    have lines (empty string, boilerplate headers) appearing 10^9-10^10
    times, so occurrences must NEVER be shuffled by line. Instead:

      1. counts: groupBy(line_hash, line).count() — HashAggregate emits a
         map-side partial, so each task contributes its DISTINCT lines to
         the exchange; the hot line costs one row per task, not one row
         per occurrence.
      2. the over-cap line set (cnt > K) is broadcast and occurrences are
         dropped with a broadcast LEFT ANTI join — zero shuffle of
         occurrence rows. The set is bounded by
         total_occurrences / (max_occurrences+1) DISTINCT lines; with the
         C4-style caps this is tiny. For max_occurrences=1 on a
         duplicate-heavy corpus it can be large — pass
         ``broadcast_over_cap=False`` to fall back to a shuffled anti-join
         (AQE skew-join splits the hot streamed partitions).
      3. per-doc ordered reassembly via
         array_sort(collect_list(struct(pos, line))).

    The line's 64-bit hash rides along as the cheap join/agg comparator,
    with the line itself as tiebreaker, so counts are EXACT even under a
    collision. A document whose every line is dropped keeps a row with an
    empty string (training pipelines filter empties in their quality
    stage, not silently here).
    """
    out_col = out_col or text_col
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _regex_quote(delimiter)))
         .alias("__pos", "__line"))
    occ = lines.withColumn(
        "__lh", F.xxhash64(F.lit(seed).cast("long"), F.col("__line")))
    over_cap = (occ.groupBy("__lh", "__line")
                   .agg(F.count("*").alias("__cnt"))
                   .where(F.col("__cnt") > max_occurrences)
                   .select("__lh", "__line"))
    if broadcast_over_cap:
        over_cap = F.broadcast(over_cap)
    kept = occ.join(over_cap, ["__lh", "__line"], "left_anti")
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("__pos", "__line"))),
                       lambda s: s["__line"]),
                   delimiter).alias(out_col)))
    keep_cols = [c for c in df.columns if c != out_col]
    return (df.select(*keep_cols)
              .join(rebuilt, id_col, "left")
              .na.fill({out_col: ""}))
