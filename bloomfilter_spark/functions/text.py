"""Text-analysis column functions for large-scale corpus pipelines.

Everything is a Catalyst expression (JVM-side, whole-stage codegen) —
token counts, quality ratios, fingerprints, PII redaction, repetition
signals, and language-ID (marker counting via codegen regexp_count, no
Python anywhere on the text path).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..config import DEFAULT_SEED

# --- token counting (JVM-side) -------------------------------------------

def token_count(col) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+")))


def word_token_count(col) -> Column:
    """BPE-ish token proxy: count of letter/digit runs plus standalone
    punctuation marks (closer to subword tokenizer output than whitespace)."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.regexp_replace(c, r"[^\p{L}\p{N}]+", " ")), r"\s+")))
    punct = F.length(F.regexp_replace(c, r"[\p{L}\p{N}\s]", ""))
    return (words + punct).cast("int")


# --- quality scoring (JVM-side) ------------------------------------------

def alpha_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(F.regexp_replace(c, r"[^a-zA-Z]", "")) /
            F.greatest(F.length(c), F.lit(1))).cast("double")


def digit_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(F.regexp_replace(c, r"[^0-9]", "")) /
            F.greatest(F.length(c), F.lit(1))).cast("double")


def punct_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", "")) /
            F.greatest(F.length(c), F.lit(1))).cast("double")


def mean_word_length(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(F.regexp_replace(c, r"\s+", "")) /
            F.greatest(token_count(c), F.lit(1))).cast("double")


def quality_score(col) -> Column:
    """Heuristic [0,1] document quality: favors alphabetic text of sane
    length with moderate punctuation (C4/Gopher-style length+symbol rules,
    public recipe)."""
    c = F.col(col) if isinstance(col, str) else col
    n = token_count(c)
    len_ok = F.when((n >= 5) & (n <= 100000), F.lit(1.0)).otherwise(F.lit(0.2))
    mwl = mean_word_length(c)
    mwl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.3))
    score = (0.4 * alpha_ratio(c) + 0.2 * (1.0 - punct_ratio(c))
             + 0.2 * len_ok + 0.2 * mwl_ok)
    return F.round(score, 6).cast("double")


# --- fingerprinting (JVM-side) -------------------------------------------

def normalized_fingerprint(col, seed: int = DEFAULT_SEED) -> Column:
    """64-bit content fingerprint invariant to case and whitespace runs —
    the exact-dedup key for 'same document modulo formatting'."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return F.xxhash64(F.lit(seed).cast("long"), normalized)


# --- language ID (vectorized pandas UDF) ---------------------------------

_LANG_MARKERS = {
    "en": [" the ", " and ", " of ", " to ", " is ", " in ", " that "],
    "de": [" der ", " die ", " und ", " ist ", " das ", " nicht ", " ein "],
    "fr": [" le ", " la ", " et ", " les ", " des ", " est ", " une "],
    "es": [" el ", " la ", " los ", " que ", " y ", " es ", " una "],
    "it": [" il ", " di ", " che ", " la ", " per ", " sono ", " una "],
    "pt": [" o ", " de ", " que ", " do ", " da ", " em ", " uma "],
    "nl": [" de ", " het ", " een ", " van ", " en ", " niet ", " dat "],
}


def lang_id(col) -> Column:
    """N-gram-marker language guesser, pure Catalyst: per-language
    stopword-marker occurrences via codegen `regexp_count`, argmax wins
    (first language in _LANG_MARKERS order on ties); 'und' (undetermined)
    when no marker fires. No Python on the text path — at 100 TB the
    document bytes never cross the Arrow pipe for this signal.

    Normalization is deliberately ASCII-only ([^a-zA-Z0-9_\\s], not \\w)
    and every pattern is valid in both Java regex and RE2, so the
    computation is reproducible bit-for-bit in RE2-based engines (DuckDB
    oracle in __spark_entry__._lang_id_oracle_sql) — the markers
    themselves are ASCII stopwords, so this loses nothing."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(
        F.lit(" "),
        F.regexp_replace(
            F.regexp_replace(F.lower(F.coalesce(c, F.lit(""))),
                             r"[^a-zA-Z0-9_\s]", " "),
            r"\s+", " "),
        F.lit(" "))
    scores = {
        lang: sum((F.regexp_count(padded, F.lit(m.replace(" ", r"\s")))
                   for m in markers), start=F.lit(0))
        for lang, markers in _LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    out = F.when(best <= 0, F.lit("und"))
    for lang in _LANG_MARKERS:  # first language in order wins ties
        out = out.when(scores[lang] == best, F.lit(lang))
    return out


#: PII scrub patterns, applied IN ORDER (emails before phones so the
#: digits in a mailbox name don't half-match a phone pattern). Patterns
#: are restricted to syntax valid in both Java regex (Spark codegen) and
#: RE2 (DuckDB oracle) so the redaction is exactly reproducible.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d. -]{7,}\d", "<PHONE>"),
]


def redact_pii(col) -> Column:
    """Scrub emails / IPv4 addresses / phone-like digit runs from a text
    column — the standard pre-training privacy pass — as a chain of
    codegen `regexp_replace` calls: no UDF, no Python, fully pushed into
    whole-stage codegen. Patterns and order are module constants so the
    behavior is auditable and the DuckDB oracle can replay them verbatim
    (q53)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def repetition_ratios(df, id_col: str, text_col: str, n: int = 2):
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1) per
    document, token n-gram granularity:

      top_ngram_frac  — occurrences of the single most frequent n-gram
                        over all n-gram occurrences (high => looping text)
      dup_ngram_frac  — fraction of n-gram occurrences beyond first use
                        (high => boilerplate / template spam)

    Pure DataFrame algebra: explode n-grams (codegen transform/slice over
    the split array), count per (doc, gram-hash), aggregate two ratios
    per doc. One shuffle on (doc, gram-hash); documents with fewer than
    n tokens get ratio 0. Returns (id_col, top_ngram_frac,
    dup_ngram_frac).

    Grams are counted by xxhash64 of the gram string, not the string —
    shuffling 8-byte keys instead of text. Two distinct grams colliding
    within ONE document (probability ~g^2/2^65 for g grams/doc, i.e.
    ~5e-12 even at g=10^4) would merge their counts and nudge the ratios;
    an exact-string oracle (q54) agrees only under this no-collision
    assumption, which at per-document cardinalities is safe."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    grams = df.select(
        F.col(id_col),
        F.explode(F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n))),
        )).alias("gram"))
    per_gram = grams.groupBy(id_col, "gram").agg(F.count("*").alias("cnt"))
    return (per_gram.groupBy(id_col)
            .agg((F.max("cnt") / F.sum("cnt")).alias("top_raw"),
                 ((F.sum("cnt") - F.count("*")) / F.sum("cnt"))
                 .alias("dup_raw"),
                 F.sum("cnt").alias("total"))
            .select(F.col(id_col),
                    F.when(F.col("total") <= 1, F.lit(0.0))
                     .otherwise(F.col("top_raw")).alias("top_ngram_frac"),
                    F.when(F.col("total") <= 1, F.lit(0.0))
                     .otherwise(F.col("dup_raw")).alias("dup_ngram_frac")))


def classifier_scores(df, id_col: str, text_col: str, weights,
                      bias: float = 0.0):
    """fastText-style linear text classifier scoring — the "model-based
    quality filter" stage of LLM curation pipelines (a trained linear
    model over bag-of-words features, applied at corpus scale):

        score = sigmoid(bias + mean_t weight(token_t))

    over lowercase whitespace tokens; tokens absent from the weight table
    contribute 0 (OOV), documents with no tokens score sigmoid(bias).
    Returns (id_col, n_tokens, score).

    `weights` is a (token string, weight double) DataFrame — the exported
    coefficients of any externally-trained linear model; duplicate token
    rows are rejected nowhere cheap, so they MUST be unique (document
    contract). Scale shape: explode (doc, token) -> broadcast hash join
    against the weight table (vocabularies fit executors by construction;
    the hint is explicit so Catalyst cannot shuffle the corpus by token,
    whose Zipf head is maximally skewed) -> one groupBy(doc) sum with
    map-side combine. Pure Catalyst end to end — no UDF on the text path."""
    c = F.col(text_col)
    toks_arr = F.split(F.trim(F.lower(c)), r"\s+")
    base = df.select(
        F.col(id_col),
        F.when(c.isNull() | (F.length(F.trim(c)) == 0), F.lit(0))
         .otherwise(F.size(toks_arr)).alias("n_tokens"))
    toks = (df.where(c.isNotNull() & (F.length(F.trim(c)) > 0))
              .select(F.col(id_col), F.explode(toks_arr).alias("__tok")))
    w = weights.select(F.col(weights.columns[0]).alias("__tok"),
                       F.col(weights.columns[1]).alias("__w"))
    sums = (toks.join(F.broadcast(w), "__tok")
                .groupBy(id_col).agg(F.sum("__w").alias("__sum")))
    x = (F.lit(float(bias))
         + F.coalesce(F.col("__sum"), F.lit(0.0))
         / F.greatest(F.col("n_tokens"), F.lit(1)))
    return (base.join(sums, id_col, "left")
            .select(F.col(id_col), "n_tokens",
                    (F.lit(1.0) / (F.lit(1.0) + F.exp(-x))).alias("score")))


def unigram_logprob_scores(df, id_col: str, text_col: str):
    """Self-trained unigram language-model score per document — the
    cheap sibling of the CCNet/Wikipedia-LM perplexity quality filter
    (docs whose tokens are corpus-atypical score low):

        avg_logprob = mean_t ln( count(token_t) / N_total )

    over lowercase whitespace tokens, with the model trained on the
    SAME corpus (every token is in-vocabulary by construction, so no
    smoothing term is needed; perplexity = exp(-avg_logprob)). Returns
    (id_col, n_tokens, avg_logprob) — zero-token docs keep NULL.

    Scale shape, pure Catalyst end to end: one map-side-combined
    groupBy(token).count() (shuffle carries distinct tokens) trains the
    model; scoring is explode -> broadcast hash join against the
    (token, logprob) dimension (explicit hint — the corpus is never
    shuffled by token, whose Zipf head is maximally skewed) -> one
    groupBy(doc) avg with map-side combine. For 10^8+-token
    vocabularies past broadcast, persist the model table and bucket
    both sides by token instead."""
    c = F.col(text_col)
    toks_arr = F.split(F.trim(F.lower(c)), r"\s+")
    toks = (df.where(c.isNotNull() & (F.length(F.trim(c)) > 0))
              .select(F.col(id_col), F.explode(toks_arr).alias("__tok")))
    counts = toks.groupBy("__tok").agg(F.count("*").alias("__c"))
    n_total = counts.agg(F.sum("__c")).first()[0] or 0
    model = counts.select(
        "__tok", F.log(F.col("__c") / F.lit(float(n_total))).alias("__lp"))
    base = df.select(
        F.col(id_col),
        F.when(c.isNull() | (F.length(F.trim(c)) == 0), F.lit(0))
         .otherwise(F.size(toks_arr)).alias("n_tokens"))
    scores = (toks.join(F.broadcast(model), "__tok")
                  .groupBy(id_col).agg(F.avg("__lp").alias("avg_logprob")))
    return base.join(scores, id_col, "left").select(
        F.col(id_col), "n_tokens", "avg_logprob")


def char_entropy_scores(df, id_col: str, text_col: str):
    """Per-document Shannon character entropy (bits/char) — the
    gibberish/boilerplate signal (natural text sits ~3.5-4.5 bits;
    single-char runs and base64 blobs fall far outside). Computed
    entirely in Catalyst via the identity

        H = log2(L) - (sum_ch c_ch * ln c_ch) / (L * ln 2)

    so the plan is: codegen split-to-chars explode -> map-side-combined
    groupBy(id, char).count() (the shuffle carries DISTINCT chars per
    doc, <= alphabet size, never L rows) -> one groupBy(id) agg.
    Returns (id_col, n_chars, entropy_bits); NULL/empty docs keep NULL
    entropy and n_chars 0."""
    c = F.col(text_col)
    chars = (df.where(c.isNotNull() & (F.length(c) > 0))
               .select(F.col(id_col),
                       F.explode(F.split(c, "")).alias("__ch")))
    per_char = chars.groupBy(id_col, "__ch").agg(F.count("*").alias("__c"))
    ln2 = 0.6931471805599453
    ent = (per_char.groupBy(id_col).agg(
        F.sum("__c").alias("__L"),
        F.sum(F.col("__c") * F.log(F.col("__c"))).alias("__s"))
        .select(F.col(id_col), F.col("__L").alias("n_chars"),
                (F.log(F.col("__L").cast("double")) / F.lit(ln2)
                 - F.col("__s") / (F.col("__L") * F.lit(ln2)))
                .alias("entropy_bits")))
    base = df.select(F.col(id_col))
    return (base.join(ent, id_col, "left")
                .withColumn("n_chars", F.coalesce("n_chars", F.lit(0))))
