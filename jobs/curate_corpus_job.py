#!/usr/bin/env python
"""spark-submit entry point: end-to-end training-corpus curation pipeline
composing the engine's pipeline operators — the "documents in, curated
mixture out" job a 100 TB data-engineering run executes.

    spark-submit --py-files bloomfilter_spark.zip jobs/curate_corpus_job.py \\
        --input '/data/documents/*.parquet' \\
        --output /data/curated/run1 \\
        [--reference '/data/benchmarks/*.parquet']  (decontamination set)
        [--min-quality 0.3] [--cap-per-fingerprint 1]
        [--mix source=web:0.1,code:1.0]  [--seed 7]

Stages (each a pure DataFrame transform; one scan flows through all of
them — Catalyst fuses the filters/projections, the only shuffles are the
dedup window and the decontamination score aggregation):

  1. PII redaction     functions/text.redact_pii (--redact-pii)
  2. quality gate      functions/text.quality_score >= --min-quality
  3. repetition gate   functions/text.repetition_ratios dup-bigram
                       fraction <= --max-dup-ngram-frac (skipped when 1.0)
  4. language ID       functions/text.lang_id -> kept as a column
  5. line dedup        operators/dedup.dedup_lines drops corpus-wide
                       repeated lines (--line-dedup-cap, 0 = skip)
  6. exact dedup cap   operators/dedup.keep_first_n on the normalized
                       fingerprint (cap 1 = classic keep-first dedup)
  7. decontamination   operators/decontaminate vs --reference (skipped
                       when no reference given)
  8. mixture sampling  operators/sampling.stratified_sample by --mix
                       (skipped when --mix absent)

Writes the curated corpus to <output>/corpus (parquet) and one JSON line
of per-stage row counts to stdout + <output>/metrics.json — the lineage a
production run records. Counts are computed with ONE action per stage
boundary using cached intermediates; pass --no-metrics to skip the extra
actions entirely (single write, no counting passes).
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_mix(spec: str | None) -> tuple[str, dict] | None:
    # "source=web:0.1,code:1.0" -> ("source", {"web": 0.1, "code": 1.0})
    if not spec:
        return None
    col, _, rest = spec.partition("=")
    fracs = {}
    for part in rest.split(","):
        name, _, f = part.rpartition(":")
        fracs[name] = float(f)
    return col, fracs


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--reference", default=None,
                    help="parquet glob of benchmark/eval texts to exclude")
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--redact-pii", action="store_true")
    ap.add_argument("--max-dup-ngram-frac", type=float, default=1.0,
                    help="drop docs whose duplicate-bigram fraction exceeds "
                         "this (1.0 = stage off)")
    ap.add_argument("--line-dedup-cap", type=int, default=0,
                    help="drop lines appearing more than this many times "
                         "corpus-wide (0 = stage off)")
    ap.add_argument("--cap-per-fingerprint", type=int, default=1)
    ap.add_argument("--contamination-threshold", type=float, default=0.2)
    ap.add_argument("--ngram", type=int, default=8)
    ap.add_argument("--mix", default=None,
                    help="strata_col=name:frac,name:frac mixture spec")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--no-metrics", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    from bloomfilter_spark.config import DEFAULT_SEED
    from bloomfilter_spark.functions.text import (lang_id,
                                                  normalized_fingerprint,
                                                  quality_score, redact_pii,
                                                  repetition_ratios)
    from bloomfilter_spark.operators.decontaminate import decontaminate
    from bloomfilter_spark.operators.dedup import dedup_lines, keep_first_n
    from bloomfilter_spark.operators.sampling import stratified_sample

    seed = args.seed if args.seed is not None else DEFAULT_SEED
    spark = SparkSession.builder.appName("curate_corpus").getOrCreate()
    metrics: dict[str, int] = {}

    def staged(name: str, df):
        if not args.no_metrics:
            df = df.persist()
            metrics[name] = df.count()
        return df

    docs = staged("input", spark.read.parquet(args.input)
                  .where(F.col(args.text_col).isNotNull()))

    if args.redact_pii:
        docs = docs.withColumn(args.text_col, redact_pii(args.text_col))

    kept = staged("quality", docs.where(
        quality_score(args.text_col) >= args.min_quality))
    if args.max_dup_ngram_frac < 1.0:
        reps = repetition_ratios(kept, args.id_col, args.text_col, n=2)
        kept = staged("repetition", kept.join(
            reps.where(F.col("dup_ngram_frac") <= args.max_dup_ngram_frac)
                .select(args.id_col), args.id_col, "left_semi"))
    kept = kept.withColumn("lang", lang_id(args.text_col))
    if args.line_dedup_cap > 0:
        kept = staged("line_dedup", dedup_lines(
            kept, args.id_col, args.text_col,
            max_occurrences=args.line_dedup_cap, seed=seed)
            .where(F.col(args.text_col) != ""))
    kept = staged("dedup_cap", keep_first_n(
        kept.withColumn("__fp", normalized_fingerprint(args.text_col)),
        ["__fp"], args.cap_per_fingerprint, [args.id_col]).drop("__fp"))

    if args.reference:
        ref = spark.read.parquet(args.reference)
        kept = staged("decontaminated", decontaminate(
            kept, ref, args.id_col, args.text_col, n=args.ngram,
            threshold=args.contamination_threshold, seed=seed))

    mix = _parse_mix(args.mix)
    if mix:
        col, fracs = mix
        kept = staged("mixed", stratified_sample(
            kept, col, fracs, key_cols=[args.id_col], seed=seed))

    kept.write.mode("overwrite").parquet(f"{args.output}/corpus")
    if not args.no_metrics:
        line = json.dumps({"stages": metrics})
        print(line)
        spark.createDataFrame([(line,)], "metrics string") \
             .coalesce(1).write.mode("overwrite") \
             .parquet(f"{args.output}/metrics.json")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
