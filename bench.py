"""Benchmark harness.

Runs the flagship sketch builds over the deterministic synthetic transcript
corpus (FIXTURES.md §1; size scaled to the sf of $SPARK_GRAFT_SF_DIR) plus
the headline oracle queries on the driver-provided tables, then prints ONE
JSON line:

  {"metric": "sketch_build_turns_per_sec", "value": N, "unit": "turns/sec",
   "queries": {name: seconds, ...}, "sf": 0.1, ...}

Environment:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  SPARK_GRAFT_TURNS    override transcript row count
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q01_pricing_summary", "q02_dedup_exact", "q03_bloom_semijoin_agg",
    "q05_heavy_hitters", "q09_sessionization", "q11_ann_cosine_topk",
    "q14_shipping_priority", "q15_asof_join",
    "q20_hll_distinct_users", "q21_cms_type_counts", "q22_kll_value_quantiles",
    "q25_minhash_neardup", "q40_theta_set_ops", "q43_stratified_sample",
    "q45_decontamination",
]


def sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_of(sf_dir)
    # 100M x sf turns: big enough that the build measures steady-state
    # compute rather than fixed per-pass costs (worker spawn, stage setup)
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", str(int(100_000_000 * sf))))

    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from bloomfilter_spark.agg import build_sketch
    from bloomfilter_spark.config import get_spark
    from bloomfilter_spark.jvm_build import (cms_build_jvm, hll_build_jvm,
                                             theta_build_jvm)
    from bloomfilter_spark.operators.sharded import build_sharded_bloom
    from bloomfilter_spark.sizing import suggest_sizing
    from bloomfilter_spark.sketches import KLL, BloomFilter, CountMinSketch, HyperLogLog
    from bloomfilter_spark.sources.transcripts import load_transcripts

    spark = get_spark("bench", cores=cores, shuffle_partitions=cores)

    tr = load_transcripts(spark, n_turns, partitions=cores * 2)
    tr = tr.persist()
    n_actual = tr.count()  # materialize cache so builds measure compute, not gen

    # warm up the Python worker pool (full kernel code path: worker spawn,
    # module imports, Arrow round-trip) so timings measure steady-state
    # throughput, not interpreter startup
    warm = spark.range(cores * 64).repartition(cores * 2)
    build_sketch(warm, ["id"], lambda: BloomFilter(1 << 10, 3))

    timings: dict[str, float] = {}

    def timed(name: str, fn, reps: int = 2) -> None:
        """min-of-reps: this VM has bursty steal time (identical passes
        measured at 1.1s and 15s), so a single-shot timing is a coin flip;
        the min over two interleaved-with-nothing reps estimates the
        steady-state cost the metric is meant to capture."""
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # flagship: sharded Bloom over (conv_id, text) — the "seen this turn
    # before?" set, built on the engine's at-scale path (top-bits routing,
    # one hash column over the pipe, no merge stage)
    timed("build_bloom_sharded",
          lambda: build_sharded_bloom(tr, ["conv_id", "text"],
                                      capacity=n_actual, fpr=0.01,
                                      n_shards=64).count())
    t_bloom = timings["build_bloom_sharded"]

    # broadcast-path (mergeable-UDAF) bloom for comparison
    m, k = suggest_sizing(n_actual, 0.01)
    timed("build_bloom_broadcast",
          lambda: build_sketch(tr, ["conv_id", "text"],
                               lambda: BloomFilter(m, k)), reps=1)

    hll_box = {}
    timed("build_hll",
          lambda: hll_box.__setitem__("hll", hll_build_jvm(tr, ["conv_id"], p=14)))
    hll = hll_box["hll"]
    # theta/KMV over the full (conv_id, text) turn key: distinct + top-k —
    # the set-expression sketch's JVM-reduced build (k+1 rows to driver)
    timed("build_theta",
          lambda: theta_build_jvm(tr, ["conv_id", "text"], k=4096))
    timed("build_cms",
          lambda: build_sketch(tr, ["tool"],
                               lambda: CountMinSketch(eps=1e-4, delta=1e-3)),
          reps=1)
    # JVM-reduced CMS (d*w cells cross the pipe instead of every row) —
    # the unweighted-build scale path; kernel build kept for comparison
    timed("build_cms_jvm", lambda: cms_build_jvm(tr, ["tool"], eps=1e-4, delta=1e-3))
    timed("build_kll",
          lambda: build_sketch(tr.select(F.length("text").alias("len")),
                               ["len"], lambda: KLL(200)))
    # pre-aggregated KLL: turn lengths have few distinct values, so only
    # (value, count) pairs cross the pipe — the value-sketch scale path
    from bloomfilter_spark.jvm_build import quantile_build_preagg
    timed("build_kll_preagg",
          lambda: quantile_build_preagg(tr.select(F.length("text").alias("len")),
                                        "len", lambda: KLL(200)))

    # pipeline-kernel throughput: near-dup signatures over 1M transcript
    # texts (OPH minhash; JVM-tokenized simhash) — the per-document cost a
    # 10^9-doc dedup pays
    from bloomfilter_spark.operators.dedup import (minhash_signatures,
                                                   simhash_signatures)
    sub = (tr.sample(fraction=min(1.0, 1_000_000 / max(n_actual, 1)), seed=7)
             .withColumn("doc_id", F.monotonically_increasing_id())
             .persist())
    n_docs = sub.count()
    timed("sig_minhash_1m", lambda: minhash_signatures(sub, "doc_id", "text")
          .write.format("noop").mode("overwrite").save())
    timed("sig_simhash_1m", lambda: simhash_signatures(sub, "doc_id", "text")
          .write.format("noop").mode("overwrite").save())
    sub.unpersist()

    # bloom file index over the 64-file cached corpus: per-file filters via
    # the shuffle-free pre-partitioned grouped build, then a 3-key probe
    # (the driver-side skip decision a point lookup pays)
    from bloomfilter_spark.operators.file_index import (build_file_bloom_index,
                                                        prune_files)
    from bloomfilter_spark.sources.transcripts import transcripts_path
    tr_path = transcripts_path(n_turns)
    idx_box = {}
    timed("build_file_index",
          lambda: idx_box.__setitem__(
              "idx", build_file_bloom_index(spark, tr_path, ["conv_id"],
                                            fpr=0.001).persist()))
    idx_box["idx"].count()
    probe = tr.select("conv_id").limit(3)
    timed("probe_file_index",
          lambda: prune_files(idx_box["idx"], ["conv_id"], probe))
    idx_box["idx"].unpersist()

    # one-scan family build: every row crosses the pipe once for ALL sketches
    from bloomfilter_spark.agg import multi_sketch_build
    t0 = time.time()
    fam = multi_sketch_build(
        tr.withColumn("len", F.length("text")),
        {"hll_conv": (["conv_id"], lambda: HyperLogLog(14)),
         "cms_tool": (["tool"], lambda: CountMinSketch(eps=1e-4, delta=1e-3)),
         "kll_len": (["len"], lambda: KLL(200))})
    timings["build_family_one_scan"] = round(time.time() - t0, 3)
    assert fam["hll_conv"].estimate() > 0

    # JVM-reduced one-scan family (HLL + CMS tagged cells, one shuffle,
    # zero per-row Arrow traffic) — the at-scale family path
    from bloomfilter_spark.jvm_build import multi_sketch_build_jvm
    timed("build_family_jvm_one_scan",
          lambda: multi_sketch_build_jvm(tr, {
              "hll_conv": ("hll", ["conv_id"], 14),
              "cms_tool": ("cms", ["tool"], 1e-4, 1e-3)}))
    tr.unpersist()

    qs = entry_mod.queries()
    for name in BENCH_QUERIES:
        t0 = time.time()
        qs[name](spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)

    spark.stop()

    total_sketch = sum(timings[k] for k in
                       ("build_bloom_sharded", "build_hll", "build_cms_jvm",
                        "build_kll"))
    result = {
        "metric": "sketch_build_turns_per_sec",
        "value": round(n_actual / t_bloom, 1),
        "unit": "turns/sec",
        "queries": timings,
        "sf": sf,
        "n_turns": n_actual,
        "cores": cores,
        "hll_estimate_convs": round(hll.estimate(), 1),
        "all_sketches_turns_per_sec": round(4 * n_actual / total_sketch, 1),
        "minhash_docs_per_sec": round(n_docs / timings["sig_minhash_1m"], 1),
        "simhash_docs_per_sec": round(n_docs / timings["sig_simhash_1m"], 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
