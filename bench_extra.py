"""Targeted phase benchmarks for optimization work (guide §1.4).

NOT the graded bench — bench.py is frozen for measurement. This harness
re-creates individual bench.py phases (same inputs, same calls) so a
single operator can be timed in isolation, with optional
.explain("formatted") capture for the plan-diff evidence in
OPTIMIZATION_r06.md / plans/r06.

Usage:
    python bench_extra.py [phase ...]        # default: all
    SPARK_GRAFT_REPS=5 python bench_extra.py cc_random_graph

Prints one JSON line {phase: {"reps": [...], "min": ...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rounds = int(os.environ.get("SPARK_GRAFT_REPS", "3"))
    import re
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", str(int(100_000_000 * sf))))

    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from bloomfilter_spark.agg import build_sketch, multi_sketch_build
    from bloomfilter_spark.config import get_spark
    from bloomfilter_spark.jvm_build import (cms_build_jvm, ddsketch_build_jvm,
                                             hll_build_jvm, iblt_build_jvm,
                                             mg_build_preagg,
                                             mg_grouped_build_preagg,
                                             multi_sketch_build_jvm,
                                             quantile_build_preagg,
                                             sample_grouped_build_jvm,
                                             theta_build_jvm,
                                             wsample_grouped_build_jvm)
    from bloomfilter_spark.operators.dedup import (minhash_signatures,
                                                   simhash_signatures)
    from bloomfilter_spark.operators.file_index import (build_file_bloom_index,
                                                        prune_files)
    from bloomfilter_spark.operators.graph import connected_components
    from bloomfilter_spark.operators.sharded import build_sharded_bloom
    from bloomfilter_spark.operators.similarity import (
        embedding_principal_directions)
    from bloomfilter_spark.sizing import suggest_sizing
    from bloomfilter_spark.sketches import (KLL, BloomFilter, CountMinSketch,
                                            HyperLogLog)
    from bloomfilter_spark.sources.transcripts import (load_transcripts,
                                                       transcripts_path)

    spark = get_spark("bench_extra", cores=cores, shuffle_partitions=cores)

    tr = load_transcripts(spark, n_turns, partitions=cores * 2).persist()
    n_actual = tr.count()
    warm = spark.range(cores * 64).repartition(cores * 2)
    build_sketch(warm, ["id"], lambda: BloomFilter(1 << 10, 3))
    sub = (tr.sample(fraction=min(1.0, 1_000_000 / max(n_actual, 1)), seed=7)
             .withColumn("doc_id", F.monotonically_increasing_id())
             .persist())
    n_docs = sub.count()
    m, k = suggest_sizing(n_actual, 0.01)
    hll_box: dict = {}
    idx_box: dict = {}
    tr_path = transcripts_path(n_turns)

    def _build_index():
        if "idx" in idx_box:
            idx_box["idx"].unpersist()
        idx_box["idx"] = build_file_bloom_index(spark, tr_path, ["conv_id"],
                                                fpr=0.001).persist()
        idx_box["idx"].count()

    probe = tr.select("conv_id").limit(3)
    qs = entry_mod.queries()

    phases: list = [
        ("build_bloom_sharded",
         lambda: build_sharded_bloom(tr, ["conv_id", "text"],
                                     capacity=n_actual, fpr=0.01,
                                     n_shards=64).count()),
        ("build_bloom_broadcast",
         lambda: build_sketch(tr, ["conv_id", "text"],
                              lambda: BloomFilter(m, k))),
        ("build_hll",
         lambda: hll_box.__setitem__("hll",
                                     hll_build_jvm(tr, ["conv_id"], p=14))),
        ("build_theta",
         lambda: theta_build_jvm(tr, ["conv_id", "text"], k=4096)),
        ("build_iblt_digest",
         lambda: iblt_build_jvm(tr, ["conv_id", "text"], max_diff=4096)),
        ("build_sample_grouped",
         lambda: sample_grouped_build_jvm(tr, ["tool"], ["conv_id"],
                                          "conv_id", k=256).count()),
        ("build_wsample_grouped",
         lambda: wsample_grouped_build_jvm(
             tr.withColumn("__wt", F.length("text").cast("double") + 1.0),
             ["tool"], ["conv_id"], "__wt", "conv_id", k=256).count()),
        ("build_cms",
         lambda: build_sketch(tr, ["tool"],
                              lambda: CountMinSketch(eps=1e-4, delta=1e-3))),
        ("build_cms_jvm",
         lambda: cms_build_jvm(tr, ["tool"], eps=1e-4, delta=1e-3)),
        ("build_kll",
         lambda: build_sketch(tr.select(F.length("text").alias("len")),
                              ["len"], lambda: KLL(200))),
        ("build_kll_preagg",
         lambda: quantile_build_preagg(tr.select(F.length("text").alias("len")),
                                       "len", lambda: KLL(200))),
        ("build_mg_preagg",
         lambda: mg_build_preagg(tr, ["tool"], k=256)),
        ("build_mg_grouped",
         lambda: mg_grouped_build_preagg(tr, ["tool"], ["conv_id"],
                                         k=64).count()),
        ("build_ddsketch_jvm",
         lambda: ddsketch_build_jvm(
             tr.select(F.length("text").alias("len")), "len", alpha=0.01)),
        ("fd_embedding_dirs",
         lambda: embedding_principal_directions(
             spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
             "embedding", ell=64, k=8)),
        ("sig_minhash_1m",
         lambda: minhash_signatures(sub, "doc_id", "text")
                 .write.format("noop").mode("overwrite").save()),
        ("sig_simhash_1m",
         lambda: simhash_signatures(sub, "doc_id", "text")
                 .write.format("noop").mode("overwrite").save()),
        ("build_file_index", _build_index),
        ("probe_file_index",
         lambda: prune_files(idx_box["idx"], ["conv_id"], probe)),
        ("build_family_one_scan",
         lambda: multi_sketch_build(
             tr.withColumn("len", F.length("text")),
             {"hll_conv": (["conv_id"], lambda: HyperLogLog(14)),
              "cms_tool": (["tool"], lambda: CountMinSketch(eps=1e-4, delta=1e-3)),
              "kll_len": (["len"], lambda: KLL(200))})),
        ("build_family_jvm_one_scan",
         lambda: multi_sketch_build_jvm(tr, {
             "hll_conv": ("hll", ["conv_id"], 14),
             "cms_tool": ("cms", ["tool"], 1e-4, 1e-3)})),
        ("cc_random_graph",
         lambda: connected_components(
             spark.range(max(n_actual // 10, 10_000)).select(
                 F.pmod(F.xxhash64("id"), F.lit(max(n_actual // 20, 5_000)))
                  .alias("src"),
                 F.pmod(F.xxhash64("id", F.lit(1)),
                        F.lit(max(n_actual // 20, 5_000))).alias("dst"))
             ).count()),
    ]
    phases += [(name, (lambda n: lambda: qs[n](spark, sf_dir).collect())(name))
               for name in [p for p in qs]]

    want = sys.argv[1:]
    if want:
        bad = [w for w in want if w not in dict(phases)]
        if bad:
            raise SystemExit(f"unknown phases: {bad}")
        phases = [(n, f) for n, f in phases if n in want]
    else:
        from bench import BENCH_QUERIES
        keep = {n for n, _ in phases[:22]} | set(BENCH_QUERIES)
        phases = [(n, f) for n, f in phases if n in keep]

    # file-index probe depends on the index phase having run this round
    names = [n for n, _ in phases]
    if "probe_file_index" in names and "build_file_index" not in names:
        _build_index()

    reps: dict[str, list[float]] = {name: [] for name, _ in phases}
    for _ in range(rounds):
        for name, fn in phases:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn()
            reps[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({name: {"reps": r, "min": min(r)}
                      for name, r in reps.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
