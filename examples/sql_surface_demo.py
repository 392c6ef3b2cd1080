#!/usr/bin/env python
"""End-to-end sketch-warehouse walkthrough: build once, answer from SQL.

The engine's flagship usage pattern over the north-rule transcript shape
(conv_id, turn_idx, role, text, tool, ts):

  1. ONE scan of the corpus builds per-day mergeable sketch tables
     (HLL distinct convs, theta conv sets, KLL turn-length quantiles).
  2. Everything after that is plain ``spark.sql`` over the serialized
     blobs — no re-scan, no Python on the data path:
       - weekly distinct convs via GROUP BY sketch_merge + sketch_estimate,
         published WITH its trust radius (sketch_error_bound);
       - tool co-occurrence via the composable theta set algebra
         (theta_intersect_pair / theta_a_not_b_pair nested inside
         sketch_estimate, plus theta_jaccard_estimate);
       - turn-length drift between first/last day via kll_ks_distance;
       - K example conv_ids per tool straight from the sample blobs
         (sample_values over a bottom-k sample table);
       - K LENGTH-WEIGHTED example conv_ids per tool with their weights
         and the total-mass estimate (sample_values + sample_weights +
         sketch_estimate over a weighted bottom-k sample table);
       - a geometry migration: fold the p=12 daily HLLs to p=10 and
         merge (sketch_fold — byte-exact downgrade);
       - warehouse-column audit via sketch_describe;
       - per-day snapshot drift audit via IBLT digest subtraction;
       - per-tool p99 turn length with a RELATIVE-VALUE guarantee
         (DDSketch: sketch_quantile + sketch_error_bound in value units).

At 10^12 turns the step-1 scan is the only corpus pass; the SQL layer
operates on O(days) rows. Run: ``python examples/sql_surface_demo.py
[n_turns]`` (default 200k).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    from pyspark.sql import functions as F

    from bloomfilter_spark.agg import grouped_sketch_table
    from bloomfilter_spark.config import get_spark
    from bloomfilter_spark.sketches import KLL, HyperLogLog, ThetaSketch
    from bloomfilter_spark.sql import register_sketch_sql
    from bloomfilter_spark.sources.transcripts import load_transcripts

    n_turns = int(argv[1]) if len(argv) > 1 else 200_000
    spark = get_spark("sql_surface_demo")
    register_sketch_sql(spark)

    t = load_transcripts(spark, n_turns).withColumn(
        "day", F.to_date("ts")).withColumn(
        "turn_len", F.length("text"))

    # -- 1. one corpus scan per sketch family -> per-day sketch rows ------
    grouped_sketch_table(t, ["day"], ["conv_id"],
                         lambda: HyperLogLog(12)) \
        .createOrReplaceTempView("hll_daily")
    grouped_sketch_table(t.where(F.col("tool").isNotNull()),
                         ["tool"], ["conv_id"],
                         lambda: ThetaSketch(4096)) \
        .createOrReplaceTempView("theta_by_tool")
    grouped_sketch_table(t, ["day"], ["turn_len"],
                         lambda: KLL(200)) \
        .createOrReplaceTempView("kll_daily")

    # -- 2a. weekly rollup WITHOUT rescanning: merge day blobs in SQL -----
    weekly = spark.sql("""
        SELECT weekofyear(day) AS week,
               sketch_estimate(sketch_merge(sketch))    AS approx_convs,
               sketch_error_bound(sketch_merge(sketch)) AS rel_std_error
        FROM hll_daily GROUP BY weekofyear(day) ORDER BY week""").collect()
    for r in weekly:
        print(f"week {r['week']}: ~{r['approx_convs']:.0f} convs "
              f"(±{100 * r['rel_std_error']:.2f}% rse)")

    # -- 2b. tool co-occurrence: composable theta set algebra ------------
    # convs using BOTH tools, and convs using a exclusively (a AND NOT b),
    # each one nested SQL expression over the per-tool conv-set blobs
    pairs = spark.sql("""
        SELECT a.tool AS tool_a, b.tool AS tool_b,
               sketch_estimate(theta_intersect_pair(a.sketch, b.sketch))
                   AS convs_both,
               sketch_estimate(theta_a_not_b_pair(a.sketch, b.sketch))
                   AS convs_a_only,
               theta_jaccard_estimate(a.sketch, b.sketch) AS jaccard
        FROM theta_by_tool a JOIN theta_by_tool b ON a.tool < b.tool
        ORDER BY convs_both DESC LIMIT 5""").collect()
    for r in pairs:
        print(f"{r['tool_a']} & {r['tool_b']}: ~{r['convs_both']:.0f} convs "
              f"use both, ~{r['convs_a_only']:.0f} only {r['tool_a']}, "
              f"jaccard {r['jaccard']:.3f}")

    # -- 2c. distribution drift between the first and last day -----------
    drift = spark.sql("""
        SELECT kll_ks_distance(f.sketch, l.sketch) AS ks
        FROM (SELECT sketch FROM kll_daily ORDER BY day ASC  LIMIT 1) f,
             (SELECT sketch FROM kll_daily ORDER BY day DESC LIMIT 1) l
        """).first()
    print(f"turn-length KS drift first->last day: {drift['ks']:.4f}")

    # -- 2d. K example conv_ids per tool from the sample blobs -----------
    from bloomfilter_spark.jvm_build import sample_grouped_build_jvm
    sample_grouped_build_jvm(
        t.where(F.col("tool").isNotNull()), ["tool"], ["conv_id"],
        "conv_id", k=16).createOrReplaceTempView("sample_by_tool")
    examples = spark.sql("""
        SELECT tool,
               slice(transform(sample_values(sketch), x -> string(x)),
                     1, 3) AS example_convs,
               sketch_estimate(sketch) AS approx_convs
        FROM sample_by_tool ORDER BY tool LIMIT 3""").collect()
    for r in examples:
        print(f"{r['tool']}: e.g. {r['example_convs']} "
              f"of ~{r['approx_convs']:.0f} convs")

    # -- 2d'. K example conv_ids per tool WEIGHTED by turn length --------
    # (ppswor: long conversations surface first — sample where the token
    # mass is, with the total mass estimate riding along)
    from bloomfilter_spark.jvm_build import wsample_grouped_build_jvm
    wsample_grouped_build_jvm(
        t.where(F.col("tool").isNotNull())
         .withColumn("wt", F.length("text").cast("double") + 1.0),
        ["tool"], ["conv_id"], "wt", "conv_id",
        k=16).createOrReplaceTempView("wsample_by_tool")
    wexamples = spark.sql("""
        SELECT tool,
               slice(transform(sample_values(sketch), x -> string(x)),
                     1, 3) AS heavy_convs,
               slice(sample_weights(sketch), 1, 3) AS their_weights,
               sketch_estimate(sketch) AS approx_total_len
        FROM wsample_by_tool ORDER BY tool LIMIT 3""").collect()
    for r in wexamples:
        print(f"{r['tool']}: length-weighted e.g. {r['heavy_convs']} "
              f"(w {[round(x, 1) for x in r['their_weights']]}) of "
              f"~{r['approx_total_len']:.0f} total turn chars")

    # -- 2e. geometry migration: fold p=12 daily HLLs to p=10, then merge -
    folded = spark.sql("""
        SELECT sketch_estimate(sketch_merge(sketch_fold(sketch, 10)))
                   AS approx_convs_p10,
               sketch_error_bound(sketch_merge(sketch_fold(sketch, 10)))
                   AS rse_p10
        FROM hll_daily""").first()
    print(f"all days at folded p=10: ~{folded['approx_convs_p10']:.0f} convs "
          f"(±{100 * folded['rse_p10']:.2f}% rse)")

    # -- 2f. audit what the warehouse column actually stores -------------
    desc = json.loads(spark.sql(
        "SELECT sketch_describe(sketch) AS d FROM hll_daily LIMIT 1"
    ).first()["d"])
    print(f"hll_daily blobs: family={desc['family']} p={desc['p']} "
          f"state={desc['state_bytes']}B")

    # -- 2g. per-day snapshot drift audit from IBLT digests ---------------
    # one digest row per day at ingest time; "which conv_ids changed
    # between any two days?" is then one SQL projection — no rescan, no
    # corpus join. Here: day 1 vs day 1 with three conv_ids withheld.
    from bloomfilter_spark.jvm_build import iblt_grouped_build_jvm
    d0 = t.select(F.lit("full").alias("snap"), "conv_id")
    victims = [r["conv_id"] for r in
               t.select("conv_id").distinct().orderBy("conv_id")
                .limit(3).collect()]
    d1 = (t.where(~F.col("conv_id").isin(victims))
           .select(F.lit("drifted").alias("snap"), "conv_id"))
    iblt_grouped_build_jvm(d0.unionByName(d1), ["snap"], ["conv_id"],
                           max_diff=256) \
        .createOrReplaceTempView("snap_digests")
    drift_row = json.loads(spark.sql("""
        SELECT iblt_decode_json(iblt_subtract_pair(a.sketch, b.sketch))
                   AS diff
        FROM snap_digests a JOIN snap_digests b
        ON a.snap = 'full' AND b.snap = 'drifted'""").first()["diff"])
    print(f"snapshot drift: {len(drift_row['pos'])} conv_ids removed, "
          f"{len(drift_row['neg'])} added "
          f"(complete={drift_row['complete']})")

    # -- 2h. per-tool p99 with a relative-VALUE guarantee (DDSketch) ------
    # the SLO form of the quantile question: the reported p99 is within
    # sketch_error_bound (= alpha, value units) of the exact rank item,
    # deterministically — KLL's bound is in RANK units, t-digest has no
    # hard bound. Build is pure codegen (groupBy(log-bucket).count()).
    from bloomfilter_spark.jvm_build import ddsketch_grouped_build_jvm
    ddsketch_grouped_build_jvm(
        t.where(F.col("tool").isNotNull()), ["tool"], "turn_len",
        alpha=0.01).createOrReplaceTempView("dd_by_tool")
    slo = spark.sql("""
        SELECT tool,
               sketch_quantile(sketch, 0.99) AS p99_len,
               sketch_error_bound(sketch)    AS rel_value_err,
               sketch_rank(sketch, 100.0)    AS frac_under_100
        FROM dd_by_tool ORDER BY p99_len DESC LIMIT 3""").collect()
    for r in slo:
        print(f"{r['tool']}: p99 turn_len ~{r['p99_len']:.0f} "
              f"(±{100 * r['rel_value_err']:.0f}% of the exact item, "
              f"guaranteed), {100 * r['frac_under_100']:.1f}% under 100")

    # sanity: the SQL answers are coherent (demo doubles as a smoke test)
    assert weekly and all(r["approx_convs"] > 0 for r in weekly)
    assert all(0 < r["rel_std_error"] < 0.05 for r in weekly)
    assert pairs and any(r["convs_both"] > 0 for r in pairs)
    assert all(0.0 <= r["jaccard"] <= 1.0 for r in pairs)
    assert 0.0 <= drift["ks"] <= 1.0
    assert examples and all(r["example_convs"] for r in examples)
    assert wexamples and all(r["heavy_convs"] and
                             all(w > 0 for w in r["their_weights"])
                             and r["approx_total_len"] > 0
                             for r in wexamples)
    total = spark.sql("""
        SELECT sketch_estimate(sketch_merge(sketch)) AS e FROM hll_daily
        """).first()["e"]
    # the fold is exact, so the folded estimate is the p=10 estimate of
    # the same registers — within the coarser rse of the full-p answer
    assert abs(folded["approx_convs_p10"] - total) <= \
        5 * folded["rse_p10"] * max(total, 1.0)
    assert desc["family"] == "HyperLogLog"
    assert drift_row["complete"] is True
    assert len(drift_row["pos"]) == 3 and drift_row["neg"] == []
    assert drift_row["net"] == 3.0
    assert slo and all(r["rel_value_err"] == 0.01 for r in slo)
    assert all(0 < r["frac_under_100"] <= 1 for r in slo)
    assert all(r["p99_len"] > 0 for r in slo)
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
