"""Two-cluster-size scaling experiment (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors).

Sandbox proxy (no real cluster, per task instructions): the same job over
the same input at local[8] vs local[32], each in a fresh JVM subprocess.

The measured job is the engine's designated at-scale build: the *sharded*
bloom (plan_bloom's beyond-broadcast path — groupBy(shard, salt) partials,
per-shard merge). The broadcast-path build is deliberately not the scaling
workload: its two-level merge cost is O(m * partials) regardless of cores,
which at sandbox sizes (seconds of total work) is a fixed term that
dominates — on a real cluster at hours of work it is noise. The sharded
build's cost is all row-parallel (shuffle + per-group kernels), so the
local[8]->local[32] proxy actually exercises the scaling contract.

Writes BENCH_SCALING.json; prints a markdown row for BASELINE.md.

Usage: python tools/run_scaling.py [n_turns] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from pyspark.sql import functions as F
from bloomfilter_spark.agg import build_sketch
from bloomfilter_spark.config import get_spark
from bloomfilter_spark.operators.sharded import build_sharded_bloom
from bloomfilter_spark.sketches import BloomFilter, HyperLogLog
from bloomfilter_spark.sources.transcripts import load_transcripts

cores = {cores}
n_turns = {n_turns}
reps = {reps}
spark = get_spark("scaling", cores=cores, shuffle_partitions=cores * 4)
tr = load_transcripts(spark, n_turns, partitions=128).persist()
n = tr.count()
# warm up the Python worker pool + JIT
build_sketch(spark.range(cores * 64).repartition(cores), ["id"],
             lambda: BloomFilter(1 << 10, 3))
times = []
for _ in range(reps):
    t0 = time.time()
    shards = build_sharded_bloom(tr, ["conv_id", "text"], capacity=n,
                                 fpr=0.01, n_shards=64, salt=4)
    assert shards.count() == 64
    hll = build_sketch(tr, ["conv_id"], lambda: HyperLogLog(14))
    times.append(time.time() - t0)
spark.stop()
import statistics
sec = statistics.median(times)
print(json.dumps({{"cores": cores, "n_turns": n, "sec_per_pass": sec,
                   "all_times": times, "turns_per_sec": 2 * n / sec}}))
"""


def run(cores: int, n_turns: int, reps: int) -> dict:
    code = RUNNER.format(root=ROOT, cores=cores, n_turns=n_turns, reps=reps)
    env = dict(os.environ, SPARK_DRIVER_MEM="64g")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True, env=env)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    r8 = run(8, n_turns, reps)
    r32 = run(32, n_turns, reps)
    eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / 4.0
    result = {"job": "sharded_bloom(64 shards, salt 4) + hll over transcripts",
              "n": r8, "four_n": r32, "scaling_efficiency": round(eff, 3),
              "passes_north_rule": eff >= 0.8}
    with open(os.path.join(ROOT, "BENCH_SCALING.json"), "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))
    print(f"\n| scaling | local[8]: {r8['turns_per_sec']:,.0f} turns/s | "
          f"local[32]: {r32['turns_per_sec']:,.0f} turns/s | "
          f"efficiency {eff:.2f} |")


if __name__ == "__main__":
    main()
