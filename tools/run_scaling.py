"""Two-cluster-size scaling experiment (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors).

Sandbox proxy (no real cluster, per task instructions): the same sketch
build over the same input at local[8] vs local[32]. Each run is a separate
subprocess (fresh JVM) so the two measurements share nothing. Writes
BENCH_SCALING.json and prints a markdown row for BASELINE.md.

Usage: python tools/run_scaling.py [n_turns]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from pyspark.sql import functions as F
from bloomfilter_spark.agg import build_sketch
from bloomfilter_spark.config import get_spark
from bloomfilter_spark.sizing import suggest_sizing
from bloomfilter_spark.sketches import BloomFilter, HyperLogLog
from bloomfilter_spark.sources.transcripts import load_transcripts

cores = {cores}
n_turns = {n_turns}
spark = get_spark("scaling", cores=cores, shuffle_partitions=cores)
tr = load_transcripts(spark, n_turns, partitions=64).persist()
n = tr.count()
# warm up worker pool so we measure steady-state compute
build_sketch(spark.range(cores * 64).repartition(cores), ["id"],
             lambda: BloomFilter(1 << 10, 3))
m, k = suggest_sizing(n, 0.01)
reps = {reps}
t0 = time.time()
for _ in range(reps):
    bf = build_sketch(tr, ["conv_id", "text"], lambda: BloomFilter(m, k))
    hll = build_sketch(tr, ["conv_id"], lambda: HyperLogLog(14))
dt = (time.time() - t0) / reps
spark.stop()
print(json.dumps({{"cores": cores, "n_turns": n, "sec_per_pass": dt,
                   "turns_per_sec": 2 * n / dt}}))
"""


def run(cores: int, n_turns: int, reps: int = 3) -> dict:
    code = RUNNER.format(root=ROOT, cores=cores, n_turns=n_turns, reps=reps)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    r8 = run(8, n_turns)
    r32 = run(32, n_turns)
    eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / 4.0
    result = {"n": r8, "four_n": r32, "scaling_efficiency": round(eff, 3),
              "passes_north_rule": eff >= 0.8}
    with open(os.path.join(ROOT, "BENCH_SCALING.json"), "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))
    print(f"\n| scaling | local[8]: {r8['turns_per_sec']:,.0f} turns/s | "
          f"local[32]: {r32['turns_per_sec']:,.0f} turns/s | "
          f"efficiency {eff:.2f} |")


if __name__ == "__main__":
    main()
