"""Two-cluster-size scaling experiment (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors).

Sandbox proxy (no real cluster, per task instructions): the same job over
the same input at local[8] vs local[32], each in a fresh JVM subprocess.

Methodology — each choice exists to make the proxy honest on a shared VM:

* **CPU pinning.** The host has exactly 32 physical cores, so an
  *unpinned* local[8] run lets its 8 task slots borrow the other 24 cores
  for Python workers, JVM GC, shuffle and Arrow serializer threads —
  inflating "N-executor" throughput in a way no real 8-core executor node
  could. Each arm is confined with `taskset -c 0..cores-1`.
* **Identical job shape.** Input is repartitioned to a fixed PARTS
  partitions and shuffle partitioning is fixed at PARTS for both arms
  (partition counts are sized for the large cluster, the production
  norm); only the core count changes. Without this, the parquet read
  splits by read-time parallelism (13 scan tasks at 8 cores vs 32 at 32
  cores observed) and the two arms run different jobs.
* **Full-job warm-up pass.** The first pass pays a Python-worker
  cold-start stampede (tens of seconds for 32 workers), JVM JIT, and
  cache materialization; it is run once untimed.
* **Interleaved arms + min-of-reps.** This sandbox is a VM with bursty
  steal time (identical passes observed at 1.1s and 15s minutes apart).
  Arms alternate N, 4N, N, 4N so bursts hit both, and each arm reports
  the min over all its reps — the steady-state throughput estimate least
  contaminated by neighbor noise.

The measured job is the engine's designated at-scale build: the *sharded*
bloom (plan_bloom's beyond-broadcast path — groupBy(shard, salt) partials,
per-shard merge) plus the broadcast-size HLL build. The sharded build's
cost is all row-parallel (shuffle + per-group kernels), so the
local[8]->local[32] proxy actually exercises the scaling contract.

Writes BENCH_SCALING.json; prints a markdown row for BASELINE.md.

Usage: python tools/run_scaling.py [n_turns] [reps_per_arm_instance]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# partition count for input cache and shuffles, both arms (== 4N cores)
PARTS = 32

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from pyspark.sql import functions as F
from bloomfilter_spark.agg import build_sketch
from bloomfilter_spark.config import get_spark
from bloomfilter_spark.operators.sharded import build_sharded_bloom
from bloomfilter_spark.sketches import HyperLogLog
from bloomfilter_spark.sources.transcripts import load_transcripts

cores = {cores}
n_turns = {n_turns}
reps = {reps}
parts = {parts}
spark = get_spark("scaling", cores=cores, shuffle_partitions=parts)
tr = load_transcripts(spark, n_turns, partitions=parts).repartition(parts).persist()
n = tr.count()

def job():
    shards = build_sharded_bloom(tr, ["conv_id", "text"], capacity=n,
                                 fpr=0.01, n_shards=64, salt=4)
    assert shards.count() == 64
    return build_sketch(tr, ["conv_id"], lambda: HyperLogLog(14))

hll = job()  # full warm-up pass, untimed
times = []
for _ in range(reps):
    t0 = time.time()
    hll = job()
    times.append(time.time() - t0)
spark.stop()
print(json.dumps({{"cores": cores, "all_times": times}}))
"""


def run_arm(cores: int, n_turns: int, reps: int) -> list[float]:
    code = RUNNER.format(root=ROOT, cores=cores, n_turns=n_turns, reps=reps,
                         parts=PARTS)
    env = dict(os.environ, SPARK_DRIVER_MEM="48g")
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, env=env)
    return json.loads(out.stdout.strip().splitlines()[-1])["all_times"]


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    times: dict[int, list[float]] = {8: [], 32: []}
    for _ in range(2):  # interleave arms: 8, 32, 8, 32
        for cores in (8, 32):
            times[cores].extend(run_arm(cores, n_turns, reps))
    arms = {}
    for cores in (8, 32):
        sec = min(times[cores])
        arms[cores] = {"cores": cores, "n_turns": n_turns, "sec_per_pass": sec,
                       "all_times": times[cores],
                       "turns_per_sec": 2 * n_turns / sec}
    eff = (arms[32]["turns_per_sec"] / arms[8]["turns_per_sec"]) / 4.0
    result = {"job": "sharded_bloom(64 shards, salt 4) + hll over transcripts",
              "methodology": "pinned cores, fixed 32-partition job shape, "
                             "interleaved arms, min over reps (bursty-steal VM)",
              "n": arms[8], "four_n": arms[32],
              "scaling_efficiency": round(eff, 3),
              "passes_north_rule": eff >= 0.8}
    with open(os.path.join(ROOT, "BENCH_SCALING.json"), "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))
    print(f"\n| scaling | local[8]: {arms[8]['turns_per_sec']:,.0f} turns/s | "
          f"local[32]: {arms[32]['turns_per_sec']:,.0f} turns/s | "
          f"efficiency {eff:.2f} |")


if __name__ == "__main__":
    main()
