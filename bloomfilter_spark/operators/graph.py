"""Distributed connected components + near-duplicate cluster dedup.

The missing last step of every near-dup pipeline: MinHash/SimHash/embedding
LSH produce candidate PAIRS (dedup.py, similarity.py), but duplicates come
in transitive chains (A~B, B~C). Grouping requires connected components
over the pair graph, then keeping one canonical document per component.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce and
Beyond", SoCC 2014). Each round is two rounds of pure DataFrame ops
(groupBy-min + join, both map-side combinable / AQE-skew-handled), and the
edge set converges to a star forest — every node pointing at its
component's minimum id — in O(log^2 n) rounds (O(log n) observed). This is
the standard web-scale formulation: no driver-side graph state, shuffle
keys are node ids only, and per-round lineage is truncated with
localCheckpoint so plans stay O(1) deep regardless of iteration count.

Reference parity note: the reference library (bos/bloomfilter) has no graph
ops; this extends the training-pipeline addendum (SURVEY.md training-data
section) the same way dedup.py's MinHash does.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected canonical form: non-null, no self-loops, (hi, lo) pairs,
    distinct. Column names: u > v elementwise."""
    e = edges.where(F.col("u").isNotNull() & F.col("v").isNotNull()
                    & (F.col("u") != F.col("v")))
    return (e.select(F.greatest("u", "v").alias("u"),
                     F.least("u", "v").alias("v"))
             .distinct())


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    nbrs = e.unionByName(e.select(F.col("v").alias("u"),
                                  F.col("u").alias("v")))
    mins = (nbrs.groupBy("u").agg(F.min("v").alias("mv"))
                .select("u", F.least("u", "mv").alias("m")))
    return (nbrs.join(mins, "u")
                .where(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges (hi → lo); connect every lo-neighbor of u (and u
    itself) to the minimum of that set."""
    e2 = _canonical(e)  # u > v
    mins = e2.groupBy("u").agg(F.min("v").alias("m"))  # m = min(N≤ ∪ {u})
    nodes = e2.select("u", "v").unionByName(
        e2.select("u", F.col("u").alias("v")).distinct())
    return (nodes.join(mins, "u")
                 .where(F.col("v") != F.col("m"))
                 .select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .distinct())


def _is_star_forest(e: DataFrame) -> bool:
    """Exact fixpoint test: a canonical edge set is a star forest iff
    (a) no node appears both as a member (u) and as a root (v) — members
    all point directly at their star's root, which (u > v canonical form
    + connectivity preservation, Kiveris et al. §3) is the component
    minimum — AND (b) every member points at exactly ONE root. Condition
    (b) is load-bearing: an edge set like {(5,1),(5,2)} satisfies (a)
    alone, so the weaker test declared it converged and node 5 was
    emitted in TWO components (found and regression-tested this round);
    at the true fixpoint the edge set is the distinct (node, component
    minimum) relation, so both conditions hold. Detecting the fixpoint
    this way ends the loop one full large-star/small-star round earlier
    than comparing successive edge sets, and an input that is already a
    star forest — the common near-dup case of disjoint A~B pairs —
    converges with ZERO rounds. Both conditions run in ONE job and ONE
    map-side-combined aggregation: endpoints are exploded with role
    counters, grouped by node, and a node violates iff it is a member
    more than once or both a member and a root (measured cheaper than
    the semi-join + aggregate pair it replaces)."""
    roles = (e.select(F.col("u").alias("n"), F.lit(1).alias("cu"),
                      F.lit(0).alias("cv"))
              .unionByName(e.select(F.col("v").alias("n"),
                                    F.lit(0).alias("cu"),
                                    F.lit(1).alias("cv"))))
    viol = (roles.groupBy("n")
                 .agg(F.sum("cu").alias("u"), F.sum("cv").alias("v"))
                 .where((F.col("u") > 1)
                        | ((F.col("u") > 0) & (F.col("v") > 0))))
    return viol.isEmpty()


def _cc_round(e: DataFrame) -> DataFrame:
    """One large-star + small-star round over a CANONICAL (u > v,
    distinct, non-self-loop) edge set; the output is again canonical —
    algebraically identical to ``_canonical(_small_star(_large_star(e)))``
    with the redundant work stripped (measured: the fused round plans 5
    exchanges instead of 9):

    * large star joins only the swapped half of the neighbor list — the
      rows with v > u are exactly ``swap(e)`` under canonical form, so
      the probe side is |e| rows, not 2|e| (the groupBy-min still reads
      both directions);
    * large-star output is already canonical (emitted (v, m) has
      v > u >= m), so small star's leading ``_canonical`` — a full
      extra exchange — is dropped, and its own dedup exchange is
      skipped too (see the inline note at ``ls``);
    * small star's self-pair rows (u -> m) are emitted straight from the
      groupBy-min result (one row per u) instead of unioning a distinct
      self-pair table into the join input (another exchange dropped);
    * small-star output is already canonical (every emission (x, m) has
      x > m), so the outer ``_canonical`` exchange is dropped too.

    ``_large_star`` / ``_small_star`` keep the literal per-operator
    formulation; equivalence of the fused round is pinned by
    test_graph.py::test_fused_round_matches_reference."""
    swap = e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    nbrs = e.unionByName(swap)
    mins = (nbrs.groupBy("u").agg(F.min("v").alias("mv"))
                .select("u", F.least("u", "mv").alias("m")))
    # no distinct on ls: duplicates are bounded by |e| (one row per swap
    # row), min/groupBy are duplicate-insensitive, and the round's final
    # distinct collapses them — an exchange per round for at best a 2x
    # shrink of the small-star inputs measured net-negative (~0.5-1 s on
    # the 1M-edge bench loop)
    ls = (swap.join(mins, "u")
              .select(F.col("v").alias("u"), F.col("m").alias("v")))
    mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
    pairs = (ls.join(mins2, "u")
               .where(F.col("v") != F.col("m"))
               .select(F.col("v").alias("u"), F.col("m").alias("v")))
    selfp = (mins2.where(F.col("u") != F.col("m"))
                  .select("u", F.col("m").alias("v")))
    return pairs.unionByName(selfp).distinct()


def _cc_state_path(checkpoint_dir: str, rnd: int) -> str:
    return os.path.join(checkpoint_dir, f"round_{rnd:04d}")


def _cc_checkpoint(e: DataFrame, checkpoint_dir: str, rnd: int,
                   input_edges: int, keep: int) -> None:
    """Persist the post-round edge state + a lineage record. The lineage
    line is appended only after the parquet write succeeds, so a crash
    between the two loses at most one round (the state dir is rewritten
    with mode=overwrite on the retried round). After a successful write,
    complete state dirs older than the newest ``keep`` are pruned —
    resume only ever uses the newest complete one, and without pruning a
    50-round run retains 50 copies of the edge set on disk. Lineage
    lines are kept for all rounds (the run's audit trail); `_cc_resume`
    already skips entries whose state dir is gone."""
    path = _cc_state_path(checkpoint_dir, rnd)
    e.write.mode("overwrite").parquet(path)
    n = e.count()
    os.makedirs(checkpoint_dir, exist_ok=True)
    with open(os.path.join(checkpoint_dir, "lineage.jsonl"), "a") as fh:
        fh.write(json.dumps({"round": rnd, "edges": n,
                             "input_edges": input_edges,
                             "ts": time.time()}) + "\n")
    rounds = []
    for name in os.listdir(checkpoint_dir):
        if name.startswith("round_"):
            try:
                rounds.append(int(name[len("round_"):]))
            except ValueError:
                continue
    complete = [r for r in sorted(rounds) if os.path.exists(
        os.path.join(_cc_state_path(checkpoint_dir, r), "_SUCCESS"))]
    keep_set = set(complete[-keep:])
    for old in sorted(rounds):
        # prune complete dirs past the newest `keep` AND incomplete
        # crash leftovers older than the round just written (rnd is
        # always the newest complete one) — an un-pruned torn dir would
        # otherwise leak a near-complete edge-set copy forever
        if old in keep_set or old >= complete[-1]:
            continue
        shutil.rmtree(_cc_state_path(checkpoint_dir, old))


def _cc_resume(spark, checkpoint_dir: str, input_edges: int):
    """(next_round, state DataFrame) from the newest complete checkpoint,
    or None when the directory holds nothing usable."""
    lineage_path = os.path.join(checkpoint_dir, "lineage.jsonl")
    if not os.path.exists(lineage_path):
        return None
    with open(lineage_path) as fh:
        entries = [json.loads(line) for line in fh if line.strip()]
    for ent in reversed(entries):
        path = _cc_state_path(checkpoint_dir, ent["round"])
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            if ent["input_edges"] != input_edges:
                raise ValueError(
                    f"checkpoint at {checkpoint_dir} was built from "
                    f"{ent['input_edges']} canonical edges; this input has "
                    f"{input_edges} — refusing to resume a different graph")
            return ent["round"] + 1, spark.read.parquet(path)
    return None


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", *, max_iter: int = 50,
                         checkpoint_dir: str | None = None,
                         checkpoint_every: int = 1,
                         keep_checkpoints: int = 2,
                         _probe=None) -> DataFrame:
    """Connected components of the undirected graph given as an edge list.

    Returns DataFrame[node, component] for every node incident to at least
    one (non-self-loop) edge, where ``component`` is the minimum node id of
    the node's component. Any orderable id type works (long, string, ...).
    Isolated nodes never appear in an edge list — callers keep them by
    left-joining (see `dedup_near_duplicates`).

    Scale: per round two shuffles keyed by node id; the groupBy-min is
    map-side combined, the join's hot keys (high-degree nodes) are AQE
    skew-splittable, and large-star's `v > u` emission provably shrinks
    high-degree stars. State lives entirely in the edge DataFrame — no
    driver materialization at any point.

    Round cost (measured, interleaved min-of-5 on the bench graph):
    convergence is detected by the `_is_star_forest` fixpoint test, one
    round earlier than successive-edge-set comparison, and an input that
    is already a star forest (disjoint near-dup pairs) runs zero rounds.
    Per-round shuffle-partition scaling was evaluated and left out: AQE
    partition coalescing (on via config.get_spark) already shrinks the
    late rounds' tiny shuffles, so a manual per-round conf override adds
    session-global mutation for no measured gain.

    ``checkpoint_dir``: opt-in resumability (north rule: resume from
    checkpoint without re-scanning completed work, same contract as
    `checkpoint.checkpointed_build`). Every ``checkpoint_every`` rounds the
    post-round edge state is written to ``<dir>/round_NNNN`` parquet and a
    lineage record (round, edge count, input fingerprint, timestamp) is
    appended to ``<dir>/lineage.jsonl`` — the same driver-visible-path
    convention as checkpoint.py. A re-run with the same dir restarts from
    the newest complete round (a run that had converged restores the star
    forest and executes ZERO further rounds); an input whose canonical edge
    count differs raises rather than silently mixing graphs. Cost when
    enabled: one parquet write + one count per checkpointed round.
    ``keep_checkpoints`` (default 2: newest + one fallback) bounds disk —
    resume only ever reads the newest complete state, so older round
    dirs are pruned after each successful write instead of accumulating
    one edge-set copy per round; lineage lines are kept for every round.

    ``_probe``: test hook, called with the round number each iteration.
    """
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    if keep_checkpoints < 1:
        raise ValueError("keep_checkpoints must be >= 1")
    spark = edges.sparkSession
    target_bytes = int(os.environ.get("SPARK_GRAFT_CC_PARTITION_BYTES",
                                      str(2 << 20)))
    sp_cap = 4 * spark.sparkContext.defaultParallelism
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    # the INITIAL canonicalize-distinct is itself an exchange over the
    # edge set: size it from the optimizer's free bytes estimate (exact
    # partitioning is re-derived from the measured edge count right
    # after; a bad estimate only mis-sizes this one exchange)
    try:
        est_bytes = int(edges._jdf.queryExecution().analyzed()
                        .stats().sizeInBytes())
    except Exception:  # noqa: BLE001 - py4j/plan-stats unavailable
        est_bytes = 0
    if est_bytes > 0:
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(min(max(est_bytes // target_bytes, 1), sp_cap)))
    try:
        e = _canonical(edges.select(F.col(src).alias("u"),
                                    F.col(dst).alias("v")))
        start_round = 0
        if checkpoint_dir is not None:
            input_edges = e.count()
            resumed = _cc_resume(spark, checkpoint_dir, input_edges)
            if resumed is not None:
                start_round, e = resumed
            e = e.localCheckpoint(eager=True)
        else:
            e = e.localCheckpoint(eager=True)
            input_edges = e.count()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    # Scale-adaptive round partitioning (guide §2.2): each round is 6
    # exchanges over the CURRENT edge set, which at bench/local sizes is a
    # few MB — pinning them to the session's global shuffle partitioning
    # spends more wall-clock on task scheduling than on the data (measured:
    # 2.19 s -> 1.13 s per round at 1M edges, 32 -> 8 reduce tasks), while
    # AQE's coalescing with parallelismFirst=true never shrinks below the
    # core count (and with parallelismFirst=false it collapses these
    # latency-sensitive iterative shuffles to ONE task — measured 2x
    # slower). So the loop derives its partition count from the input
    # size — ~2 MB of edge rows per reduce task, floored at 1, capped at
    # 4x the cluster's core count so a 10^10-edge graph still fans out
    # (160 GB / cap(4x cores) stays ~40 MB/task at 1000 cores) — and
    # scopes it to this loop via session conf (restored in finally; the
    # same scoped-conf pattern as jvm_build's WGL window).
    n_parts = min(max((input_edges * 32) // target_bytes, 1), sp_cap)
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        if not _is_star_forest(e):  # already-forest input: zero rounds
            # Count-gated convergence detection: a fixpoint implies a
            # stable edge count, so the star-forest check (its own job,
            # ~1/3 of a round's cost) runs only when the count repeats —
            # the count itself is the job that materializes the round's
            # lazy localCheckpoint, so a round normally costs ONE job.
            # If the forest appears in a count-changing round, the next
            # round maps it to itself (fixpoint), the count repeats, and
            # the check fires one round late — bounded overshoot, same
            # labels either way.
            prev_n = input_edges
            for it in range(start_round, max_iter):
                if _probe is not None:
                    _probe(it)
                e = _cc_round(e).localCheckpoint(eager=False)
                n_e = e.count()  # materializes the checkpoint
                if checkpoint_dir is not None and \
                        (it + 1) % checkpoint_every == 0:
                    _cc_checkpoint(e, checkpoint_dir, it, input_edges,
                                   keep_checkpoints)
                if n_e == prev_n and _is_star_forest(e):
                    break
                prev_n = n_e
            else:
                raise RuntimeError(
                    f"connected_components did not converge in {max_iter} "
                    "rounds (needs O(log^2 n)); raise max_iter")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    # Converged star forest: edges are (member, root), member > root; a
    # root labels itself. The node set is INVARIANT through star rounds
    # (every node incident to a real edge either emits or is emitted to
    # in both stars — see test_fused_round_matches_reference's shapes +
    # test_cc_partition_invariance for the self-loop-only exclusion), so
    # members ∪ roots IS the full incident-node set: the previous
    # endpoints-distinct + semi-join + left-join re-derivation of the
    # same set cost 3 extra exchanges over the raw input.
    members = e.select(F.col("u").alias("node"),
                       F.col("v").alias("component"))
    roots = (e.select("v").distinct()
              .select(F.col("v").alias("node"), F.col("v").alias("component")))
    return members.unionByName(roots)


def dedup_near_duplicates(df: DataFrame, pairs: DataFrame, id_col: str,
                          src: str = "id_a", dst: str = "id_b",
                          *, max_iter: int = 50,
                          checkpoint_dir: str | None = None) -> DataFrame:
    """Keep one canonical document per near-duplicate cluster.

    ``pairs`` is any candidate/verified pair list (e.g.
    `minhash_lsh_candidates`, `embedding_near_dups`). Clusters are the
    connected components of the pair graph; the kept representative is the
    minimum ``id_col`` in each cluster. Documents in no pair are untouched.
    The drop list is one row per non-canonical clustered doc — tiny
    relative to the corpus — so the anti-join broadcasts under AQE.
    ``checkpoint_dir`` flows to `connected_components` — a restarted dedup
    job resumes the CC rounds instead of re-running them.
    """
    cc = connected_components(pairs, src, dst, max_iter=max_iter,
                              checkpoint_dir=checkpoint_dir)
    drop = (cc.where(F.col("node") != F.col("component"))
              .select(F.col("node").alias(id_col)))
    return df.join(drop, id_col, "left_anti")
