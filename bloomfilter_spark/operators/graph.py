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
    """Exact fixpoint test: a canonical edge set is a star forest iff no
    node appears both as a member (u) and as a root (v) — members all
    point directly at their star's root, which (u > v canonical form +
    connectivity preservation, Kiveris et al. §3) is the component
    minimum. Detecting the fixpoint THIS way ends the loop one full
    large-star/small-star round earlier than comparing successive edge
    sets (the fixpoint recomputation those need), and an input that is
    already a forest — the common near-dup case of disjoint A~B pairs —
    converges with ZERO rounds. Cost: one self semi-join on the (already
    checkpointed) edge set per round, vs ~4 shuffles for the round it
    replaces."""
    return (e.select("v")
             .join(e.select(F.col("u").alias("v")), "v", "left_semi")
             .isEmpty())


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", *, max_iter: int = 50,
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

    ``_probe``: test hook, called with the round number each iteration.
    """
    e = _canonical(edges.select(F.col(src).alias("u"),
                                F.col(dst).alias("v")))
    e = e.localCheckpoint(eager=True)
    if not _is_star_forest(e):  # already-forest input: zero rounds
        for it in range(max_iter):
            if _probe is not None:
                _probe(it)
            e = _canonical(_small_star(_large_star(e))).localCheckpoint(
                eager=True)
            if _is_star_forest(e):
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "rounds (needs O(log^2 n)); raise max_iter")
    # Converged star forest: edges are (member, root), member > root. A
    # node absent as a member is a component root -> labels itself.
    members = e.select(F.col("u").alias("node"),
                       F.col("v").alias("component"))
    nodes = (edges.select(F.col(src).alias("node"))
                  .unionByName(edges.select(F.col(dst).alias("node")))
                  .where(F.col("node").isNotNull()).distinct())
    # restrict to nodes with a real (non-self-loop) edge
    incident = (members.select("node")
                .unionByName(members.select(F.col("component")
                                            .alias("node"))).distinct())
    return (nodes.join(incident, "node", "left_semi")
                 .join(members, "node", "left")
                 .select("node", F.coalesce("component", "node")
                         .alias("component")))


def dedup_near_duplicates(df: DataFrame, pairs: DataFrame, id_col: str,
                          src: str = "id_a", dst: str = "id_b",
                          *, max_iter: int = 50) -> DataFrame:
    """Keep one canonical document per near-duplicate cluster.

    ``pairs`` is any candidate/verified pair list (e.g.
    `minhash_lsh_candidates`, `embedding_near_dups`). Clusters are the
    connected components of the pair graph; the kept representative is the
    minimum ``id_col`` in each cluster. Documents in no pair are untouched.
    The drop list is one row per non-canonical clustered doc — tiny
    relative to the corpus — so the anti-join broadcasts under AQE.
    """
    cc = connected_components(pairs, src, dst, max_iter=max_iter)
    drop = (cc.where(F.col("node") != F.col("component"))
              .select(F.col("node").alias(id_col)))
    return df.join(drop, id_col, "left_anti")
