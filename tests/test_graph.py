"""Connected components (large-star/small-star) + cluster dedup.

Oracle: an exact in-process union-find over the same edge list — tiny
graphs here, but the operator under test is the distributed formulation.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.operators import (connected_components,
                                         dedup_near_duplicates)


def _union_find_labels(edges):
    """Exact min-id component labels for every node incident to an edge."""
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        for n in (a, b):
            parent.setdefault(n, n)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for n in parent:
        out[n] = find(n)
    # path compression above keeps roots minimal because we always hang
    # the larger root under the smaller one
    return {n: find(n) for n in parent}


def _labels(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_cc_matches_union_find_random_graph(spark):
    rng = np.random.default_rng(42)
    e = rng.integers(0, 400, size=(900, 2))
    edges = [(int(a), int(b)) for a, b in e if a != b]
    df = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    got = _labels(connected_components(df))
    assert got == _union_find_labels(edges)


def test_cc_chain_converges_in_log_rounds(spark):
    """A 256-node path is the diameter worst case; large/small-star still
    converges in O(log n) rounds, not O(n)."""
    edges = [(i, i + 1) for i in range(255)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rounds = []
    got = _labels(connected_components(df, _probe=rounds.append))
    assert got == {i: 0 for i in range(256)}
    assert len(rounds) <= 12


def test_cc_partition_invariance_and_string_ids(spark):
    edges = [("d%03d" % a, "d%03d" % b)
             for a, b in [(1, 2), (2, 3), (9, 1), (5, 6), (7, 7)]]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = _labels(connected_components(df.repartition(1)))
    b = _labels(connected_components(df.repartition(13, "dst")))
    assert a == b
    assert a["d009"] == "d001" and a["d006"] == "d005"
    assert "d007" not in a  # self-loop only -> not incident to a real edge


def test_cc_nulls_and_empty(spark):
    df = spark.createDataFrame([(1, None), (None, 2)], "src long, dst long")
    assert connected_components(df).count() == 0
    empty = spark.createDataFrame([], "src long, dst long")
    out = connected_components(empty)
    assert out.columns == ["node", "component"] and out.count() == 0


def test_cc_hot_hub_star(spark):
    """One node connected to everything (the skew shape LSH produces for a
    boilerplate bucket): converges and labels all to the min."""
    edges = [(0, i) for i in range(1, 500)] + [(499, 500)]
    df = spark.createDataFrame(edges, "src long, dst long").repartition(8)
    got = _labels(connected_components(df))
    assert got == {i: 0 for i in range(501)}


def test_cc_forest_input_zero_rounds(spark):
    """An input that is already a star forest (disjoint pairs — the common
    near-dup shape) must converge with ZERO large/small-star rounds via
    the _is_star_forest fixpoint test, and still label correctly."""
    df = spark.createDataFrame([(i + 1000, i) for i in range(50)],
                               "src long, dst long")
    rounds = []
    got = _labels(connected_components(df, _probe=rounds.append))
    assert rounds == []
    assert got == {**{i: i for i in range(50)},
                   **{i + 1000: i for i in range(50)}}


def test_cc_multi_root_member_not_declared_converged(spark):
    """Regression (r6): {(5,1),(5,2)} satisfies 'no node is both member
    and root' but is NOT a star forest — node 5 points at two roots. The
    weaker fixpoint test declared it converged and emitted node 5 in TWO
    components; the strengthened test must run a round and produce the
    exact single-component labels, one row per node."""
    df = spark.createDataFrame([(5, 1), (5, 2)], "src long, dst long")
    out = connected_components(df)
    assert out.count() == 3  # exactly one row per node
    assert _labels(out) == {1: 1, 2: 1, 5: 1}
    # same shape mid-graph: two disjoint double-root members + noise
    edges = [(9, 3), (9, 4), (30, 10), (30, 20), (40, 41)]
    df2 = spark.createDataFrame(edges, "src long, dst long")
    got = _labels(connected_components(df2))
    assert got == _union_find_labels(edges)


def test_fused_round_matches_reference(spark):
    """_cc_round is the fused form of
    _canonical(_small_star(_large_star(e))); both must produce the same
    edge SET on canonical inputs of every shape (random, chain, star,
    double-root)."""
    import numpy as np
    from bloomfilter_spark.operators.graph import (_canonical, _cc_round,
                                                   _large_star, _small_star)
    rng = np.random.default_rng(7)
    cases = [
        [(int(a), int(b)) for a, b in rng.integers(0, 60, size=(150, 2))],
        [(i, i + 1) for i in range(40)],
        [(0, i) for i in range(1, 30)],
        [(5, 1), (5, 2)],
        [(2, 1)],
    ]
    for edges in cases:
        df = spark.createDataFrame(edges, "u long, v long")
        e = _canonical(df)
        ref = {(r["u"], r["v"]) for r in
               _canonical(_small_star(_large_star(e))).collect()}
        got = {(r["u"], r["v"]) for r in _cc_round(e).collect()}
        assert got == ref, edges


def test_cc_max_iter_raises(spark):
    edges = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_iter=1)


def test_dedup_near_duplicates_transitive_chain(spark, documents):
    """A~B, B~C chain collapses to one kept doc (the min id), D~E to one,
    and unpaired docs are untouched."""
    docs = documents.where(F.col("doc_id") < 50)
    pairs = spark.createDataFrame(
        [(3, 7), (7, 11), (20, 21)], "id_a long, id_b long")
    kept = dedup_near_duplicates(docs, pairs, "doc_id")
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    base = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert ids == base - {7, 11, 21}


def test_dedup_with_minhash_pairs_end_to_end(spark, documents):
    """Real pipeline: inject exact copies, MinHash-LSH candidates, CC
    cluster, keep canonical — every injected copy is dropped, every
    original kept."""
    from bloomfilter_spark.operators import minhash_lsh_dedup
    base = documents.where(F.col("doc_id") < 60).select("doc_id", "text")
    copies = base.where(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text")
    corpus = base.unionByName(copies)
    pairs = minhash_lsh_dedup(corpus, "doc_id", "text", threshold=0.9)
    pairs = pairs.persist()
    kept = dedup_near_duplicates(corpus, pairs, "doc_id")
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert not {i for i in ids if i >= 10000}  # all copies dropped
    # exact expectation: union-find over the same pair list — survivors
    # are the per-cluster minima plus every unpaired doc
    edge_list = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    labels = _union_find_labels(edge_list)
    all_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    expect = {i for i in all_ids if labels.get(i, i) == i}
    assert ids == expect
    # every injected copy must have been caught by LSH and clustered with
    # its original (identical text -> identical signature)
    assert all(labels.get(i + 10000) == labels.get(i, i)
               and (i + 10000) in labels for i in range(20))


# --- checkpoint / resume (north-rule resumability on the iterative op) ----

def test_cc_checkpoint_then_resume_zero_rounds(spark, tmp_path):
    """A completed run leaves a converged star forest in the checkpoint;
    a re-run with the same dir restores it and executes ZERO rounds."""
    edges = [(i, i + 1) for i in range(255)]
    df = spark.createDataFrame(edges, "src long, dst long")
    base = _labels(connected_components(df))
    ck = str(tmp_path / "cc")
    r1 = []
    got1 = _labels(connected_components(df, checkpoint_dir=ck,
                                        _probe=r1.append))
    assert got1 == base and len(r1) >= 2
    r2 = []
    got2 = _labels(connected_components(df, checkpoint_dir=ck,
                                        _probe=r2.append))
    assert got2 == base
    assert r2 == []  # restored state is the fixpoint: loop never entered


def test_cc_resume_after_mid_run_crash(spark, tmp_path):
    """Kill the loop after two completed rounds; the resumed run starts at
    round 2 (not 0) and still produces the exact union-find labels."""
    edges = [(i, i + 1) for i in range(511)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ck = str(tmp_path / "cc")

    class Boom(Exception):
        pass

    def bomb(it):
        if it == 2:
            raise Boom()

    with pytest.raises(Boom):
        connected_components(df, checkpoint_dir=ck, _probe=bomb)
    rounds = []
    got = _labels(connected_components(df, checkpoint_dir=ck,
                                       _probe=rounds.append))
    assert got == _union_find_labels(edges)
    assert rounds[0] == 2  # rounds 0 and 1 were not re-executed


def test_cc_checkpoint_rejects_different_input(spark, tmp_path):
    ck = str(tmp_path / "cc")
    df1 = spark.createDataFrame([(i, i + 1) for i in range(64)],
                                "src long, dst long")
    connected_components(df1, checkpoint_dir=ck)
    df2 = spark.createDataFrame([(i, i + 1) for i in range(100)],
                                "src long, dst long")
    with pytest.raises(ValueError, match="refusing to resume"):
        connected_components(df2, checkpoint_dir=ck)


def test_cc_checkpoint_lineage_and_every(spark, tmp_path):
    """checkpoint_every=2 halves the writes; lineage records are ordered,
    input-stamped, and readable with checkpoint.read_lineage."""
    from bloomfilter_spark.checkpoint import read_lineage
    edges = [(i, i + 1) for i in range(255)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ck = str(tmp_path / "cc")
    rounds = []
    connected_components(df, checkpoint_dir=ck, checkpoint_every=2,
                         _probe=rounds.append)
    lin = read_lineage(ck)
    assert lin  # at least one checkpoint landed
    assert [e["round"] for e in lin] == sorted(e["round"] for e in lin)
    assert all(e["round"] % 2 == 1 for e in lin)  # rounds 1, 3, ...
    n0 = len({tuple(sorted(p)) for p in edges})
    assert all(e["input_edges"] == n0 for e in lin)
    with pytest.raises(ValueError):
        connected_components(df, checkpoint_dir=ck, checkpoint_every=0)


def test_cc_checkpoint_pruning_bounds_disk(spark, tmp_path):
    """keep_checkpoints prunes round dirs past the newest N complete ones
    (a path graph runs O(log n) rounds — without pruning that is one edge
    set copy per round); lineage keeps every round and resume still
    restores from the newest surviving state."""
    import os
    edges = [(i, i + 1) for i in range(511)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ck = str(tmp_path / "cc")
    rounds = []
    base = _labels(connected_components(df, checkpoint_dir=ck,
                                        _probe=rounds.append))
    assert len(rounds) >= 3  # enough rounds for pruning to have fired
    dirs = sorted(d for d in os.listdir(ck) if d.startswith("round_"))
    assert dirs == [f"round_{len(rounds) - 2:04d}",
                    f"round_{len(rounds) - 1:04d}"]  # default keep=2
    from bloomfilter_spark.checkpoint import read_lineage
    assert [e["round"] for e in read_lineage(ck)] == list(range(len(rounds)))
    r2 = []
    got = _labels(connected_components(df, checkpoint_dir=ck,
                                       _probe=r2.append))
    assert got == base and r2 == []  # converged state survived pruning
    with pytest.raises(ValueError, match="keep_checkpoints"):
        connected_components(df, checkpoint_dir=ck, keep_checkpoints=0)


def test_cc_checkpoint_prunes_torn_round_dirs(spark, tmp_path):
    """An incomplete round dir (crashed parquet write, no _SUCCESS) older
    than the newest complete round is pruned like any other leftover —
    it can never be resumed from, so keeping it only leaks disk."""
    import os
    from bloomfilter_spark.operators.graph import (_cc_checkpoint,
                                                   _cc_state_path)
    e = spark.createDataFrame([(2, 1)], "u long, v long")
    ck = str(tmp_path / "ck")
    _cc_checkpoint(e, ck, 0, 1, 2)
    _cc_checkpoint(e, ck, 2, 1, 2)
    os.makedirs(_cc_state_path(ck, 1))  # torn: no _SUCCESS inside
    _cc_checkpoint(e, ck, 5, 1, 2)
    dirs = sorted(d for d in os.listdir(ck) if d.startswith("round_"))
    assert dirs == ["round_0002", "round_0005"]
