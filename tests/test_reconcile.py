"""End-to-end snapshot reconciliation (operators/reconcile.py): two
transcript-shaped corpora, one-scan digests, subtract+peel, broadcast
materialization of exactly the differing rows."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.operators.reconcile import (reconcile,
                                                   reconcile_digests)


@pytest.fixture(scope="module")
def snapshots(spark):
    """Two snapshots of a transcript corpus: B dropped 12 conv_ids of A
    and gained 7 new ones (an ingest-drift scenario)."""
    from bloomfilter_spark.sources.transcripts import load_transcripts
    t = load_transcripts(spark, 40_000).cache()
    convs = [r["conv_id"] for r in
             t.select("conv_id").distinct().orderBy("conv_id").collect()]
    dropped = convs[:12]
    extra = t.where(F.col("conv_id").isin(convs[-7:])) \
             .withColumn("conv_id", F.concat(F.lit("new-"), F.col("conv_id")))
    left = t
    right = t.where(~F.col("conv_id").isin(dropped)).unionByName(extra)
    return left.cache(), right.cache(), set(dropped), 7


def test_reconcile_exact_rows_and_hashes(spark, snapshots):
    left, right, dropped, n_new = snapshots
    res = reconcile(left, right, ["conv_id"], max_diff=200)
    assert res.complete
    assert res.net == len(dropped) - n_new
    only_l = {r["conv_id"] for r in
              res.only_in_left.select("conv_id").distinct().collect()}
    only_r = {r["conv_id"] for r in
              res.only_in_right.select("conv_id").distinct().collect()}
    assert only_l == dropped
    assert len(only_r) == n_new and all(c.startswith("new-") for c in only_r)
    # row materialization returns ALL rows of the differing keys
    exp_rows = left.where(F.col("conv_id").isin(list(dropped))).count()
    assert res.only_in_left.count() == exp_rows
    assert res.left_only_hashes.size == len(dropped)
    assert res.right_only_hashes.size == n_new


def test_reconcile_identical_corpora_is_empty(spark, snapshots):
    left, _, _, _ = snapshots
    res = reconcile(left, left.repartition(9), ["conv_id"], max_diff=64)
    assert res.complete and res.net == 0
    assert res.left_only_hashes.size == res.right_only_hashes.size == 0
    assert res.only_in_left.count() == 0
    assert res.only_in_right.count() == 0


def test_reconcile_digests_from_persisted_blobs(spark, snapshots, tmp_path):
    """The 'no prior context' property: digests built (and warehoused) at
    snapshot time reconcile LATER without rescanning — and match the
    direct reconcile bit-for-bit."""
    from bloomfilter_spark.jvm_build import iblt_build_jvm
    from bloomfilter_spark.sketches import IBLT

    left, right, dropped, n_new = snapshots
    dl = iblt_build_jvm(left, ["conv_id"], max_diff=200)
    dr = iblt_build_jvm(right, ["conv_id"], max_diff=200)
    # wire roundtrip = what a warehouse row would hand back
    dl = IBLT.from_bytes(dl.to_bytes())
    dr = IBLT.from_bytes(dr.to_bytes())
    res = reconcile_digests(dl, dr, left=left, right=right,
                            cols=["conv_id"])
    direct = reconcile(left, right, ["conv_id"], max_diff=200)
    assert res.complete
    assert np.array_equal(res.left_only_hashes, direct.left_only_hashes)
    assert np.array_equal(res.right_only_hashes, direct.right_only_hashes)


def test_reconcile_incomplete_detected(spark, snapshots):
    """Undersized digests must fail LOUDLY (or hand back the verified
    subset on request) — never a silently-short listing."""
    left, right, dropped, n_new = snapshots
    # empty right -> the difference is EVERY conv_id, far beyond the
    # floor-geometry capacity (~78 keys at max_diff=1)
    empty = left.limit(0)
    n_convs = left.select("conv_id").distinct().count()
    assert n_convs > 200
    with pytest.raises(ValueError, match="decode incomplete"):
        reconcile(left, empty, ["conv_id"], max_diff=1, num_hashes=3)
    res = reconcile(left, empty, ["conv_id"], max_diff=1, num_hashes=3,
                    on_incomplete="partial")
    assert not res.complete
    # whatever was listed is genuinely in the difference (all of left)
    all_convs = {r["conv_id"] for r in
                 left.select("conv_id").distinct().collect()}
    only_l = {r["conv_id"] for r in
              res.only_in_left.select("conv_id").distinct().collect()}
    assert only_l <= all_convs and len(only_l) < n_convs
    assert res.only_in_right.count() == 0


def test_reconcile_plan_has_broadcast_probe(spark, snapshots):
    """The materialization join must be a BroadcastHashJoin with the
    recovered-hash side as build — the corpus never shuffles."""
    left, right, _, _ = snapshots
    res = reconcile(left, right, ["conv_id"], max_diff=200)
    plan = res.only_in_left._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_reconcile_composite_key(spark, snapshots):
    """Multi-column keys hash through the same variadic hash_col as every
    builder: reconcile on (conv_id, turn_idx) finds a single edited
    turn."""
    left, _, _, _ = snapshots
    victim = left.select("conv_id", "turn_idx").first()
    right = left.where(~((F.col("conv_id") == victim["conv_id"])
                         & (F.col("turn_idx") == victim["turn_idx"])))
    res = reconcile(left, right, ["conv_id", "turn_idx"], max_diff=32)
    assert res.complete
    assert res.only_in_right.count() == 0
    rows = res.only_in_left.collect()
    assert len(rows) == 1
    assert (rows[0]["conv_id"], rows[0]["turn_idx"]) \
        == (victim["conv_id"], victim["turn_idx"])
