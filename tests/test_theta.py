"""Theta/KMV sketch: canonical-state merge algebra, estimator bounds
(union / intersection / a-not-b per Beyer et al. / the theta framework,
see sketches/theta.py module doc), serialization, and JVM-build parity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.agg import build_sketch, grouped_sketch_df
from bloomfilter_spark.jvm_build import (theta_build_jvm,
                                         theta_grouped_estimate_jvm)
from bloomfilter_spark.sketches import (ThetaSketch, theta_a_not_b,
                                        theta_intersect)
from bloomfilter_spark.util import U64

RNG = np.random.default_rng(42)


def _hashes(n: int, offset: int = 0) -> np.ndarray:
    """n distinct pseudo-uniform uint64 'hashes' (disjoint per offset)."""
    base = (np.arange(n, dtype=np.uint64) + np.uint64(offset))
    # splitmix-ish scramble, bijective on uint64 so distinctness holds
    z = base * np.uint64(0x9E3779B97F4A7C15)
    z ^= z >> np.uint64(31)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    return z.astype(U64)


def test_theta_exact_mode_below_k():
    sk = ThetaSketch(256)
    h = _hashes(200)
    sk.update(h)
    sk.update(h[:50])  # duplicates: no effect
    assert sk.estimate() == 200.0


def test_theta_estimate_bound():
    k = 1024
    n = 100_000
    sk = ThetaSketch(k)
    sk.update(_hashes(n))
    rel = abs(sk.estimate() - n) / n
    assert rel <= 4.0 / np.sqrt(k - 2), rel


def test_theta_state_is_order_and_batch_invariant():
    """Eager trimming makes the state a pure function of the hash SET
    (theta.py module doc): any chunking/order gives identical bytes."""
    h = _hashes(5000)
    a = ThetaSketch(64); a.update(h)
    b = ThetaSketch(64)
    for chunk in np.array_split(h[::-1], 7):
        b.update(chunk)
    assert a.to_bytes() == b.to_bytes()


def test_theta_merge_algebra_byte_exact():
    parts = [_hashes(3000, off) for off in (0, 10_000, 20_000)]
    def mk(h):
        s = ThetaSketch(128); s.update(h); return s
    one = ThetaSketch(128); one.update(np.concatenate(parts))
    # (a+b)+c == a+(b+c) == c+(b+a) == one-shot; zero is identity
    ab_c = mk(parts[0]).merge(mk(parts[1])).merge(mk(parts[2]))
    bc = mk(parts[1]).merge(mk(parts[2]))
    a_bc = mk(parts[0]).merge(bc)
    cba = mk(parts[2]).merge(mk(parts[1])).merge(mk(parts[0]))
    with_zero = mk(parts[0]).merge(ThetaSketch(128)) \
        .merge(mk(parts[1])).merge(mk(parts[2]))
    assert (ab_c.to_bytes() == a_bc.to_bytes() == cba.to_bytes()
            == with_zero.to_bytes() == one.to_bytes())


def test_theta_serialization_roundtrip():
    sk = ThetaSketch(64)
    sk.update(_hashes(1000))
    back = ThetaSketch.from_bytes(sk.to_bytes())
    assert back.k == sk.k and back.theta == sk.theta
    assert np.array_equal(back.retained, sk.retained)
    assert back.estimate() == sk.estimate()


def test_theta_intersect_and_a_not_b_exact_mode():
    """Below k everything is exact: set expressions give exact counts."""
    a = ThetaSketch(4096); a.update(_hashes(300))        # ids 0..299
    b = ThetaSketch(4096); b.update(_hashes(400, 100))   # ids 100..499
    assert theta_intersect(a, b).estimate() == 200.0
    assert theta_a_not_b(a, b).estimate() == 100.0
    assert theta_a_not_b(b, a).estimate() == 200.0


def test_theta_intersect_bound_estimation_mode():
    """|A|=60k, |B|=80k, |I|=20k, |U|=120k, k=4096: 4-sigma binomial
    bound sqrt(I*U/k) from the module doc."""
    k = 4096
    a = ThetaSketch(k); a.update(_hashes(60_000))            # 0..60k
    b = ThetaSketch(k); b.update(_hashes(80_000, 40_000))    # 40k..120k
    i_exact, u_exact = 20_000, 120_000
    est = theta_intersect(a, b).estimate()
    bound = 4.0 * np.sqrt(i_exact * u_exact / k) + 1
    assert abs(est - i_exact) <= bound, est
    d_est = theta_a_not_b(a, b).estimate()
    assert abs(d_est - 40_000) <= 4.0 * np.sqrt(40_000 * u_exact / k) + 1


def test_theta_merge_k_mismatch_raises():
    with pytest.raises(ValueError, match="k mismatch"):
        ThetaSketch(64).merge(ThetaSketch(128))


def test_theta_spark_build_partition_invariance(spark, events):
    """UDAF build through agg.build_sketch: repartitioning cannot change a
    byte (canonical state), and the estimate tracks exact distinct."""
    exact = events.select("user_id").where(
        F.col("user_id").isNotNull()).distinct().count()
    s4 = build_sketch(events.repartition(4), ["user_id"],
                      lambda: ThetaSketch(512))
    s13 = build_sketch(events.repartition(13), ["user_id"],
                       lambda: ThetaSketch(512))
    assert s4.to_bytes() == s13.to_bytes()
    assert abs(s4.estimate() - exact) / exact <= 4.0 / np.sqrt(512 - 2)


def test_theta_jvm_build_byte_identical(spark, events, lineitem):
    kernel = build_sketch(events, ["user_id"], lambda: ThetaSketch(256))
    jvm = theta_build_jvm(events, ["user_id"], k=256)
    assert kernel.to_bytes() == jvm.to_bytes()
    # composite key, estimation mode (lineitem rows >> k)
    cols = ["l_orderkey", "l_linenumber"]
    kernel2 = build_sketch(lineitem, cols, lambda: ThetaSketch(64))
    jvm2 = theta_build_jvm(lineitem, cols, k=64)
    assert kernel2.to_bytes() == jvm2.to_bytes()
    assert kernel2.theta < np.uint64(0xFFFFFFFFFFFFFFFF)  # really trimmed


def test_theta_grouped_estimate_jvm_matches_kernel(spark, events):
    """Pure-SQL grouped estimator is float-identical to per-key kernel
    sketches (same flipped-int64 theta normalization)."""
    k = 128
    jvm = {r["event_type"]: r["est"] for r in
           theta_grouped_estimate_jvm(events, ["event_type"], ["user_id"],
                                      k=k).collect()}
    kern = grouped_sketch_df(
        events.where(F.col("user_id").isNotNull()),
        ["event_type"], ["user_id"], lambda: ThetaSketch(k),
        {"est": lambda s: float(s.estimate())}, salt=2)
    kern = {r["event_type"]: r["est"] for r in kern.collect()}
    assert set(jvm) == set(kern)
    for t in kern:
        assert jvm[t] == kern[t], (t, jvm[t], kern[t])


def test_theta_spark_intersection_vs_exact(spark, events):
    """End-to-end: users who clicked AND purchased, sketch vs exact."""
    ev = events.where(F.col("user_id").isNotNull())
    a_df = ev.where(F.col("event_type") == "click")
    b_df = ev.where(F.col("event_type") == "purchase")
    k = 4096
    a = build_sketch(a_df, ["user_id"], lambda: ThetaSketch(k))
    b = build_sketch(b_df, ["user_id"], lambda: ThetaSketch(k))
    exact_i = (a_df.select("user_id").distinct()
               .intersect(b_df.select("user_id").distinct()).count())
    exact_u = (a_df.select("user_id").union(b_df.select("user_id"))
               .distinct().count())
    est = theta_intersect(a, b).estimate()
    assert abs(est - exact_i) <= 4.0 * np.sqrt(max(exact_i, 1) * exact_u / k) + 1


def test_theta_streaming_accumulator_byte_identical_to_batch(spark, events,
                                                             tmp_path):
    """Canonical state means the foreachBatch fold over micro-batches ends
    byte-identical to the one-shot batch build (streaming/batch merge
    compatibility, the north rule's streaming requirement)."""
    from bloomfilter_spark.streaming import SketchAccumulator

    src = str(tmp_path / "theta_stream")
    keyed = events.select("user_id").where(F.col("user_id").isNotNull())
    for i in range(3):  # three files -> three micro-batches
        keyed.where(F.col("user_id") % 3 == i).write.mode("append").parquet(src)

    acc = SketchAccumulator(["user_id"], lambda: ThetaSketch(512),
                            state_dir=str(tmp_path / "theta_state"))
    stream = (spark.readStream.schema(keyed.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = stream.writeStream.foreachBatch(acc).trigger(availableNow=True).start()
    q.awaitTermination(120)

    batch = build_sketch(keyed, ["user_id"], lambda: ThetaSketch(512))
    assert acc.sketch.to_bytes() == batch.to_bytes()
    # and the persisted state restores to the same bytes
    acc2 = SketchAccumulator(["user_id"], lambda: ThetaSketch(512),
                             state_dir=str(tmp_path / "theta_state"))
    assert acc2.sketch.to_bytes() == batch.to_bytes()


def test_theta_jvm_build_prefilter_hint_byte_identical(spark, lineitem):
    """expected_n pre-filter (shuffle ~8k rows instead of all distinct
    hashes) is byte-identical for exact, over- and under-estimated hints,
    including the fallback path when the hint over-shoots by > 8x."""
    base = theta_build_jvm(lineitem, ["l_orderkey"], k=64)
    n = lineitem.select("l_orderkey").distinct().count()
    for hint in (n, n * 10, max(n // 10, 1), n * 1000):
        hinted = theta_build_jvm(lineitem, ["l_orderkey"], k=64,
                                 expected_n=hint)
        assert hinted.to_bytes() == base.to_bytes(), hint


def test_theta_set_algebra_laws():
    """Algebra laws over estimation-mode sketches (the SQL pair functions
    rest on these): intersect is commutative and idempotent; the result
    never mutates its inputs; intersect + a_not_b PARTITION a's retained
    sample below the common theta; (A∩B)'s retained set is a subset of
    both inputs'."""
    k = 1024
    a = ThetaSketch(k); a.update(_hashes(50_000))
    b = ThetaSketch(k); b.update(_hashes(60_000, 30_000))
    a_bytes, b_bytes = a.to_bytes(), b.to_bytes()

    i_ab, i_ba = theta_intersect(a, b), theta_intersect(b, a)
    assert np.array_equal(i_ab.retained, i_ba.retained)   # commutative
    assert i_ab.theta == i_ba.theta == min(a.theta, b.theta)
    assert a.to_bytes() == a_bytes and b.to_bytes() == b_bytes  # no mutation

    i_aa = theta_intersect(a, a)                          # idempotent
    assert np.array_equal(i_aa.retained, a.retained[a.retained < a.theta])

    d_ab = theta_a_not_b(a, b)
    common_theta = min(a.theta, b.theta)
    a_below = a.retained[a.retained < common_theta]
    # partition: intersect(a,b) ∪ a_not_b(a,b) == a's sample, disjointly
    union = np.union1d(i_ab.retained, d_ab.retained)
    assert np.array_equal(union, np.sort(a_below))
    assert np.intersect1d(i_ab.retained, d_ab.retained).size == 0
    # subset of both inputs
    assert np.isin(i_ab.retained, a.retained).all()
    assert np.isin(i_ab.retained, b.retained).all()
