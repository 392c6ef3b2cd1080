"""Family-wide sizing calculators (sizing.py, north-star 'suggestSizing-
equivalent calculator' generalized): each suggested size is validated two
ways — the formula inverts the kernel's own reported bound exactly, and a
sketch BUILT at the suggested size meets the requested target empirically
on synthetic data (3x margin where the bound is a standard error, exact
where it is deterministic). Pure-kernel tests: no Spark session."""

import math

import numpy as np
import pytest

from bloomfilter_spark.sizing import (SizingError, analytic_fpr,
                                      suggest_cms_dims, suggest_hll_precision,
                                      suggest_kll_k, suggest_mg_k,
                                      suggest_sketch, suggest_tdigest_delta,
                                      suggest_theta_k, tdigest_rank_error)
from bloomfilter_spark.sketches import (KLL, BloomFilter, CountMinSketch,
                                        HyperLogLog, MisraGries, TDigest,
                                        ThetaSketch)
from bloomfilter_spark.util import splitmix64


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)


# --- formula inversions --------------------------------------------------

def test_hll_precision_inverts_rse_formula():
    for target in (0.2, 0.05, 0.02, 0.01, 0.005):
        p, pred, nbytes = suggest_hll_precision(target)
        assert pred <= target
        assert 4 <= p <= 18 and nbytes == 1 << p
        if p > 4:  # minimality: one precision down must miss the target
            assert 1.04 / math.sqrt(1 << (p - 1)) > target
    with pytest.raises(SizingError):
        suggest_hll_precision(0.0005)  # needs p > 18
    with pytest.raises(SizingError):
        suggest_hll_precision(0.0)


def test_cms_dims_match_constructor():
    w, d, nbytes = suggest_cms_dims(1e-4, 1e-3)
    sk = CountMinSketch(eps=1e-4, delta=1e-3)
    assert (w, d) == (sk.width, sk.depth)
    assert nbytes == sk.table.nbytes
    with pytest.raises(SizingError):
        suggest_cms_dims(0, 0.1)
    with pytest.raises(SizingError):
        suggest_cms_dims(0.1, 1.0)


def test_kll_k_inverts_kernel_bound():
    for target in (0.02, 0.01, 0.0085, 0.001):
        k, pred, _ = suggest_kll_k(target)
        assert pred <= target
        assert KLL(k).rank_error_bound() <= target  # the kernel's own bound
        assert KLL(k - 1).rank_error_bound() > target or k == 8


def test_theta_k_pow2_and_bound():
    for target in (0.1, 0.05, 0.02, 0.01):
        k, pred, nbytes = suggest_theta_k(target)
        assert k & (k - 1) == 0 and k >= 16
        assert pred <= target and nbytes == 8 * k
        assert 1.0 / math.sqrt(k // 2 - 2) > target  # pow-2 minimality


def test_mg_k_guarantees_deterministic_bound():
    for eps in (0.5, 0.1, 0.01, 1 / 3):
        k, nbytes = suggest_mg_k(eps)
        # the kernel's bound is dec <= n/(k+1); need n/(k+1) <= eps*n
        assert 1.0 / (k + 1) <= eps + 1e-12
        assert nbytes == 16 * k


def test_tdigest_delta_and_tail_error_profile():
    delta, pred, nbytes = suggest_tdigest_delta(0.005)
    assert pred <= 0.005
    assert nbytes == 16 * (delta // 2 + 1)
    # arcsine scale: tails strictly sharper than the median
    assert tdigest_rank_error(delta, 0.01) < tdigest_rank_error(delta, 0.5)
    assert tdigest_rank_error(delta, 0.5) == pred


def test_dispatcher_params_construct_real_sketches():
    cases = {
        "bloom": dict(capacity=10_000, err_rate=0.01),
        "hll": dict(rel_std_error=0.02),
        "cms": dict(eps=1e-3, delta=0.01),
        "kll": dict(rank_error=0.01),
        "theta": dict(rel_std_error=0.02),
        "sample": dict(rel_std_error=0.02, avg_payload_bytes=40),
        "weighted_sample": dict(rel_std_error=0.02, avg_payload_bytes=40),
        "mg": dict(eps=0.01),
        "tdigest": dict(mid_rank_error=0.01),
        "ddsketch": dict(rel_value_error=0.01, dynamic_range=1e6),
    }
    from bloomfilter_spark.sketches import (DDSketch, SampleSketch,
                                            WeightedSampleSketch)
    classes = {"bloom": BloomFilter, "hll": HyperLogLog,
               "cms": CountMinSketch, "kll": KLL, "theta": ThetaSketch,
               "sample": SampleSketch, "weighted_sample": WeightedSampleSketch,
               "mg": MisraGries, "tdigest": TDigest, "ddsketch": DDSketch}
    for kind, targets in cases.items():
        out = suggest_sketch(kind, **targets)
        sk = classes[kind](**out["params"])  # kwargs really construct
        assert out["state_bytes"] > 0
        assert 0 < out["predicted_error"] < 1
        assert sk is not None
    # sample shares theta's k inversion but budgets payload bytes
    th = suggest_sketch("theta", rel_std_error=0.02)
    sp = suggest_sketch("sample", rel_std_error=0.02, avg_payload_bytes=40)
    assert sp["params"]["k"] == th["params"]["k"]
    assert sp["state_bytes"] == th["params"]["k"] * (12 + 40)
    # weighted sample: same CV inversion, +8 bytes/entry for the weight
    ws = suggest_sketch("weighted_sample", rel_std_error=0.02,
                        avg_payload_bytes=40)
    assert ws["params"]["k"] == th["params"]["k"]
    assert ws["state_bytes"] == th["params"]["k"] * (20 + 40)
    with pytest.raises(SizingError):
        suggest_sketch("cuckoo", eps=0.1)


# --- empirical: a sketch built at the suggested size meets the target ----

def test_sized_hll_meets_target(rng):
    target = 0.02
    p, _, _ = suggest_hll_precision(target)
    vals = rng.integers(0, 200_000, 600_000, dtype=np.int64)
    exact = len(np.unique(vals))
    sk = HyperLogLog(p)
    sk.update(splitmix64(vals.view(np.uint64)))
    assert abs(sk.estimate() - exact) / exact <= 3 * target


def test_sized_cms_meets_target(rng):
    eps, delta = 2e-4, 1e-3
    w, d, _ = suggest_cms_dims(eps, delta)
    keys = rng.zipf(1.3, 300_000).astype(np.int64) % 50_000
    sk = CountMinSketch(width=w, depth=d)
    h = splitmix64(keys.view(np.uint64))
    sk.update(h)
    uk, cnt = np.unique(keys, return_counts=True)
    est = sk.query(splitmix64(uk.view(np.uint64)))
    assert (est >= cnt).all()  # zero undercount
    n = keys.size
    # eps*N bound holds for >= 1-delta of queries; assert all within 2x
    assert (est - cnt <= 2 * eps * n).all()


def test_sized_kll_meets_target(rng):
    target = 0.01
    k, _, _ = suggest_kll_k(target)
    x = rng.lognormal(2.0, 1.0, 400_000)
    sk = KLL(k)
    sk.update(x)
    for q in (0.05, 0.25, 0.5, 0.75, 0.95):
        true_rank = (x <= sk.quantile(q)).mean()
        assert abs(true_rank - q) <= 3 * target


def test_sized_theta_meets_target(rng):
    target = 0.02
    k, _, _ = suggest_theta_k(target)
    vals = rng.integers(0, 150_000, 400_000, dtype=np.int64)
    exact = len(np.unique(vals))
    sk = ThetaSketch(k)
    sk.update(splitmix64(vals.view(np.uint64)))
    assert abs(sk.estimate() - exact) / exact <= 3 * target


def test_sized_mg_meets_target(rng):
    eps = 0.005
    k, _ = suggest_mg_k(eps)
    keys = rng.zipf(1.5, 200_000).astype(np.int64) % 10_000
    sk = MisraGries(k)
    sk.update(splitmix64(keys.view(np.uint64)))
    assert sk.error_bound() <= eps * keys.size  # deterministic, no margin


def test_sized_tdigest_meets_target(rng):
    target = 0.005
    delta, _, _ = suggest_tdigest_delta(target)
    x = rng.gamma(2.0, 3.0, 400_000)
    sk = TDigest(delta)
    sk.update(x)
    for q in (0.1, 0.5, 0.9):
        true_rank = (x <= sk.quantile(q)).mean()
        assert abs(true_rank - q) <= 3 * target
    # centroid budget claim from the sizer holds post-build
    sk._flush()
    assert sk.means.size <= delta // 2 + 1


def test_bloom_dispatcher_fpr_roundtrip():
    out = suggest_sketch("bloom", capacity=50_000, err_rate=0.01)
    m = out["params"]["num_bits"]
    k = out["params"]["num_hashes"]
    assert analytic_fpr(m, k, 50_000) <= 0.01
    assert out["state_bytes"] == m // 8


def test_scalable_bloom_sizer_inverts_compound_bound():
    """suggest_scalable_bloom: err0 = total*(1-t), so the Almeida compound
    bound converges to exactly the requested total — passing the total
    straight to the constructor would converge to total/(1-t) instead."""
    from bloomfilter_spark.sizing import suggest_scalable_bloom
    err0, total, nbytes = suggest_scalable_bloom(0.01)
    assert err0 == 0.01 * 0.5 and total == 0.01 and nbytes > 0
    # dispatcher form constructs a real filter whose bound stays under
    # the target at EVERY growth depth
    from bloomfilter_spark.sketches import ScalableBloomFilter
    out = suggest_sketch("scalable_bloom", total_err_rate=0.01)
    sbf = ScalableBloomFilter(**out["params"])
    for _ in range(6):
        sbf._grow()
        assert sbf.compound_error_bound() <= 0.01 + 1e-12
    with pytest.raises(SizingError):
        suggest_sketch("scalable_bloom", total_err_rate=0.01, tightening=1.5)


def test_sized_scalable_bloom_meets_target(rng):
    """Empirical: a scalable filter built at the suggested params, grown
    well past its initial capacity, keeps observed FPR under the TOTAL
    target (plus 4-sigma sampling slack) and zero false negatives."""
    from bloomfilter_spark.sizing import suggest_scalable_bloom
    from bloomfilter_spark.sketches import ScalableBloomFilter
    total = 0.02
    err0, _, _ = suggest_scalable_bloom(total, initial_capacity=512)
    sbf = ScalableBloomFilter(err0, initial_capacity=512)
    h = np.unique(rng.integers(0, 2**63, 60_000, dtype=np.int64)
                  .view(np.uint64))
    ins, absent = h[:8_000], h[8_000:]
    sbf.update(ins)
    assert len(sbf.filters) > 3          # grew well past level 0
    assert bool(sbf.contains(ins).all())  # zero FN
    observed = float(sbf.contains(absent).mean())
    slack = 4.0 * math.sqrt(total * (1 - total) / absent.size)
    assert observed <= total + slack
    assert sbf.compound_error_bound() <= total + 1e-12


def test_iblt_sizer_matches_for_diff_and_decodes():
    """suggest_sketch('iblt', max_diff=d) returns the exact geometry
    IBLT.for_diff(d) builds, constructs a working table, and the sized
    table decodes a d-key difference (the empirical build-at-suggested-
    size-meets-target check the other families get)."""
    from bloomfilter_spark.sketches import IBLT
    from bloomfilter_spark.sizing import suggest_iblt
    from bloomfilter_spark.util import splitmix64

    out = suggest_sketch("iblt", max_diff=500)
    proto = IBLT.for_diff(500)
    assert out["params"] == {"num_cells": proto.num_cells, "num_hashes": 4}
    assert out["decode_capacity"] == proto.decode_capacity() >= 500
    assert out["state_bytes"] == proto.state_nbytes == 24 * proto.num_cells
    cells, cap, nbytes = suggest_iblt(500)
    assert (cells, cap, nbytes) == (proto.num_cells,
                                    proto.decode_capacity(),
                                    proto.state_nbytes)
    # built at suggested size, a 500-key difference peels completely
    built = IBLT(**out["params"])
    ka = splitmix64(np.arange(1, 301, dtype=np.uint64))
    kb = splitmix64(np.arange(10**6, 10**6 + 200, dtype=np.uint64))
    other = IBLT(**out["params"])
    built.update(ka)
    other.update(kb)
    pos, neg, complete = built.subtract(other).decode()
    assert complete and pos.size == 300 and neg.size == 200
    with pytest.raises(SizingError):
        suggest_iblt(0)
    with pytest.raises(ValueError):
        suggest_iblt(100, num_hashes=9)


def test_sized_ddsketch_meets_target(rng):
    """A DDSketch built at the suggested geometry answers every quantile
    within the target relative value error over the declared dynamic
    range, WITHOUT collapsing (the sizing's 25% headroom claim)."""
    from bloomfilter_spark.sketches import DDSketch
    from bloomfilter_spark.sizing import suggest_ddsketch

    target, drange = 0.02, 1e6
    alpha, limit, nbytes = suggest_ddsketch(target, dynamic_range=drange)
    assert alpha == target
    # values spanning exactly the declared range
    v = np.exp(rng.uniform(0.0, np.log(drange), 40_000))
    sk = DDSketch(alpha, bucket_limit=limit)
    sk.update(v)
    assert not sk.collapsed          # headroom held
    assert sk.state_nbytes <= nbytes  # budget is an upper bound
    qs = np.linspace(0.0, 1.0, 101)
    xs = np.sort(v)
    exact = xs[np.floor(qs * (len(xs) - 1)).astype(int)]
    rel = np.abs(np.asarray(sk.quantile(qs)) - exact) / exact
    assert rel.max() <= target * (1 + 1e-9)
    # signed data fills BOTH stores: the budget doubles (review fix) and
    # a mixed-sign corpus spanning the range stays within it uncollapsed
    a2, l2, nb2 = suggest_ddsketch(target, dynamic_range=drange, signed=True)
    assert l2 == limit and nb2 == 2 * 12 * limit + 58
    sk2 = DDSketch(a2, bucket_limit=l2)
    sk2.update(np.concatenate([v, -v]))
    assert not sk2.collapsed and sk2.state_nbytes <= nb2
    assert suggest_sketch("ddsketch", rel_value_error=target,
                          dynamic_range=drange,
                          signed=True)["state_bytes"] == nb2
    # validation
    with pytest.raises(SizingError):
        suggest_ddsketch(1e-7)
    with pytest.raises(SizingError):
        suggest_ddsketch(0.01, dynamic_range=0.5)
