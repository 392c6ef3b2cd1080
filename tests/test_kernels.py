"""Pure-numpy kernel properties (no Spark): the engine analogs of the
reference's QuickCheck suite (/root/reference/tests/QC.hs) at the state
level — zero false negatives, FPR bound, merge algebra, serialization
round-trips, estimate bounds."""

import numpy as np
import pytest

from bloomfilter_spark.sizing import suggest_sizing
from bloomfilter_spark.sketches import (KLL, BloomFilter, CountMinSketch,
                                        HyperLogLog, TDigest)
from bloomfilter_spark.util import clz64, next_power_of_two, splitmix64, to_u64


def hashes(rng, n):
    return rng.integers(0, 2**63, n, dtype=np.int64).view(np.uint64)


# --- util ----------------------------------------------------------------

def test_next_power_of_two():
    assert [next_power_of_two(n) for n in (1, 2, 3, 63, 64, 65, 1000)] == \
        [1, 2, 4, 64, 64, 128, 1024]


def test_clz64_exact():
    xs = np.array([0, 1, 2, 3, 2**31, 2**32, 2**63, 2**64 - 1], dtype=np.uint64)
    expected = [64, 63, 62, 62, 32, 31, 0, 0]
    assert clz64(xs).tolist() == expected


def test_splitmix_is_bijective_sample(rng):
    x = hashes(rng, 10000)
    assert len(np.unique(splitmix64(x))) == len(np.unique(x))


# --- bloom ---------------------------------------------------------------

@pytest.mark.parametrize("variant", ["km64", "shift32"])
@pytest.mark.parametrize("fpr", [1e-6, 1e-3, 0.01, 0.1, 0.5])
def test_bloom_prop_pai_and_fpr(rng, variant, fpr):
    """prop_pai (QC.hs:17-18): every inserted key is found; and observed FPR
    on a disjoint probe set stays within ~2x the configured bound."""
    n = 20000
    m, k = suggest_sizing(n, fpr)
    if variant == "shift32" and k > 32:
        pytest.skip("shift32 degenerates beyond k=32 by design")
    bf = BloomFilter(m, k, variant=variant)
    h = hashes(rng, n)
    bf.update(h)
    assert bf.contains(h).all()
    probes = hashes(rng, 50000)
    # exclude accidental collisions with inserted keys
    probes = np.setdiff1d(probes, h)
    observed = bf.contains(probes).mean()
    assert observed <= max(fpr * 2.0, 5e-4)


def test_bloom_merge_algebra(rng):
    m, k = 1 << 16, 5
    h = hashes(rng, 9000)
    parts = np.array_split(h, 3)
    sk = [BloomFilter(m, k) for _ in range(3)]
    for s, p in zip(sk, parts):
        s.update(p)
    a, b, c = sk
    left = a.copy().merge(b).merge(c)
    right = a.copy().merge(b.copy().merge(c))
    swapped = c.copy().merge(a).merge(b)
    whole = BloomFilter(m, k)
    whole.update(h)
    for other in (right, swapped, whole):
        assert (left.words == other.words).all()
    ident = BloomFilter(m, k).merge(left)
    assert (ident.words == left.words).all()


def test_bloom_geometry_mismatch_raises():
    with pytest.raises(ValueError):
        BloomFilter(1 << 10, 3).merge(BloomFilter(1 << 11, 3))
    with pytest.raises(ValueError):
        BloomFilter(1 << 10, 3).merge(BloomFilter(1 << 10, 4))


def test_bloom_serialization_roundtrip(rng):
    bf = BloomFilter(1 << 12, 4)
    bf.update(hashes(rng, 1000))
    b2 = BloomFilter.from_bytes(bf.to_bytes())
    assert (b2.words == bf.words).all()
    assert (b2.num_bits, b2.num_hashes, b2.variant) == (bf.num_bits, bf.num_hashes, bf.variant)
    assert bf.to_bytes() == b2.to_bytes()


def test_bloom_empty_and_singleton(rng):
    """empty (BloomFilter.hs:155-159) has nothing; singleton (165-170) has
    exactly its element (plus FPR-rate accidents)."""
    bf = BloomFilter(1 << 10, 3)
    assert not bf.contains(hashes(rng, 100)).any() or bf.bit_count() == 0
    one = hashes(rng, 1)
    bf.update(one)
    assert bf.contains(one).all()


def test_bloom_update_batch_equals_incremental(rng):
    """Batched update == sequence of single inserts (the fusion-rule law,
    BloomFilter.hs:229-251: chains collapse to one build)."""
    h = hashes(rng, 500)
    a = BloomFilter(1 << 12, 5)
    a.update(h)
    b = BloomFilter(1 << 12, 5)
    for x in h:
        b.update(np.array([x], dtype=np.uint64))
    assert (a.words == b.words).all()


def test_bloom_shift32_reference_semantics(rng):
    """shift32 probes mirror Hash.hs:149-156: h1=high32, h2=low32,
    probe_i = h1 + (h2 >> i), masked."""
    from bloomfilter_spark.util import km_probes_shift32
    h = hashes(rng, 10)
    k, mask = 4, (1 << 20) - 1
    probes = km_probes_shift32(h, k, mask)
    for j, hv in enumerate(h.tolist()):
        h1, h2 = hv >> 32, hv & 0xFFFFFFFF
        for i in range(k):
            assert probes[i, j] == ((h1 + (h2 >> i)) & mask)


def test_bloom_swamidass_baldi_cardinality(rng):
    """estimate()/approx_cardinality: the fill-ratio inversion
    n ≈ -(m/k)·ln(1 − X/m) tracks the true distinct insert count across
    fills (Swamidass & Baldi 2007, eq. 8); duplicate inserts set no new
    bits so the estimate is idempotent; a saturated filter reports +inf."""
    m, k = 1 << 16, 7
    for n in (100, 1000, 5000):
        bf = BloomFilter(m, k)
        h = np.unique(hashes(rng, 2 * n))[:n]
        bf.update(h)
        est = bf.estimate()
        assert abs(est - n) / n < 0.05
        bf.update(h)  # duplicates: no new bits, estimate unchanged
        assert bf.estimate() == est
    sat = BloomFilter(64, 1)
    sat.words[:] = np.uint64(0xFFFFFFFFFFFFFFFF)
    assert sat.approx_cardinality() == float("inf")


def test_scalable_bloom_estimate_tracks_distinct(rng):
    """ScalableBloomFilter.estimate(): per-level Swamidass–Baldi sum tracks
    the distinct count across a multi-level growth history."""
    from bloomfilter_spark.sketches.scalable import ScalableBloomFilter
    sbf = ScalableBloomFilter(0.01, initial_capacity=1024)
    h = np.unique(hashes(rng, 12000))[:10000]
    sbf.update(h)
    assert len(sbf.filters) > 1  # growth actually happened
    est = sbf.estimate()
    assert abs(est - h.size) / h.size < 0.05


def test_bloom_fpp_observed_fill(rng):
    """fpp(): (X/m)^k at the observed fill tracks the empirically measured
    false-positive rate, sits at/under the configured bound when filled to
    the sized capacity, and reports the DEGRADED rate when overfilled —
    the operational signal the sizing-time bound cannot give."""
    cap, target = 5000, 0.01
    bf = BloomFilter.for_capacity(cap, target)
    h = np.unique(hashes(rng, 60000))
    bf.update(h[:cap])
    at_cap = bf.fpp()
    observed = float(bf.contains(h[cap:cap + 20000]).mean())
    assert abs(at_cap - observed) < 0.005   # 4 sigma at n=20k, p<=0.01
    assert at_cap <= 1.5 * target           # honest at design fill
    bf.update(h[cap:5 * cap])               # overfill 5x the sized capacity
    assert bf.fpp() > 5 * target            # degraded rate is reported


def test_scalable_bloom_fpp_matches_observed(rng):
    """ScalableBloomFilter.fpp(): 1 - prod(1 - level fpp) over observed
    per-level fills tracks the measured FP rate of the multi-level probe
    and stays within the Almeida compound schedule bound."""
    from bloomfilter_spark.sketches.scalable import ScalableBloomFilter
    sbf = ScalableBloomFilter(0.01, initial_capacity=1024)
    h = np.unique(hashes(rng, 50000))
    sbf.update(h[:10000])
    assert len(sbf.filters) > 1
    fpp = sbf.fpp()
    observed = float(sbf.contains(h[10000:50000]).mean())
    assert abs(fpp - observed) < 0.005
    assert 0.0 < fpp <= sbf.compound_error_bound()


# --- hll -----------------------------------------------------------------

def test_hll_accuracy_and_merge(rng):
    p = 14
    vals = rng.integers(0, 300000, 1000000, dtype=np.int64)
    exact = len(np.unique(vals))
    h = splitmix64(vals.view(np.uint64))
    full = HyperLogLog(p)
    full.update(h)
    rel = abs(full.estimate() - exact) / exact
    assert rel < 3 * 1.04 / np.sqrt(2**p)
    parts = np.array_split(h, 7)
    merged = HyperLogLog(p)
    for chunk in parts:
        s = HyperLogLog(p)
        s.update(chunk)
        merged.merge(s)
    assert (merged.registers == full.registers).all()  # byte-exact merge
    r2 = HyperLogLog.from_bytes(full.to_bytes())
    assert (r2.registers == full.registers).all()


def test_hll_small_range_linear_counting(rng):
    s = HyperLogLog(12)
    vals = np.arange(50, dtype=np.uint64)
    s.update(splitmix64(vals))
    assert abs(s.estimate() - 50) <= 2


# --- cms -----------------------------------------------------------------

def test_cms_bounds_and_merge(rng):
    keys = rng.zipf(1.5, 500000).astype(np.int64) % 10000
    h = splitmix64(keys.view(np.uint64))
    cms = CountMinSketch(eps=1e-4, delta=1e-3)
    cms.update(h)
    uk, cnt = np.unique(keys, return_counts=True)
    est = cms.query(splitmix64(uk.view(np.uint64)))
    assert (est >= cnt).all()  # never undercounts
    assert (est - cnt <= cms.error_bound() * 2).all()
    # byte-exact merge
    parts = np.array_split(h, 5)
    merged = CountMinSketch(width=cms.width, depth=cms.depth)
    for chunk in parts:
        s = CountMinSketch(width=cms.width, depth=cms.depth)
        s.update(chunk)
        merged.merge(s)
    assert (merged.table == cms.table).all()
    assert merged.total == cms.total
    r2 = CountMinSketch.from_bytes(cms.to_bytes())
    assert (r2.table == cms.table).all() and r2.total == cms.total


def test_cms_weighted_updates(rng):
    cms = CountMinSketch(eps=1e-4, delta=1e-3)
    keys = np.arange(100, dtype=np.uint64)
    h = splitmix64(keys)
    w = rng.integers(1, 50, 100).astype(np.float64)
    cms.update(h, w)
    est = cms.query(h)
    assert (est >= w.astype(np.int64)).all()
    assert cms.total == int(w.sum())


def test_cms_inner_product_sandwich(rng):
    """Join-size estimate: deterministic lower bound (exact <= est) and
    the (e/w)*Na*Nb upper slack; exact on a collision-free tiny sketch."""
    # exact case: wide sketch, few keys -> no collisions, est == exact
    ka = np.repeat(np.arange(10, dtype=np.int64), np.arange(1, 11))
    kb = np.repeat(np.arange(5, 20, dtype=np.int64), 3)
    a = CountMinSketch(width=4096, depth=5)
    b = CountMinSketch(width=4096, depth=5)
    a.update(splitmix64(ka.view(np.uint64)))
    b.update(splitmix64(kb.view(np.uint64)))
    ua, ca = np.unique(ka, return_counts=True)
    ub, cb = np.unique(kb, return_counts=True)
    exact = sum(int(ca[list(ua).index(k)]) * int(cb[list(ub).index(k)])
                for k in set(ua) & set(ub))
    assert a.inner_product(b) == exact
    # symmetric
    assert b.inner_product(a) == exact

    # collision regime: narrow sketch on zipf streams -> sandwich holds
    za = rng.zipf(1.3, 200000).astype(np.int64) % 5000
    zb = rng.zipf(1.3, 200000).astype(np.int64) % 5000
    sa = CountMinSketch(width=256, depth=5)
    sb = CountMinSketch(width=256, depth=5)
    sa.update(splitmix64(za.view(np.uint64)))
    sb.update(splitmix64(zb.view(np.uint64)))
    ua, ca = np.unique(za, return_counts=True)
    ub, cb = np.unique(zb, return_counts=True)
    common, ia, ib = np.intersect1d(ua, ub, return_indices=True)
    exact = int((ca[ia].astype(np.int64) * cb[ib].astype(np.int64)).sum())
    est = sa.inner_product(sb)
    assert est >= exact
    assert est <= exact + sa.inner_product_bound(sb)

    # F2 self-product: est(a,a) >= sum f_k^2 (second frequency moment)
    f2 = int((ca.astype(np.int64) ** 2).sum())
    assert sa.inner_product(sa) >= f2

    # merge compatibility: sketch of concatenated stream == merged parts
    half = CountMinSketch(width=256, depth=5)
    half.update(splitmix64(za[:100000].view(np.uint64)))
    rest = CountMinSketch(width=256, depth=5)
    rest.update(splitmix64(za[100000:].view(np.uint64)))
    assert half.merge(rest).inner_product(sb) == est

    with pytest.raises(ValueError):
        sa.inner_product(CountMinSketch(width=512, depth=5))


# --- tdigest -------------------------------------------------------------

def test_tdigest_quantiles_and_merge(rng):
    x = rng.lognormal(3.0, 1.0, 300000)
    td = TDigest(200)
    td.update(x)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = td.quantile(q)
        true_rank = (x <= est).mean()
        assert abs(true_rank - q) < 0.01, (q, true_rank)
    parts = np.array_split(x, 9)
    merged = TDigest(200)
    for chunk in parts:
        s = TDigest(200)
        s.update(chunk)
        merged.merge(s)
    for q in (0.01, 0.5, 0.99):
        true_rank = (x <= merged.quantile(q)).mean()
        assert abs(true_rank - q) < 0.015, (q, true_rank)
    assert abs(merged.total_weight - x.size) < 1e-6
    r2 = TDigest.from_bytes(td.to_bytes())
    assert abs(r2.quantile(0.5) - td.quantile(0.5)) < 1e-12


def test_tdigest_monotone_and_extremes(rng):
    x = rng.normal(0, 1, 50000)
    td = TDigest(100)
    td.update(x)
    qs = np.linspace(0, 1, 101)
    est = td.quantile(qs)
    assert (np.diff(est) >= -1e-12).all()
    assert est[0] == pytest.approx(x.min())
    assert est[-1] == pytest.approx(x.max())


# --- kll -----------------------------------------------------------------

def test_kll_rank_bound_and_merge(rng):
    x = rng.lognormal(3.0, 1.0, 300000)
    k = 200
    sk = KLL(k)
    sk.update(x)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = sk.quantile(q)
        true_rank = (x <= est).mean()
        assert abs(true_rank - q) <= 3 * sk.rank_error_bound(), (q, true_rank)
    assert sk.n == x.size
    parts = np.array_split(x, 6)
    merged = KLL(k)
    for chunk in parts:
        s = KLL(k)
        s.update(chunk)
        merged.merge(s)
    assert merged.n == x.size
    for q in (0.1, 0.5, 0.9):
        true_rank = (x <= merged.quantile(q)).mean()
        assert abs(true_rank - q) <= 4 * merged.rank_error_bound(), (q, true_rank)
    r2 = KLL.from_bytes(sk.to_bytes())
    assert r2.n == sk.n
    assert abs(r2.quantile(0.5) - sk.quantile(0.5)) < 1e-12


def test_kll_deterministic(rng):
    x = rng.normal(0, 1, 100000)
    a = KLL(128)
    a.update(x)
    b = KLL(128)
    b.update(x)
    assert a.to_bytes() == b.to_bytes()


def _exact_ks(x: np.ndarray, y: np.ndarray) -> float:
    pts = np.union1d(x, y)
    fx = np.searchsorted(np.sort(x), pts, side="right") / x.size
    fy = np.searchsorted(np.sort(y), pts, side="right") / y.size
    return float(np.abs(fx - fy).max())


def test_kll_ks_distance(rng):
    """Two-sample KS estimate: within summed rank-error of the exact
    statistic, detects a real shift, symmetric, zero on self."""
    k = 200
    x = rng.normal(0.0, 1.0, 200000)
    y = rng.normal(0.0, 1.0, 200000)   # same distribution
    z = rng.normal(0.5, 1.0, 200000)   # shifted
    a, b, c = KLL(k), KLL(k), KLL(k)
    a.update(x)
    b.update(y)
    c.update(z)
    tol = 4 * (a.rank_error_bound() + b.rank_error_bound())
    assert abs(a.ks_distance(b) - _exact_ks(x, y)) <= tol
    assert abs(a.ks_distance(c) - _exact_ks(x, z)) <= tol
    # a 0.5-sigma shift has KS ~0.2 -- must dominate the same-dist pair
    assert a.ks_distance(c) > a.ks_distance(b) + 0.1
    assert a.ks_distance(c) == c.ks_distance(a)
    assert a.ks_distance(a) == 0.0
    # merged parts give the same estimate as a one-shot build
    parts = np.array_split(z, 5)
    merged = KLL(k)
    for chunk in parts:
        s = KLL(k)
        s.update(chunk)
        merged.merge(s)
    assert abs(a.ks_distance(merged) - _exact_ks(x, z)) <= tol
    # empty conventions
    assert KLL(k).ks_distance(KLL(k)) == 0.0
    assert KLL(k).ks_distance(a) == 1.0


def test_kll_weight_conservation(rng):
    x = rng.normal(0, 1, 12345)
    sk = KLL(64)
    sk.update(x)
    _, w = sk._weighted_items()
    # compaction conserves weight to within the odd-item promotions
    assert abs(w.sum() - x.size) / x.size < 0.05


# --- null / nan handling -------------------------------------------------

def test_value_sketches_skip_nan(rng):
    x = np.array([1.0, np.nan, 2.0, np.nan, 3.0])
    td = TDigest(50)
    td.update(x)
    assert td.total_weight == 3
    sk = KLL(64)
    sk.update(x)
    assert sk.n == 3


# --- sparse serialization -------------------------------------------------

def test_hll_sparse_dense_roundtrip_and_size(rng):
    """Sparse mode kicks in for lightly-loaded sketches (a grouped
    warehouse's per-key HLLs), is byte-deterministic, and round-trips to
    identical registers; saturated sketches stay dense."""
    light = HyperLogLog(14)
    light.update(hashes(rng, 300))
    blob = light.to_bytes()
    assert len(blob) < (1 << 14) // 4          # far below the 16 KiB dense form
    back = HyperLogLog.from_bytes(blob)
    assert np.array_equal(back.registers, light.registers)
    assert back.to_bytes() == blob             # canonical: re-encode identical

    heavy = HyperLogLog(8)
    heavy.update(hashes(rng, 50_000))
    hb = heavy.to_bytes()
    assert len(hb) >= (1 << 8)                 # dense once mostly non-zero
    assert np.array_equal(HyperLogLog.from_bytes(hb).registers, heavy.registers)


def test_bloom_sparse_dense_roundtrip_and_size(rng):
    """A partial holding n/P of the keys serializes at O(set words), not
    O(m) — the two-level merge's shuffle-byte bound."""
    partial = BloomFilter(1 << 22, 7)
    h = hashes(rng, 2000)
    partial.update(h)
    blob = partial.to_bytes()
    # ~12 B per touched word vs m/8 dense: 2000 keys x 7 probes touch
    # <= 14000 words of 65536, so sparse lands well under dense/3
    assert len(blob) < (1 << 22) // 8 // 3
    back = BloomFilter.from_bytes(blob)
    assert np.array_equal(back.words, partial.words)
    assert back.contains(h).all()              # zero FN survives the format
    assert back.to_bytes() == blob

    full = BloomFilter(1 << 10, 3)
    full.update(hashes(rng, 100_000))
    fb = full.to_bytes()
    assert np.array_equal(BloomFilter.from_bytes(fb).words, full.words)


def test_sparse_merge_byte_equality(rng):
    """Merging two sparse-serialized halves == one-shot build, byte-exact
    through the wire format (the UDAF invariant the driver relies on)."""
    h = hashes(rng, 4000)
    for mk in (lambda: BloomFilter(1 << 20, 5), lambda: HyperLogLog(12)):
        a, b, full = mk(), mk(), mk()
        a.update(h[:2000]); b.update(h[2000:]); full.update(h)
        via_wire = type(a).from_bytes(a.to_bytes()).merge(
            type(b).from_bytes(b.to_bytes()))
        assert via_wire.to_bytes() == full.to_bytes()


def test_params_only_zero_sketch():
    """_from_payload(params, b"") must yield a usable zero sketch — the
    warehouse reconstructs factories from the params header alone."""
    for proto in (BloomFilter(1 << 16, 4), HyperLogLog(14)):
        params, _ = proto._payload()
        zero = type(proto)._from_payload(params, b"")
        merged = zero.merge(proto)             # zero is the merge identity
        assert merged.to_bytes() == proto.to_bytes()


def test_state_nbytes_reflects_dense_state(rng):
    """Planning must see the in-memory cost, not the (sparse) wire size:
    an empty big-m Bloom serializes to ~20 B but costs m/8 in every
    partial task."""
    bf = BloomFilter(1 << 25, 5)
    assert bf.state_nbytes == (1 << 25) // 8
    assert len(bf.to_bytes()) < 100
    assert HyperLogLog(14).state_nbytes == 1 << 14


def test_v1_blob_rejected_with_version_error():
    import struct
    import pytest
    v1 = struct.pack("<4sBBI", b"SKCH", 1, 1, 13) + b"x" * 13 + b"\x00" * 128
    with pytest.raises(ValueError, match="version"):
        BloomFilter.from_bytes(v1)


def test_cms_conservative_bounds(rng):
    """Estan–Varghese conservative update: exact <= conservative estimate
    <= plain estimate <= exact + eps*N, batched + weighted + merged."""
    keys = rng.zipf(1.5, 200000).astype(np.int64) % 5000
    h = splitmix64(keys.view(np.uint64))
    plain = CountMinSketch(width=1 << 11, depth=5)
    cons = CountMinSketch(width=1 << 11, depth=5, conservative=True)
    for chunk in np.array_split(h, 7):
        plain.update(chunk)
        cons.update(chunk)
    uk, cnt = np.unique(keys, return_counts=True)
    hq = splitmix64(uk.view(np.uint64))
    ep, ec = plain.query(hq), cons.query(hq)
    assert (ec >= cnt).all()           # never undercounts
    assert (ec <= ep).all()            # never worse than plain CMS
    assert (ec - cnt).sum() < (ep - cnt).sum()  # strictly tighter in aggregate

    # merged conservative partials: both inequalities still hold
    m = CountMinSketch(width=1 << 11, depth=5, conservative=True)
    for chunk in np.array_split(h, 4):
        part = CountMinSketch(width=1 << 11, depth=5, conservative=True)
        part.update(chunk)
        m.merge(part)
    em = m.query(hq)
    assert (em >= cnt).all() and (em <= ep).all()

    # roundtrip preserves the flag; zero factory from params works
    r = CountMinSketch.from_bytes(cons.to_bytes())
    assert r.conservative and (r.table == cons.table).all()
    params, _ = cons._payload()
    z = CountMinSketch._from_payload(params, b"")
    assert z.conservative and z.total == 0 and z.table.sum() == 0
    with pytest.raises(ValueError):
        cons.merge(CountMinSketch(width=1 << 11, depth=5))


def test_wire_version_compat_per_type(rng):
    """v1 blobs stay readable for sketch types whose payload layout never
    changed (theta, t-digest, KLL, CMS); only Bloom/HLL — whose v2 payload
    added the sparse/dense mode byte — reject v1, with a clear error."""
    import struct
    import pytest
    from bloomfilter_spark.sketches.theta import ThetaSketch
    from bloomfilter_spark.sketches.base import _MAGIC

    def as_v1(sk):
        blob = sk.to_bytes()
        magic, version, tag, plen = struct.unpack_from("<4sBBI", blob, 0)
        head = struct.pack("<4sBBI", magic, 1, tag, plen)
        # v3 writers put a 4-byte CRC word after the header; a v1 blob
        # has none, so drop it along with the version downgrade
        return head + blob[struct.calcsize("<4sBBI") + 4:]

    th = ThetaSketch(k=64)
    th.update(rng.integers(0, 2**63, 1000, dtype=np.int64).view(np.uint64))
    back = ThetaSketch.from_bytes(as_v1(th))
    assert back.estimate() == th.estimate()

    td = TDigest()
    td.update(rng.standard_normal(500))
    assert TDigest.from_bytes(as_v1(td)).quantile(0.5) == td.quantile(0.5)

    cms = CountMinSketch(width=256, depth=4)
    cms.update(rng.integers(0, 2**63, 500, dtype=np.int64).view(np.uint64))
    assert np.array_equal(CountMinSketch.from_bytes(as_v1(cms)).table,
                          cms.table)

    bf = BloomFilter(1 << 12, 4)
    bf.update(rng.integers(0, 2**63, 100, dtype=np.int64).view(np.uint64))
    with pytest.raises(ValueError, match="reads v2"):
        BloomFilter.from_bytes(as_v1(bf))
    h = HyperLogLog(p=10)
    h.update(rng.integers(0, 2**63, 100, dtype=np.int64).view(np.uint64))
    with pytest.raises(ValueError, match="reads v2"):
        HyperLogLog.from_bytes(as_v1(h))
    assert _MAGIC == b"SKCH"


def test_wire_crc_integrity_matrix(rng):
    """v3+ blobs carry a CRC32 (v3: params+payload; v4: header too): ANY
    corruption — including the truncations length checks cannot see
    (sparse Bloom/HLL pairs and theta retained samples cut exactly at an
    entry boundary parse as a VALID smaller state; for a Bloom membership
    blob that is silent false negatives) — fails loudly at from_bytes.
    v2 (pre-CRC) and v3 (body-only CRC) blobs stay readable: integrity is
    enforced exactly as each writer promised it. v4 additionally makes
    header flips (tag/plen) a structural CRC failure rather than relying
    on per-type payload-geometry guards."""
    import struct
    from bloomfilter_spark.sketches.base import _MAGIC, _VERSION
    from bloomfilter_spark.sketches.mg import MisraGries
    from bloomfilter_spark.sketches.scalable import ScalableBloomFilter
    from bloomfilter_spark.sketches.theta import ThetaSketch

    h = rng.integers(0, 2**63, 5000, dtype=np.int64).view(np.uint64)
    few = h[:64]
    vals = rng.standard_normal(5000)
    dense_bf = BloomFilter(1 << 14, 5)
    dense_bf.update(h)
    sparse_bf = BloomFilter(1 << 20, 5)   # 64 keys in 2^20 bits -> sparse wire
    sparse_bf.update(few)
    sparse_hll = HyperLogLog(14)          # 64 keys in 2^14 registers -> sparse
    sparse_hll.update(few)
    cms = CountMinSketch(width=512, depth=4)
    cms.update(h)
    th = ThetaSketch(k=256)
    th.update(h)
    mg = MisraGries(64)
    mg.update(h)
    kll = KLL(128)
    kll.update(vals)
    td = TDigest()
    td.update(vals)
    sbf = ScalableBloomFilter(0.01, initial_capacity=256)
    for chunk in np.array_split(h, 4):
        sbf.update(chunk)
    hll = HyperLogLog(10)
    hll.update(h)

    import zlib
    from bloomfilter_spark.sketches import sketch_from_bytes

    head_fmt = "<4sBBI"
    body_off = struct.calcsize(head_fmt) + 4  # header + CRC word
    for sk in (dense_bf, sparse_bf, hll, sparse_hll, cms, th, mg, kll, td, sbf):
        cls = type(sk)
        blob = sk.to_bytes()
        assert blob[4] == _VERSION  # writer stamps the current version
        cls.from_bytes(blob)        # intact blob parses

        # one flipped byte anywhere in params/payload -> CRC failure
        for idx in (body_off + 2, len(blob) - 1):
            bad = bytearray(blob)
            bad[idx] ^= 0xFF
            with pytest.raises(ValueError, match="CRC32"):
                cls.from_bytes(bytes(bad))

        # truncation inside the body -> loud error (CRC or length check)
        with pytest.raises(ValueError):
            cls.from_bytes(blob[:-7])

        # a v2 blob of the SAME body (CRC word dropped, version byte
        # downgraded) parses: pre-CRC warehouses stay readable
        magic, _, tag, plen = struct.unpack_from("<4sBBI", blob, 0)
        v2 = struct.pack("<4sBBI", magic, 2, tag, plen) + blob[body_off:]
        cls.from_bytes(v2)

        # a v3 blob as the OLD writer produced it (CRC over body only)
        # still verifies and parses: v3 warehouses stay readable
        body = blob[body_off:]
        v3 = (struct.pack("<4sBBI", magic, 3, tag, plen)
              + struct.pack("<I", zlib.crc32(body)) + body)
        assert cls.from_bytes(v3).to_bytes() == blob

        # v4 structural header coverage: a plen flip fails the CRC
        # (v3 relied on the per-type params guard catching the mis-slice)
        bad_plen = bytearray(blob)
        bad_plen[6] ^= 0x01
        with pytest.raises(ValueError, match="CRC32"):
            cls.from_bytes(bytes(bad_plen))

    # v4 type-confusion guard: flip Bloom's tag byte to HLL's and dispatch
    # by tag (the SQL-surface path) — the CRC rejects it BEFORE HLL's
    # payload guards ever see the alien body
    confused = bytearray(dense_bf.to_bytes())
    assert confused[5] == 1
    confused[5] = 2
    with pytest.raises(ValueError, match="CRC32"):
        sketch_from_bytes(bytes(confused))

    # The motivating cases: entry-boundary truncation used to reconstruct
    # silently smaller state (sparse Bloom 12-byte pairs, sparse HLL
    # 5-byte pairs, theta 8-byte samples); CRC now rejects all three.
    for sk, entry in ((sparse_bf, 12), (sparse_hll, 5), (th, 8)):
        blob = sk.to_bytes()
        with pytest.raises(ValueError, match="CRC32"):
            type(sk).from_bytes(blob[:-entry])


# --- Misra-Gries ----------------------------------------------------------

def _zipf_stream(rng, n=20000, n_keys=500, a=1.4):
    keys = hashes(rng, n_keys)
    idx = np.minimum(rng.zipf(a, n) - 1, n_keys - 1)
    return keys[idx]


def _exact_counts(stream):
    uniq, cnt = np.unique(stream, return_counts=True)
    return dict(zip(uniq.tolist(), cnt.tolist()))


def test_mg_exact_mode(rng):
    """k >= distinct keys: never trims, dec == 0, counts exact."""
    from bloomfilter_spark.sketches import MisraGries
    stream = _zipf_stream(rng, n=5000, n_keys=100)
    mg = MisraGries(k=256)
    mg.update(stream)
    assert mg.dec == 0 and mg.n == stream.size
    exact = _exact_counts(stream)
    got = mg.query(np.array(list(exact), dtype=np.uint64))
    assert got.tolist() == list(exact.values())


def test_mg_sandwich_and_bound(rng):
    """Small k: stored <= true <= stored + dec for EVERY key (present or
    evicted), and dec <= (n - M)/(k+1) — the Mergeable Summaries Lemma 1
    invariants, deterministic (no failure probability)."""
    from bloomfilter_spark.sketches import MisraGries
    stream = _zipf_stream(rng)
    k = 16
    mg = MisraGries(k=k)
    for chunk in np.array_split(stream, 7):      # batched arrival
        mg.update(chunk)
    exact = _exact_counts(stream)
    probes = np.array(list(exact), dtype=np.uint64)
    lo = mg.query(probes)
    true = np.array(list(exact.values()))
    assert np.all(lo <= true)
    assert np.all(true <= lo + mg.dec)
    m_stored = int(mg.counts.sum())
    assert mg.dec <= (mg.n - m_stored) / (k + 1)
    # absent key probes answer 0
    assert mg.query(np.array([3], dtype=np.uint64)).tolist() == [0]


def test_mg_merge_keeps_invariants(rng):
    """Random 4-way split, independent partials, pairwise merges in two
    different association orders: bounds hold for both results and n/dec
    bookkeeping is consistent (estimate-bounds contract, like KLL)."""
    from bloomfilter_spark.sketches import MisraGries
    stream = _zipf_stream(rng)
    parts = np.array_split(rng.permutation(stream), 4)
    sks = []
    for p in parts:
        s = MisraGries(k=24)
        s.update(p)
        sks.append(s)
    left = sks[0].copy().merge(sks[1]).merge(sks[2]).merge(sks[3])
    right = sks[2].copy().merge(sks[3]).merge(sks[0]).merge(sks[1])
    exact = _exact_counts(stream)
    probes = np.array(list(exact), dtype=np.uint64)
    true = np.array(list(exact.values()))
    for merged in (left, right):
        assert merged.n == stream.size
        lo = merged.query(probes)
        assert np.all(lo <= true)
        assert np.all(true <= lo + merged.dec)
        assert merged.dec <= merged.n / (merged.k + 1)


def test_mg_heavy_hitters_zero_fn(rng):
    """Every true phi-frequent key survives in heavy_hitters(phi)."""
    from bloomfilter_spark.sketches import MisraGries
    stream = _zipf_stream(rng, a=1.2)
    mg = MisraGries(k=32)
    mg.update(stream)
    phi = 0.02
    exact = _exact_counts(stream)
    frequent = {h for h, c in exact.items() if c >= phi * stream.size}
    got_items, _ = mg.heavy_hitters(phi)
    assert frequent <= set(got_items.tolist())


def test_mg_weighted_equals_repeated(rng):
    """update(keys, counts) == the same multiset fed unweighted."""
    from bloomfilter_spark.sketches import MisraGries
    keys = hashes(rng, 40)
    w = rng.integers(1, 9, 40)
    a = MisraGries(k=8)
    a.update(keys, w)
    b = MisraGries(k=8)
    b.update(np.repeat(keys, w))
    assert a.n == b.n == int(w.sum())
    probes = np.unique(keys)
    true = np.array([int(w[keys == p].sum()) for p in probes])
    for sk in (a, b):
        lo = sk.query(probes)
        assert np.all(lo <= true) and np.all(true <= lo + sk.dec)


def test_mg_serialization_roundtrip_and_errors(rng):
    from bloomfilter_spark.sketches import MisraGries, sketch_from_bytes
    mg = MisraGries(k=16)
    mg.update(_zipf_stream(rng, n=3000))
    back = sketch_from_bytes(mg.to_bytes())
    assert isinstance(back, MisraGries)
    assert back.k == mg.k and back.n == mg.n and back.dec == mg.dec
    assert np.array_equal(back.items, mg.items)
    assert np.array_equal(back.counts, mg.counts)
    with pytest.raises(ValueError, match="k mismatch"):
        mg.merge(MisraGries(k=8))
    with pytest.raises(ValueError, match="negative"):
        mg.update(hashes(rng, 3), np.array([1, -2, 3]))
    with pytest.raises(ValueError, match="k must be"):
        MisraGries(k=0)


def test_wire_exhaustive_prefix_and_flip_fuzz(rng):
    """The strongest form of the wire-integrity claim, verified by brute
    force on small sketches of all 14 families: EVERY strict prefix of a
    blob and EVERY sampled single-byte flip (header bytes exhaustively,
    body positions sampled) raises — nothing parses to silently different
    state. Since v4 the header sits inside the CRC, so tag/plen flips are
    structural CRC failures; version-byte flips land outside the accepted
    [MIN_WIRE_VERSION, 4] range (all single-bit flips of 0x04 do)."""
    from bloomfilter_spark.sketches.mg import MisraGries
    from bloomfilter_spark.sketches.scalable import ScalableBloomFilter
    from bloomfilter_spark.sketches.theta import ThetaSketch

    h = rng.integers(0, 2**63, 2000, dtype=np.int64).view(np.uint64)
    vals = rng.standard_normal(2000)
    sketches = []
    bf = BloomFilter(1 << 12, 5); bf.update(h); sketches.append(bf)
    sh = HyperLogLog(10); sh.update(h[:150]); sketches.append(sh)  # sparse
    cm = CountMinSketch(width=64, depth=3); cm.update(h); sketches.append(cm)
    kl = KLL(64); kl.update(vals); sketches.append(kl)
    td = TDigest(50); td.update(vals); sketches.append(td)
    mg = MisraGries(8); mg.update(h); sketches.append(mg)
    th = ThetaSketch(k=64); th.update(h); sketches.append(th)
    sb = ScalableBloomFilter(0.01, initial_capacity=128); sb.update(h)
    sketches.append(sb)
    from bloomfilter_spark.sketches.sample import SampleSketch
    sp = SampleSketch(k=64)
    sp.update(h, [f"pl-{i}".encode() for i in range(len(h))])
    sketches.append(sp)
    from bloomfilter_spark.sketches.counting import CountingBloomFilter
    cb = CountingBloomFilter(1 << 12, 5); cb.update(h[:100])  # sparse
    sketches.append(cb)
    cb2 = CountingBloomFilter(64, 2); cb2.update(h)  # dense
    sketches.append(cb2)
    from bloomfilter_spark.sketches.wsample import WeightedSampleSketch
    ws = WeightedSampleSketch(k=64)
    ws.update(h, (h % np.uint64(97)).astype(np.float64) + 1.0,
              [f"pl-{i}".encode() for i in range(len(h))])
    sketches.append(ws)
    from bloomfilter_spark.sketches.iblt import IBLT
    ib = IBLT(1 << 12, 4); ib.update(h[:40]); sketches.append(ib)  # sparse
    ib2 = IBLT(128, 4); ib2.update(h); ib2.delete(h[:500])
    sketches.append(ib2)  # dense, mixed-sign cells
    from bloomfilter_spark.sketches.ddsketch import DDSketch
    dd = DDSketch(0.02)
    dd.update(np.concatenate([np.exp(vals), -np.exp(vals[:300]),
                              np.zeros(5)]))
    sketches.append(dd)  # both stores + zero bucket
    dd2 = DDSketch(0.002, bucket_limit=16)
    dd2.update(np.exp(3.0 * vals))
    assert dd2.collapsed
    sketches.append(dd2)  # collapsed flag set on the wire
    from bloomfilter_spark.sketches.fd import FrequentDirections
    fd = FrequentDirections(ell=8)
    fd.update(vals[:200].reshape(20, 10))
    sketches.append(fd)  # matrix sketch: float payload, params-gated

    for sk in sketches:
        cls = type(sk)
        blob = sk.to_bytes()
        for cut in range(len(blob)):          # every strict prefix
            with pytest.raises(ValueError):
                cls.from_bytes(blob[:cut])
        header = np.arange(10)
        body = rng.choice(np.arange(10, len(blob)),
                          size=min(150, len(blob) - 10), replace=False)
        for pos in np.concatenate([header, body]):
            for bit in (0, 7):
                bad = bytearray(blob)
                bad[pos] ^= 1 << bit
                with pytest.raises(ValueError):
                    cls.from_bytes(bytes(bad))
