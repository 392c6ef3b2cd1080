"""Property-based kernel tests (hypothesis) — the engine's port of the
reference's QuickCheck suite (tests/QC.hs): random inputs, algebraic laws,
never golden values. Pure-kernel (no SparkSession), so hundreds of cases
run in seconds; the distributed analogs of these laws are asserted against
Spark in test_spark_agg / test_checkpoint.

Laws covered (reference property in parens):
- zero false negatives for ANY inserted set and ANY (m, k)   (prop_pai, QC.hs:17-18)
- chunking invariance: any partition of the input into update
  batches yields a byte-identical sketch                      (prop_rechunked_eq, QC.hs:52-60)
- merge is associative + commutative with `empty` identity    (north rule)
- suggestSizing output meets the requested FPR analytically   (Easy.hs:62-77 contract)
- CMS never under-counts; KLL rank error within bound; t-digest
  quantiles monotone and within data range                    (published bounds)
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from bloomfilter_spark.sizing import analytic_fpr, suggest_sizing
from bloomfilter_spark.sketches import (KLL, BloomFilter, CountMinSketch,
                                        HyperLogLog, TDigest)

# uint64 hash values as the reference's `Hashable a => [a]` analog: every
# Spark-side key reaches a kernel as its 64-bit hash
hashes = st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                  min_size=0, max_size=400)
nonempty_hashes = st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                           min_size=1, max_size=400)


def _u64(xs) -> np.ndarray:
    return np.array(xs, dtype=np.uint64)


def _chunks(xs, sizes):
    out, i = [], 0
    for s in sizes:
        out.append(xs[i:i + s])
        i += s
    out.append(xs[i:])
    return out


# --- Bloom -----------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(nonempty_hashes, st.integers(6, 14), st.integers(1, 10))
def test_bloom_zero_false_negatives_any_geometry(xs, log_m, k):
    bf = BloomFilter(1 << log_m, k)
    bf.update(_u64(xs))
    assert bf.contains(_u64(xs)).all()


@settings(max_examples=40, deadline=None)
@given(nonempty_hashes, st.lists(st.integers(0, 50), max_size=6))
def test_bloom_chunking_invariance(xs, sizes):
    one = BloomFilter(1 << 12, 5)
    one.update(_u64(xs))
    chunked = BloomFilter(1 << 12, 5)
    for c in _chunks(xs, sizes):
        if c:
            chunked.update(_u64(c))
    assert one.to_bytes() == chunked.to_bytes()


@settings(max_examples=40, deadline=None)
@given(hashes, hashes, hashes)
def test_bloom_merge_assoc_comm_identity(a, b, c):
    def bf(xs):
        f = BloomFilter(1 << 11, 4)
        if xs:
            f.update(_u64(xs))
        return f

    ab_c = bf(a).merge(bf(b)).merge(bf(c)).to_bytes()
    a_bc = bf(a).merge(bf(b).merge(bf(c))).to_bytes()
    ba = bf(b).merge(bf(a))
    ab = bf(a).merge(bf(b))
    assert ab_c == a_bc
    assert ab.to_bytes() == ba.to_bytes()
    assert bf(a).merge(bf([])).to_bytes() == bf(a).to_bytes()  # empty identity


# --- sizing ----------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(st.integers(1, 10_000_000), st.floats(1e-6, 0.5))
def test_suggest_sizing_meets_requested_fpr(n, eps):
    m, k = suggest_sizing(n, eps)
    assert m & (m - 1) == 0  # power of two (reference rounding)
    assert analytic_fpr(m, k, n) <= eps * (1 + 1e-9)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 1_000_000), st.floats(1e-4, 0.3))
def test_suggest_sizing_monotone_in_n(n, eps):
    m1, _ = suggest_sizing(n, eps)
    m2, _ = suggest_sizing(2 * n, eps)
    assert m2 >= m1


# --- HLL ---------------------------------------------------------------

@settings(max_examples=40, deadline=None)
@given(nonempty_hashes, st.lists(st.integers(0, 50), max_size=5))
def test_hll_chunking_invariance_and_merge(xs, sizes):
    one = HyperLogLog(10)
    one.update(_u64(xs))
    merged = HyperLogLog(10)
    for c in _chunks(xs, sizes):
        part = HyperLogLog(10)
        if c:
            part.update(_u64(c))
        merged.merge(part)
    assert (one.registers == merged.registers).all()
    assert one.estimate() == merged.estimate()


# --- CMS ---------------------------------------------------------------

@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=1, max_size=300))
def test_cms_never_undercounts(keys):
    h = np.array([hash((k, 7)) & ((1 << 64) - 1) for k in keys], dtype=np.uint64)
    cms = CountMinSketch(width=512, depth=4)
    cms.update(h)
    uniq, exact = np.unique(h, return_counts=True)
    est = cms.query(uniq)
    assert (est >= exact).all()
    assert (est <= exact + cms.error_bound() * 512 / np.e + len(keys)).all()


@settings(max_examples=30, deadline=None)
@given(nonempty_hashes, st.lists(st.integers(0, 50), max_size=5))
def test_cms_chunking_invariance(xs, sizes):
    one = CountMinSketch(width=256, depth=3)
    one.update(_u64(xs))
    chunked = CountMinSketch(width=256, depth=3)
    for c in _chunks(xs, sizes):
        part = CountMinSketch(width=256, depth=3)
        if c:
            part.update(_u64(c))
        chunked.merge(part)
    assert (one.table == chunked.table).all()
    assert one.total == chunked.total


# --- quantile sketches ---------------------------------------------------

values = st.lists(st.floats(-1e9, 1e9, allow_nan=False, allow_infinity=False),
                  min_size=2, max_size=500)


@settings(max_examples=40, deadline=None)
@given(values)
def test_kll_rank_error_within_bound(vs):
    x = np.array(vs, dtype=np.float64)
    sk = KLL(100)
    sk.update(x)
    for q in (0.1, 0.5, 0.9):
        est = sk.quantile(q)
        # with ties, the returned value's valid rank is the whole interval
        # [P(x < est), P(x <= est)] — the bound applies to the interval's
        # distance from q (standard KLL statement over item ranks)
        lo, hi = (x < est).mean(), (x <= est).mean()
        dist = max(0.0, lo - q, q - hi)
        assert dist <= 3 * sk.rank_error_bound() + 1.0 / x.size


@settings(max_examples=40, deadline=None)
@given(values)
def test_tdigest_quantiles_monotone_and_in_range(vs):
    x = np.array(vs, dtype=np.float64)
    td = TDigest(100)
    td.update(x)
    qs = np.linspace(0.01, 0.99, 9)
    est = np.array([td.quantile(q) for q in qs])
    assert (np.diff(est) >= -1e-9).all()
    assert est.min() >= x.min() - 1e-9 and est.max() <= x.max() + 1e-9


@settings(max_examples=30, deadline=None)
@given(values, st.lists(st.integers(0, 100), max_size=4))
def test_tdigest_merge_weight_conservation(vs, sizes):
    x = np.array(vs, dtype=np.float64)
    merged = TDigest(100)
    for c in _chunks(list(x), sizes):
        part = TDigest(100)
        if c:
            part.update(np.array(c))
        merged.merge(part)
    assert abs(merged.total_weight - x.size) < 1e-9


# --- OPH minhash kernel ---------------------------------------------------

texts = st.lists(st.text(min_size=0, max_size=120), min_size=1, max_size=40)


@settings(max_examples=30, deadline=None)
@given(texts, st.integers(1, 30))
def test_oph_signatures_chunk_invariant(ts, split):
    from bloomfilter_spark.operators.dedup import (_concat_shingle_hashes,
                                                   _oph_signatures)
    k = 5
    enc = [t.encode("utf-8", "ignore").ljust(k, b" ") for t in ts]
    lens = np.array([len(e) for e in enc])
    h, counts = _concat_shingle_hashes(enc, lens, k, 99)
    full = _oph_signatures(h, counts, 32)
    n1 = min(split, len(enc))
    parts = []
    for lo, hi in ((0, n1), (n1, len(enc))):
        if hi > lo:
            hh, cc = _concat_shingle_hashes(enc[lo:hi], lens[lo:hi], k, 99)
            parts.append(_oph_signatures(hh, cc, 32))
    assert np.array_equal(full, np.vstack(parts))


@settings(max_examples=30, deadline=None)
@given(st.text(min_size=0, max_size=200))
def test_oph_identical_docs_identical_signatures(t):
    from bloomfilter_spark.operators.dedup import (_concat_shingle_hashes,
                                                   _oph_signatures)
    k = 5
    enc = [t.encode("utf-8", "ignore").ljust(k, b" ")] * 2
    lens = np.array([len(e) for e in enc])
    h, counts = _concat_shingle_hashes(enc, lens, k, 1)
    sig = _oph_signatures(h, counts, 64)
    assert np.array_equal(sig[0], sig[1])


# --- Scalable Bloom (Almeida et al. 2007; Scalable/Mutable.hs design) -------

sched = st.tuples(st.floats(0.001, 0.1), st.integers(8, 256),
                  st.floats(0.2, 0.9))


@settings(max_examples=40, deadline=None)
@given(nonempty_hashes, st.lists(st.integers(0, 50), max_size=6), sched)
def test_scalable_bloom_zero_fn_any_chunking(xs, sizes, s):
    """Zero false negatives regardless of how inserts are chunked across
    growth boundaries (the reference's prop_pai at unknown capacity)."""
    from bloomfilter_spark.sketches.scalable import ScalableBloomFilter
    err, cap0, tight = s
    sbf = ScalableBloomFilter(err, cap0, tight)
    for chunk in _chunks(xs, sizes):
        if len(chunk):
            sbf.update(_u64(chunk))
    assert sbf.contains(_u64(xs)).all()
    assert sbf.count == len(xs)


@settings(max_examples=40, deadline=None)
@given(nonempty_hashes, sched)
def test_scalable_bloom_serialization_roundtrip(xs, s):
    from bloomfilter_spark.sketches.scalable import ScalableBloomFilter
    err, cap0, tight = s
    sbf = ScalableBloomFilter(err, cap0, tight)
    sbf.update(_u64(xs))
    back = ScalableBloomFilter.from_bytes(sbf.to_bytes())
    assert back.to_bytes() == sbf.to_bytes()
    assert back.contains(_u64(xs)).all()
    assert back.count == sbf.count
    assert back.compound_error_bound() == sbf.compound_error_bound()


@settings(max_examples=30, deadline=None)
@given(nonempty_hashes, nonempty_hashes)
def test_scalable_bloom_merge_superset(xs, ys):
    """Level-wise merge (same schedule): the merged filter contains every
    element of both inputs — the only law general scalable-merge supports
    (histories differ, so byte-equality with a single-writer build is not
    promised, unlike the sized BloomFilter)."""
    from bloomfilter_spark.sketches.scalable import ScalableBloomFilter
    a = ScalableBloomFilter(0.01, 64)
    b = ScalableBloomFilter(0.01, 64)
    a.update(_u64(xs))
    b.update(_u64(ys))
    a.merge(b)
    assert a.contains(_u64(xs)).all() and a.contains(_u64(ys)).all()


# --- DDSketch (13th family: relative-value-error quantiles) ----------------

finite_vals = st.lists(
    st.floats(min_value=-1e12, max_value=1e12,
              allow_nan=False, allow_infinity=False),
    min_size=0, max_size=400)


@settings(max_examples=50, deadline=None)
@given(finite_vals, st.lists(st.integers(0, 50), max_size=6))
def test_ddsketch_chunking_invariance(vs, sizes):
    """Any partition of the input into update batches / merged partials
    yields a byte-identical sketch (the counts are exactly additive) —
    prop_rechunked_eq for the value-sketch domain."""
    from bloomfilter_spark.sketches import DDSketch
    one = DDSketch(0.01)
    one.update(np.array(vs, dtype=np.float64))
    merged = DDSketch(0.01)
    for chunk in _chunks(vs, sizes):
        part = DDSketch(0.01)
        part.update(np.array(chunk, dtype=np.float64))
        merged.merge(part)
    assert merged.to_bytes() == one.to_bytes()


@settings(max_examples=50, deadline=None)
@given(finite_vals.filter(lambda v: len(v) > 0),
       st.floats(min_value=0.001, max_value=0.2),
       st.floats(min_value=0.0, max_value=1.0))
def test_ddsketch_relative_error_guarantee(vs, alpha, q):
    """For ANY finite data, alpha and q: |quantile(q) - x_q| <=
    alpha * |x_q| with x_q the exact rank item — the family's defining
    deterministic guarantee (Masson et al. VLDB 2019, Thm 1)."""
    from bloomfilter_spark.sketches import DDSketch
    s = DDSketch(alpha)
    v = np.array(vs, dtype=np.float64)
    s.update(v)
    xs = np.sort(v)
    exact = xs[int(np.floor(q * (len(xs) - 1)))]
    est = s.quantile(q)
    # equality is attained when a value sits exactly on a bucket's upper
    # edge (hypothesis finds e.g. v=1.5 at alpha=0.2, where gamma=1.5),
    # so allow ulp-scale headroom on the tight bound
    assert abs(est - exact) <= alpha * abs(exact) * (1 + 1e-9) + 1e-300


@settings(max_examples=50, deadline=None)
@given(finite_vals, st.floats(min_value=0.001, max_value=0.2),
       st.integers(16, 64))
def test_ddsketch_serialization_roundtrip(vs, alpha, limit):
    """to_bytes/from_bytes is the identity on state, including collapsed
    flags and both stores, at any geometry."""
    from bloomfilter_spark.sketches import DDSketch, sketch_from_bytes
    s = DDSketch(alpha, bucket_limit=limit)
    s.update(np.array(vs, dtype=np.float64))
    r = sketch_from_bytes(s.to_bytes())
    assert r.to_bytes() == s.to_bytes()
    assert r.n == s.n and r.zero_count == s.zero_count
    assert r.collapsed == s.collapsed


@settings(max_examples=40, deadline=None)
@given(finite_vals, finite_vals, finite_vals)
def test_ddsketch_merge_assoc_comm_identity(a, b, c):
    from bloomfilter_spark.sketches import DDSketch

    def mk(vals):
        s = DDSketch(0.02)
        s.update(np.array(vals, dtype=np.float64))
        return s

    left = mk(a).merge(mk(b)).merge(mk(c))
    right = mk(b).merge(mk(c)).merge(mk(a))
    assert left.to_bytes() == right.to_bytes()
    z = DDSketch(0.02)
    assert z.merge(mk(a)).to_bytes() == mk(a).to_bytes()
