"""Frequent Directions kernel + distributed-build tests (Liberty KDD'13;
Ghashami et al. SICOMP'16). Load-bearing claims:

1. Deterministic spectral bound: 0 <= A^T A - B^T B (psd order) and
   ||A^T A - B^T B||_2 <= ||A||_F^2 / ell, for sequential AND any
   partitioned/merged build (mergeable-summaries composition).
2. n / total_fnorm2 are exact under any chunking (plain addition), so
   cov_error_bound() is computable from the blob alone.
3. Top singular directions of low-rank streams are recovered.
4. Wire roundtrip identity + corruption validation.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.sketches import FrequentDirections, sketch_from_bytes


def _spectral_gap(A: np.ndarray, fd: FrequentDirections) -> tuple[float, float]:
    ev = np.linalg.eigvalsh(A.T @ A - fd.cov())
    return float(ev.max()), float(ev.min())


def _lowrank(rng, n, d, r, noise=0.05):
    return (rng.standard_normal((n, r)) @ rng.standard_normal((r, d))
            + noise * rng.standard_normal((n, d)))


def test_liberty_bound_sequential_and_partitioned(rng):
    for (n, d, r) in ((4000, 24, 3), (2500, 48, 8)):
        A = _lowrank(rng, n, d, r)
        for ell in (8, 16, 32):
            fd = FrequentDirections(ell)
            fd.update(A)
            hi, lo = _spectral_gap(A, fd)
            assert hi <= fd.cov_error_bound() * (1 + 1e-9)
            assert lo >= -1e-8 * fd.total_fnorm2  # B^T B underestimates
            assert fd.n == n
            assert fd.total_fnorm2 == pytest.approx(float((A * A).sum()),
                                                    rel=1e-12)
            # partitioned build: stack-and-shrink composition keeps the
            # SAME bound (representation may differ — only the bound and
            # the exact counters are invariants)
            m = FrequentDirections(ell)
            for chunk in np.array_split(A, 9):
                part = FrequentDirections(ell)
                part.update(chunk)
                m.merge(part)
            hi_m, lo_m = _spectral_gap(A, m)
            assert hi_m <= m.cov_error_bound() * (1 + 1e-9)
            assert lo_m >= -1e-8 * m.total_fnorm2
            assert m.n == n and m.total_fnorm2 == pytest.approx(
                fd.total_fnorm2, rel=1e-12)


def test_top_directions_recovered_on_lowrank(rng):
    A = _lowrank(rng, 6000, 40, 3, noise=0.01)
    fd = FrequentDirections(ell=16)
    fd.update(A)
    sig, vt = fd.singular_directions(3)
    _, _, vtrue = np.linalg.svd(A, full_matrices=False)
    for i in range(3):
        assert abs(vt[i] @ vtrue[i]) > 0.98, i
    # sigma^2 underestimates true sigma^2 by at most the bound
    strue = np.linalg.svd(A, compute_uv=False)
    assert np.all(sig**2 <= strue[:3] ** 2 + 1e-6)
    assert np.all(strue[:3] ** 2 - sig**2 <= fd.cov_error_bound() * (1 + 1e-9))


def test_merge_identity_and_guards(rng):
    A = rng.standard_normal((500, 12))
    a = FrequentDirections(8)
    a.update(A)
    before = a.to_bytes()
    a.merge(FrequentDirections(8))  # empty identity: state unchanged
    assert a.to_bytes() == before
    z = FrequentDirections(8)
    z.merge(sketch_from_bytes(before))
    assert z.n == 500 and z.d == 12
    hi, _ = _spectral_gap(A, z)
    assert hi <= z.cov_error_bound() * (1 + 1e-9)
    with pytest.raises(ValueError, match="ell mismatch"):
        a.merge(FrequentDirections(16))
    b = FrequentDirections(8)
    b.update(rng.standard_normal((10, 7)))
    with pytest.raises(ValueError, match="d mismatch"):
        a.merge(b)
    from bloomfilter_spark.sketches import KLL
    with pytest.raises(ValueError, match="cannot merge"):
        a.merge(KLL(64))
    with pytest.raises(ValueError, match="row dimension"):
        a.update(rng.standard_normal((5, 9)))
    with pytest.raises(ValueError, match="ell must be"):
        FrequentDirections(1)


def test_domain_rule_and_shapes(rng):
    fd = FrequentDirections(8)
    fd.update(np.array([1.0, 2.0, 3.0]))  # 1-D row accepted as (1, d)
    assert fd.n == 1 and fd.d == 3
    rows = rng.standard_normal((6, 3))
    rows[2, 1] = np.nan
    rows[4, 0] = np.inf
    fd.update(rows)  # non-finite ROWS skipped
    assert fd.n == 5
    with pytest.raises(ValueError, match="rows, d"):
        fd.update(np.zeros((2, 2, 2)))


def test_wire_roundtrip_and_validation(rng):
    A = _lowrank(rng, 3000, 20, 4)
    fd = FrequentDirections(12)
    fd.update(A)
    blob = fd.to_bytes()
    r = sketch_from_bytes(blob)
    assert isinstance(r, FrequentDirections)
    assert r.to_bytes() == blob
    assert r.n == fd.n and r.total_fnorm2 == fd.total_fnorm2
    assert np.array_equal(r.buffer(), fd.buffer())
    hi, _ = _spectral_gap(A, r)
    assert hi <= r.cov_error_bound() * (1 + 1e-9)
    # params-only zero reconstruction (warehouse factory convention)
    z = FrequentDirections.from_bytes(FrequentDirections(12).to_bytes())
    assert z.n == 0 and z.buffer().shape[0] == 0
    # empty sketch with no d yet still roundtrips
    assert sketch_from_bytes(FrequentDirections(5).to_bytes()).ell == 5


def test_empty_buffer_roundtrip_keeps_mass(rng):
    """Regression (r6, round-5 ADVICE): a REAL sketch whose shrink zeroed
    every buffer row serializes with an empty payload — the roundtrip
    must keep n and the Frobenius mass (the blob otherwise claimed an
    exact Gram, cov_error_bound() == 0, and merges lost the mass)."""
    ell = 8
    fd = FrequentDirections(ell)
    fd.update(np.eye(2 * ell))  # 2*ell orthonormal rows: shrink zeroes all
    assert fd.buffer().shape[0] == 0 and fd.n == 2 * ell
    assert fd.cov_error_bound() > 0
    r = FrequentDirections.from_bytes(fd.to_bytes())
    assert r.n == fd.n
    assert r.total_fnorm2 == fd.total_fnorm2
    assert r.cov_error_bound() == fd.cov_error_bound()
    assert r.d == fd.d and r.buffer().shape[0] == 0
    # the deserialized blob merges without losing the accumulated mass
    other = FrequentDirections(ell)
    other.update(rng.standard_normal((5, 2 * ell)))
    before = other.total_fnorm2
    merged = other.merge(r)
    assert merged.n == 5 + 2 * ell
    assert merged.total_fnorm2 == pytest.approx(before + fd.total_fnorm2)
    # n == 0 keeps the pure params-only zero convention
    z = FrequentDirections.from_bytes(FrequentDirections(ell).to_bytes())
    assert z.n == 0 and z.total_fnorm2 == 0.0


def test_registry_and_sizing():
    from bloomfilter_spark.sketches import SKETCH_TYPES
    from bloomfilter_spark.sizing import SizingError, suggest_fd, suggest_sketch

    assert SKETCH_TYPES[FrequentDirections.TYPE_TAG] is FrequentDirections
    ell, frac, nbytes = suggest_fd(0.02, d=64)
    assert ell == 50 and frac == 0.02 and nbytes == 50 * 64 * 8 + 40
    out = suggest_sketch("fd", fnorm2_fraction=0.02, d=64)
    sk = FrequentDirections(**out["params"])
    assert sk.ell == 50
    # a sketch at the suggested ell meets the target fraction
    rng = np.random.default_rng(11)
    A = rng.standard_normal((4000, 64))
    sk.update(A)
    hi, _ = _spectral_gap(A, sk)
    assert hi <= 0.02 * sk.total_fnorm2 * (1 + 1e-9)
    with pytest.raises(SizingError):
        suggest_fd(0.0, d=8)
    with pytest.raises(SizingError):
        suggest_fd(0.1, d=0)


def test_embedding_principal_directions_operator(spark):
    """Distributed build over the real embeddings table: bound vs the
    exact Gram matrix, exact counters, partition invariance of the
    BOUND, NULL-vector handling."""
    from bloomfilter_spark.operators.similarity import (
        embedding_principal_directions)

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sk, sig, vt = embedding_principal_directions(df, "embedding",
                                                 ell=32, k=5)
    pdf = df.toPandas()
    A = np.vstack([np.asarray(v, dtype=np.float64)
                   for v in pdf["embedding"]])
    assert sk.n == len(A) and sk.d == A.shape[1]
    assert sk.total_fnorm2 == pytest.approx(float((A * A).sum()), rel=1e-6)
    hi, lo = _spectral_gap(A, sk)
    assert hi <= sk.cov_error_bound() * (1 + 1e-6)
    assert lo >= -1e-6 * sk.total_fnorm2
    assert sig.shape == (5,) and vt.shape == (5, sk.d)

    # different physical layout: counters exact, bound still holds
    sk2, _, _ = embedding_principal_directions(df.repartition(13),
                                               "embedding", ell=32)
    assert sk2.n == sk.n
    assert sk2.total_fnorm2 == pytest.approx(sk.total_fnorm2, rel=1e-9)
    hi2, _ = _spectral_gap(A, sk2)
    assert hi2 <= sk2.cov_error_bound() * (1 + 1e-6)

    # NULL vectors are skipped
    with_null = df.withColumn(
        "embedding", F.when(F.col("vec_id") % 50 == 0,
                            F.lit(None)).otherwise(F.col("embedding")))
    sk3, _, _ = embedding_principal_directions(with_null, "embedding",
                                               ell=16)
    assert sk3.n == with_null.where(F.col("embedding").isNotNull()).count()


def test_sketch_describe_on_fd_blob(spark, rng):
    import json

    from bloomfilter_spark.sql import register_sketch_sql

    register_sketch_sql(spark)
    fd = FrequentDirections(ell=8)
    fd.update(rng.standard_normal((40, 6)))
    spark.createDataFrame([(fd.to_bytes(),)], "s binary") \
         .createOrReplaceTempView("fd_t")
    d = json.loads(spark.sql("SELECT sketch_describe(s) AS d FROM fd_t")
                   .first()["d"])
    assert d["family"] == "FrequentDirections"
    assert d["ell"] == 8 and d["d"] == 6 and d["n"] == 40
    assert d["total_fnorm2"] == pytest.approx(fd.total_fnorm2)
    # no distinct-count meaning: sketch_estimate refuses with the family
    with pytest.raises(Exception, match="FrequentDirections"):
        spark.sql("SELECT sketch_estimate(s) FROM fd_t").collect()
