"""IBLT (Invertible Bloom Lookup Table) kernel laws + set reconciliation.

The family's contract (sketches/iblt.py): every mutation is linear over
(Z^m, GF(2)^64m), so merge is associative/commutative with the empty table
as identity, subtract-then-decode lists the EXACT symmetric difference
while it fits the peeling capacity, insert-then-delete is a byte-exact
involution, and fold is byte-identical to a direct build at the smaller
geometry (Goodrich–Mitzenmacher 2011; Eppstein et al. SIGCOMM 2011).
"""

import numpy as np
import pytest

from bloomfilter_spark.sketches.iblt import IBLT, _CK
from bloomfilter_spark.util import U64, splitmix64


def _keys(lo, n):
    """Deterministic well-mixed uint64 key hashes (what hash_col feeds)."""
    return splitmix64(np.arange(lo, lo + n, dtype=np.uint64))


def test_subtract_decode_exact_symmetric_difference(rng):
    shared = _keys(1, 20_000)
    only_a = _keys(10**7, 120)
    only_b = _keys(2 * 10**7, 80)
    ta = IBLT.for_diff(300)
    tb = IBLT.for_diff(300)
    ta.update(np.concatenate([shared, only_a]))
    tb.update(np.concatenate([shared, only_b]))
    diff = ta.subtract(tb)
    pos, neg, complete = diff.decode()
    assert complete
    assert set(pos.tolist()) == set(only_a.tolist())
    assert set(neg.tolist()) == set(only_b.tolist())
    # estimate is the EXACT net count, available without peeling
    assert diff.estimate() == 120 - 80
    # subtraction must not mutate its inputs
    pos2, neg2, c2 = ta.subtract(tb).decode()
    assert c2 and np.array_equal(pos2, pos) and np.array_equal(neg2, neg)


def test_merge_algebra_assoc_comm_identity():
    a, b, c = IBLT(256, 4), IBLT(256, 4), IBLT(256, 4)
    a.update(_keys(1, 50))
    b.update(_keys(100, 60))
    c.update(_keys(200, 70))

    def blob(*parts):
        out = IBLT(256, 4)
        for p in parts:
            out.merge(IBLT.from_bytes(p.to_bytes()))
        return out.to_bytes()

    assert blob(a, b, c) == blob(c, b, a) == blob(b, a, c)   # commutative
    ab = IBLT.from_bytes(a.to_bytes()).merge(b)
    bc = IBLT.from_bytes(b.to_bytes()).merge(c)
    left = IBLT.from_bytes(ab.to_bytes()).merge(c)
    right = IBLT.from_bytes(a.to_bytes()).merge(bc)
    assert left.to_bytes() == right.to_bytes()                # associative
    zero = IBLT(256, 4)
    assert IBLT.from_bytes(a.to_bytes()).merge(zero).to_bytes() \
        == a.to_bytes()                                       # identity


def test_partitioned_build_merges_to_whole():
    """Partials over a PARTITION of the key set merge byte-exactly to the
    single-pass build — the distributed-build correctness law."""
    keys = _keys(1, 5_000)
    whole = IBLT(1024, 4)
    whole.update(keys)
    merged = IBLT(1024, 4)
    for chunk in np.array_split(keys, 7):
        part = IBLT(1024, 4)
        part.update(chunk)
        merged.merge(part)
    assert merged.to_bytes() == whole.to_bytes()


def test_insert_delete_involution_and_signed_counts():
    t = IBLT(256, 4)
    ka, kb = _keys(1, 40), _keys(500, 30)
    t.update(ka)
    t.delete(ka)
    assert t.to_bytes() == IBLT(256, 4).to_bytes()
    # delete-before-insert is a valid linear state, not an error
    t.delete(kb)
    t.update(kb)
    assert t.to_bytes() == IBLT(256, 4).to_bytes()
    # a pure negative table decodes on the neg side
    t.delete(kb)
    pos, neg, complete = t.decode()
    assert complete and pos.size == 0
    assert set(neg.tolist()) == set(kb.tolist())
    assert t.estimate() == -30


def test_wire_roundtrip_dense_and_sparse():
    # sparse: few occupied cells in a big table
    big = IBLT(1 << 14, 4)
    big.update(_keys(1, 10))
    b1 = big.to_bytes()
    assert len(b1) < 24 * big.num_cells  # actually took the sparse branch
    r1 = IBLT.from_bytes(b1)
    assert r1.to_bytes() == b1
    assert np.array_equal(r1.counts, big.counts)
    assert np.array_equal(r1.key_xor, big.key_xor)
    assert np.array_equal(r1.check_xor, big.check_xor)
    # dense: small table, most cells touched
    small = IBLT(64, 3)
    small.update(_keys(1, 500))
    b2 = small.to_bytes()
    r2 = IBLT.from_bytes(b2)
    assert r2.to_bytes() == b2
    # serialization is a pure function of content: kernel path == roundtrip
    assert np.array_equal(r2.counts, small.counts)


def test_params_only_zero_is_merge_identity():
    proto = IBLT(512, 5)
    proto.update(_keys(1, 100))
    params, _ = proto._payload()
    zero = IBLT._from_payload(params, b"")
    assert (zero.num_cells, zero.num_hashes) == (proto.num_cells, 5)
    assert zero.sub == proto.sub
    assert zero.merge(proto).to_bytes() == proto.to_bytes()


def test_fold_byte_equals_direct_build():
    keys = _keys(1, 800)
    big = IBLT(2048, 4)
    big.update(keys)
    direct = IBLT(256, 4)
    direct.update(keys)
    folded = big.fold(256)
    assert folded.to_bytes() == direct.to_bytes()
    # source not mutated; folding up refuses
    assert big.num_cells == 2048 and big.decode_capacity() > folded.decode_capacity()
    with pytest.raises(ValueError):
        direct.fold(2048)


def test_geometry_mismatch_and_param_validation():
    with pytest.raises(ValueError):
        IBLT(256, 4).merge(IBLT(512, 4))
    with pytest.raises(ValueError):
        IBLT(256, 4).subtract(IBLT(256, 5))
    with pytest.raises(ValueError):
        IBLT(256, 1)
    with pytest.raises(ValueError):
        IBLT(256, 8)


def test_incomplete_decode_returns_only_verified_keys():
    """An undersized table must DEGRADE, not lie: decode reports
    complete=False and every key it does list is genuinely in the
    difference (never garbage)."""
    only_a = _keys(10**7, 2_000)   # far beyond a 64-cell table's capacity
    t = IBLT(64, 4)
    t.update(only_a)
    pos, neg, complete = t.decode()
    assert not complete
    truth = set(only_a.tolist())
    assert all(int(p) in truth for p in pos.tolist())
    assert neg.size == 0


def test_decode_capacity_sizing_contract(rng):
    """for_diff(d) decodes d-sized differences w.h.p. — run 20 random
    trials at the sized capacity and require all to peel completely
    (failure prob per trial is O(d^-2) at k=4, far below 1/20)."""
    d = 200
    for trial in range(20):
        lo = 10**6 * (trial + 1)
        n_pos = int(rng.integers(0, d + 1))
        ka = _keys(lo, n_pos)
        kb = _keys(lo + 10**5, d - n_pos)
        ta, tb = IBLT.for_diff(d), IBLT.for_diff(d)
        ta.update(ka)
        tb.update(kb)
        pos, neg, complete = ta.subtract(tb).decode()
        assert complete
        assert set(pos.tolist()) == set(ka.tolist())
        assert set(neg.tolist()) == set(kb.tolist())
    assert IBLT.for_diff(d).decode_capacity() >= d
    assert IBLT.for_diff(d).num_cells >= _CK[4] * d


def test_estimate_exact_under_multiplicity():
    """estimate() is Σcounts/k — exact for any signed multiset, including
    repeated inserts (the builders dedupe; the kernel is honest about
    what a raw multiset state means)."""
    t = IBLT(256, 4)
    k10 = _keys(1, 10)
    t.update(k10)
    t.update(k10)          # multiplicity 2 each
    assert t.estimate() == 20.0
    t.delete(k10)
    assert t.estimate() == 10.0
    pos, neg, complete = t.decode()   # back to multiplicity 1 -> decodable
    assert complete and set(pos.tolist()) == set(k10.tolist())


def test_registered_in_family_registry():
    from bloomfilter_spark.sketches import SKETCH_TYPES, sketch_from_bytes
    assert SKETCH_TYPES[12] is IBLT
    t = IBLT(128, 4)
    t.update(_keys(1, 5))
    rt = sketch_from_bytes(t.to_bytes())
    assert isinstance(rt, IBLT) and rt.to_bytes() == t.to_bytes()


def test_occupied_count_and_state_nbytes():
    t = IBLT(1 << 10, 4)
    assert t.occupied_count() == 0
    t.update(_keys(1, 3))
    assert 1 <= t.occupied_count() <= 12
    assert t.state_nbytes == (8 + 8 + 8) * (1 << 10)
