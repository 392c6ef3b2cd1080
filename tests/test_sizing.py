"""Sizing-oracle tests: suggest_sizing reproduces the reference's
safeSuggestSizing outputs (formula and k-scan from
/root/reference/Data/BloomFilter/Easy.hs:62-77), including error cases."""

import math

import pytest

from bloomfilter_spark.sizing import (SizingError, analytic_fpr,
                                      safe_suggest_sizing,
                                      suggest_sizing_reference)

GOLDEN = {
    (1, 0.01): (64, 7),
    (100, 0.5): (256, 1),
    (1000, 0.001): (16384, 10),
    (10000, 0.01): (131072, 7),
    (100000, 0.01): (1048576, 7),
    (1000000, 0.1): (8388608, 3),
    (5000, 1e-6): (262144, 20),
    (12345, 0.02): (131072, 6),
}


@pytest.mark.parametrize("args,expected", sorted(GOLDEN.items()))
def test_golden_pairs(args, expected):
    assert safe_suggest_sizing(*args) == expected
    assert suggest_sizing_reference(*args) == expected


@pytest.mark.parametrize("cap", [0, -1, -100])
def test_invalid_capacity(cap):
    with pytest.raises(SizingError, match="invalid capacity"):
        safe_suggest_sizing(cap, 0.01)


@pytest.mark.parametrize("eps", [0.0, 1.0, -0.5, 1.5])
def test_invalid_error_rate(eps):
    with pytest.raises(SizingError, match="invalid error rate"):
        safe_suggest_sizing(100, eps)


def test_reference_cap_32bit():
    """Reference rejects > 2^32-1 bits (Easy.hs:75-77); engine lifts it."""
    with pytest.raises(SizingError, match="too large"):
        suggest_sizing_reference(10**9, 1e-6)
    m, k = safe_suggest_sizing(10**9, 1e-6)
    assert m > 0xFFFFFFFF and k >= 1


def test_power_of_two_and_bound():
    """m is a power of two and the analytic FPR at (m,k,n) stays within the
    requested bound (rounding up only lowers realized FPR)."""
    for (cap, eps), (m, k) in GOLDEN.items():
        assert m & (m - 1) == 0
        assert analytic_fpr(m, k, cap) <= eps * (1 + 1e-9)


def test_k_scan_is_minimizing():
    """The chosen (m,k) must not be beaten by any other k in 1..100 before
    rounding (lexicographic minimum, Easy.hs:70-74)."""
    cap, eps = 10000, 0.01
    m, k = safe_suggest_sizing(cap, eps)
    best = min(
        ((-kk) * cap / math.log(1 - eps ** (1.0 / kk)), kk)
        for kk in range(1, 101)
    )
    assert int(best[1]) == k
