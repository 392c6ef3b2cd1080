"""Capacity / FPR sizing calculator.

Exact semantic port of the reference's ``safeSuggestSizing`` /
``suggestSizing`` (/root/reference/Data/BloomFilter/Easy.hs:62-92): scan
k = 1..100, minimize (bits, k) lexicographically where
bits = -k * n / ln(1 - eps**(1/k)), round bits up to the next power of two.

Deviation (documented, SURVEY.md §4): the reference rejects filters above
2^32-1 bits (32-bit hashes, Data/BloomFilter/Mutable.hs:96-101); this engine
hashes with 64 bits, so the cap is lifted to 2^63. ``safe_suggest_sizing``
keeps a ``max_bits`` parameter defaulting to the lifted cap;
``suggest_sizing_reference`` reproduces the reference's exact behavior
including its cap, for parity tests.
"""

from __future__ import annotations

import math

from .util import next_power_of_two

REFERENCE_MAX_BITS = 0xFFFFFFFF
ENGINE_MAX_BITS = 1 << 63


class SizingError(ValueError):
    pass


def safe_suggest_sizing(capacity: int, err_rate: float,
                        max_bits: int = ENGINE_MAX_BITS) -> tuple[int, int]:
    """Return (num_bits, num_hashes). Raises SizingError on invalid input,
    mirroring the reference's Left cases (Easy.hs:73-77,86-88)."""
    if capacity <= 0:
        raise SizingError("invalid capacity")
    if err_rate <= 0 or err_rate >= 1:
        raise SizingError("invalid error rate")
    best_bits = math.inf
    best_k = 1.0
    cap = float(capacity)
    for k in range(1, 101):
        kf = float(k)
        denom = math.log(1.0 - err_rate ** (1.0 / kf))
        bits = (-kf) * cap / denom
        if (bits, kf) < (best_bits, best_k):
            best_bits, best_k = bits, kf
    rounded = next_power_of_two(math.ceil(best_bits))
    if rounded <= 0 or rounded > max_bits:
        raise SizingError("capacity too large to represent")
    # reference allocates at least 64 bits (Mutable.hs:96-99: max 64)
    return max(rounded, 64), int(best_k)


def suggest_sizing(capacity: int, err_rate: float) -> tuple[int, int]:
    """Raising variant (Easy.hs:86-92) with the engine's 64-bit cap."""
    return safe_suggest_sizing(capacity, err_rate)


def suggest_sizing_reference(capacity: int, err_rate: float) -> tuple[int, int]:
    """Bit-for-bit reference parity (32-bit cap, no 64-bit floor adjustment
    beyond the reference's own MB.new clamp)."""
    return safe_suggest_sizing(capacity, err_rate, max_bits=REFERENCE_MAX_BITS)


def analytic_fpr(m: int, k: int, n: int) -> float:
    """Expected false-positive rate (1 - e^{-kn/m})^k for n inserted keys."""
    if n == 0:
        return 0.0
    return (1.0 - math.exp(-k * n / m)) ** k
