"""Vectorized numpy primitives shared by all sketch kernels.

These replace the reference's C hashing/bit-twiddling layer
(/root/reference/cbits/lookup3.c, Data/BloomFilter/Util.hs) with
branch-free numpy operations over whole Arrow batches — no per-row
Python anywhere (mandated by BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_M64 = U64(0xFFFFFFFFFFFFFFFF)


def next_power_of_two(n: int) -> int:
    """Nearest power of two >= n (reference: Data/BloomFilter/Util.hs:21-32,
    bit-smearing round-up; here via int.bit_length)."""
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def log2_power_of_two(n: int) -> int:
    """Integer log2 of a power of two (reference: Data/BloomFilter.hs:318-321)."""
    return n.bit_length() - 1


def to_u64(x) -> np.ndarray:
    """Reinterpret an int64 array/Series (e.g. Spark xxhash64 output) as uint64."""
    arr = np.asarray(x, dtype=np.int64)
    return arr.view(U64)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (public domain, Steele/Lea/Flood 2014) — used to
    derive independent 64-bit streams from one base hash, replacing the
    reference's second lookup3 pass (hashword2, cbits/lookup3.c:114-149)."""
    with np.errstate(over="ignore"):
        z = (x + U64(0x9E3779B97F4A7C15)) & _M64
        z = (z ^ (z >> U64(30))) * U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> U64(27))) * U64(0x94D049BB133111EB)
        return z ^ (z >> U64(31))


def splitmix64_scalar(x: int) -> int:
    z = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


# clz of one byte: _CLZ8[b] = leading zeros within 8 bits (b==0 -> 8)
_CLZ8 = np.array([8, 7, 6, 6, 5, 5, 5, 5] + [4] * 8 + [3] * 16 + [2] * 32
                 + [1] * 64 + [0] * 128, dtype=np.uint8)


def clz64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros for uint64 (no float round-trip,
    so ranks are bit-exact and platform-independent). x==0 -> 64.

    Bytewise: view as big-endian bytes, find the first nonzero byte, add its
    8-bit LUT clz — one pass over n x 8 bytes, ~2.5x faster than the
    shift-halving loop."""
    b = np.ascontiguousarray(x, dtype=">u8").view(np.uint8).reshape(-1, 8)
    nz = b != 0
    first = nz.argmax(axis=1)
    vals = b[np.arange(b.shape[0]), first]
    out = first * 8 + _CLZ8[vals]
    out[~nz.any(axis=1)] = 64
    return out.astype(np.int64)


def km_probes(h: np.ndarray, k: int, m_mask: int) -> np.ndarray:
    """Kirsch–Mitzenmacher probe matrix, canonical multiply form over 64-bit
    halves: probe_i = (h1 + i*h2) & (m-1), h2 forced odd.

    The reference uses a 32-bit shift variant (h1 + (h2 >> i),
    Data/BloomFilter/Hash.hs:131-156) which caps m at 2^32 bits; we keep its
    2-inspection property but widen to 64-bit so m scales to 2^63 (documented
    deviation, SURVEY.md §2.3/§4). Returns shape (k, n) uint64.
    """
    h1 = h
    h2 = splitmix64(h) | U64(1)
    i = np.arange(k, dtype=U64)[:, None]
    with np.errstate(over="ignore"):
        probes = (h1[None, :] + i * h2[None, :]) & U64(m_mask)
    return probes


def km_probes_shift32(h: np.ndarray, k: int, m_mask: int) -> np.ndarray:
    """Reference-parity shift variant: h1 = high 32 bits, h2 = low 32 bits,
    probe_i = (h1 + (h2 >> i)) & (m-1) (Data/BloomFilter/Hash.hs:149-156).
    Valid for m <= 2^32 and k <= 32 (beyond i=31 probes degenerate to h1,
    same as the reference)."""
    h1 = h >> U64(32)
    h2 = h & U64(0xFFFFFFFF)
    i = np.arange(k, dtype=U64)[:, None]
    with np.errstate(over="ignore"):
        probes = (h1[None, :] + (h2[None, :] >> i)) & U64(m_mask)
    return probes


def or_into_bits(words: np.ndarray, probes: np.ndarray) -> None:
    """Set bit positions `probes` (flat bit indices, any shape) in the packed
    uint64 word array in place.

    Equivalent of the reference's per-element unsafeWrite loop
    (Data/BloomFilter/Mutable.hs:123-128) but batched: sort word indices,
    segment-OR masks with bitwise_or.reduceat, then one scatter per distinct
    word — far faster than np.bitwise_or.at's unbuffered per-element loop.
    """
    p = probes.ravel()
    if p.size == 0:
        return
    p = np.sort(p)  # sorting bit indices sorts their words (monotone >> 6)
    w_sorted = (p >> U64(6)).astype(np.int64)
    m_sorted = U64(1) << (p & U64(63))
    starts = np.flatnonzero(np.concatenate(([True], w_sorted[1:] != w_sorted[:-1])))
    ored = np.bitwise_or.reduceat(m_sorted, starts)
    words[w_sorted[starts]] |= ored


def test_bits(words: np.ndarray, probes: np.ndarray) -> np.ndarray:
    """All-k-bits-set membership test. probes shape (k, n) -> bool (n,).

    Reference semantics: `all` over k probe bit tests (Data/BloomFilter.hs:192-194);
    short-circuit traded for batch vectorization (SURVEY.md §4)."""
    w = (probes >> U64(6)).astype(np.int64)
    b = probes & U64(63)
    hit = (words[w] >> b) & U64(1)
    return hit.all(axis=0)
