"""Bloom filter over a packed uint64 bit array — the engine's center of
gravity, re-expressing /root/reference/Data/BloomFilter.hs semantics as a
vectorized, mergeable aggregation state.

Semantics preserved from the reference:
  - power-of-two geometry, mask addressing (Mutable.hs:81-94, BloomFilter.hs:349-357)
  - Kirsch–Mitzenmacher double hashing, value inspected <= 2x for any k
    (Hash.hs:131-156); default widened to 64-bit multiply form, `shift32`
    variant reproduces the reference's exact probe scheme
  - zero false negatives (BloomFilter.hs:16-18), FPR <= configured bound at
    sized (m, k) (Easy.hs:62-77)
  - insert/elem/notElem/length/empty/singleton/fromList equivalents

Added beyond the reference (required by the merge-based distributed build):
  - union/merge: bitwise OR of same-geometry arrays, associative/commutative
    with empty as identity (SURVEY.md §2.1 note)
  - intersect: bitwise AND (upper-bound semantics)
  - canonical little-endian serialization
"""

from __future__ import annotations

import struct

import numpy as np

from ..sizing import suggest_sizing
from ..util import (U64, km_probes, km_probes_shift32, log2_power_of_two,
                    next_power_of_two, or_into_bits, test_bits)
from .base import Sketch

_VARIANTS = {"km64": 0, "shift32": 1}
_VARIANT_NAMES = {v: k for k, v in _VARIANTS.items()}


class BloomFilter(Sketch):
    TYPE_TAG = 1
    # v2 added the sparse/dense payload mode byte for this type
    MIN_WIRE_VERSION = 2
    HASH_KEYED = True

    def __init__(self, num_bits: int, num_hashes: int, variant: str = "km64"):
        if variant not in _VARIANTS:
            raise ValueError(f"unknown probe variant {variant!r}")
        m = max(64, next_power_of_two(num_bits))
        if variant == "shift32" and m > (1 << 32):
            raise ValueError("shift32 variant caps num_bits at 2^32 "
                             "(reference Mutable.hs:96-101); use km64")
        if num_hashes < 1:
            raise ValueError("num_hashes must be >= 1")
        self.num_bits = m
        self.num_hashes = num_hashes
        self.variant = variant
        self.mask = m - 1
        self.words = np.zeros(m // 64, dtype=U64)

    @classmethod
    def for_capacity(cls, capacity: int, fpr: float, variant: str = "km64") -> "BloomFilter":
        m, k = suggest_sizing(capacity, fpr)
        return cls(m, k, variant=variant)

    # --- kernel ---------------------------------------------------------
    def _probes(self, hashes: np.ndarray) -> np.ndarray:
        if self.variant == "km64":
            return km_probes(hashes, self.num_hashes, self.mask)
        return km_probes_shift32(hashes, self.num_hashes, self.mask)

    def update(self, hashes: np.ndarray) -> None:
        """Insert a batch of pre-hashed uint64 keys (MB.insert equivalent,
        batched: Mutable.hs:123-128)."""
        h = np.ascontiguousarray(hashes, dtype=U64)
        if h.size == 0:
            return
        or_into_bits(self.words, self._probes(h))

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership (elem equivalent, BloomFilter.hs:192-194).
        Returns bool array; no false negatives."""
        h = np.ascontiguousarray(hashes, dtype=U64)
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        return test_bits(self.words, self._probes(h))

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        """Union = bitwise OR; requires identical geometry (m, k, variant)."""
        self._check_geometry(other)
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    def intersect(self, other: "BloomFilter") -> "BloomFilter":
        self._check_geometry(other)
        np.bitwise_and(self.words, other.words, out=self.words)
        return self

    def fold(self, num_bits: int) -> "BloomFilter":
        """EXACT size downgrade: a new filter byte-identical to a direct
        build at ``num_bits`` (pow-2 clamped, >= 64) over the same hashes.

        Why it is exact: probes are ``(h1 + i*h2) & (m-1)`` (util.km_probes;
        the shift32 variant masks the same way), and for pow-2 m' <= m,
        ``x & (m'-1) == (x & (m-1)) & (m'-1)`` — so the direct-build bit set
        is the image of this filter's bit set under ``mod m'``, i.e. OR of
        the halves, repeated. k and variant are unchanged; FPR degrades to
        the OBSERVED fill (``fpp()`` reports it — overloaded folds are
        visible, zero false negatives are preserved by exactness). Source
        is not mutated. Enables merging warehoused filter tables built at
        different sizes (fold the bigger one down, then merge)."""
        m = max(64, next_power_of_two(num_bits))
        if m > self.num_bits:
            raise ValueError(
                f"fold target {m} bits exceeds this filter's {self.num_bits} "
                "(can only reduce size; rebuild to increase it)")
        out = BloomFilter(m, self.num_hashes, variant=self.variant)
        w = self.words.copy()
        while w.size > out.words.size:
            half = w.size // 2
            w = w[:half] | w[half:]
        out.words = w
        return out

    def _check_geometry(self, other: "BloomFilter") -> None:
        if (self.num_bits, self.num_hashes, self.variant) != (
                other.num_bits, other.num_hashes, other.variant):
            raise ValueError("geometry mismatch: cannot merge bloom filters")

    # --- stats ----------------------------------------------------------
    def bit_count(self) -> int:
        """Number of set bits (for load-factor / cardinality estimation)."""
        return int(np.bitwise_count(self.words).sum()) if hasattr(np, "bitwise_count") \
            else int(sum(bin(int(w)).count("1") for w in self.words))

    def approx_cardinality(self) -> float:
        """Swamidass–Baldi fill-ratio estimate: n ≈ -(m/k)·ln(1 − X/m)
        where X = set bits (Swamidass & Baldi, J. Chem. Inf. Model. 2007,
        eq. 8). Duplicate inserts set no new bits, so this estimates
        DISTINCT inserted keys — same semantics as HLL/theta `estimate`.
        Saturated filters (every bit set) return +inf."""
        x = self.bit_count()
        m, k = self.num_bits, self.num_hashes
        if x == 0:
            return 0.0  # explicit: -(m/k)·log1p(-0) would be IEEE -0.0
        if x >= m:
            return float("inf")
        return -(m / k) * np.log1p(-x / m)

    def estimate(self) -> float:
        """Distinct-count estimate (alias of :meth:`approx_cardinality`),
        giving Bloom blobs the same `estimate()` surface as HLL/theta so
        `sql.sketch_estimate` works on warehoused membership filters."""
        return self.approx_cardinality()

    def fpp(self) -> float:
        """Current false-positive probability at the OBSERVED fill:
        (X/m)^k, X = set bits — a non-member's k probes each hit a set bit
        independently with probability X/m (standard approximation,
        Mitzenmacher & Upfal §5.5.3). This is the operational "is this
        filter overloaded?" number: unlike the configured bound (fixed at
        sizing time for a planned capacity), it tracks actual inserts, so
        a filter fed past its capacity reports the degraded rate instead
        of the stale promise."""
        return float((self.bit_count() / self.num_bits) ** self.num_hashes)

    def __len__(self) -> int:
        """Size in bits (B.length, BloomFilter.hs:261-262)."""
        return self.num_bits

    @property
    def state_nbytes(self) -> int:
        return self.words.nbytes

    # --- serialization --------------------------------------------------
    def _payload(self) -> tuple[bytes, bytes]:
        """Payload = 1 mode byte + words. Mode 1 (sparse) stores only
        non-zero words as (<u4 word-index, <u8 word) pairs, chosen whenever
        strictly smaller than dense. A per-partition partial in the
        two-level merge touches <= k * rows/P bits of an m sized for ALL n
        rows, so partials are overwhelmingly sparse — this cuts the merge
        shuffle from O(P * m/8) bytes to O(k * n / 8) total. Mode is a
        deterministic function of content, preserving byte-equality across
        build paths."""
        params = struct.pack("<QIB", self.num_bits, self.num_hashes,
                             _VARIANTS[self.variant])
        words = self.words.astype("<u8", copy=False)
        nz = np.flatnonzero(words)
        # u4 word indices address <= 2^32 words (m <= 2^38 bits); beyond
        # that, sparse would silently wrap indices — stay dense (a filter
        # that big should be sharded anyway, plans.plan_bloom says so)
        if 12 * nz.size < 8 * words.size and words.size <= 0xFFFFFFFF:
            payload = (b"\x01" + nz.astype("<u4").tobytes()
                       + words[nz].tobytes())
        else:
            payload = b"\x00" + words.tobytes()
        return params, payload

    @classmethod
    def _from_payload(cls, params: bytes, payload: bytes) -> "BloomFilter":
        num_bits, num_hashes, var = struct.unpack("<QIB", params)
        f = cls(num_bits, num_hashes, variant=_VARIANT_NAMES[var])
        if not payload:  # params-only zero filter (warehouse factory)
            return f
        mode, body = payload[0], memoryview(payload)[1:]
        n_words = f.words.size
        if mode == 0:
            if len(body) != 8 * n_words:
                raise ValueError("dense bloom payload length != m/8")
            f.words = np.frombuffer(body, dtype="<u8").astype(U64, copy=True)
        elif mode == 1:
            nnz, rem = divmod(len(body), 12)
            if rem:
                raise ValueError("sparse bloom payload not a multiple of 12")
            idx = np.frombuffer(body, dtype="<u4", count=nnz).astype(np.int64)
            if nnz and (idx.max() >= n_words or idx.min() < 0):
                raise ValueError("sparse bloom word index out of range")
            f.words[idx] = np.frombuffer(body, dtype="<u8",
                                         offset=4 * nnz, count=nnz).astype(U64)
        else:
            raise ValueError(f"unknown bloom payload mode {mode}")
        return f

    def __repr__(self) -> str:
        return (f"BloomFilter(m=2^{log2_power_of_two(self.num_bits)}, "
                f"k={self.num_hashes}, variant={self.variant})")
