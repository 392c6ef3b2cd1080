"""Scalable Bloom filter (Almeida et al. 2007) — completing what the
reference only sketches.

The reference ships a vestigial scalable module (only `new` is exported, no
insert/query, absent from the cabal build — /root/reference/Data/BloomFilter/
Scalable/Mutable.hs:10-14, SURVEY.md §2.4). This engine finishes the design:
a list of fixed filters with geometrically growing capacity (x2) and a
geometric error-rate schedule (err * tightening^i, reference's `grow`
semantics at Scalable/Mutable.hs:41-48), plus the insert/query/serialize
surface the reference never shipped.

Used where capacity is unknown up front (streaming accumulation). Not
merge-friendly across arbitrary splits (levels differ per history) — for
distributed batch builds use the sized BloomFilter; this type targets
single-writer incremental growth, matching the reference's ST-confined
mutable intent.
"""

from __future__ import annotations

import struct

import numpy as np

from ..sizing import suggest_sizing
from ..util import U64
from .base import Sketch
from .bloom import BloomFilter

DEFAULT_INITIAL_CAPACITY = 1024  # reference: Scalable/Mutable.hs:62 (cap 1024)
DEFAULT_TIGHTENING = 0.5


class ScalableBloomFilter(Sketch):
    TYPE_TAG = 6
    HASH_KEYED = True

    def __init__(self, err_rate: float = 0.01,
                 initial_capacity: int = DEFAULT_INITIAL_CAPACITY,
                 tightening: float = DEFAULT_TIGHTENING):
        # reference validates tightening in (0,1): Scalable/Mutable.hs:50-56
        if not 0.0 < tightening < 1.0:
            raise ValueError("tightening ratio must be in (0, 1)")
        if not 0.0 < err_rate < 1.0:
            raise ValueError("invalid error rate")
        self.err_rate = err_rate
        self.initial_capacity = initial_capacity
        self.tightening = tightening
        self.filters: list[BloomFilter] = []
        self.capacities: list[int] = []
        self.counts: list[int] = []

    def _grow(self) -> None:
        """Next sub-filter: capacity x2, error x tightening (grow,
        Scalable/Mutable.hs:41-48)."""
        level = len(self.filters)
        cap = self.initial_capacity * (2 ** level)
        eps = self.err_rate * (self.tightening ** level)
        m, k = suggest_sizing(cap, eps)
        self.filters.append(BloomFilter(m, k))
        self.capacities.append(cap)
        self.counts.append(0)

    def update(self, hashes: np.ndarray) -> None:
        h = np.ascontiguousarray(hashes, dtype=U64)
        pos = 0
        while pos < h.size:
            if not self.filters or self.counts[-1] >= self.capacities[-1]:
                self._grow()
            room = self.capacities[-1] - self.counts[-1]
            chunk = h[pos:pos + room]
            self.filters[-1].update(chunk)
            self.counts[-1] += chunk.size
            pos += chunk.size

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        h = np.ascontiguousarray(hashes, dtype=U64)
        out = np.zeros(h.size, dtype=bool)
        for f in self.filters:
            out |= f.contains(h)
        return out

    @property
    def count(self) -> int:
        return sum(self.counts)

    def estimate(self) -> float:
        """Distinct-count estimate: sum of per-level Swamidass–Baldi
        fill-ratio estimates. Levels are disjoint insert windows, so
        duplicates WITHIN a level dedup for free; a key re-inserted after
        the filter grew counts once per level it landed in (the dedup
        streams that use this type probe `contains` before inserting, so
        cross-level repeats never reach `update` there). Upper-bounded by
        `count` (exact inserts) when every insert was membership-gated."""
        return float(sum(f.approx_cardinality() for f in self.filters))

    def fpp(self) -> float:
        """Current false-positive probability at the OBSERVED per-level
        fills: a probe answers positive iff ANY level does, and levels use
        independent hash offsets, so fpp = 1 − Π(1 − fpp_i). The
        actual-fill dual of :meth:`compound_error_bound` (the configured
        Almeida schedule bound): a membership-gated filter stays well
        under the compound bound because each level is frozen just as it
        reaches its designed fill."""
        miss = 1.0
        for f in self.filters:
            miss *= 1.0 - f.fpp()
        return float(1.0 - miss)

    def compound_error_bound(self) -> float:
        """Union bound over levels: sum of the level error schedule —
        converges to err/(1-tightening) (Almeida eq. 2.1)."""
        return sum(self.err_rate * self.tightening ** i
                   for i in range(len(self.filters)))

    def merge(self, other: "ScalableBloomFilter") -> "ScalableBloomFilter":
        """Level-wise merge, valid only for filters with identical growth
        histories (same schedule AND same level geometries); general merge
        of scalable filters is lossy by construction."""
        if (self.err_rate, self.initial_capacity, self.tightening) != (
                other.err_rate, other.initial_capacity, other.tightening):
            raise ValueError("schedule mismatch: cannot merge scalable blooms")
        while len(self.filters) < len(other.filters):
            self._grow()
        for i, f in enumerate(other.filters):
            self.filters[i].merge(f)
            self.counts[i] = min(self.counts[i] + other.counts[i],
                                 self.capacities[i])
        return self

    def _payload(self) -> tuple[bytes, bytes]:
        params = struct.pack("<ddII", self.err_rate, self.tightening,
                             self.initial_capacity, len(self.filters))
        blobs = []
        for f, cnt in zip(self.filters, self.counts):
            b = f.to_bytes()
            blobs.append(struct.pack("<IQ", len(b), cnt) + b)
        return params, b"".join(blobs)

    @classmethod
    def _from_payload(cls, params: bytes, payload: bytes) -> "ScalableBloomFilter":
        err, tight, cap0, n = struct.unpack("<ddII", params)
        s = cls(err, cap0, tight)
        off = 0
        for level in range(n):
            blen, cnt = struct.unpack_from("<IQ", payload, off)
            off += struct.calcsize("<IQ")
            s.filters.append(BloomFilter.from_bytes(payload[off:off + blen]))
            off += blen
            s.capacities.append(cap0 * (2 ** level))
            s.counts.append(cnt)
        if off != len(payload):
            raise ValueError(
                f"scalable-Bloom payload has {len(payload) - off} trailing "
                f"bytes after {n} declared levels — corrupted blob")
        return s

    def __repr__(self) -> str:
        return (f"ScalableBloomFilter(levels={len(self.filters)}, "
                f"n={self.count}, bound={self.compound_error_bound():.4g})")
