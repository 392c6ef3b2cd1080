"""Counting Bloom filter — the delete-capable extension of the engine's
center-of-gravity Bloom filter (Fan, Cao, Almeida & Broder, "Summary
Cache", IEEE/ACM ToN 2000, §4.3), sharing the reference's exact geometry
and probe scheme so membership semantics line up bit-for-bit with
`BloomFilter` built over the same keys:

  - power-of-two cell count, mask addressing (reference
    /root/reference/Data/BloomFilter/Mutable.hs:81-94)
  - Kirsch–Mitzenmacher double hashing, value inspected <= 2x for any k
    (/root/reference/Data/BloomFilter/Hash.hs:131-156; km64 default +
    `shift32` reference-parity variant, same as bloom.py)
  - zero false negatives for every key whose inserts have not been
    matched by deletes (/root/reference/Data/BloomFilter.hs:16-18)

What the counters buy over the bit array (the reference has no delete —
its filters are immutable-once-frozen): each of the k probe positions
holds a uint32 occupancy count instead of one bit, so

  insert  = +1 on the key's k cells        (vectorized, multiset-exact)
  delete  = -1 on the k cells, ONLY for keys that currently test
            positive; underflow fails loudly (see `delete`)
  member  = all k cells > 0  — identical truth value to a plain Bloom
            over the same remaining multiset
  query   = min over the k cells — a CMS-style upper bound on the key's
            remaining multiplicity (a CBF *is* a 1-row-per-hash CMS)

Merge is element-wise SATURATING addition (sticky at 2^32-1), which is
associative and commutative with the empty filter as identity — once a
cell saturates it stays saturated, and a saturated cell is never
decremented (Fan et al. §4.3's overflow rule). Saturation therefore can
only ever produce stale *positives*, never a false negative, preserving
the membership contract under any merge/delete schedule. At 4.29e9
occupancies per cell, reaching saturation requires a single key inserted
more times than a 10^12-turn corpus has turns — the guard is about
correctness-under-adversity, not an expected path.

Cost: 32x the memory of a plain Bloom at the same (m, k). The classic
4-bit-counter layout would cut that to 4x but saturates at 15, which at
transcript-corpus skew (one conv_id appearing 10^8 times) turns MOST hot
cells sticky and quietly disables delete where it matters; 32-bit
counters keep delete exact at any realistic skew. Size with
`sizing.suggest_sketch("counting_bloom", ...)` — same (m, k) math as the
reference's suggestSizing (/root/reference/Data/BloomFilter/Easy.hs:62-77),
byte budget reported at 4 bytes/cell.
"""

from __future__ import annotations

import struct

import numpy as np

from ..sizing import suggest_sizing
from ..util import (U64, km_probes, km_probes_shift32, log2_power_of_two,
                    next_power_of_two, or_into_bits)
from .base import Sketch
from .bloom import BloomFilter, _VARIANT_NAMES, _VARIANTS

_SAT = np.uint32(0xFFFFFFFF)


class CountingBloomFilter(Sketch):
    TYPE_TAG = 10
    # new family: first wire version it ever serialized under is v4
    MIN_WIRE_VERSION = 4
    HASH_KEYED = True

    def __init__(self, num_cells: int, num_hashes: int, variant: str = "km64"):
        if variant not in _VARIANTS:
            raise ValueError(f"unknown probe variant {variant!r}")
        m = max(64, next_power_of_two(num_cells))
        if variant == "shift32" and m > (1 << 32):
            raise ValueError("shift32 variant caps num_cells at 2^32 "
                             "(reference Mutable.hs:96-101); use km64")
        if num_hashes < 1:
            raise ValueError("num_hashes must be >= 1")
        self.num_cells = m
        self.num_hashes = num_hashes
        self.variant = variant
        self.mask = m - 1
        self.cells = np.zeros(m, dtype=np.uint32)

    @classmethod
    def for_capacity(cls, capacity: int, fpr: float,
                     variant: str = "km64") -> "CountingBloomFilter":
        m, k = suggest_sizing(capacity, fpr)
        return cls(m, k, variant=variant)

    # --- kernel ---------------------------------------------------------
    def _probes(self, hashes: np.ndarray) -> np.ndarray:
        if self.variant == "km64":
            return km_probes(hashes, self.num_hashes, self.mask)
        return km_probes_shift32(hashes, self.num_hashes, self.mask)

    @staticmethod
    def _coalesce(probes: np.ndarray, weights=None):
        """Collapse a (k, n) probe matrix (+ optional per-key int weights)
        into (unique cell indices, int64 increment per index) — one sorted
        unique pass instead of np.add.at's unbuffered per-element loop,
        and the exactness anchor for saturating arithmetic: the whole
        batch becomes ONE saturating add per touched cell."""
        flat = probes.ravel()
        if weights is None:
            idx, inc = np.unique(flat, return_counts=True)
            return idx.astype(np.int64), inc.astype(np.int64)
        k = probes.shape[0]
        w = np.broadcast_to(np.asarray(weights, dtype=np.int64), probes.shape[1])
        flat_w = np.tile(w, k)
        order = np.argsort(flat, kind="stable")
        sorted_idx = flat[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], sorted_idx[1:] != sorted_idx[:-1])))
        inc = np.add.reduceat(flat_w[order], starts)
        return sorted_idx[starts].astype(np.int64), inc

    def update(self, hashes: np.ndarray, weights=None) -> None:
        """Insert a batch of pre-hashed uint64 keys; ``weights`` (optional,
        positive ints — float weights from the agg pipeline are validated
        integral) insert each key with that multiplicity. Saturating: a
        cell pinned at 2^32-1 stays there (documented header rationale)."""
        h = np.ascontiguousarray(hashes, dtype=U64)
        if h.size == 0:
            return
        if weights is not None:
            w = np.asarray(weights, dtype=np.float64)
            if w.shape != h.shape:
                raise ValueError("weights shape must match hashes")
            if np.any(w < 0) or np.any(w != np.floor(w)):
                raise ValueError("counting-bloom weights must be "
                                 "non-negative integers (multiplicities)")
            weights = w.astype(np.int64)
        idx, inc = self._coalesce(self._probes(h), weights)
        new = self.cells[idx].astype(np.int64) + inc
        self.cells[idx] = np.minimum(new, np.int64(_SAT)).astype(np.uint32)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: all k cells > 0. No false negatives for
        keys whose inserts exceed their deletes."""
        h = np.ascontiguousarray(hashes, dtype=U64)
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        p = self._probes(h)
        return (self.cells[p.astype(np.int64)] > 0).all(axis=0)

    def query(self, hashes: np.ndarray) -> np.ndarray:
        """Upper bound on each key's remaining multiplicity: min over its
        k cells (the CBF *is* a CMS whose d rows share one array, so the
        Cormode–Muthukrishnan never-undercounts argument carries over)."""
        h = np.ascontiguousarray(hashes, dtype=U64)
        if h.size == 0:
            return np.zeros(0, dtype=np.int64)
        p = self._probes(h)
        return self.cells[p.astype(np.int64)].min(axis=0).astype(np.int64)

    def delete(self, hashes: np.ndarray) -> np.ndarray:
        """Delete a batch of keys. Returns a bool mask of keys actually
        deleted — those that test positive against the state at batch
        start; absent keys are skipped (True deletes, False no-ops), so a
        dedup pipeline can retract-if-present in one call.

        Two documented hazards of the structure, both handled loudly or
        conservatively rather than silently:

        - Deleting a FALSE POSITIVE decrements cells owned by other keys
          (inherent to the structure — Fan et al. §4.3). Callers that
          cannot tolerate this must track inserts exactly; the filter
          cannot distinguish a true member from a false positive by
          construction. The membership pre-check here blocks the larger
          class (deletes of keys that were never inserted and do not even
          test positive).
        - If a batch's combined decrements exceed a cell's count (e.g.
          the same once-inserted key deleted twice in one batch — both
          occurrences pass the pre-check, which reads batch-start state),
          the batch RAISES and the filter is left unchanged, because
          underflow would wrap to a huge count and silently corrupt
          membership.

        Saturated cells are never decremented (sticky — see header)."""
        h = np.ascontiguousarray(hashes, dtype=U64)
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        p = self._probes(h)
        present = (self.cells[p.astype(np.int64)] > 0).all(axis=0)
        if not present.any():
            return present
        idx, dec = self._coalesce(p[:, present])
        cur = self.cells[idx]
        live = cur != _SAT  # sticky saturation: never decrement
        if np.any(dec[live] > cur[live].astype(np.int64)):
            raise ValueError(
                "counting-bloom delete would underflow a cell (more "
                "decrements in this batch than the cell's count — "
                "double-delete or a false-positive delete); batch "
                "rejected, filter unchanged")
        out = cur.astype(np.int64) - np.where(live, dec, 0)
        self.cells[idx] = out.astype(np.uint32)
        return present

    def merge(self, other: "CountingBloomFilter") -> "CountingBloomFilter":
        """Multiset union: element-wise saturating add (associative,
        commutative, empty identity — sticky-at-max addition commutes
        because min(a+b, SAT) is order-independent)."""
        self._check_geometry(other)
        s = self.cells.astype(np.uint64) + other.cells.astype(np.uint64)
        np.minimum(s, np.uint64(_SAT), out=s)
        self.cells = s.astype(np.uint32)
        return self

    def fold(self, num_cells: int) -> "CountingBloomFilter":
        """EXACT size downgrade (absent saturation): saturating-add of
        halves, repeated. Same argument as BloomFilter.fold — probes are
        masked, so for pow-2 m' <= m the direct-build cell counts are the
        mod-m' column sums of this filter's counts. Byte-identical to a
        direct build at ``num_cells`` whenever no cell saturates (cells
        cap at 2^32-1 occupancies — see header). Source not mutated."""
        m = max(64, next_power_of_two(num_cells))
        if m > self.num_cells:
            raise ValueError(
                f"fold target {m} cells exceeds this filter's "
                f"{self.num_cells} (can only reduce; rebuild to grow)")
        out = CountingBloomFilter(m, self.num_hashes, variant=self.variant)
        c = self.cells.astype(np.uint64)
        while c.size > m:
            half = c.size // 2
            c = c[:half] + c[half:]
            np.minimum(c, np.uint64(_SAT), out=c)
        out.cells = c.astype(np.uint32)
        return out

    def to_bloom(self) -> BloomFilter:
        """Collapse to a plain BloomFilter (bit per non-zero cell) —
        byte-identical to a BloomFilter built directly over the same
        inserted keys when no deletes have occurred (identical probes,
        geometry, variant). The cheap wire/broadcast form once deletes
        are done: 1/32nd the bytes, same membership answers."""
        bf = BloomFilter(self.num_cells, self.num_hashes, variant=self.variant)
        nz = np.flatnonzero(self.cells).astype(U64)
        or_into_bits(bf.words, nz)
        return bf

    def _check_geometry(self, other: "CountingBloomFilter") -> None:
        if (self.num_cells, self.num_hashes, self.variant) != (
                other.num_cells, other.num_hashes, other.variant):
            raise ValueError(
                "geometry mismatch: cannot merge counting bloom filters")

    # --- stats ----------------------------------------------------------
    def occupied_count(self) -> int:
        """Number of non-zero cells (the Bloom bit_count analog)."""
        return int(np.count_nonzero(self.cells))

    def estimate(self) -> float:
        """Distinct-count estimate of the REMAINING multiset via the
        Swamidass–Baldi fill inversion over non-zero cells (same formula
        as BloomFilter.approx_cardinality; the non-zero cell set of a CBF
        equals the bit set of the equivalent plain Bloom)."""
        x = self.occupied_count()
        m, k = self.num_cells, self.num_hashes
        if x == 0:
            return 0.0
        if x >= m:
            return float("inf")
        return -(m / k) * np.log1p(-x / m)

    def fpp(self) -> float:
        """False-positive probability at OBSERVED occupancy: (X/m)^k with
        X = non-zero cells (same operational meaning as BloomFilter.fpp)."""
        return float((self.occupied_count() / self.num_cells) ** self.num_hashes)

    def __len__(self) -> int:
        return self.num_cells

    @property
    def state_nbytes(self) -> int:
        return self.cells.nbytes

    # --- serialization --------------------------------------------------
    def _payload(self) -> tuple[bytes, bytes]:
        """Payload = 1 mode byte + cells. Sparse mode (1) stores non-zero
        cells as (<u4 index, <u4 count) pairs when strictly smaller than
        dense — per-partition partials in the two-level merge touch
        <= k * rows/P cells of an m sized for all n, so partials ship
        sparse, same rationale as bloom.py. Mode is a deterministic
        function of content (byte-equality across build paths)."""
        params = struct.pack("<QIB", self.num_cells, self.num_hashes,
                             _VARIANTS[self.variant])
        cells = self.cells.astype("<u4", copy=False)
        nz = np.flatnonzero(cells)
        if 8 * nz.size < 4 * cells.size and cells.size <= 0xFFFFFFFF:
            payload = (b"\x01" + nz.astype("<u4").tobytes()
                       + cells[nz].tobytes())
        else:
            payload = b"\x00" + cells.tobytes()
        return params, payload

    @classmethod
    def _from_payload(cls, params: bytes, payload: bytes) -> "CountingBloomFilter":
        num_cells, num_hashes, var = struct.unpack("<QIB", params)
        f = cls(num_cells, num_hashes, variant=_VARIANT_NAMES[var])
        if not payload:  # params-only zero filter (warehouse factory)
            return f
        mode, body = payload[0], memoryview(payload)[1:]
        n_cells = f.cells.size
        if mode == 0:
            if len(body) != 4 * n_cells:
                raise ValueError("dense counting-bloom payload length != 4m")
            f.cells = np.frombuffer(body, dtype="<u4").astype(
                np.uint32, copy=True)
        elif mode == 1:
            nnz, rem = divmod(len(body), 8)
            if rem:
                raise ValueError(
                    "sparse counting-bloom payload not a multiple of 8")
            idx = np.frombuffer(body, dtype="<u4", count=nnz).astype(np.int64)
            if nnz and (idx.max() >= n_cells or idx.min() < 0):
                raise ValueError("sparse counting-bloom index out of range")
            vals = np.frombuffer(body, dtype="<u4", offset=4 * nnz,
                                 count=nnz)
            if nnz and (vals == 0).any():
                raise ValueError(
                    "sparse counting-bloom payload stores a zero count")
            f.cells[idx] = vals.astype(np.uint32)
        else:
            raise ValueError(f"unknown counting-bloom payload mode {mode}")
        return f

    def __repr__(self) -> str:
        return (f"CountingBloomFilter(m=2^{log2_power_of_two(self.num_cells)}, "
                f"k={self.num_hashes}, variant={self.variant})")
