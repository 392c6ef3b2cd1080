"""Misra–Gries frequent-items summary (deterministic heavy hitters).

Completes the frequency side of the family with the one guarantee CMS
cannot give: a DETERMINISTIC two-sided sandwich.  CMS never undercounts
but its overcount is probabilistic (eps*N with prob 1-delta); Misra–Gries
never OVERcounts and its undercount is bounded by a quantity the sketch
itself carries (``dec``), with no failure probability at all.  Together a
CMS + MG pair brackets every frequency from both sides unconditionally.

Published basis: Misra & Gries 1982 ("Finding repeated elements"); the
merge rule and its error analysis are Agarwal, Cormode, Huang, Phillips,
Wei, Yi, "Mergeable Summaries" (PODS 2012, §3.1): combine counters
pointwise, then subtract the (k+1)-th largest count from every counter
and drop the non-positive ones.  No reference-repo analog
(bos/bloomfilter has no frequency sketch); cited as the published
algorithm only.

State: at most ``k`` (item-hash, count) counters plus two scalars —
``n`` (total stream weight) and ``dec`` (total decrement ever applied,
summed across updates AND merges).  Invariants maintained by every
update/merge (asserted in tests):

  * lower bound:  stored(x) <= true(x)               (never overcounts)
  * upper bound:  true(x)  <= stored(x) + dec        (absent => 0 + dec)
  * bound size:   dec <= (n - M) / (k + 1),  M = sum of stored counts
                  (each decrement round of size t removes >= (k+1)*t
                  stream weight from the stored mass)

so every item with true frequency > n/(k+1) is GUARANTEED present, and
``heavy_hitters(phi)`` has zero false negatives for threshold phi*n.

Unlike the hash-canonical kernels (Bloom/HLL/CMS/theta) the MG state is
order-DEPENDENT (which ties get trimmed depends on arrival order), so the
contract is estimate-bounds equivalence — the same contract as t-digest
and KLL — not byte equality across partitionings.  The bounds above hold
for every update/merge order.

Weighted updates are supported (counts column); the batch fold is
np.unique + np.bincount — no per-item Python.
"""

from __future__ import annotations

import struct

import numpy as np

from ..util import U64
from .base import Sketch


class MisraGries(Sketch):
    """Misra–Gries summary over pre-hashed uint64 keys.

    ``k``: max retained counters (>= 1).  Memory: <= 16k bytes + 2 scalars.
    Deterministic undercount bound: ``dec`` <= n/(k+1).
    """

    TYPE_TAG = 8
    HASH_KEYED = True

    def __init__(self, k: int = 256):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.n = 0            # total inserted weight
        self.dec = 0          # total decrement applied (the error bound)
        self.items = np.empty(0, dtype=U64)    # sorted by item hash
        self.counts = np.empty(0, dtype=np.int64)

    # -- core state transition ----------------------------------------------

    def _fold(self, items: np.ndarray, counts: np.ndarray) -> None:
        """Add (item, count) pairs into the state, then trim to k counters
        with the mergeable-summaries rule (one subtraction round suffices:
        after subtracting the (k+1)-th largest count t, at most k items
        remain strictly positive)."""
        alli = np.concatenate([self.items, items])
        allc = np.concatenate([self.counts, counts])
        uniq, inv = np.unique(alli, return_inverse=True)
        summed = np.bincount(inv, weights=allc.astype(np.float64))
        summed = summed.astype(np.int64)
        if uniq.size > self.k:
            t = int(np.partition(summed, -(self.k + 1))[-(self.k + 1)])
            summed = summed - t
            keep = summed > 0
            uniq, summed = uniq[keep], summed[keep]
            self.dec += t
        self.items, self.counts = uniq, summed

    def update(self, hashes: np.ndarray, counts: np.ndarray | None = None) -> None:
        h = np.ascontiguousarray(hashes, dtype=U64)
        if h.size == 0:
            return
        uniq, inv = np.unique(h, return_inverse=True)
        if counts is None:
            per_key = np.bincount(inv).astype(np.int64)
        else:
            w = np.ascontiguousarray(counts, dtype=np.int64)
            if np.any(w < 0):
                raise ValueError("negative weights are not mergeable")
            per_key = np.bincount(inv, weights=w.astype(np.float64)).astype(np.int64)
        self.n += int(per_key.sum())
        self._fold(uniq, per_key)

    def merge(self, other: "MisraGries") -> "MisraGries":
        if self.k != other.k:
            raise ValueError("k mismatch: cannot merge Misra-Gries summaries")
        self.n += other.n
        self.dec += other.dec
        self._fold(other.items, other.counts)
        return self

    def fold(self, k: int) -> "MisraGries":
        """Counter-budget downgrade to ``k`` <= self.k: one trim round with
        the mergeable-summaries rule (subtract the (k+1)-th largest stored
        count), the same operation merge applies. The potential argument
        of Agarwal et al. (PODS'12 §3.1) covers prune-to-smaller-k the
        same way it covers merge: every decrement round of size t removes
        >= (k+1)*t stored mass, so the folded summary's total decrement
        stays <= n/(k+1) — query()'s [count, count+dec] sandwich and the
        phi-heavy-hitter guarantee hold at the NEW k. Not byte-equal to a
        direct k-build (MG is order-dependent; same caveat as merge,
        module docstring). Source is not mutated."""
        if k < 1:
            raise ValueError("k must be >= 1")
        if k > self.k:
            raise ValueError(
                f"fold target k={k} exceeds this summary's k={self.k} "
                "(can only reduce counters; rebuild to increase them)")
        out = MisraGries(k)
        out.n, out.dec = self.n, self.dec
        out._fold(self.items.copy(), self.counts.copy())
        return out

    # -- estimation -----------------------------------------------------------

    def query(self, hashes: np.ndarray) -> np.ndarray:
        """Stored count per probe hash (0 if absent) — the LOWER bound on
        the true frequency; true <= this + self.dec."""
        h = np.ascontiguousarray(hashes, dtype=U64)
        if self.items.size == 0:
            return np.zeros(h.size, dtype=np.int64)
        pos = np.searchsorted(self.items, h)
        pos_c = np.clip(pos, 0, self.items.size - 1)
        hit = self.items[pos_c] == h
        return np.where(hit, self.counts[pos_c], 0)

    def error_bound(self) -> int:
        """Max possible undercount of any query() answer (== total
        decrement applied; <= n/(k+1) by the potential argument)."""
        return self.dec

    def heavy_hitters(self, phi: float) -> tuple[np.ndarray, np.ndarray]:
        """(item hashes, lower-bound counts) of every candidate whose true
        frequency COULD be >= phi*n. Zero false negatives: a true
        phi-frequent item has stored >= phi*n - dec."""
        thresh = phi * self.n - self.dec
        keep = self.counts.astype(np.float64) >= max(thresh, 1.0)
        return self.items[keep], self.counts[keep]

    # -- serialization: params <IQQ k n dec>, payload items u8 + counts i8 --

    def _payload(self) -> tuple[bytes, bytes]:
        return (struct.pack("<IQQ", self.k, self.n, self.dec),
                self.items.astype("<u8").tobytes()
                + self.counts.astype("<i8").tobytes())

    @classmethod
    def _from_payload(cls, params: bytes, payload: bytes) -> "MisraGries":
        k, n, dec = struct.unpack("<IQQ", params)
        sk = cls(k)
        sk.n, sk.dec = int(n), int(dec)
        if len(payload) % 16:
            raise ValueError(
                f"Misra-Gries payload length {len(payload)} not a multiple of "
                f"16 (u64 item + i64 count pairs) — truncated blob")
        m = len(payload) // 16
        sk.items = np.frombuffer(payload[: 8 * m], dtype="<u8").astype(U64)
        sk.counts = np.frombuffer(payload[8 * m:], dtype="<i8").astype(np.int64)
        return sk
