"""Theta / KMV distinct-count sketch with set-expression estimates
(union, intersection, difference).

Completes the north-rule family with the one capability HLL lacks: set
EXPRESSIONS over distinct counts.  HLL registers merge only by max (union);
"how many users did A *and* B" needs a sketch whose state is a uniform
hash sample.  Published basis: the KMV estimator of Beyer et al. (SIGMOD
2007, "On synopses for distinct-value estimation under multiset
operations") and the Theta-Sketch framework of Dasgupta/Lang/Rhodes/
Thaler (2016), of which Apache DataSketches is the reference open-source
implementation.  No reference-repo analog (bos/bloomfilter has no
cardinality sketch); cited here as the published algorithm only.

State: ``theta`` (uint64 exclusive threshold) + the sorted distinct hash
values ``< theta``, at most ``k`` of them.  Eager trimming keeps theta at
exactly the (k+1)-th smallest distinct hash once more than k have been
seen, so the state is a pure function of the SET of hashes observed —
update order, batching, and partitioning cannot change a byte.  That makes
merge associative, commutative, and byte-exact (asserted in tests), the
same canonical-state discipline as the Bloom/HLL/CMS kernels.

Estimate: ``len(retained) / (theta / 2^64)`` (exact when theta is still
saturated, i.e. fewer than k+1 distinct values seen).  The estimator
``k / U_(k+1)`` is unbiased with relative standard error ~ 1/sqrt(k-2)
(Beyer et al. Theorem 1).

Set expressions operate on frozen states: with theta* = min(theta_a,
theta_b), each retained set filtered to < theta* is a uniform theta*-
sample of its underlying set, so intersection/difference of the retained
sets is a theta*-sample of the intersection/difference — count / theta*
estimates its cardinality (Theta framework §3).  The retained-count of an
intersection I out of union U is ~ Binomial(|I|, k/|U|), giving
SD(estimate) ~ sqrt(|I|·|U|/k) — the absolute bound the tests and the
driver query assert at 4 sigma.

Float note: theta normalizes to double via the *flipped-int64* path
(``(double(theta ^ 2^63) + 2^63) / 2^64``) so the kernel estimate is
bit-identical to the pure-SQL grouped estimator in jvm_build.py, which
only has signed int64 to work with.
"""

from __future__ import annotations

import struct

import numpy as np

from ..util import U64
from .base import Sketch

#: "nothing trimmed yet" threshold: all 64-bit hashes retained (the single
#: value 2^64-1 is excluded from sampling; P[xxhash64 == MAX] = 2^-64).
_THETA_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
_SIGN = np.uint64(1 << 63)


def _theta_norm(theta: np.uint64) -> float:
    """theta/2^64 as double, via the same arithmetic the SQL estimator
    uses (flip to int64, widen, un-flip in double) — see module doc."""
    flipped = np.int64(np.uint64(theta) ^ _SIGN)
    return (float(flipped) + float(1 << 63)) / float(1 << 64)


class ThetaSketch(Sketch):
    """KMV/theta sketch over pre-hashed uint64 keys.

    ``k``: nominal retained-sample size (>= 16).  Memory: <= 8k bytes.
    """

    TYPE_TAG = 7
    HASH_KEYED = True

    def __init__(self, k: int = 4096):
        if k < 16:
            raise ValueError("k must be >= 16")
        self.k = int(k)
        self.theta = _THETA_MAX
        self.retained = np.empty(0, dtype=U64)  # sorted, distinct, < theta

    # -- core state transition ---------------------------------------------

    def _absorb(self, sorted_distinct: np.ndarray) -> None:
        """Fold a sorted-distinct uint64 array into the state."""
        cand = sorted_distinct[sorted_distinct < self.theta]
        if cand.size == 0:
            return
        merged = np.union1d(self.retained, cand)  # sorted distinct
        if merged.size > self.k:
            self.theta = merged[self.k]           # (k+1)-th smallest
            merged = merged[: self.k]
        self.retained = merged

    def update(self, hashes: np.ndarray) -> None:
        h = np.ascontiguousarray(hashes, dtype=U64)
        if h.size == 0:
            return
        self._absorb(np.unique(h))

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        if self.k != other.k:
            raise ValueError("k mismatch: cannot merge theta sketches")
        self.theta = min(self.theta, other.theta)
        # re-filter own retained against the (possibly lowered) theta
        self.retained = self.retained[self.retained < self.theta]
        self._absorb(other.retained)
        return self

    def fold(self, k: int) -> "ThetaSketch":
        """Sample-size downgrade to nominal ``k`` <= self.k (>= 16): keep
        the k smallest retained hashes; if that trims, theta drops to the
        (k+1)-th smallest — exactly what a direct build at k would hold
        (eager trim keeps the k smallest distinct with theta the (k+1)-th
        once more than k are seen), so a fold of a directly-built sketch
        is byte-identical to the direct k-build. For merged sketches whose
        theta is already below the trim point the sample is kept as-is
        (resolution already spent); estimates are unchanged, future
        updates trim at the new k. rse() reports the new ~1/sqrt(k-2).
        Source is not mutated."""
        if k < 16:
            raise ValueError("k must be >= 16")
        if k > self.k:
            raise ValueError(
                f"fold target k={k} exceeds this sketch's k={self.k} "
                "(can only reduce the sample; rebuild to increase it)")
        out = ThetaSketch(k)
        out.theta = self.theta
        out.retained = self.retained.copy()
        if out.retained.size > k:
            out.theta = out.retained[k]
            out.retained = out.retained[:k]
        return out

    # -- estimation --------------------------------------------------------

    def estimate(self) -> float:
        if self.theta == _THETA_MAX:
            return float(self.retained.size)      # exact mode
        return self.retained.size / _theta_norm(self.theta)

    def rse(self) -> float:
        """Relative standard error of estimate() (Beyer et al. Thm 1)."""
        return 1.0 / np.sqrt(self.k - 2)

    # -- serialization: params <IQ k theta>, payload sorted LE uint64 ------

    def _payload(self) -> tuple[bytes, bytes]:
        return (struct.pack("<IQ", self.k, int(self.theta)),
                self.retained.astype("<u8").tobytes())

    @classmethod
    def _from_payload(cls, params: bytes, payload: bytes) -> "ThetaSketch":
        k, theta = struct.unpack("<IQ", params)
        sk = cls(k)
        sk.theta = np.uint64(theta)
        sk.retained = np.frombuffer(payload, dtype="<u8").astype(U64)
        return sk


def _common(a: ThetaSketch, b: ThetaSketch) -> tuple[np.uint64, np.ndarray, np.ndarray]:
    theta = min(a.theta, b.theta)
    return (theta,
            a.retained[a.retained < theta],
            b.retained[b.retained < theta])


def theta_intersect(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    """Sketch of A ∩ B: common theta, intersection of retained samples.
    Its estimate() is the intersection-cardinality estimate; SD ~
    sqrt(|I|·|U|/k) (module doc)."""
    theta, ra, rb = _common(a, b)
    out = ThetaSketch(min(a.k, b.k))
    out.theta = theta
    out.retained = np.intersect1d(ra, rb)
    return out


def theta_a_not_b(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    """Sketch of A \\ B (set difference), same estimator contract as
    theta_intersect."""
    theta, ra, rb = _common(a, b)
    out = ThetaSketch(min(a.k, b.k))
    out.theta = theta
    out.retained = np.setdiff1d(ra, rb)
    return out
