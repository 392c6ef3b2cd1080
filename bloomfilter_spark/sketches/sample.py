"""Bottom-k sample sketch: a mergeable uniform sample of DISTINCT keys
with an attached example payload per sampled key.

The missing "show me examples" primitive over a 10^12-turn corpus:
"K random example texts per tool", "sample conv_ids per day for manual
audit" — maintainable incrementally, mergeable across shards/days, and
stored in the warehouse next to the other sketch families. One corpus
scan builds every key's sample; rollups re-sample coarser keys from
O(keys * k) sketch rows without rescanning anything.

Published basis: bottom-k (KMV) sampling — retain the k smallest keyed
hash values; because the hash is uniform, the retained DISTINCT keys are
a uniform sample of the distinct-key population (Beyer et al. SIGMOD'07;
Cohen & Kaplan PODC'07 framework for bottom-k samples). Carrying a
payload per retained hash does not disturb the sample: membership
depends only on the hash order. The same retained set doubles as the
KMV cardinality estimator (k/U_(k+1)), so every sample ships with the
distinct-count context it was drawn from.

Determinism: the sample is a pure function of the distinct (hash,
min-payload) set — bottom-k by hash, payload ties broken by smallest
bytes — so merge is associative, commutative, idempotent, and builds
are byte-identical under any partitioning or arrival order (the same
eager-trim canonicalization as theta.py, which this module mirrors;
reference parity: bos/bloomfilter has no sampling type — this is part
of the north-rule extension family, like Data/BloomFilter's easyList
generalized to suggest-sized sketches).

State: ``theta`` (uint64 exclusive threshold) + up to ``k`` (hash,
payload) pairs with hash < theta, hashes sorted distinct. Estimate /
rse: exactly ThetaSketch's. Memory: <= k * (8 + avg payload bytes).
"""

from __future__ import annotations

import struct

import numpy as np

from ..util import U64
from .base import Sketch
from .theta import _THETA_MAX, _theta_norm


class SampleSketch(Sketch):
    TYPE_TAG = 9
    #: new type born at wire v4 — there are no older blobs to read
    MIN_WIRE_VERSION = 4
    HASH_KEYED = True

    def __init__(self, k: int = 1024):
        if k < 16:
            raise ValueError("k must be >= 16")
        self.k = int(k)
        self.theta = _THETA_MAX
        self.hashes = np.empty(0, dtype=U64)       # sorted distinct, < theta
        self.payloads = np.empty(0, dtype=object)  # aligned bytes

    # -- core state transition ----------------------------------------------

    def _absorb(self, hashes: np.ndarray, payloads: np.ndarray) -> None:
        """Fold (hash, payload) pairs below theta into the state, dedupe
        to min-payload per hash, then eager-trim to the k smallest with
        theta = the (k+1)-th smallest distinct hash (theta.py:82-91's
        rule, with payloads riding along)."""
        m = hashes < self.theta
        h = np.concatenate([self.hashes, hashes[m]])
        p = np.concatenate([self.payloads, payloads[m]])
        if h.size == 0:
            return
        # bound the python-level payload grouping: only pairs whose hash
        # is among the (k+1) smallest DISTINCT hashes can survive the trim
        uniq = np.unique(h)
        if uniq.size > self.k:
            cut = uniq[self.k]           # the would-be new theta
            keep = h < cut
            h, p = h[keep], p[keep]
            new_theta = cut
        else:
            new_theta = None
        order = np.argsort(h, kind="stable")
        h, p = h[order], p[order]
        starts = np.flatnonzero(np.concatenate(([True], h[1:] != h[:-1])))
        if starts.size != h.size:        # duplicate hashes: min payload wins
            bounds = np.append(starts, h.size)
            dedup = np.empty(starts.size, dtype=object)
            for i in range(starts.size):
                lo, hi = bounds[i], bounds[i + 1]
                dedup[i] = p[lo] if hi - lo == 1 else min(p[lo:hi])
            h, p = h[starts], dedup
        if new_theta is not None:
            self.theta = new_theta
        self.hashes, self.payloads = h, p

    def update(self, hashes: np.ndarray,
               payloads: "np.ndarray | list | None" = None) -> None:
        h = np.ascontiguousarray(hashes, dtype=U64)
        if h.size == 0:
            return
        if payloads is None:             # pure-KMV use: empty payloads
            p = np.full(h.size, b"", dtype=object)
        else:
            p = np.empty(len(payloads), dtype=object)
            p[:] = [b"" if x is None
                    else (x.encode("utf-8") if isinstance(x, str) else bytes(x))
                    for x in payloads]
            if p.size != h.size:
                raise ValueError("hashes and payloads length mismatch")
        self._absorb(h, p)

    def merge(self, other: "SampleSketch") -> "SampleSketch":
        if self.k != other.k:
            raise ValueError("k mismatch: cannot merge sample sketches")
        self.theta = min(self.theta, other.theta)
        keep = self.hashes < self.theta
        self.hashes, self.payloads = self.hashes[keep], self.payloads[keep]
        self._absorb(other.hashes, other.payloads)
        return self

    def fold(self, k: int) -> "SampleSketch":
        """Sample-size downgrade, exactly ThetaSketch.fold with payloads
        riding along: keep the k smallest retained hashes; a fold of a
        directly-built sketch is byte-identical to a direct k-build."""
        if k < 16:
            raise ValueError("k must be >= 16")
        if k > self.k:
            raise ValueError(
                f"fold target k={k} exceeds this sketch's k={self.k} "
                "(can only reduce the sample; rebuild to increase it)")
        out = SampleSketch(k)
        out.theta = self.theta
        out.hashes = self.hashes.copy()
        out.payloads = self.payloads.copy()
        if out.hashes.size > k:
            out.theta = out.hashes[k]
            out.hashes = out.hashes[:k]
            out.payloads = out.payloads[:k]
        return out

    # -- queries --------------------------------------------------------------

    def estimate(self) -> float:
        """KMV distinct-count estimate over the same retained set the
        sample is drawn from (theta.py:110-113)."""
        if self.theta == _THETA_MAX:
            return float(self.hashes.size)         # exact mode
        return self.hashes.size / _theta_norm(self.theta)

    def rse(self) -> float:
        """Relative standard error of estimate() (Beyer et al. Thm 1)."""
        return 1.0 / np.sqrt(self.k - 2)

    def sample(self) -> list[bytes]:
        """The sampled payloads (uniform over distinct keys seen)."""
        return list(self.payloads)

    def __len__(self) -> int:
        return int(self.hashes.size)

    # -- serialization: params <IQ k theta>,
    #    payload <I count> hashes u8*count | lengths u4*count | bytes ------

    def _payload(self) -> tuple[bytes, bytes]:
        params = struct.pack("<IQ", self.k, int(self.theta))
        cnt = self.hashes.size
        lens = np.fromiter((len(b) for b in self.payloads),
                           dtype="<u4", count=cnt)
        body = (struct.pack("<I", cnt)
                + self.hashes.astype("<u8").tobytes()
                + lens.tobytes()
                + b"".join(self.payloads))
        return params, body

    @classmethod
    def _from_payload(cls, params: bytes, payload: bytes) -> "SampleSketch":
        k, theta = struct.unpack("<IQ", params)
        sk = cls(k)
        sk.theta = np.uint64(theta)
        if not payload:                  # params-only zero (warehouse factory)
            return sk
        if len(payload) < 4:
            raise ValueError("sample payload truncated before the count")
        (cnt,) = struct.unpack_from("<I", payload, 0)
        fixed = 4 + cnt * 12
        if cnt > k or len(payload) < fixed:
            raise ValueError("sample payload count inconsistent with size")
        sk.hashes = np.frombuffer(payload, dtype="<u8", count=cnt,
                                  offset=4).astype(U64)
        lens = np.frombuffer(payload, dtype="<u4", count=cnt,
                             offset=4 + cnt * 8).astype(np.int64)
        if fixed + int(lens.sum()) != len(payload):
            raise ValueError("sample payload bytes inconsistent with lengths")
        offs = fixed + np.concatenate(([0], np.cumsum(lens)))
        sk.payloads = np.empty(cnt, dtype=object)
        for i in range(cnt):
            sk.payloads[i] = payload[offs[i]:offs[i + 1]]
        if cnt and (np.any(sk.hashes[1:] <= sk.hashes[:-1])
                    or sk.hashes[-1] >= sk.theta):
            raise ValueError("sample hashes not sorted-distinct below theta")
        return sk
