"""Weighted bottom-k sample sketch: a mergeable weight-proportional
sample of DISTINCT keys, each with an example payload — plus an unbiased
total-weight estimator over the same retained set.

The weighted dual of sketches/sample.py: where SampleSketch answers
"K *uniform* example texts per tool", this answers "K example texts per
tool sampled proportionally to a weight" — token count, latency,
revenue, quality score — so the sample shows you where the MASS is, not
where the key count is. Like every family here it is incrementally
maintainable, mergeable across shards/days/streams, foldable to a
smaller k, and warehoused next to the other sketches; rollups re-sample
coarser keys from O(keys * k) sketch rows without rescanning anything.

Published basis: weighted sampling without replacement via exponential
ranks. Each distinct key i with weight w_i > 0 gets rank
``r_i = -ln(u_i) / w_i`` with u_i uniform in (0,1) — an Exp(w_i) draw —
and the k smallest ranks are retained (Efraimidis & Spirakis, IPL 2006,
whose key u^(1/w) is the same order reversed; the bottom-k/exponential-
rank formulation and its estimators are Cohen & Kaplan, "Summarizing
data using bottom-k sketches", PODC 2007 — "ppswor" sampling). The
retained set with threshold tau (the (k+1)-th smallest rank) yields the
rank-conditioned Horvitz-Thompson estimator of TOTAL weight:

    W_hat = sum over retained i of  w_i / P[Exp(w_i) < tau]
          = sum w_i / (1 - exp(-w_i * tau))

unbiased with coefficient of variation <= 1/sqrt(k-2) (Cohen & Kaplan
Sec. 3; the same bound the theta/KMV estimator enjoys, to which this
degenerates when all weights are equal). No reference-repo analog
(bos/bloomfilter has no sampling type); cited as the published
algorithm only, like theta.py.

Determinism (the family's brand): u_i is derived from the key's 64-bit
hash, not an RNG — ``u = max((float64(int64(h ^ 2^63)) + 2^63) * 2^-64,
2^-64)`` (the flipped-int64 widening theta.py's estimator uses, so the
same expression is computable from Spark's signed xxhash64; the floor
keeps a pathological all-zero hash from producing u = 0 -> rank = inf).
The state is a pure function of the SET of (hash, weight, payload)
items observed:

  - per distinct hash, the canonical entry is the one with the LARGEST
    weight (= smallest rank; for equal weights, smallest payload bytes),
    an associative, commutative, idempotent rule — required so replayed
    or multiply-observed rows at 10^12-turn scale cannot change a byte;
  - items are ordered by (rank, hash); once more than k are seen, tau
    drops to the (k+1)-th smallest rank and retention is STRICT
    ``rank < tau`` (boundary rank ties drop with it — measure-zero for
    real hashes, and canonical either way).

Merge is therefore associative, commutative, idempotent, and
byte-exact under any partitioning, chunking, or arrival order —
asserted in tests, same discipline as theta/sample.

Weight semantics: a key's weight is the MAXIMUM weight observed for its
hash. When the weight is a pure function of the key (token count of a
text, duration of a span) duplicates agree and max is a no-op; max — not
sum — is what keeps the state replay-safe and merge-idempotent. Rows
whose weight is NULL/NaN or <= 0 are excluded, exactly as NULL keys are
(a zero-rate exponential never finishes; exclusion IS the w -> 0 limit).

State: ``tau`` (float64 exclusive rank threshold, +inf until first trim)
+ up to k (hash u64, weight f64, payload bytes) triples with
rank < tau, sorted by (rank, hash). Memory <= k * (16 + avg payload).
Wire: params <I k><d tau>; payload <I cnt> + hashes + weights + payload
lengths + payload bytes (ranks are DERIVED from exact (hash, weight) on
load, so the wire carries no platform-sensitive float ordering).
"""

from __future__ import annotations

import struct

import numpy as np

from ..util import U64
from .base import Sketch

_SIGN = np.uint64(1 << 63)
#: floor for the unit-interval mapping (see module doc)
_U_FLOOR = 2.0 ** -64


def _unit(hashes: np.ndarray) -> np.ndarray:
    """uint64 hash -> u in (0, 1], via the flipped-int64 widening that is
    expressible in both numpy and Spark SQL from a signed xxhash64."""
    flipped = (np.asarray(hashes, dtype=U64) ^ _SIGN).view(np.int64)
    u = (flipped.astype(np.float64) + float(1 << 63)) * 2.0 ** -64
    return np.maximum(u, _U_FLOOR)


def _rank(hashes: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Exponential rank r = -ln(u(h)) / w; Exp(w) distributed for
    uniform h. Smaller rank == more likely sampled == larger weight."""
    return -np.log(_unit(hashes)) / np.asarray(weights, dtype=np.float64)


class WeightedSampleSketch(Sketch):
    TYPE_TAG = 11
    #: new type born at wire v4 — there are no older blobs to read
    MIN_WIRE_VERSION = 4
    HASH_KEYED = True

    def __init__(self, k: int = 1024):
        if k < 16:
            raise ValueError("k must be >= 16")
        self.k = int(k)
        self.tau = np.inf
        self.hashes = np.empty(0, dtype=U64)        # aligned, by (rank, hash)
        self.weights = np.empty(0, dtype=np.float64)
        self.payloads = np.empty(0, dtype=object)   # aligned bytes

    # -- core state transition ----------------------------------------------

    def _absorb(self, hashes: np.ndarray, weights: np.ndarray,
                payloads: np.ndarray) -> None:
        """Fold (hash, weight, payload) items below tau into the state:
        dedupe per hash to (max weight, min payload), order by
        (rank, hash), trim to rank < the (k+1)-th smallest once more
        than k survive."""
        r_in = _rank(hashes, weights)
        m = r_in < self.tau
        h = np.concatenate([self.hashes, hashes[m]])
        w = np.concatenate([self.weights, weights[m]])
        p = np.concatenate([self.payloads, payloads[m]])
        if h.size == 0:
            return
        r = _rank(h, w)
        # dedupe per hash: max weight wins (= min rank); equal weights ->
        # min payload. Sort by hash then rank so each group's head is the
        # winner unless payload ties need breaking (python touches ONLY
        # duplicate groups, as sample.py does).
        order = np.lexsort((r, h))
        h, w, p, r = h[order], w[order], p[order], r[order]
        starts = np.flatnonzero(np.concatenate(([True], h[1:] != h[:-1])))
        if starts.size != h.size:
            bounds = np.append(starts, h.size)
            keep_idx = np.empty(starts.size, dtype=np.int64)
            for i in range(starts.size):
                lo, hi = bounds[i], bounds[i + 1]
                if hi - lo == 1:
                    keep_idx[i] = lo
                else:
                    g = slice(lo, hi)
                    # group sorted by rank asc: winners share the min rank
                    tied = np.flatnonzero(r[g] == r[lo]) + lo
                    keep_idx[i] = (tied[0] if tied.size == 1 else
                                   min(tied, key=lambda j: p[j]))
            h, w, p, r = h[keep_idx], w[keep_idx], p[keep_idx], r[keep_idx]
        # canonical order: (rank, hash)
        order = np.lexsort((h, r))
        h, w, p, r = h[order], w[order], p[order], r[order]
        if h.size > self.k:
            self.tau = float(r[self.k])              # (k+1)-th smallest rank
            keep = r < self.tau
            h, w, p = h[keep], w[keep], p[keep]
        self.hashes, self.weights, self.payloads = h, w, p

    def update(self, hashes: np.ndarray, weights: np.ndarray,
               payloads: "np.ndarray | list | None" = None) -> None:
        h = np.ascontiguousarray(hashes, dtype=U64)
        w = np.ascontiguousarray(weights, dtype=np.float64)
        if w.size != h.size:
            raise ValueError("hashes and weights length mismatch")
        if h.size == 0:
            return
        if payloads is None:                  # pure estimator use
            p = np.full(h.size, b"", dtype=object)
        else:
            p = np.empty(len(payloads), dtype=object)
            p[:] = [b"" if x is None
                    else (x.encode("utf-8") if isinstance(x, str) else bytes(x))
                    for x in payloads]
            if p.size != h.size:
                raise ValueError("hashes and payloads length mismatch")
        ok = np.isfinite(w) & (w > 0)         # NULL-key-style exclusion
        if not ok.all():
            h, w, p = h[ok], w[ok], p[ok]
            if h.size == 0:
                return
        self._absorb(h, w, p)

    def merge(self, other: "WeightedSampleSketch") -> "WeightedSampleSketch":
        if self.k != other.k:
            raise ValueError("k mismatch: cannot merge weighted samples")
        self.tau = min(self.tau, other.tau)
        if self.hashes.size:
            keep = _rank(self.hashes, self.weights) < self.tau
            self.hashes = self.hashes[keep]
            self.weights = self.weights[keep]
            self.payloads = self.payloads[keep]
        self._absorb(other.hashes, other.weights, other.payloads)
        return self

    def fold(self, k: int) -> "WeightedSampleSketch":
        """Sample-size downgrade, exactly SampleSketch.fold in rank
        space: keep the k smallest (rank, hash) items; a fold of a
        directly-built sketch is byte-identical to a direct k-build."""
        if k < 16:
            raise ValueError("k must be >= 16")
        if k > self.k:
            raise ValueError(
                f"fold target k={k} exceeds this sketch's k={self.k} "
                "(can only reduce the sample; rebuild to increase it)")
        out = WeightedSampleSketch(k)
        out.tau = self.tau
        out.hashes = self.hashes.copy()
        out.weights = self.weights.copy()
        out.payloads = self.payloads.copy()
        if out.hashes.size > k:
            r = _rank(out.hashes, out.weights)
            out.tau = float(r[k])
            keep = r < out.tau
            out.hashes = out.hashes[keep]
            out.weights = out.weights[keep]
            out.payloads = out.payloads[keep]
        return out

    # -- queries --------------------------------------------------------------

    def estimate(self) -> float:
        """Unbiased estimate of the TOTAL weight of the distinct-key
        population (rank-conditioned Horvitz-Thompson, Cohen & Kaplan):
        exact sum while tau is still +inf, else
        sum w_i / (1 - exp(-w_i * tau)) over the retained items."""
        if not np.isfinite(self.tau):
            return float(self.weights.sum())
        p_in = -np.expm1(-self.weights * self.tau)   # P[Exp(w) < tau]
        return float((self.weights / p_in).sum())

    def rse(self) -> float:
        """Coefficient of variation bound of estimate() (Cohen & Kaplan
        Sec. 3 for bottom-k with exponential ranks)."""
        return 1.0 / np.sqrt(self.k - 2)

    def sample(self) -> list[bytes]:
        """The sampled payloads, inclusion probability proportional to
        weight (without replacement), heaviest-rank first."""
        return list(self.payloads)

    def sample_weights(self) -> list[float]:
        """Weights aligned with sample()."""
        return [float(x) for x in self.weights]

    def __len__(self) -> int:
        return int(self.hashes.size)

    # -- serialization: params <Id k tau>, payload <I count> hashes u8*count
    #    | weights f8*count | lengths u4*count | bytes ----------------------

    def _payload(self) -> tuple[bytes, bytes]:
        params = struct.pack("<Id", self.k, float(self.tau))
        cnt = self.hashes.size
        lens = np.fromiter((len(b) for b in self.payloads),
                           dtype="<u4", count=cnt)
        body = (struct.pack("<I", cnt)
                + self.hashes.astype("<u8").tobytes()
                + self.weights.astype("<f8").tobytes()
                + lens.tobytes()
                + b"".join(self.payloads))
        return params, body

    @classmethod
    def _from_payload(cls, params: bytes,
                      payload: bytes) -> "WeightedSampleSketch":
        k, tau = struct.unpack("<Id", params)
        sk = cls(k)
        if np.isnan(tau) or tau <= 0:
            raise ValueError("weighted sample tau must be positive")
        sk.tau = float(tau)
        if not payload:                 # params-only zero (warehouse factory)
            return sk
        if len(payload) < 4:
            raise ValueError("weighted sample payload truncated before count")
        (cnt,) = struct.unpack_from("<I", payload, 0)
        fixed = 4 + cnt * 20
        if cnt > k or len(payload) < fixed:
            raise ValueError(
                "weighted sample payload count inconsistent with size")
        sk.hashes = np.frombuffer(payload, dtype="<u8", count=cnt,
                                  offset=4).astype(U64)
        sk.weights = np.frombuffer(payload, dtype="<f8", count=cnt,
                                   offset=4 + cnt * 8).astype(np.float64)
        lens = np.frombuffer(payload, dtype="<u4", count=cnt,
                             offset=4 + cnt * 16).astype(np.int64)
        if fixed + int(lens.sum()) != len(payload):
            raise ValueError(
                "weighted sample payload bytes inconsistent with lengths")
        offs = fixed + np.concatenate(([0], np.cumsum(lens)))
        sk.payloads = np.empty(cnt, dtype=object)
        for i in range(cnt):
            sk.payloads[i] = payload[offs[i]:offs[i + 1]]
        if cnt:
            if not (np.isfinite(sk.weights).all() and (sk.weights > 0).all()):
                raise ValueError("weighted sample weights must be finite > 0")
            r = _rank(sk.hashes, sk.weights)
            pair_ok = (r[1:] > r[:-1]) | ((r[1:] == r[:-1])
                                          & (sk.hashes[1:] > sk.hashes[:-1]))
            if not pair_ok.all():
                raise ValueError(
                    "weighted sample items not sorted by (rank, hash)")
            if np.unique(sk.hashes).size != cnt:
                raise ValueError("weighted sample hashes not distinct")
            if not (r < sk.tau).all():
                raise ValueError("weighted sample rank at or above tau")
        return sk
