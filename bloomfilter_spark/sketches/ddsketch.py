"""DDSketch — relative-VALUE-error quantiles (Masson, Rim & Lee,
VLDB 2019: "DDSketch: a fast and fully-mergeable quantile sketch with
relative-error guarantees").

The quantile family the engine was missing a guarantee for: KLL bounds
normalized RANK error (~1.7/k) and t-digest interpolates with no hard
bound, but a latency SLO question ("report p99 within 1%") needs the
returned VALUE to be within a relative band of the true quantile. DDSketch
gives exactly that: bucket i holds the count of values in
(gamma^(i-1), gamma^i] with gamma = (1+alpha)/(1-alpha); answering a
quantile with the bucket's representative value 2*gamma^i/(gamma+1) is
within relative error alpha of EVERY value in the bucket, hence of the
true quantile item — for all q at once, deterministically, no
probability involved.

Why this family is special at cluster scale: the state is a pure
HISTOGRAM, so updates are exactly additive — merge is elementwise count
addition (associative, commutative, zero identity, BYTE-deterministic
under any partitioning/chunking while uncollapsed), and the distributed
build reduces entirely to JVM codegen: ``ceil(log(abs(x)) / log(gamma))``
is one Catalyst expression and ``groupBy(bucket).count()`` aggregates
map-side, so only O(#occupied buckets) rows ever cross the Arrow pipe
regardless of row count or value cardinality (jvm_build.ddsketch_build_jvm
— contrast KLL's pre-agg path, which needs bounded DISTINCT cardinality).

State bound: ``bucket_limit`` caps each store (positive / negative) by
collapsing the LOWEST-indexed buckets into the lowest kept one (the
paper's collapsing variant, = Datadog's CollapsingLowestDense policy).
The alpha guarantee then holds for every quantile that lands above the
collapsed mass (for the canonical latency workload — heavy tails, upper
quantiles — the collapsed region is the uninteresting low end). Collapse
is recorded in ``collapsed`` and surfaced by sketch_describe. Merging
already-collapsed states stays within the same guarantee (the paper's
mergeability theorem) but is no longer byte-deterministic w.r.t. merge
order — only value-level bounds are promised once ``collapsed`` is set.

Numeric domain: finite float64 values; NaN and +/-inf are skipped (SQL
NULL semantics; an infinity has no finite bucket and no meaningful
relative error), zeros are counted exactly in a dedicated bucket,
negative values mirror through a second store. alpha must be >= 1e-6 so
every finite double's bucket index fits int32 (|idx| <= ~709/log(gamma)).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import Sketch

_I4 = np.dtype("<i4")
_U8 = np.dtype("<u8")


def _merge_buckets(idx_a: np.ndarray, cnt_a: np.ndarray,
                   idx_b: np.ndarray, cnt_b: np.ndarray
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Union two sorted (index, count) runs, summing counts on collisions."""
    if idx_a.size == 0:
        return idx_b.copy(), cnt_b.copy()
    if idx_b.size == 0:
        return idx_a.copy(), cnt_a.copy()
    idx = np.concatenate([idx_a, idx_b])
    cnt = np.concatenate([cnt_a, cnt_b])
    order = np.argsort(idx, kind="stable")
    idx, cnt = idx[order], cnt[order]
    uniq, start = np.unique(idx, return_index=True)
    sums = np.add.reduceat(cnt, start)
    return uniq.astype(np.int32), sums.astype(np.uint64)


class DDSketch(Sketch):
    TYPE_TAG = 13
    HASH_KEYED = False

    def __init__(self, alpha: float = 0.01, bucket_limit: int = 2048):
        if not (1e-6 <= alpha < 1.0):
            raise ValueError(
                f"alpha must be in [1e-6, 1), got {alpha} (below 1e-6 a "
                "subnormal double's bucket index overflows int32)")
        if bucket_limit < 16:
            raise ValueError(f"bucket_limit must be >= 16, got {bucket_limit}")
        self.alpha = float(alpha)
        self.bucket_limit = int(bucket_limit)
        self.zero_count = 0
        self.n = 0
        self.collapsed = False
        self._pos_idx = np.zeros(0, dtype=np.int32)
        self._pos_cnt = np.zeros(0, dtype=np.uint64)
        self._neg_idx = np.zeros(0, dtype=np.int32)
        self._neg_cnt = np.zeros(0, dtype=np.uint64)

    # gamma and log(gamma) are ALWAYS derived from alpha (never stored),
    # so a wire roundtrip can never change future bucketing
    @property
    def gamma(self) -> float:
        return (1.0 + self.alpha) / (1.0 - self.alpha)

    @property
    def _log_gamma(self) -> float:
        return math.log1p(2.0 * self.alpha / (1.0 - self.alpha))

    # --- bucket arithmetic ------------------------------------------------
    def bucket_index(self, values: np.ndarray) -> np.ndarray:
        """ceil(log_gamma(|v|)) for nonzero finite v — the wire-contract
        mapping (bucket i covers (gamma^(i-1), gamma^i]). A value within
        1 ulp of a boundary may land one bucket off between this (libm)
        and the JVM build (Math.log); both neighbors' representatives are
        within alpha of it, so estimates are unaffected."""
        with np.errstate(divide="ignore"):
            return np.ceil(np.log(np.abs(values)) / self._log_gamma
                           ).astype(np.int32)

    def _collapse(self, idx: np.ndarray, cnt: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
        if idx.size <= self.bucket_limit:
            return idx, cnt
        cut = idx.size - self.bucket_limit  # collapse [0, cut] into idx[cut]
        spill = cnt[:cut].sum(dtype=np.uint64)
        idx = idx[cut:]
        cnt = cnt[cut:].copy()
        cnt[0] += spill
        self.collapsed = True
        return idx, cnt

    def _insert_buckets(self, sign: int, idx: np.ndarray,
                        cnt: np.ndarray) -> None:
        """Add pre-bucketed (index, count) pairs to one store. `idx` need
        not be sorted/unique; counts must be positive. The JVM-reduced
        build's entry point — and exactly what update() does after
        bucketing, so the two paths are byte-identical by construction."""
        idx = np.asarray(idx, dtype=np.int64)
        cnt = np.asarray(cnt, dtype=np.int64)
        if np.any(cnt <= 0):
            raise ValueError("bucket counts must be positive")
        if idx.size and (idx.min() < np.iinfo(np.int32).min
                         or idx.max() > np.iinfo(np.int32).max):
            raise ValueError("bucket index out of int32 range")
        order = np.argsort(idx, kind="stable")
        idx, cnt = idx[order], cnt[order]
        uniq, start = np.unique(idx, return_index=True)
        sums = np.add.reduceat(cnt, start).astype(np.uint64)
        uniq = uniq.astype(np.int32)
        if sign >= 0:
            merged = _merge_buckets(self._pos_idx, self._pos_cnt, uniq, sums)
            self._pos_idx, self._pos_cnt = self._collapse(*merged)
        else:
            merged = _merge_buckets(self._neg_idx, self._neg_cnt, uniq, sums)
            self._neg_idx, self._neg_cnt = self._collapse(*merged)
        self.n += int(sums.sum())

    # --- updates ------------------------------------------------------------
    def update(self, values: np.ndarray) -> None:
        v = np.ascontiguousarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]  # NaN and +/-inf skipped (inf has no
        # finite bucket; relative error of an infinity is meaningless)
        if v.size == 0:
            return
        nz = int((v == 0.0).sum())
        if nz:
            self.zero_count += nz
            self.n += nz
        pos = v[v > 0.0]
        if pos.size:
            self._insert_buckets(1, self.bucket_index(pos),
                                 np.ones(pos.size, dtype=np.int64))
        neg = v[v < 0.0]
        if neg.size:
            self._insert_buckets(-1, self.bucket_index(neg),
                                 np.ones(neg.size, dtype=np.int64))

    def update_weighted(self, values: np.ndarray,
                        weights: np.ndarray) -> None:
        """Insert each value with an integral count weight — byte-equal to
        repeating it (counts just add), so the pre-aggregated build paths
        carry the identical guarantee."""
        v = np.ascontiguousarray(values, dtype=np.float64)
        w = np.asarray(weights)
        if not np.all(np.equal(np.mod(w, 1), 0)):
            raise ValueError("DDSketch weights must be integral (counts)")
        w = w.astype(np.int64)
        if np.any(w < 0):
            raise ValueError("DDSketch weights must be non-negative counts "
                             "(negative weight is a caller sign bug, not a "
                             "deletion — this sketch cannot delete)")
        keep = np.isfinite(v) & (w > 0)
        v, w = v[keep], w[keep]
        if v.size == 0:
            return
        wz = int(w[v == 0.0].sum())
        if wz:
            self.zero_count += wz
            self.n += wz
        sel = v > 0.0
        if sel.any():
            self._insert_buckets(1, self.bucket_index(v[sel]), w[sel])
        sel = v < 0.0
        if sel.any():
            self._insert_buckets(-1, self.bucket_index(v[sel]), w[sel])

    # --- merge / fold ---------------------------------------------------
    def merge(self, other: "DDSketch") -> "DDSketch":
        if not isinstance(other, DDSketch):
            raise ValueError(f"cannot merge DDSketch with "
                             f"{type(other).__name__}")
        if (self.alpha != other.alpha
                or self.bucket_limit != other.bucket_limit):
            raise ValueError(
                f"geometry mismatch: (alpha={self.alpha}, "
                f"limit={self.bucket_limit}) vs (alpha={other.alpha}, "
                f"limit={other.bucket_limit}) — fold the finer one first")
        self._pos_idx, self._pos_cnt = self._collapse(*_merge_buckets(
            self._pos_idx, self._pos_cnt, other._pos_idx, other._pos_cnt))
        self._neg_idx, self._neg_cnt = self._collapse(*_merge_buckets(
            self._neg_idx, self._neg_cnt, other._neg_idx, other._neg_cnt))
        self.zero_count += other.zero_count
        self.n += other.n
        self.collapsed = self.collapsed or other.collapsed
        return self

    def fold(self, m: int) -> "DDSketch":
        """Exact accuracy downgrade by an INTEGER coarsening factor m:
        gamma' = gamma^m, so new bucket j covers (gamma^(m(j-1)),
        gamma^(mj)] and the old index maps as j = ceil(i/m) — exact
        integer arithmetic, and since ceil(ceil(a)/m) == ceil(a/m) the
        fold equals bucketing the raw values at gamma^m directly (the
        same cross-geometry-merge escape hatch as the other families'
        folds; sketch_fold exposes it from SQL). The result's alpha' =
        (gamma^m - 1)/(gamma^m + 1). fold(1) is a copy. Source is not
        mutated. NOTE: a fresh DDSketch(alpha') re-derives log(gamma')
        from the stored alpha', which can differ from m*log(gamma) by an
        ulp — future INSERTS of exact-boundary values may bucket one off
        (within bound either way); existing mass maps exactly. For the
        same reason fold(m1).fold(m2) holds bucket contents IDENTICAL to
        fold(m1*m2) (ceil-division composes exactly) while the alpha
        params can differ in the last ulp, so whole-blob byte equality is
        only promised for a single fold."""
        if int(m) != m or m < 1:
            raise ValueError(f"fold factor must be an integer >= 1, got {m}")
        m = int(m)
        if m == 1:
            alpha_new = self.alpha  # avoid ulp drift on the identity fold
        else:
            g_m = self.gamma ** m
            alpha_new = (g_m - 1.0) / (g_m + 1.0)
        out = DDSketch(alpha_new, self.bucket_limit)
        out.zero_count = self.zero_count
        out.n = self.zero_count
        out.collapsed = self.collapsed
        # ceil-divide signed int by positive int: -(-i // m)
        if self._pos_idx.size:
            out._insert_buckets(1, -(-self._pos_idx.astype(np.int64) // m),
                                self._pos_cnt.astype(np.int64))
        if self._neg_idx.size:
            out._insert_buckets(-1, -(-self._neg_idx.astype(np.int64) // m),
                                self._neg_cnt.astype(np.int64))
        return out

    # --- queries ----------------------------------------------------------
    def _items(self) -> tuple[np.ndarray, np.ndarray]:
        """(sorted representative values, counts) over both stores + zero.
        Representative of bucket i is 2*gamma^i/(gamma+1) — within
        relative alpha of every value in (gamma^(i-1), gamma^i]."""
        scale = 2.0 / (self.gamma + 1.0)
        lg = self._log_gamma
        parts_v, parts_c = [], []
        if self._neg_idx.size:
            # most-negative first: descending index of the mirrored store
            parts_v.append(-np.exp(self._neg_idx[::-1] * lg) * scale)
            parts_c.append(self._neg_cnt[::-1].astype(np.float64))
        if self.zero_count:
            parts_v.append(np.zeros(1))
            parts_c.append(np.array([float(self.zero_count)]))
        if self._pos_idx.size:
            parts_v.append(np.exp(self._pos_idx * lg) * scale)
            parts_c.append(self._pos_cnt.astype(np.float64))
        if not parts_v:
            return np.zeros(0), np.zeros(0)
        return np.concatenate(parts_v), np.concatenate(parts_c)

    def quantile(self, q) -> np.ndarray | float:
        """Value at quantile q, by the paper's selection rule: the first
        bucket whose cumulative count EXCEEDS q*(n-1) — exactly the
        bucket holding the q-quantile item x_q = sorted[floor(q*(n-1))],
        because counts are exact. The returned representative is
        therefore within relative error `alpha` of x_q, for every q
        whose mass is uncollapsed — a deterministic guarantee, not a
        probabilistic one (contrast KLL, whose RANK can be off by
        ~1.7n/k items)."""
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        v, w = self._items()
        if v.size == 0:
            out = np.full(qs.shape, np.nan)
            return out if np.ndim(q) else float(out[0])
        cum = np.cumsum(w)
        ranks = np.clip(qs, 0.0, 1.0) * (cum[-1] - 1.0)
        idx = np.searchsorted(cum, ranks, side="right")
        idx = np.clip(idx, 0, v.size - 1)
        out = v[idx]
        return out if np.ndim(q) else float(out[0])

    def rank(self, x) -> np.ndarray | float:
        """Estimated CDF at x — fraction of the sketched stream <= x,
        evaluated over the representatives (exact w.r.t. the sketch's
        step distribution; each step value is within alpha of its
        bucket's true values)."""
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        v, w = self._items()
        if v.size == 0:
            out = np.full(xs.shape, np.nan)
            return out if np.ndim(x) else float(out[0])
        cum = np.concatenate(([0.0], np.cumsum(w)))
        idx = np.searchsorted(v, xs, side="right")
        out = cum[idx] / cum[-1]
        return out if np.ndim(x) else float(out[0])

    def ks_distance(self, other: "DDSketch") -> float:
        """Two-sample Kolmogorov–Smirnov statistic between the two
        sketched distributions — the drift signal over warehoused
        latency sketches. Both sketch CDFs are right-continuous step
        functions jumping only at bucket representatives, so the sup is
        attained at one of the union's jump points and is computed
        EXACTLY w.r.t. the sketches' step distributions; geometries may
        differ (rank evaluates at arbitrary points). Vs the true-sample
        KS the distortion is the mass sitting within relative alpha of
        the crossing points (each value is within alpha of its bucket's
        representative), vanishing as alpha -> 0. Empty vs non-empty is
        maximal drift (1.0); two empties are identical (0.0) — the KLL
        convention."""
        v1, _ = self._items()
        v2, _ = other._items()
        if v1.size == 0 and v2.size == 0:
            return 0.0
        if v1.size == 0 or v2.size == 0:
            return 1.0
        pts = np.union1d(v1, v2)
        r1 = np.asarray(self.rank(pts))
        r2 = np.asarray(other.rank(pts))
        return float(np.abs(r1 - r2).max())

    def value_error_bound(self) -> float:
        """Published guarantee: |returned - exact quantile| <=
        alpha * |exact quantile| (relative VALUE error — contrast
        KLL.rank_error_bound's rank units), valid wherever the quantile's
        mass is uncollapsed (`collapsed` False => everywhere)."""
        return self.alpha

    # --- serialization ----------------------------------------------------
    def _payload(self) -> tuple[bytes, bytes]:
        params = struct.pack("<dIBQ", self.alpha, self.bucket_limit,
                             1 if self.collapsed else 0, self.zero_count)
        payload = (struct.pack("<II", self._pos_idx.size, self._neg_idx.size)
                   + self._pos_idx.astype(_I4).tobytes()
                   + self._pos_cnt.astype(_U8).tobytes()
                   + self._neg_idx.astype(_I4).tobytes()
                   + self._neg_cnt.astype(_U8).tobytes())
        return params, payload

    @classmethod
    def _from_payload(cls, params: bytes, payload: bytes) -> "DDSketch":
        alpha, limit, coll, zc = struct.unpack("<dIBQ", params)
        s = cls(alpha, limit)
        if not payload:
            # params-only zero reconstruction (sketch_factory_from_meta,
            # fsck geometry probes): absent payload = empty state
            return s
        s.collapsed = bool(coll)
        s.zero_count = int(zc)
        if len(payload) < 8:
            raise ValueError("DDSketch payload truncated inside the "
                             "store-size header")
        npos, nneg = struct.unpack_from("<II", payload, 0)
        want = 8 + 12 * (npos + nneg)
        if len(payload) != want:
            raise ValueError(
                f"DDSketch payload length {len(payload)} != {want} declared "
                f"({npos} positive + {nneg} negative buckets) — truncated "
                "blob")
        off = 8
        s._pos_idx = np.frombuffer(payload, _I4, npos, off).copy()
        off += 4 * npos
        s._pos_cnt = np.frombuffer(payload, _U8, npos, off).copy()
        off += 8 * npos
        s._neg_idx = np.frombuffer(payload, _I4, nneg, off).copy()
        off += 4 * nneg
        s._neg_cnt = np.frombuffer(payload, _U8, nneg, off).copy()
        for idx, cnt, store in ((s._pos_idx, s._pos_cnt, "positive"),
                                (s._neg_idx, s._neg_cnt, "negative")):
            if idx.size and np.any(np.diff(idx.astype(np.int64)) <= 0):
                raise ValueError(f"DDSketch {store} store indices not "
                                 "strictly increasing — corrupt blob")
            if np.any(cnt == 0):
                raise ValueError(f"DDSketch {store} store carries a zero "
                                 "count — corrupt blob")
        s.n = int(zc) + int(s._pos_cnt.sum()) + int(s._neg_cnt.sum())
        return s

    def __repr__(self) -> str:
        return (f"DDSketch(alpha={self.alpha:g}, n={self.n}, "
                f"buckets={self._pos_idx.size}+{self._neg_idx.size}"
                f"{'+zero' if self.zero_count else ''}"
                f"{', collapsed' if self.collapsed else ''})")
