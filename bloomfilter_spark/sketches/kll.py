"""KLL quantile sketch (Karnin, Lang & Liberty 2016).

State: a list of level buffers; items at level l carry weight 2^l. Level
capacities shrink geometrically from the top: cap(l) = max(2, k * c^(H-1-l))
with c = 2/3. When total size exceeds the capacity budget, the lowest
over-full level is compacted: sort, keep every other item (offset chosen by
a deterministic counter-seeded coin — SURVEY.md §7 hard parts (a): seeded so
resume and associativity tests are stable), promote to the next level.

Merge: concatenate levels pairwise, then compact to budget — associative in
distribution; estimates invariant within the published +/- eps*n rank bound
(eps ~ 1.7/k at default k=200). Query: gather (value, 2^level) pairs, sort,
cumulative weight -> rank interpolation.
"""

from __future__ import annotations

import struct

import numpy as np

from ..util import splitmix64_scalar
from .base import Sketch

_C = 2.0 / 3.0


class KLL(Sketch):
    TYPE_TAG = 5
    HASH_KEYED = False

    def __init__(self, k: int = 200, seed: int = 0x9150A946):
        self.k = int(k)
        self.seed = int(seed)
        self.levels: list[np.ndarray] = [np.zeros(0, dtype=np.float64)]
        self.n = 0
        self._compactions = 0
        # raw values buffered ahead of level 0: folding them in lazily
        # replaces many small per-batch sorts with one large one — same
        # algorithm (level 0 receives the same multiset), same bounds
        self._pending: list[np.ndarray] = []
        self._pending_n = 0

    _PENDING_CAP = 1 << 20

    def _flush(self) -> None:
        if self._pending:
            self.levels[0] = np.concatenate([self.levels[0], *self._pending])
            self._pending = []
            self._pending_n = 0
            self._compress()

    # --- capacity machinery --------------------------------------------
    def _cap(self, level: int) -> int:
        height = len(self.levels)
        return max(2, int(np.ceil(self.k * _C ** (height - 1 - level))))

    def _budget(self) -> int:
        return sum(self._cap(l) for l in range(len(self.levels)))

    def _size(self) -> int:
        return sum(buf.size for buf in self.levels)

    def _coin(self) -> int:
        self._compactions += 1
        return splitmix64_scalar(self.seed + self._compactions) & 1

    def _compact_level(self, l: int) -> None:
        """Sort level l, keep any odd item in place, promote every other item
        of the even remainder (offset = deterministic coin) to level l+1."""
        buf = np.sort(self.levels[l], kind="stable")
        if buf.size % 2 == 1:
            keep_here, buf = buf[-1:], buf[:-1]
        else:
            keep_here = np.zeros(0, dtype=np.float64)
        promoted = buf[self._coin()::2]
        self.levels[l] = keep_here
        if l + 1 == len(self.levels):
            self.levels.append(np.zeros(0, dtype=np.float64))
        self.levels[l + 1] = np.concatenate([self.levels[l + 1], promoted])

    def _compact_once(self) -> None:
        for l in range(len(self.levels)):
            if self.levels[l].size > self._cap(l) and self.levels[l].size >= 2:
                self._compact_level(l)
                return
        # total over budget without a single over-cap level: compact largest
        l = int(np.argmax([buf.size for buf in self.levels]))
        if self.levels[l].size >= 2:
            self._compact_level(l)

    def _compress(self) -> None:
        while self._size() > self._budget():
            before = self._size()
            self._compact_once()
            if self._size() >= before:
                break

    def update(self, values: np.ndarray) -> None:
        v = np.ascontiguousarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.n += v.size
        self._pending.append(v)
        self._pending_n += v.size
        if self._pending_n >= self._PENDING_CAP:
            self._flush()

    def update_weighted(self, values: np.ndarray, weights: np.ndarray) -> None:
        """Insert each value with an integral weight, by binary-decomposing
        the weight across levels (items at level l carry weight 2^l). This
        is exactly a level-wise merge with a sketch holding those items, so
        the published rank bound carries over unchanged — it is the
        pre-aggregated build path (jvm_build.quantile_build_preagg): ship
        (value, count) pairs over the pipe instead of n rows."""
        v = np.ascontiguousarray(values, dtype=np.float64)
        w = np.asarray(weights)
        if not np.all(np.equal(np.mod(w, 1), 0)):
            raise ValueError("KLL weights must be integral (counts)")
        w = w.astype(np.int64)
        if np.any(w < 0):
            raise ValueError("KLL weights must be non-negative counts "
                             "(a negative weight is a caller sign bug; "
                             "zero-weight rows are dropped)")
        keep = ~np.isnan(v) & (w > 0)
        v, w = v[keep], w[keep]
        if v.size == 0:
            return
        self._flush()
        self.n += int(w.sum())
        for l in range(int(w.max()).bit_length()):
            sel = v[(w >> l) & 1 == 1]
            if sel.size == 0:
                continue
            while len(self.levels) <= l:
                self.levels.append(np.zeros(0, dtype=np.float64))
            self.levels[l] = np.concatenate([self.levels[l], sel])
        self._compress()

    def fold(self, k: int) -> "KLL":
        """Accuracy downgrade to ``k`` <= self.k: copy the level buffers
        into a fresh KLL(k) and recompress under the new (smaller) level
        capacities — exactly a merge into an empty k-sketch, which the KLL
        paper's analysis allows (compaction error depends only on the
        level at which a compaction happens, not on when). Rank error of
        the result is bounded by eps(old k) + eps(new k) <= 2*eps(k):
        compactions already performed were charged at the old (tighter)
        capacities, new ones at the new. Same seed, so folding is
        deterministic. Source is not mutated."""
        if k < 8:
            raise ValueError("k must be >= 8")
        if k > self.k:
            raise ValueError(
                f"fold target k={k} exceeds this sketch's k={self.k} "
                "(can only reduce accuracy; rebuild to increase it)")
        self._flush()
        out = KLL(k, seed=self.seed)
        out.levels = [buf.copy() for buf in self.levels]
        out.n = self.n
        out._compactions = self._compactions
        out._compress()
        return out

    def merge(self, other: "KLL") -> "KLL":
        if self.k != other.k:
            raise ValueError("k mismatch: cannot merge KLL sketches")
        self._flush()
        other._flush()
        while len(self.levels) < len(other.levels):
            self.levels.append(np.zeros(0, dtype=np.float64))
        for l, buf in enumerate(other.levels):
            if buf.size:
                self.levels[l] = np.concatenate([self.levels[l], buf])
        self.n += other.n
        self._compactions = max(self._compactions, other._compactions)
        self._compress()
        return self

    # --- queries --------------------------------------------------------
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        self._flush()
        vals, wts = [], []
        for l, buf in enumerate(self.levels):
            if buf.size:
                vals.append(buf)
                wts.append(np.full(buf.size, float(1 << l)))
        if not vals:
            return np.zeros(0), np.zeros(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q) -> np.ndarray | float:
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        v, w = self._weighted_items()
        if v.size == 0:
            out = np.full(qs.shape, np.nan)
            return out if np.ndim(q) else float(out[0])
        cum = np.cumsum(w)
        total = cum[-1]
        ranks = np.clip(qs, 0.0, 1.0) * total
        idx = np.searchsorted(cum - w / 2.0, ranks, side="left")
        idx = np.clip(idx, 0, v.size - 1)
        out = v[idx]
        return out if np.ndim(q) else float(out[0])

    def rank(self, x) -> np.ndarray | float:
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        v, w = self._weighted_items()
        if v.size == 0:
            out = np.full(xs.shape, np.nan)
            return out if np.ndim(x) else float(out[0])
        cum = np.concatenate(([0.0], np.cumsum(w)))
        idx = np.searchsorted(v, xs, side="right")
        out = cum[idx] / cum[-1]
        return out if np.ndim(x) else float(out[0])

    def rank_error_bound(self) -> float:
        """Published normalized rank error ~1.7/k for the KLL default profile."""
        return 1.7 / self.k

    def ks_distance(self, other: "KLL") -> float:
        """Two-sample Kolmogorov–Smirnov statistic estimate:
        sup_x |F_self(x) - F_other(x)| between the two sketched
        distributions — the standard corpus-drift / distribution-shift
        signal (did this month's token-length distribution move?).

        Both sketch CDFs are right-continuous step functions that only
        change at retained items, so the sup over all x is attained at
        (the right limit of) one of the union's jump points — evaluating
        `rank` at the union of retained items computes the sketch-CDF sup
        EXACTLY. Error vs the true-sample KS is bounded by the sum of the
        two sketches' rank errors (each rank is within ~1.7/k of truth),
        so |est - exact| <= self.rank_error_bound() +
        other.rank_error_bound() up to the usual constant.

        Empty vs non-empty is maximal drift by convention (1.0); two
        empties are identical (0.0).
        """
        v1, _ = self._weighted_items()
        v2, _ = other._weighted_items()
        if v1.size == 0 and v2.size == 0:
            return 0.0
        if v1.size == 0 or v2.size == 0:
            return 1.0
        pts = np.union1d(v1, v2)
        r1 = self.rank(pts)
        r2 = other.rank(pts)
        return float(np.abs(np.asarray(r1) - np.asarray(r2)).max())

    # --- serialization --------------------------------------------------
    def _payload(self) -> tuple[bytes, bytes]:
        self._flush()
        sizes = np.array([buf.size for buf in self.levels], dtype="<u4")
        params = struct.pack("<IQQII", self.k, self.n, self._compactions,
                             self.seed & 0xFFFFFFFF, len(self.levels))
        payload = sizes.tobytes() + b"".join(
            buf.astype("<f8").tobytes() for buf in self.levels)
        return params, payload

    @classmethod
    def _from_payload(cls, params: bytes, payload: bytes) -> "KLL":
        k, n, comps, seed, nlevels = struct.unpack("<IQQII", params)
        s = cls(k, seed)
        s.n = n
        s._compactions = comps
        if not payload:
            # params-only zero reconstruction (sketch_factory_from_meta,
            # verify_sketch_table's geometry probe): same convention as
            # the other families — an absent payload means empty state,
            # regardless of the level count the params were stamped with
            s.n = 0
            s._compactions = 0
            return s
        if len(payload) < 4 * nlevels:
            raise ValueError("KLL payload truncated inside the level-size table")
        sizes = np.frombuffer(payload[:4 * nlevels], dtype="<u4")
        if len(payload) != 4 * nlevels + 8 * int(sizes.sum()):
            raise ValueError(
                f"KLL payload length {len(payload)} != declared level sizes "
                f"({nlevels} levels, {int(sizes.sum())} values) — truncated blob")
        off = 4 * nlevels
        s.levels = []
        for sz in sizes:
            s.levels.append(np.frombuffer(
                payload[off:off + 8 * int(sz)], dtype="<f8").astype(np.float64))
            off += 8 * int(sz)
        if not s.levels:
            s.levels = [np.zeros(0, dtype=np.float64)]
        return s

    def __repr__(self) -> str:
        return f"KLL(k={self.k}, n={self.n}, levels={len(self.levels)})"
