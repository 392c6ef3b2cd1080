"""Count–Min sketch (Cormode & Muthukrishnan 2005).

State: d x w uint64 counter matrix. Update: row j increments column
g_j(x) = (h1 + (j+1)*h2) mod w (Kirsch–Mitzenmacher row derivation from one
base hash — same 2-inspection economy as the reference's probe scheme,
Hash.hs:131-156). Point query: min over rows; overcount <= eps*N with
probability 1-delta for w = ceil(e/eps), d = ceil(ln(1/delta)). Merge:
elementwise add — associative/commutative, zeros identity.

Weighted updates supported (counts column); update uses np.bincount per row
(vectorized histogram), not per-row Python.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ..util import U64, splitmix64
from .base import Sketch


class CountMinSketch(Sketch):
    TYPE_TAG = 3
    HASH_KEYED = True

    def __init__(self, width: int | None = None, depth: int | None = None,
                 eps: float | None = None, delta: float | None = None,
                 conservative: bool = False):
        if width is None:
            eps = eps or 1e-4
            width = math.ceil(math.e / eps)
        if depth is None:
            delta = delta or 0.01
            depth = max(1, math.ceil(math.log(1.0 / delta)))
        self.width = int(width)
        self.depth = int(depth)
        #: conservative update (Estan & Varghese 2002): raise each cell
        #: only to the key's new estimate instead of adding everywhere.
        #: Always exact <= estimate <= plain-CMS estimate <= exact + eps*N.
        #: Merging (elementwise add) keeps both inequalities but a merged
        #: conservative sketch over-counts more than a single-writer one —
        #: the distributed build trades some of the tightening for
        #: mergeability (documented; the eps*N bound is unaffected).
        self.conservative = bool(conservative)
        self.table = np.zeros((self.depth, self.width), dtype=np.uint64)
        self.total = 0  # N, for eps*N bound reporting

    def _row_indices(self, h: np.ndarray) -> np.ndarray:
        """(d, n) column indices; one base hash inspected, rows derived."""
        h1 = h
        h2 = splitmix64(h) | U64(1)
        j = np.arange(1, self.depth + 1, dtype=U64)[:, None]
        with np.errstate(over="ignore"):
            g = h1[None, :] + j * h2[None, :]
        return (g % U64(self.width)).astype(np.int64)

    def update(self, hashes: np.ndarray, counts: np.ndarray | None = None) -> None:
        h = np.ascontiguousarray(hashes, dtype=U64)
        if h.size == 0:
            return
        if counts is None:
            w = None
            self.total += h.size
        else:
            w = np.ascontiguousarray(counts, dtype=np.float64)
            self.total += int(w.sum())
        if self.conservative:
            # batch form: fold the batch to (unique key, count), read each
            # key's pre-batch estimate, scatter-MAX cells up to est+count.
            # Induction keeps min-cell >= true count (>= exact), and no
            # cell ever exceeds the plain-update value (<= plain CMS).
            uniq, inv = np.unique(h, return_inverse=True)
            per_key = np.bincount(inv, weights=w).astype(np.uint64) if w is not None \
                else np.bincount(inv).astype(np.uint64)
            idx = self._row_indices(uniq)
            rows = np.arange(self.depth)[:, None]
            target = self.table[rows, idx].min(axis=0) + per_key
            np.maximum.at(self.table, (rows, idx), target[None, :])
            return
        idx = self._row_indices(h)
        for j in range(self.depth):
            binc = np.bincount(idx[j], weights=w, minlength=self.width)
            self.table[j] += binc.astype(np.uint64)

    def query(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized point-frequency estimates (min over rows)."""
        h = np.ascontiguousarray(hashes, dtype=U64)
        if h.size == 0:
            return np.zeros(0, dtype=np.int64)
        idx = self._row_indices(h)
        ests = self.table[np.arange(self.depth)[:, None], idx]
        return ests.min(axis=0).astype(np.int64)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.width, self.depth, self.conservative) != (
                other.width, other.depth, other.conservative):
            raise ValueError("geometry mismatch: cannot merge CMS")
        self.table += other.table
        self.total += other.total
        return self

    def fold(self, width: int | None = None,
             depth: int | None = None) -> "CountMinSketch":
        """Geometry downgrade: a new sketch at (``width``, ``depth``) with
        width any DIVISOR of self.width and depth <= self.depth.

        Width fold is exact for plain CMS: row positions are
        ``(h1 + (j+1)*h2) mod w`` and for w' | w, ``(x mod w) mod w' ==
        x mod w'`` — so summing column v into v mod w' reproduces a direct
        build at w' byte-for-byte. Depth fold is exact for both variants:
        row j's hash depends only on j, so the first d' rows ARE the
        d'-deep build. A folded CONSERVATIVE sketch is not byte-equal to a
        direct conservative build (its update path saw the old geometry)
        but keeps both guarantees: it never undercounts (each summed group
        contains the cell the key maps to, all cells >= 0) and is
        cell-wise <= the plain fold, so the e/width' * total bound still
        holds. Source is not mutated. Enables cross-geometry table merges
        and join-size estimation between warehouses sized differently."""
        width = self.width if width is None else int(width)
        depth = self.depth if depth is None else int(depth)
        if width < 1 or self.width % width != 0:
            raise ValueError(
                f"fold width {width} must be a divisor of {self.width} "
                "(row positions are mod width; only divisors nest exactly)")
        if not 1 <= depth <= self.depth:
            raise ValueError(
                f"fold depth {depth} must be in [1, {self.depth}]")
        out = CountMinSketch(width=width, depth=depth,
                             conservative=self.conservative)
        out.table = (self.table[:depth]
                     .reshape(depth, self.width // width, width)
                     .sum(axis=1, dtype=np.uint64))
        out.total = self.total
        return out

    def error_bound(self) -> float:
        """eps*N additive overcount bound for the current stream length."""
        return math.e / self.width * self.total

    def inner_product(self, other: "CountMinSketch") -> int:
        """AMS-style join-size / inner-product estimate
        (Cormode & Muthukrishnan 2005, Thm 3): min over rows of the
        row-wise counter dot product estimates a (.) b = sum_k f_a(k)*f_b(k)
        — the JOIN CARDINALITY of the two streams on the sketched key.

        Guarantees (same-seed, same-geometry sketches):
        - deterministic lower bound: every row's dot >= a (.) b, because
          hash collisions only ADD non-negative products — the estimate
          never undercounts the true join size;
        - upper bound: est <= a (.) b + (e/width)*N_a*N_b with probability
          >= 1 - exp(-depth) (min over depth independent rows).

        With b = a this is the second frequency moment F2 (number of
        duplicate pairs + n). Float64 accumulation: exact for products
        below 2^53, i.e. any realistic per-cell count pair; the estimate
        is an estimate either way.

        Requires the same hash seed on both builds (HASH_KEYED sketches
        hash upstream — build both sides with the same ``seed``).
        """
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError("geometry mismatch: cannot inner_product CMS")
        dots = (self.table.astype(np.float64)
                * other.table.astype(np.float64)).sum(axis=1)
        return int(dots.min())

    def inner_product_bound(self, other: "CountMinSketch") -> float:
        """(e/width)*N_a*N_b additive overcount bound for inner_product."""
        return math.e / self.width * self.total * other.total

    def _payload(self) -> tuple[bytes, bytes]:
        params = struct.pack("<IIQB", self.width, self.depth, self.total,
                             int(self.conservative))
        return params, self.table.astype("<u8").tobytes()

    @classmethod
    def _from_payload(cls, params: bytes, payload: bytes) -> "CountMinSketch":
        width, depth, total, cons = struct.unpack("<IIQB", params)
        s = cls(width=width, depth=depth, conservative=bool(cons))
        if payload:  # params-only zero sketch (warehouse factory) otherwise
            s.table = np.frombuffer(payload, dtype="<u8") \
                .astype(np.uint64).reshape(depth, width)
            s.total = total
        return s

    def __repr__(self) -> str:
        return f"CountMinSketch(w={self.width}, d={self.depth}, N={self.total})"
