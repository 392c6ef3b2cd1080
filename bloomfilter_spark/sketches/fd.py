"""Frequent Directions — the mergeable MATRIX sketch (Liberty, KDD 2013;
Ghashami, Liberty, Phillips & Woodruff, SIAM J. Comput. 2016).

The spectral member of the family: where Misra–Gries keeps the heavy
ITEMS of a frequency vector, Frequent Directions keeps the heavy
DIRECTIONS of a row matrix. State is an ell x d float64 buffer B; after
streaming the rows of any tall matrix A (10^12 embedding vectors),

    0  <=  x^T (A^T A - B^T B) x  <=  ||A||_F^2 / ell     for unit x,

i.e. the sketch's Gram matrix underestimates the true one by at most
epsilon = ||A||_F^2 / ell in spectral norm (Liberty's deterministic
bound — no randomness, no failure probability). That makes B a drop-in
for covariance-level questions over the `embeddings` table: top singular
directions (diagnose a collapsed embedding space), PCA preconditioning
for IVF list geometry, low-rank energy fractions — from O(ell*d) state
instead of a d x d Gram accumulation or a second corpus pass.

Shrink step: when the buffer fills to 2*ell rows, SVD it and subtract
the (ell+1)-th squared singular value from every direction's energy:
sigma_i' = sqrt(max(sigma_i^2 - sigma_ell^2, 0)) — at least half the
buffer zeroes out, and each shrink charges at most sigma_ell^2 <=
||A||_F^2 / ell to every unit direction (the MG decrement, verbatim, in
spectral arithmetic).

Merge: stack the two buffers and shrink — the bound composes additively
(Ghashami et al. Thm 3.1: FD is a mergeable summary), so partitioned /
treeAggregate builds carry the same guarantee as one sequential pass.
Like t-digest (and unlike the counting families), the REPRESENTATION is
order/partition-dependent — different chunkings give different (equally
valid) buffers; what is invariant is the error bound, tested against the
exact Gram matrix. ``total_fnorm2`` (exact Frobenius mass, plain
addition) and ``n`` ride along, so the bound is computable from the blob
alone (`cov_error_bound`).

Not HASH_KEYED and not a scalar value sketch either: update() consumes a
2-D (rows, d) float64 array, so the distributed build is
`operators.similarity.embedding_principal_directions` (mapInPandas
partials, O(ell*d) per partition to the driver) rather than
agg.build_sketch's scalar column path.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Sketch


class FrequentDirections(Sketch):
    TYPE_TAG = 14
    HASH_KEYED = False

    def __init__(self, ell: int = 64, d: int | None = None):
        if ell < 2:
            raise ValueError(f"ell must be >= 2, got {ell}")
        if d is not None and d < 1:
            raise ValueError(f"d must be >= 1, got {d}")
        self.ell = int(ell)
        self.d = None if d is None else int(d)  # fixed on first update
        self.n = 0
        self.total_fnorm2 = 0.0
        self._buf = None  # (2*ell, d) workspace; rows [_rows:] are zero
        self._rows = 0

    # --- internals --------------------------------------------------------
    def _ensure_buf(self, d: int) -> None:
        if self.d is None:
            self.d = int(d)
        elif self.d != d:
            raise ValueError(f"row dimension {d} != sketch d={self.d}")
        if self._buf is None:
            self._buf = np.zeros((2 * self.ell, self.d), dtype=np.float64)

    def _shrink(self) -> None:
        """SVD the buffer, subtract the ell-th squared singular value —
        the spectral MG decrement. Afterwards at most ell rows are
        nonzero (row i holds sigma_i' * V_i)."""
        # economy SVD of the (2*ell, d) buffer: O(ell^2 * d)
        _, sig, vt = np.linalg.svd(self._buf[:self._rows], full_matrices=False)
        if sig.size > self.ell:
            delta = sig[self.ell] ** 2
            sig = np.sqrt(np.maximum(sig**2 - delta, 0.0))
        keep = min(self.ell, sig.size)
        self._buf[:] = 0.0
        self._buf[:keep] = sig[:keep, None] * vt[:keep]
        # drop numerically-zero rows from the active window
        nz = int(np.count_nonzero(np.any(self._buf[:keep] != 0.0, axis=1)))
        # zero rows are always the tail (sig sorted descending)
        self._rows = nz

    def update(self, rows: np.ndarray) -> None:
        """Append a batch of d-dimensional rows (2-D float64 array;
        non-finite rows are skipped, matching the value sketches' domain
        rule)."""
        a = np.ascontiguousarray(rows, dtype=np.float64)
        if a.ndim == 1:
            a = a[None, :]
        if a.ndim != 2:
            raise ValueError("update expects a (rows, d) array")
        a = a[np.all(np.isfinite(a), axis=1)]
        if a.shape[0] == 0:
            return
        self._ensure_buf(a.shape[1])
        self.n += a.shape[0]
        self.total_fnorm2 += float((a * a).sum())
        i = 0
        while i < a.shape[0]:
            take = min(2 * self.ell - self._rows, a.shape[0] - i)
            self._buf[self._rows:self._rows + take] = a[i:i + take]
            self._rows += take
            i += take
            if self._rows >= 2 * self.ell:
                self._shrink()

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        if not isinstance(other, FrequentDirections):
            raise ValueError(f"cannot merge FrequentDirections with "
                             f"{type(other).__name__}")
        if self.ell != other.ell:
            raise ValueError(f"ell mismatch: {self.ell} vs {other.ell}")
        if other.d is not None:
            if self.d is not None and self.d != other.d:
                raise ValueError(f"d mismatch: {self.d} vs {other.d}")
            if other._rows:
                # stack + shrink = the mergeable-summaries composition
                self._ensure_buf(other.d)
                rows = other._buf[:other._rows].copy()
                i = 0
                while i < rows.shape[0]:
                    take = min(2 * self.ell - self._rows, rows.shape[0] - i)
                    self._buf[self._rows:self._rows + take] = rows[i:i + take]
                    self._rows += take
                    i += take
                    if self._rows >= 2 * self.ell:
                        self._shrink()
            elif self.d is None:
                self.d = other.d
        self.n += other.n
        self.total_fnorm2 += other.total_fnorm2
        return self

    # --- queries ----------------------------------------------------------
    def buffer(self) -> np.ndarray:
        """The current (<= ell kept rows, d) sketch matrix B (a copy)."""
        if self._buf is None:
            return np.zeros((0, self.d or 0), dtype=np.float64)
        if self._rows > self.ell:
            self._shrink()  # canonicalize before exposing/serializing
        return self._buf[:self._rows].copy()

    def cov(self) -> np.ndarray:
        """B^T B — the sketched Gram/covariance matrix (d x d), with
        0 <= A^T A - B^T B <= cov_error_bound() * I in the psd order."""
        b = self.buffer()
        return b.T @ b

    def cov_error_bound(self) -> float:
        """Liberty's deterministic bound: ||A^T A - B^T B||_2 <=
        total_fnorm2 / ell, computable from the blob alone. Merges
        compose additively, so this holds for any partitioned build."""
        return self.total_fnorm2 / self.ell

    def singular_directions(self, k: int | None = None
                            ) -> tuple[np.ndarray, np.ndarray]:
        """(singular values, right singular vectors (k, d)) of the sketch
        — the approximate top directions of the row stream. Each
        sigma_i^2 underestimates the true i-th squared singular value by
        at most cov_error_bound()."""
        b = self.buffer()
        if b.shape[0] == 0:
            return (np.zeros(0), np.zeros((0, self.d or 0)))
        _, sig, vt = np.linalg.svd(b, full_matrices=False)
        if k is not None:
            sig, vt = sig[:k], vt[:k]
        return sig, vt

    # --- serialization ----------------------------------------------------
    def _payload(self) -> tuple[bytes, bytes]:
        b = self.buffer()  # canonical: <= ell rows
        params = struct.pack("<IIQdI", self.ell, self.d or 0, self.n,
                             self.total_fnorm2, b.shape[0])
        return params, b.astype("<f8").tobytes()

    @classmethod
    def _from_payload(cls, params: bytes, payload: bytes) -> "FrequentDirections":
        ell, d, n, fn2, rows = struct.unpack("<IIQdI", params)
        s = cls(ell, d or None)
        if not payload:
            # Empty payload covers TWO states (r6 fix, round-5 ADVICE): the
            # params-only zero sketch (n == 0, house convention) AND a real
            # sketch whose shrink zeroed every buffer row — the latter must
            # keep its accumulated n / Frobenius mass, or the roundtripped
            # blob claims an exact Gram (cov_error_bound() == 0) while the
            # true spectral error is fn2/ell, and merges lose the mass.
            if n:
                if d == 0 or rows != 0:
                    raise ValueError(
                        f"FrequentDirections blob inconsistent (n={n}, "
                        f"d={d}, rows={rows}, empty payload) — corrupt blob")
                if not (np.isfinite(fn2) and fn2 >= 0):
                    raise ValueError(
                        "FrequentDirections total_fnorm2 not finite and "
                        "non-negative — corrupt blob")
                s.n = int(n)
                s.total_fnorm2 = float(fn2)
                s._buf = np.zeros((2 * ell, d), dtype=np.float64)
            return s
        if d == 0 or rows > ell:
            raise ValueError(
                f"FrequentDirections blob inconsistent (d={d}, rows={rows}, "
                f"ell={ell}) — corrupt blob")
        if len(payload) != 8 * rows * d:
            raise ValueError(
                f"FrequentDirections payload length {len(payload)} != "
                f"{8 * rows * d} declared ({rows} x {d} float64) — "
                "truncated blob")
        s.n = int(n)
        s.total_fnorm2 = float(fn2)
        if not np.isfinite(s.total_fnorm2) or s.total_fnorm2 < 0:
            raise ValueError("FrequentDirections total_fnorm2 not finite "
                             "and non-negative — corrupt blob")
        s._buf = np.zeros((2 * ell, d), dtype=np.float64)
        s._buf[:rows] = np.frombuffer(payload, "<f8").reshape(rows, d)
        if not np.all(np.isfinite(s._buf[:rows])):
            raise ValueError("FrequentDirections buffer carries non-finite "
                             "entries — corrupt blob")
        s._rows = int(rows)
        return s

    def __repr__(self) -> str:
        return (f"FrequentDirections(ell={self.ell}, d={self.d}, "
                f"n={self.n}, rows={self._rows})")
