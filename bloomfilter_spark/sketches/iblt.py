"""Invertible Bloom Lookup Table — set-RECONCILIATION sketch: subtract
two snapshots' blobs and peel out the ACTUAL differing keys, from state
sized by the difference, not the corpora.

The one question the other membership/cardinality families cannot
answer: theta says *how many* keys differ, Bloom says whether one key is
present — the IBLT LISTS the difference. Two 10^12-row corpus snapshots
that differ in d conv_ids reconcile with two one-scan O(d)-cell builds
plus an O(d) driver-side peel: no join, no shuffle of either corpus
against the other, and the blobs ship/merge/persist like every other
family (operators/reconcile.py drives it end to end; the recovered
hashes broadcast back to materialize the differing rows).

Published basis: Goodrich & Mitzenmacher, "Invertible Bloom Lookup
Tables" (Allerton 2011) — cells of (count, keySum, checkSum); Eppstein,
Goodrich, Uyeda & Varghese, "What's the Difference? Efficient Set
Reconciliation without Prior Context" (SIGCOMM 2011) — the subtract-
then-peel difference digest this module implements, with XOR key/check
aggregation so subtraction and deletion are the same involution.

PARTITIONED layout (why this family does NOT reuse bloom.py's
Kirsch–Mitzenmacher probe scheme): K-M derives all k probes from
(h1 mod m, h2 mod m) — 2·log2(m) bits — so two keys share their ENTIRE
probe set with probability ≈ 1/m². Harmless for a Bloom filter (one
extra false positive); fatal for an IBLT, where such a pair is an
unpeelable 2-cycle: at d listed keys the decode failure probability is
≈ d²/2m² — a CONSTANT at fixed space rate m/d, measured at 7.6% for
(d=200, m=512), swamping the published o(1) peeling failure rate. The
standard remedy (Goodrich–Mitzenmacher's own implementation) is k
INDEPENDENT hash functions, each into its own m/k-cell subtable:

  cell_i(h) = i·sub + (splitmix64(h ^ PROBE_SALTS[i]) & (sub − 1))

Per-key cells are pairwise distinct BY CONSTRUCTION (different
subtables), and a full probe-vector collision now needs k independent
slot matches: P ≈ d²/2 · sub^−k (≈ 7e-5 for the same d=200 geometry,
vanishing with m — restoring the published analysis).

State: three length-m arrays (m = k·sub, sub a power of two) —

  counts     int64   signed occupancy (deletes/subtraction go negative)
  key_xor    uint64  XOR of the hashes of keys mapped to the cell
  check_xor  uint64  XOR of check(h) = splitmix64(h ^ CHECK_SALT)

Every mutation is LINEAR over (Z^m, GF(2)^64m): insert = (+1, ^h, ^c),
delete = (−1, ^h, ^c), merge = cell-wise (+, ^, ^), subtract = cell-wise
(−, ^, ^). Hence merge is associative/commutative with the empty table
as identity, builds are byte-deterministic under any partitioning, and
insert-then-delete returns byte-exactly to zero. decode() peels pure
cells (count ±1, check matches, cell is the key's own probe in that
subtable) and succeeds with high probability while the number of listed
keys is below ``decode_capacity()`` = m / c_k (c_k the k-ary peeling
thresholds, Goodrich–Mitzenmacher Table 1: c_3 1.222, c_4 1.295,
c_5 1.425); ``for_diff`` adds a finite-size hedge on top (small tables
sit before the asymptotic threshold bites).

The represented object is a signed MULTISET of key hashes. Reconcili-
ation semantics need each side to contribute each distinct key ONCE —
the builders (jvm_build.iblt_build_jvm / iblt_grouped_build_jvm) dedupe
in codegen before any cell is touched; kernel callers dedupe their own
batches (np.unique) when feeding raw streams. Merging partials built
over DISJOINT key sets (what a partitioned dedup produces) is exact.

Reference parity: bos/bloomfilter has no invertible structure — this is
a north-rule extension family like scalable.py, sharing the reference's
splitmix-derived independent hash streams (Data/BloomFilter/Hash.hs
hashword2 analog) and pow-2 masked subtable addressing
(Data/BloomFilter/Mutable.hs:81-94 analog, per subtable).
"""

from __future__ import annotations

import struct

import numpy as np

from ..util import (U64, log2_power_of_two, next_power_of_two, splitmix64,
                    splitmix64_scalar)
from .base import Sketch

#: salt folded into the key hash before the splitmix64 finalizer to derive
#: the per-cell check stream — independent of both the probe streams
#: (PROBE_SALTS below) and the key stream (h itself). Part of the wire
#: contract: two blobs only subtract meaningfully if built with the same
#: check derivation (same engine). Mirrored in jvm_build's codegen build.
CHECK_SALT = 0xA5A5_5A5A_C33C_96E3

#: per-probe salts: probe i's slot stream is splitmix64(h ^ PROBE_SALTS[i]).
#: Derived once from a fixed constant — part of the wire contract, mirrored
#: in jvm_build. Index 0..6 covers num_hashes <= 7.
PROBE_SEED = 0x9B0C_8F1E_55AA_77D1
PROBE_SALTS = np.array(
    [splitmix64_scalar(PROBE_SEED + i) for i in range(7)], dtype=np.uint64)

#: peeling-success space thresholds c_k (m >= c_k * d decodes w.h.p.):
#: Goodrich & Mitzenmacher 2011 Table 1 / the k-ary 2-core thresholds.
_CK = {3: 1.222, 4: 1.295, 5: 1.425, 6: 1.570, 7: 1.721}

#: finite-size hedge for for_diff: the c_k thresholds are asymptotic; at
#: small d the 2-core appears earlier. Multiplicative + additive headroom
#: (Eppstein et al. §5 observe the same small-d effect); the sizing test
#: validates 20/20 decode success at exactly for_diff(d) geometry.
_HEDGE_MULT = 1.35
_HEDGE_CELLS = 24

#: floor on slots per subtable: below this the 2-core shows up at
#: measurable rates even under the c_k·hedge rate (measured: 0.5% decode
#: failure at d=10 with 16-slot subtables; zero in 400 trials at 32). A
#: k=4 floor table is 4·32·24 B = 3 KiB — headroom is free at this size.
_MIN_SUB = 32


def _check(h: np.ndarray) -> np.ndarray:
    return splitmix64(h ^ U64(CHECK_SALT))


class IBLT(Sketch):
    TYPE_TAG = 12
    #: new family: first wire version it ever serialized under is v4
    MIN_WIRE_VERSION = 4
    HASH_KEYED = True

    def __init__(self, num_cells: int, num_hashes: int = 4):
        if not (2 <= num_hashes <= 7):
            raise ValueError("num_hashes must be in [2, 7] (peeling "
                             "thresholds published for 3..7; 2 allowed "
                             "for testing)")
        k = int(num_hashes)
        # round the per-subtable slot count up to a power of two; total
        # state is k*sub cells (>= the requested num_cells)
        sub = max(_MIN_SUB,
                  next_power_of_two(-(-max(int(num_cells), 1) // k)))
        self.num_hashes = k
        self.sub = sub
        self.num_cells = k * sub
        self.mask = sub - 1
        self.counts = np.zeros(self.num_cells, dtype=np.int64)
        self.key_xor = np.zeros(self.num_cells, dtype=U64)
        self.check_xor = np.zeros(self.num_cells, dtype=U64)

    @classmethod
    def for_diff(cls, max_diff: int, num_hashes: int = 4) -> "IBLT":
        """Size for decoding up to ``max_diff`` listed keys w.h.p.: the
        published c_k space rate plus the finite-size hedge
        (sizing.suggest_sketch('iblt', max_diff=...))."""
        c = _CK.get(num_hashes, _CK[4])
        cells = int(np.ceil(c * _HEDGE_MULT * max(int(max_diff), 1))) \
            + _HEDGE_CELLS
        return cls(cells, num_hashes)

    # --- probes -----------------------------------------------------------

    def _probe_matrix(self, h: np.ndarray) -> np.ndarray:
        """Shape (k, n) int64 cell indices; row i lies in subtable i, so
        per-key cells are pairwise distinct by construction."""
        k, sub, mask = self.num_hashes, self.sub, U64(self.mask)
        out = np.empty((k, h.size), dtype=np.int64)
        for i in range(k):
            slot = splitmix64(h ^ PROBE_SALTS[i]) & mask
            out[i] = slot.astype(np.int64) + i * sub
        return out

    # --- kernel -----------------------------------------------------------

    def _apply(self, hashes: np.ndarray, sign: int) -> None:
        h = np.ascontiguousarray(hashes, dtype=U64)
        if h.size == 0:
            return
        p = self._probe_matrix(h)
        idx = p.ravel()
        keys = np.broadcast_to(h, p.shape).ravel()
        chks = np.broadcast_to(_check(h), p.shape).ravel()
        np.add.at(self.counts, idx, np.int64(sign))
        np.bitwise_xor.at(self.key_xor, idx, keys)
        np.bitwise_xor.at(self.check_xor, idx, chks)

    def update(self, hashes: np.ndarray) -> None:
        """Insert a batch of pre-hashed uint64 keys (+1 per cell). The
        batch is taken as given — reconciliation callers must feed each
        distinct key once per side (builders dedupe in codegen)."""
        self._apply(hashes, +1)

    def delete(self, hashes: np.ndarray) -> None:
        """Remove a batch of keys (−1, same XORs — XOR is an involution).
        Always valid: counts are signed, so delete-before-insert and
        subtraction below zero are exact linear states, not errors."""
        self._apply(hashes, -1)

    def merge(self, other: "IBLT") -> "IBLT":
        """Cell-wise (+, ^, ^): associative, commutative, empty identity.
        Exact multiset addition — partials over disjoint key sets (any
        partitioned dedup build) merge to the whole-set table."""
        self._check_geometry(other)
        self.counts += other.counts
        self.key_xor ^= other.key_xor
        self.check_xor ^= other.check_xor
        return self

    def subtract(self, other: "IBLT") -> "IBLT":
        """The difference digest (Eppstein et al. §4): a NEW table
        representing self's multiset minus other's. decode() on it lists
        keys only in self (+1 side) and only in other (−1 side). Neither
        input is mutated."""
        self._check_geometry(other)
        out = IBLT(self.num_cells, self.num_hashes)
        np.subtract(self.counts, other.counts, out=out.counts)
        np.bitwise_xor(self.key_xor, other.key_xor, out=out.key_xor)
        np.bitwise_xor(self.check_xor, other.check_xor, out=out.check_xor)
        return out

    def decode(self) -> tuple[np.ndarray, np.ndarray, bool]:
        """Peel the table: returns (pos, neg, complete) — sorted uint64
        key hashes with net multiplicity +1 / −1, and whether the table
        emptied (complete=True ⇒ the listing is the EXACT symmetric
        difference). A pure cell must pass three tests before its key is
        trusted: count == ±1, check_xor == check(key_xor), and the cell
        is the key's own probe in its subtable — so a spurious listing
        needs a 64-bit check collision (P ≈ 2^-64 per candidate), and an
        INCOMPLETE decode still returns only verified keys (never
        garbage), just possibly not all of them.

        Does not mutate self (peels a scratch copy). O(m) work per pass,
        ≤ O(m) passes; m is sized O(d) by construction."""
        counts = self.counts.copy()
        key_xor = self.key_xor.copy()
        check_xor = self.check_xor.copy()
        sub, mask = self.sub, U64(self.mask)
        pos: list[int] = []
        neg: list[int] = []
        candidates = np.flatnonzero(np.abs(counts) == 1)
        while candidates.size:
            nxt: list[int] = []
            for i in candidates.tolist():
                c = counts[i]
                if c != 1 and c != -1:
                    continue
                key = key_xor[i]
                karr = np.array([key], dtype=U64)
                if check_xor[i] != _check(karr)[0]:
                    continue
                # the cell must be the key's own probe in THIS subtable
                t = i // sub
                if (splitmix64(karr ^ PROBE_SALTS[t]) & mask)[0] != i % sub:
                    continue  # check collision faking purity
                p = self._probe_matrix(karr)[:, 0]
                (pos if c == 1 else neg).append(int(key))
                chk = _check(karr)[0]
                counts[p] -= c
                key_xor[p] ^= key
                check_xor[p] ^= chk
                nxt.extend(p.tolist())
            candidates = np.unique(np.array(nxt, dtype=np.int64)) \
                if nxt else np.empty(0, dtype=np.int64)
            if candidates.size:
                candidates = candidates[np.abs(counts[candidates]) == 1]
        complete = (not counts.any() and not key_xor.any()
                    and not check_xor.any())
        return (np.sort(np.array(pos, dtype=U64)),
                np.sort(np.array(neg, dtype=U64)), complete)

    def fold(self, num_cells: int) -> "IBLT":
        """EXACT size downgrade: each SUBTABLE folds independently — slot
        j of folded subtable i combines slots {j, j+sub', j+2·sub', ...}
        of source subtable i with (+, ^, ^). Slots are masked, so for
        pow-2 sub' ≤ sub every key's slot mod sub' is its direct-build
        slot — byte-identical to a direct build at the target geometry
        (same proof as BloomFilter.fold, per subtable). Source not
        mutated. Folding shrinks decode_capacity proportionally."""
        k = self.num_hashes
        tgt = IBLT(num_cells, k)
        if tgt.sub > self.sub:
            raise ValueError(
                f"fold target {tgt.num_cells} cells exceeds this table's "
                f"{self.num_cells} (can only reduce; rebuild to grow)")
        c = self.counts.reshape(k, self.sub)
        kx = self.key_xor.reshape(k, self.sub)
        cx = self.check_xor.reshape(k, self.sub)
        while c.shape[1] > tgt.sub:
            half = c.shape[1] // 2
            c = c[:, :half] + c[:, half:]
            kx = kx[:, :half] ^ kx[:, half:]
            cx = cx[:, :half] ^ cx[:, half:]
        tgt.counts = np.ascontiguousarray(c).reshape(-1).copy()
        tgt.key_xor = np.ascontiguousarray(kx).reshape(-1).copy()
        tgt.check_xor = np.ascontiguousarray(cx).reshape(-1).copy()
        return tgt

    # --- stats ------------------------------------------------------------

    def estimate(self) -> float:
        """EXACT net key count of the represented signed multiset:
        Σcounts / k (every key contributes exactly k cell increments).
        For a difference digest this is |A∖B| − |B∖A| — the signed size
        of the difference, known before any peel."""
        return float(int(self.counts.sum()) / self.num_hashes)

    def decode_capacity(self) -> float:
        """Max listed-key count decode() handles w.h.p.: m / c_k
        (Goodrich–Mitzenmacher Table 1 peeling thresholds). The sizing
        dual of suggest_sketch('iblt', max_diff=...)."""
        return float(self.num_cells / _CK.get(self.num_hashes, _CK[4]))

    def occupied_count(self) -> int:
        """Cells with any content (count or XOR state non-zero)."""
        return int(np.count_nonzero(
            (self.counts != 0) | (self.key_xor != 0) | (self.check_xor != 0)))

    def __len__(self) -> int:
        return self.num_cells

    @property
    def state_nbytes(self) -> int:
        return self.counts.nbytes + self.key_xor.nbytes + self.check_xor.nbytes

    def _check_geometry(self, other: "IBLT") -> None:
        if (self.num_cells, self.num_hashes) != (other.num_cells,
                                                 other.num_hashes):
            raise ValueError("geometry mismatch: cannot combine IBLTs")

    # --- serialization: params <QI m k>; payload mode byte +
    #     dense: counts i8*m | key_xor u8*m | check_xor u8*m
    #     sparse: (<u4 idx, i8 count, u8 kx, u8 cx>) per non-empty cell ---

    def _payload(self) -> tuple[bytes, bytes]:
        params = struct.pack("<QI", self.num_cells, self.num_hashes)
        nz = np.flatnonzero((self.counts != 0) | (self.key_xor != 0)
                            | (self.check_xor != 0))
        # sparse entry is 28 B vs 24 B/cell dense; deterministic function
        # of content (byte-equality across build paths), same rationale
        # as bloom.py — per-partition partials touch <= k*rows cells
        if 28 * nz.size < 24 * self.num_cells and self.num_cells <= 0xFFFFFFFF:
            body = (b"\x01" + nz.astype("<u4").tobytes()
                    + self.counts[nz].astype("<i8").tobytes()
                    + self.key_xor[nz].astype("<u8").tobytes()
                    + self.check_xor[nz].astype("<u8").tobytes())
        else:
            body = (b"\x00" + self.counts.astype("<i8").tobytes()
                    + self.key_xor.astype("<u8").tobytes()
                    + self.check_xor.astype("<u8").tobytes())
        return params, body

    @classmethod
    def _from_payload(cls, params: bytes, payload: bytes) -> "IBLT":
        num_cells, num_hashes = struct.unpack("<QI", params)
        t = cls(num_cells, num_hashes)
        if t.num_cells != num_cells:
            raise ValueError(
                f"IBLT params corrupt: {num_cells} cells is not "
                f"{num_hashes} x pow-2 subtables")
        if not payload:                 # params-only zero (warehouse factory)
            return t
        mode, body = payload[0], memoryview(payload)[1:]
        m = t.num_cells
        if mode == 0:
            if len(body) != 24 * m:
                raise ValueError("dense IBLT payload length != 24m")
            t.counts = np.frombuffer(body, dtype="<i8", count=m).astype(
                np.int64, copy=True)
            t.key_xor = np.frombuffer(body, dtype="<u8", count=m,
                                      offset=8 * m).astype(U64, copy=True)
            t.check_xor = np.frombuffer(body, dtype="<u8", count=m,
                                        offset=16 * m).astype(U64, copy=True)
        elif mode == 1:
            nnz, rem = divmod(len(body), 28)
            if rem:
                raise ValueError("sparse IBLT payload not a multiple of 28")
            idx = np.frombuffer(body, dtype="<u4", count=nnz).astype(np.int64)
            if nnz and (idx.max() >= m or np.any(idx[1:] <= idx[:-1])):
                raise ValueError(
                    "sparse IBLT indices out of range or not increasing")
            cnt = np.frombuffer(body, dtype="<i8", count=nnz, offset=4 * nnz)
            kx = np.frombuffer(body, dtype="<u8", count=nnz, offset=12 * nnz)
            cx = np.frombuffer(body, dtype="<u8", count=nnz, offset=20 * nnz)
            if nnz and np.any((cnt == 0) & (kx == 0) & (cx == 0)):
                raise ValueError("sparse IBLT payload stores an empty cell")
            t.counts[idx] = cnt
            t.key_xor[idx] = kx
            t.check_xor[idx] = cx
        else:
            raise ValueError(f"unknown IBLT payload mode {mode}")
        return t

    def __repr__(self) -> str:
        return (f"IBLT(m={self.num_hashes}x2^"
                f"{log2_power_of_two(self.sub)}, k={self.num_hashes})")
