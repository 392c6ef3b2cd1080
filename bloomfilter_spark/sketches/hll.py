"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, with the
small-range linear-counting and 64-bit large-range handling of the HLL++
paper, Heule et al. 2013 — bias table omitted, documented).

State: 2^p uint8 registers. Update: reg[h >> (64-p)] = max(reg, rho) where
rho = (leading zeros of the remaining 64-p bits) + 1. Merge: elementwise max
— associative, commutative, idempotent; zero registers are the identity.
Error: ±1.04/sqrt(2^p) relative std (≈0.81% at default p=14).

Cross-checked in tests against Spark's approx_count_distinct and exact
count(distinct) (SURVEY.md §2.7).
"""

from __future__ import annotations

import struct

import numpy as np

from ..util import U64, clz64
from .base import Sketch


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HyperLogLog(Sketch):
    TYPE_TAG = 2
    # v2 added the sparse/dense payload mode byte for this type
    MIN_WIRE_VERSION = 2
    HASH_KEYED = True

    def __init__(self, p: int = 14):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update(self, hashes: np.ndarray) -> None:
        h = np.ascontiguousarray(hashes, dtype=U64)
        if h.size == 0:
            return
        idx = (h >> U64(64 - self.p)).astype(np.int64)
        rest = h << U64(self.p)  # remaining 64-p bits, top-aligned
        rho = np.minimum(clz64(rest) + 1, 64 - self.p + 1).astype(np.uint8)
        # unbuffered scatter-max: the register array is small (2^p bytes)
        # and cache-resident, so maximum.at beats sort-and-segment here
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if self.p != other.p:
            raise ValueError("precision mismatch: cannot merge HLL sketches")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def fold(self, p: int) -> "HyperLogLog":
        """EXACT precision downgrade: a new sketch byte-identical to a
        direct build at precision ``p`` <= self.p over the same hashes
        (HLL++ §5's precision-reduction idea, Heule et al. 2013, made
        exact by this layout: index = top p bits, rho domain top-aligned).

        Why it is exact: an element with index i at precision P splits as
        i = (i' << d) | t at p = P - d. If t != 0 the dropped bits start
        the new rho domain, so its rho' = d - bitlength(t) + 1 — the same
        for EVERY element in sub-register t, so occupancy (register > 0)
        is all we need. If t == 0 the new rho continues through d zero
        bits: rho' = d + rho, monotone in rho, so the stored max carries.
        Source is not mutated. Enables merging warehoused tables built at
        different precisions (fold the finer one, then merge)."""
        if not 4 <= p <= self.p:
            raise ValueError(
                f"fold target p={p} must be in [4, {self.p}] (can only "
                "reduce precision; rebuild to increase it)")
        out = HyperLogLog(p)
        if p == self.p:
            out.registers = self.registers.copy()
            return out
        d = self.p - p
        regs = self.registers.reshape(-1, 1 << d)
        t0 = regs[:, 0].astype(np.int64)
        folded = np.where(t0 > 0, t0 + d, 0)
        # rho' for sub-register t>0 is d - bitlength(t) + 1; frexp's
        # exponent IS bitlength for positive ints (exact, no float log)
        t = np.arange(1, 1 << d, dtype=np.float64)
        rho_t = (d - np.frexp(t)[1] + 1).astype(np.int64)
        contrib = np.where(regs[:, 1:] > 0, rho_t[None, :], 0).max(
            axis=1, initial=0)
        out.registers = np.maximum(folded, contrib).astype(np.uint8)
        return out

    def rse(self) -> float:
        """Relative standard error of estimate(): 1.04/sqrt(m)
        (Flajolet et al. 2007) — the same bound suggest_hll_precision
        inverts and test_hll_accuracy validates empirically."""
        return 1.04 / np.sqrt(self.m)

    def estimate(self) -> float:
        m = float(self.m)
        regs = self.registers.astype(np.float64)
        raw = _alpha(self.m) * m * m / np.sum(np.exp2(-regs))
        zeros = int(np.count_nonzero(self.registers == 0))
        if raw <= 2.5 * m and zeros > 0:
            return m * np.log(m / zeros)  # linear counting, small range
        return float(raw)

    def _payload(self) -> tuple[bytes, bytes]:
        """Payload = 1 mode byte + registers. Mode 1 (sparse) stores only
        the non-zero registers as (<u4 index, u8 value) pairs — chosen
        whenever strictly smaller than dense. Per-key sketches in a grouped
        warehouse mostly track small sets (a conv_id has ~10^2 distinct
        turns, not 2^p), so sparse cuts the phase-2 shuffle and the
        persisted table from 2^p bytes/key (16 KiB at p=14) to ~5 bytes
        per distinct-ish value. The mode is a deterministic function of
        register content, so byte-equality across build paths (kernel vs
        JVM-reduced) is preserved."""
        params = struct.pack("<B", self.p)
        nz = np.flatnonzero(self.registers)
        if 5 * nz.size < self.m:
            payload = (b"\x01" + nz.astype("<u4").tobytes()
                       + self.registers[nz].tobytes())
        else:
            payload = b"\x00" + self.registers.tobytes()
        return params, payload

    @classmethod
    def _from_payload(cls, params: bytes, payload: bytes) -> "HyperLogLog":
        (p,) = struct.unpack("<B", params)
        s = cls(p)
        if not payload:  # params-only zero sketch (warehouse factory)
            return s
        mode, body = payload[0], memoryview(payload)[1:]
        if mode == 0:
            if len(body) != s.m:
                raise ValueError("dense HLL payload length != 2^p")
            s.registers = np.frombuffer(body, dtype=np.uint8).copy()
        elif mode == 1:
            nnz, rem = divmod(len(body), 5)
            if rem:
                raise ValueError("sparse HLL payload not a multiple of 5")
            idx = np.frombuffer(body, dtype="<u4", count=nnz).astype(np.int64)
            if nnz and (idx.max() >= s.m or idx.min() < 0):
                raise ValueError("sparse HLL index out of range")
            s.registers[idx] = np.frombuffer(body, dtype=np.uint8,
                                             offset=4 * nnz, count=nnz)
        else:
            raise ValueError(f"unknown HLL payload mode {mode}")
        return s

    @property
    def state_nbytes(self) -> int:
        return self.registers.nbytes

    def __repr__(self) -> str:
        return f"HyperLogLog(p={self.p})"
