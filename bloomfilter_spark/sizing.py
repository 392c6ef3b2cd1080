"""Capacity / FPR sizing calculator.

Exact semantic port of the reference's ``safeSuggestSizing`` /
``suggestSizing`` (/root/reference/Data/BloomFilter/Easy.hs:62-92): scan
k = 1..100, minimize (bits, k) lexicographically where
bits = -k * n / ln(1 - eps**(1/k)), round bits up to the next power of two.

Deviation (documented, SURVEY.md §4): the reference rejects filters above
2^32-1 bits (32-bit hashes, Data/BloomFilter/Mutable.hs:96-101); this engine
hashes with 64 bits, so the cap is lifted to 2^63. ``safe_suggest_sizing``
keeps a ``max_bits`` parameter defaulting to the lifted cap;
``suggest_sizing_reference`` reproduces the reference's exact behavior
including its cap, for parity tests.
"""

from __future__ import annotations

import math

from .util import next_power_of_two

REFERENCE_MAX_BITS = 0xFFFFFFFF
ENGINE_MAX_BITS = 1 << 63


class SizingError(ValueError):
    pass


def safe_suggest_sizing(capacity: int, err_rate: float,
                        max_bits: int = ENGINE_MAX_BITS) -> tuple[int, int]:
    """Return (num_bits, num_hashes). Raises SizingError on invalid input,
    mirroring the reference's Left cases (Easy.hs:73-77,86-88)."""
    if capacity <= 0:
        raise SizingError("invalid capacity")
    if err_rate <= 0 or err_rate >= 1:
        raise SizingError("invalid error rate")
    best_bits = math.inf
    best_k = 1.0
    cap = float(capacity)
    for k in range(1, 101):
        kf = float(k)
        denom = math.log(1.0 - err_rate ** (1.0 / kf))
        bits = (-kf) * cap / denom
        if (bits, kf) < (best_bits, best_k):
            best_bits, best_k = bits, kf
    rounded = next_power_of_two(math.ceil(best_bits))
    if rounded <= 0 or rounded > max_bits:
        raise SizingError("capacity too large to represent")
    # reference allocates at least 64 bits (Mutable.hs:96-99: max 64)
    return max(rounded, 64), int(best_k)


def suggest_sizing(capacity: int, err_rate: float) -> tuple[int, int]:
    """Raising variant (Easy.hs:86-92) with the engine's 64-bit cap."""
    return safe_suggest_sizing(capacity, err_rate)


def suggest_sizing_reference(capacity: int, err_rate: float) -> tuple[int, int]:
    """Bit-for-bit reference parity (32-bit cap, no 64-bit floor adjustment
    beyond the reference's own MB.new clamp)."""
    return safe_suggest_sizing(capacity, err_rate, max_bits=REFERENCE_MAX_BITS)


def analytic_fpr(m: int, k: int, n: int) -> float:
    """Expected false-positive rate (1 - e^{-kn/m})^k for n inserted keys."""
    if n == 0:
        return 0.0
    return (1.0 - math.exp(-k * n / m)) ** k


# ---------------------------------------------------------------------------
# Family-wide sizing: the reference's suggestSizing idea (target accuracy ->
# parameters), generalized to every mergeable family in the engine. Each
# helper inverts the SAME bound formula the corresponding kernel reports
# (sketches/*.py error_bound / rank_error_bound / estimate docs), so a
# sketch built at the suggested size is exactly the one whose observed error
# the kernel tests already validate. All return (params..., predicted_error,
# state_bytes); predicted error never exceeds the requested target.
#
# Published bounds inverted:
#   HLL   RSE ~ 1.04/sqrt(m), m = 2^p        (Flajolet et al. 2007)
#   CMS   overcount <= (e/width)*N w.p. 1-delta, depth = ln(1/delta)
#                                             (Cormode & Muthukrishnan 2005)
#   KLL   normalized rank error ~ 1.7/k      (Karnin, Lang & Liberty 2016;
#                                             kll.py rank_error_bound)
#   theta/KMV  RSE ~ 1/sqrt(k-2)             (Beyer et al., SIGMOD 2007)
#   MG    undercount <= n/(k+1)              (Misra & Gries 1982)
#   t-digest   rank error at q ~ pi*sqrt(q(1-q))/delta for the k1 scale
#              (Dunning & Ertl 2019; derived from tdigest.py's arcsine
#              cluster assignment: dk/dq = delta/(2*pi*sqrt(q(1-q))), one
#              cluster spans delta-k of 1, interpolation error ~ half span)
# ---------------------------------------------------------------------------


def _require_frac(name: str, x: float) -> None:
    if not (0.0 < x < 1.0):
        raise SizingError(f"invalid {name} (need 0 < {name} < 1, got {x!r})")


def suggest_hll_precision(rel_std_error: float) -> tuple[int, float, int]:
    """Smallest HLL precision p in [4, 18] with 1.04/sqrt(2^p) <= target.

    Returns (p, predicted_rse, dense_state_bytes). Raises SizingError if the
    target needs p > 18 (the kernel's cap — registers would exceed 256 KiB;
    use a theta sketch for tighter RSE at that point).
    """
    _require_frac("rel_std_error", rel_std_error)
    m_needed = (1.04 / rel_std_error) ** 2
    p = max(4, math.ceil(math.log2(m_needed)))
    if p > 18:
        raise SizingError(
            f"rel_std_error {rel_std_error} needs p={p} > 18; use "
            "suggest_theta_k for sub-0.3% RSE")
    return p, 1.04 / math.sqrt(1 << p), (1 << p)


def suggest_cms_dims(eps: float, delta: float) -> tuple[int, int, int]:
    """(width, depth, state_bytes) so any point query overcounts by at most
    eps*N with probability >= 1-delta. Identical formulas to the
    CountMinSketch constructor (width = ceil(e/eps), depth = ceil(ln 1/d)),
    exposed so callers can budget memory before building."""
    _require_frac("eps", eps)
    _require_frac("delta", delta)
    width = math.ceil(math.e / eps)
    depth = max(1, math.ceil(math.log(1.0 / delta)))
    return width, depth, width * depth * 8


def suggest_kll_k(rank_error: float) -> tuple[int, float, int]:
    """Smallest k with the kernel's reported bound 1.7/k <= target.

    Returns (k, predicted_error, approx_state_bytes). State: level
    capacities are k * (2/3)^i, so total retained items <= 3k float64s
    (kll.py cap machinery) — the byte figure is that worst case."""
    _require_frac("rank_error", rank_error)
    k = max(8, math.ceil(1.7 / rank_error))
    return k, 1.7 / k, 3 * k * 8


def suggest_theta_k(rel_std_error: float) -> tuple[int, float, int]:
    """Smallest power-of-two k (>= 16) with KMV RSE 1/sqrt(k-2) <= target.

    Power-of-two because theta unions re-trim to min(k) across operands;
    pow-2 sizes nest cleanly (same convention as the Bloom sizer's bit
    rounding). Returns (k, predicted_rse, max_state_bytes)."""
    _require_frac("rel_std_error", rel_std_error)
    k = next_power_of_two(max(16, math.ceil(1.0 / rel_std_error**2 + 2)))
    return k, 1.0 / math.sqrt(k - 2), k * 8


def suggest_mg_k(eps: float) -> tuple[int, int]:
    """Smallest counter budget k with undercount bound n/(k+1) <= eps*n,
    i.e. k = ceil(1/eps) - 1. Returns (k, state_bytes) — the bound is
    deterministic (no delta) and scale-free, so there is no predicted-error
    component beyond eps itself."""
    _require_frac("eps", eps)
    k = max(1, math.ceil(1.0 / eps) - 1)
    if (k + 1) * eps < 1.0:  # ceil boundary: guarantee n/(k+1) <= eps*n
        k += 1
    return k, 16 * k


def suggest_tdigest_delta(mid_rank_error: float) -> tuple[int, float, int]:
    """Smallest compression delta whose k1-scale interior rank error at the
    median, pi/(2*delta), meets the target. Error at other quantiles is
    SMALLER by sqrt(q(1-q))/0.5 (the arcsine scale spends resolution on the
    tails), so the median is the honest worst case to size against.

    Returns (delta, predicted_mid_error, max_state_bytes): the kernel's
    floor(k(q)) clustering keeps at most delta/2 + 1 centroids of 16 bytes.
    """
    _require_frac("mid_rank_error", mid_rank_error)
    delta = max(10, math.ceil(math.pi / (2.0 * mid_rank_error)))
    return delta, math.pi / (2.0 * delta), 16 * (delta // 2 + 1)


def tdigest_rank_error(delta: int, q: float) -> float:
    """Predicted k1-scale rank error at quantile q for compression delta."""
    if delta <= 0:
        raise SizingError("invalid delta")
    _require_frac("q", q)
    return math.pi * math.sqrt(q * (1.0 - q)) / delta


def suggest_scalable_bloom(total_err_rate: float, tightening: float = 0.5,
                           initial_capacity: int = 1024
                           ) -> tuple[float, float, int]:
    """Level-0 error rate so a ScalableBloomFilter's COMPOUND bound stays
    under the target at ANY growth history: the Almeida union bound over
    levels is err0·(1−t^L)/(1−t), which converges from below to
    err0/(1−t) — so err0 = total·(1−t). This is the footgun the helper
    exists for: passing the TOTAL target as the constructor's ``err_rate``
    silently doubles the converged bound at the default tightening 0.5
    (Almeida et al. 2007, eq. 2.1–2.2).

    Returns (err_rate, predicted_total_error, level0_state_bytes); the
    predicted total is the L→∞ limit, an upper bound on every finite
    history. Level-0 bytes use the same exact sizing scan the plain Bloom
    path uses; each later level roughly doubles capacity at a tightened
    rate, so total state stays O(level-L size)."""
    _require_frac("total_err_rate", total_err_rate)
    if not 0.0 < tightening < 1.0:
        raise SizingError("tightening ratio must be in (0, 1)")
    if initial_capacity < 1:
        raise SizingError("invalid capacity")
    err0 = total_err_rate * (1.0 - tightening)
    bits, _k = safe_suggest_sizing(initial_capacity, err0)
    return err0, total_err_rate, bits // 8


def suggest_ddsketch(rel_value_error: float,
                     dynamic_range: float = 1e9,
                     signed: bool = False) -> tuple[float, int, int]:
    """DDSketch geometry for a target relative VALUE error: alpha is the
    target itself (the bound is exact by construction — Masson et al.
    VLDB 2019), so the sizing question is the BUCKET budget: values
    spanning ``dynamic_range`` = max/min magnitude occupy at most
    ceil(ln(range)/ln(gamma)) + 1 buckets per sign, gamma =
    (1+alpha)/(1-alpha). The returned bucket_limit covers that span with
    a 25% headroom so the collapsing guard never fires inside the
    declared range (collapse only degrades quantiles below the collapsed
    mass, but an honest sizing keeps it out of the picture entirely).

    Returns (alpha, bucket_limit, state_bytes); state is 12 bytes per
    occupied bucket (int32 index + uint64 count) + the fixed header, an
    UPPER bound — sparse data occupies fewer. ``bucket_limit`` caps EACH
    sign's store, so data carrying both signs (deltas, signed scores —
    not the plain-latency case) holds up to two full stores: pass
    ``signed=True`` to budget state_bytes for both (the limit itself is
    per-store and unchanged). The error dual
    (DDSketch.value_error_bound) reports the same alpha back."""
    _require_frac("rel_value_error", rel_value_error)
    if rel_value_error < 1e-6:
        raise SizingError("rel_value_error below 1e-6 overflows the "
                          "int32 bucket-index space (ddsketch.py)")
    if dynamic_range <= 1.0:
        raise SizingError("dynamic_range must be > 1")
    gamma = (1.0 + rel_value_error) / (1.0 - rel_value_error)
    span = math.ceil(math.log(dynamic_range) / math.log(gamma)) + 1
    limit = max(16, math.ceil(span * 1.25))
    stores = 2 if signed else 1
    return rel_value_error, limit, stores * 12 * limit + 58


def suggest_fd(fnorm2_fraction: float, d: int) -> tuple[int, float, int]:
    """Frequent Directions buffer rows for a target covariance error
    expressed as a fraction of the stream's total Frobenius mass:
    Liberty's bound is ||A^T A - B^T B||_2 <= ||A||_F^2 / ell, so
    ell = ceil(1/fraction) guarantees the requested fraction
    deterministically (no delta). Returns (ell, predicted_fraction,
    state_bytes = ell * d * 8 for the serialized buffer + header) —
    the d x d exact-Gram alternative costs d*d*8 per partial, so the
    sketch wins whenever ell < d."""
    _require_frac("fnorm2_fraction", fnorm2_fraction)
    if d < 1:
        raise SizingError("d must be >= 1")
    ell = max(2, math.ceil(1.0 / fnorm2_fraction))
    return ell, 1.0 / ell, ell * d * 8 + 40


def suggest_iblt(max_diff: int, num_hashes: int = 4) -> tuple[int, float, int]:
    """IBLT cells for decoding a symmetric difference of up to
    ``max_diff`` keys w.h.p.: the Goodrich–Mitzenmacher c_k space rate
    with the kernel's finite-size hedge (sketches/iblt.py:for_diff —
    this helper and the constructor share the rounding, so the returned
    numbers describe exactly the table for_diff builds).

    Returns (num_cells, decode_capacity, state_bytes). decode_capacity
    is the capacity the BUILT table reports (≥ max_diff after rounding);
    state is 24 bytes/cell (count + key XOR + check XOR). Unlike every
    other family the accuracy axis is not an error magnitude — decode is
    exact-or-detected — so the "predicted error" dual is the capacity
    margin, not a bound."""
    from .sketches.iblt import IBLT
    if max_diff < 1:
        raise SizingError("max_diff must be >= 1")
    proto = IBLT.for_diff(max_diff, num_hashes)   # validates num_hashes
    return proto.num_cells, proto.decode_capacity(), proto.state_nbytes


def suggest_sketch(kind: str, **targets) -> dict:
    """One-call dispatcher: target accuracy -> constructor kwargs + budget.

    Returns {"kind", "params" (constructor kwargs for the matching
    sketches.* class), "predicted_error", "state_bytes"}. Kinds and their
    targets:

      bloom  capacity=, err_rate=          -> num_bits/num_hashes
      counting_bloom capacity=, err_rate=  -> num_cells/num_hashes
                                              (same math, 4 bytes/cell —
                                              the price of delete)
      hll    rel_std_error=                -> p
      cms    eps=, delta=                  -> width/depth
      kll    rank_error=                   -> k
      theta  rel_std_error=                -> k
      sample rel_std_error= [, avg_payload_bytes=] -> k (bottom-k sample;
                                              KMV estimator shares theta's
                                              inversion)
      weighted_sample rel_std_error= [, avg_payload_bytes=] -> k
                                              (ppswor bottom-k: the
                                              Cohen–Kaplan CV bound
                                              1/sqrt(k-2) is theta's, so
                                              the inversion is shared;
                                              +8 bytes/entry for the
                                              weight)
      mg     eps=                          -> k
      tdigest mid_rank_error=              -> delta
      fd     fnorm2_fraction=, d=          -> ell (Frequent Directions:
                                              deterministic spectral
                                              covariance error as a
                                              fraction of ||A||_F^2)
      ddsketch rel_value_error= [, dynamic_range=] -> alpha/bucket_limit
                                              (relative VALUE error —
                                              alpha IS the target; sizing
                                              picks the bucket budget for
                                              the declared dynamic range)
      scalable_bloom total_err_rate= [, tightening=, initial_capacity=]
                                           -> err_rate/tightening/
                                              initial_capacity
      iblt   max_diff= [, num_hashes=]     -> num_cells/num_hashes
                                              (set reconciliation: decode
                                              is exact-or-detected, so the
                                              result carries
                                              decode_capacity instead of
                                              an error bound)
    """
    kind = kind.lower()
    if kind == "bloom":
        bits, k = safe_suggest_sizing(targets["capacity"], targets["err_rate"])
        return {"kind": kind, "params": {"num_bits": bits, "num_hashes": k},
                "predicted_error": analytic_fpr(bits, k, targets["capacity"]),
                "state_bytes": bits // 8}
    if kind == "counting_bloom":
        # same (m, k) inversion as bloom — membership math is identical;
        # only the byte budget changes (uint32 cell per bit position)
        bits, k = safe_suggest_sizing(targets["capacity"], targets["err_rate"])
        return {"kind": kind, "params": {"num_cells": bits, "num_hashes": k},
                "predicted_error": analytic_fpr(bits, k, targets["capacity"]),
                "state_bytes": bits * 4}
    if kind == "hll":
        p, err, nbytes = suggest_hll_precision(targets["rel_std_error"])
        return {"kind": kind, "params": {"p": p},
                "predicted_error": err, "state_bytes": nbytes}
    if kind == "cms":
        w, d, nbytes = suggest_cms_dims(targets["eps"], targets["delta"])
        return {"kind": kind, "params": {"width": w, "depth": d},
                "predicted_error": targets["eps"], "state_bytes": nbytes}
    if kind == "kll":
        k, err, nbytes = suggest_kll_k(targets["rank_error"])
        return {"kind": kind, "params": {"k": k},
                "predicted_error": err, "state_bytes": nbytes}
    if kind == "theta":
        k, err, nbytes = suggest_theta_k(targets["rel_std_error"])
        return {"kind": kind, "params": {"k": k},
                "predicted_error": err, "state_bytes": nbytes}
    if kind == "sample":
        # bottom-k sample: the estimator IS theta's KMV (same retained-set
        # geometry), so the k-for-RSE inversion is shared; per-entry state
        # adds the payload bytes (8 + 4 length word + avg payload)
        k, err, _ = suggest_theta_k(targets["rel_std_error"])
        avg_payload = int(targets.get("avg_payload_bytes", 0))
        return {"kind": kind, "params": {"k": k},
                "predicted_error": err,
                "state_bytes": k * (12 + avg_payload)}
    if kind == "weighted_sample":
        # ppswor bottom-k (wsample.py): CV <= 1/sqrt(k-2) — the same
        # bound as theta/sample, so the k inversion is shared; per-entry
        # state adds an 8-byte weight to sample's layout
        k, err, _ = suggest_theta_k(targets["rel_std_error"])
        avg_payload = int(targets.get("avg_payload_bytes", 0))
        return {"kind": kind, "params": {"k": k},
                "predicted_error": err,
                "state_bytes": k * (20 + avg_payload)}
    if kind == "mg":
        k, nbytes = suggest_mg_k(targets["eps"])
        return {"kind": kind, "params": {"k": k},
                "predicted_error": targets["eps"], "state_bytes": nbytes}
    if kind == "tdigest":
        delta, err, nbytes = suggest_tdigest_delta(targets["mid_rank_error"])
        return {"kind": kind, "params": {"delta": delta},
                "predicted_error": err, "state_bytes": nbytes}
    if kind == "ddsketch":
        rng = targets.get("dynamic_range", 1e9)
        alpha, limit, nbytes = suggest_ddsketch(
            targets["rel_value_error"], rng,
            signed=bool(targets.get("signed", False)))
        return {"kind": kind,
                "params": {"alpha": alpha, "bucket_limit": limit},
                "predicted_error": alpha, "state_bytes": nbytes}
    if kind == "fd":
        ell, frac, nbytes = suggest_fd(targets["fnorm2_fraction"],
                                       targets["d"])
        return {"kind": kind, "params": {"ell": ell, "d": targets["d"]},
                "predicted_error": frac, "state_bytes": nbytes}
    if kind == "iblt":
        kh = targets.get("num_hashes", 4)
        cells, cap_keys, nbytes = suggest_iblt(targets["max_diff"], kh)
        return {"kind": kind,
                "params": {"num_cells": cells, "num_hashes": kh},
                # decode is exact-or-detected; the dual of "error" is the
                # decode capacity the sized table actually carries
                "predicted_error": 0.0, "decode_capacity": cap_keys,
                "state_bytes": nbytes}
    if kind == "scalable_bloom":
        t = targets.get("tightening", 0.5)
        cap = targets.get("initial_capacity", 1024)
        err0, total, nbytes = suggest_scalable_bloom(
            targets["total_err_rate"], t, cap)
        return {"kind": kind,
                "params": {"err_rate": err0, "tightening": t,
                           "initial_capacity": cap},
                "predicted_error": total, "state_bytes": nbytes}
    raise SizingError(f"unknown sketch kind {kind!r}")
