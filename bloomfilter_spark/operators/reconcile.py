"""Snapshot reconciliation: list WHICH keys differ between two corpora
from O(d) sketch state — no join or shuffle of either corpus against the
other (Eppstein, Goodrich, Uyeda & Varghese, "What's the Difference?",
SIGCOMM 2011, over the IBLT of sketches/iblt.py).

Why this beats the join at 100 TB: the exact alternative
(`full_outer` anti-join on the key) shuffles BOTH corpora — at two
10^12-row snapshots that is the most expensive plan the engine could
run, to find what is typically a handful of drifted conv_ids. Here each
corpus is scanned ONCE through a codegen aggregation whose output is
O(num_cells) rows (jvm_build.iblt_build_jvm), the two digests subtract
cell-wise on the driver, and an O(d) peel lists the differing key
hashes; only then do the corpora get touched again — a broadcast
semi-join against the ≤d recovered hashes, which Catalyst turns into a
BroadcastHashJoin with the d-row side as build. Total cost: two scans +
one broadcast probe, state O(d).

The digests are ordinary sketch blobs: persist them per snapshot
(warehouse.save_sketch_table / iblt_grouped_build_jvm for per-key
tables) and reconcile any two snapshots LATER without rescanning either
— the SIGCOMM paper's "no prior context" property. Incomplete decodes
(difference larger than the sized capacity) are DETECTED, never silent:
the peel returns only verified keys, and this operator either raises
with resize guidance or returns the verified subset with
``complete=False``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..agg import _cols, hash_col
from ..config import DEFAULT_SEED
from ..sketches.iblt import IBLT


@dataclass
class ReconcileResult:
    """Outcome of reconcile(): the differing ROWS of each side plus the
    decoded key-hash sets and digest diagnostics."""
    only_in_left: DataFrame        #: rows of left whose key right lacks
    only_in_right: DataFrame       #: rows of right whose key left lacks
    left_only_hashes: np.ndarray   #: uint64 key hashes unique to left
    right_only_hashes: np.ndarray  #: uint64 key hashes unique to right
    complete: bool                 #: True = the listing is EXACT
    net: float                     #: |left∖right| − |right∖left| (exact)


def _hash_frame(spark, hashes: np.ndarray) -> DataFrame:
    """≤d recovered uint64 hashes as a one-column DataFrame of the int64
    bit patterns hash_col produces (broadcast build side)."""
    signed = hashes.astype(np.int64).tolist()
    return spark.createDataFrame([(int(s),) for s in signed], "__rh long")


def _rows_for(df: DataFrame, cs, seed: int, hashes: np.ndarray) -> DataFrame:
    """All rows of ``df`` whose key hash is among ``hashes`` — broadcast
    semi-join; the corpus side never shuffles."""
    if hashes.size == 0:
        return df.limit(0)
    probe = _hash_frame(df.sparkSession, hashes)
    return df.join(F.broadcast(probe),
                   hash_col(cs, seed) == F.col("__rh"), "left_semi")


def reconcile(left: DataFrame, right: DataFrame, cols,
              max_diff: int, num_hashes: int = 4,
              seed: int = DEFAULT_SEED,
              on_incomplete: str = "raise",
              assume_distinct: bool = False) -> ReconcileResult:
    """Diff two corpora on the DISTINCT keys of ``cols``; see module doc.

    ``max_diff`` sizes the digests (IBLT.for_diff — the expected upper
    bound on |symmetric difference|; state is ~31·c_k·max_diff bytes, so
    over-provisioning is cheap). ``on_incomplete``: 'raise' (default)
    raises ValueError when the true difference exceeded the sized
    capacity; 'partial' returns the verified subset with
    ``complete=False`` (listed keys are still guaranteed correct — the
    peel never emits unverified keys). ``assume_distinct=True`` skips
    both digests' dedup shuffles when ``cols`` is the snapshots' primary
    key — the remaining exchanges are O(cells · tasks) whatever the
    corpus size (jvm_build._iblt_updates has the exact contract)."""
    from ..jvm_build import iblt_build_jvm  # lazy: operators <-> jvm_build
    if on_incomplete not in ("raise", "partial"):
        raise ValueError("on_incomplete must be 'raise' or 'partial'")
    cs = _cols(cols)
    dl = iblt_build_jvm(left, cols, max_diff=max_diff,
                        num_hashes=num_hashes, seed=seed,
                        assume_distinct=assume_distinct)
    dr = iblt_build_jvm(right, cols, max_diff=max_diff,
                        num_hashes=num_hashes, seed=seed,
                        assume_distinct=assume_distinct)
    return reconcile_digests(dl, dr, left=left, right=right, cols=cols,
                             seed=seed, on_incomplete=on_incomplete)


def reconcile_digests(left_digest: IBLT, right_digest: IBLT, *,
                      left: DataFrame, right: DataFrame, cols,
                      seed: int = DEFAULT_SEED,
                      on_incomplete: str = "raise") -> ReconcileResult:
    """Reconcile from PRE-BUILT digests (e.g. warehoused per-snapshot
    blobs) — the corpora are only touched by the final broadcast
    semi-joins that materialize the differing rows. Digests must share
    geometry and seed (geometry is checked; the seed is the caller's
    contract, same as every other sketch family)."""
    cs = _cols(cols)
    diff = left_digest.subtract(right_digest)
    pos, neg, complete = diff.decode()
    if not complete and on_incomplete == "raise":
        raise ValueError(
            f"IBLT decode incomplete: the true difference exceeds the "
            f"sized capacity (~{diff.decode_capacity():.0f} keys at "
            f"{diff.num_cells} cells). Rebuild with a larger max_diff, "
            f"or pass on_incomplete='partial' for the verified subset "
            f"({pos.size + neg.size} keys recovered).")
    return ReconcileResult(
        only_in_left=_rows_for(left, cs, seed, pos),
        only_in_right=_rows_for(right, cs, seed, neg),
        left_only_hashes=pos,
        right_only_hashes=neg,
        complete=complete,
        net=diff.estimate(),
    )
