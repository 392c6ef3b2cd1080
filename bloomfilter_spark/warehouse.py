"""Sketch-warehouse persistence: durable (keys..., sketch binary) tables.

The mergeable form produced by `agg.grouped_sketch_table` is only useful
across jobs if (a) it survives on disk and (b) nobody merges sketches
built with a different hash seed or different parameters — both silent
estimate-corrupting mistakes. This module makes the lifecycle first-class:

    save_sketch_table(tbl, path, keys=["day"], factory=lambda: ThetaSketch(4096))
    tbl, meta = load_sketch_table(spark, path)        # meta round-trips
    merged, meta = union_sketch_tables(spark, [p1, p2])

Metadata (sketch type/params, hash seed, key columns) rides WITH the data
as a one-row parquet under `<path>/_sketch_meta` — readable on any Hadoop
filesystem the table itself lives on, no driver-local files. `load` and
`union` refuse mismatched seeds/params instead of silently merging
incompatible states.

At scale this is the pattern the north rule's checkpoint/resume story
generalizes to: per-day (or per-corpus) sketch tables are built once by
incremental jobs, then any rollup — weekly distinct counts, day-pair
intersections (q46), corpus unions — is answered from the tables alone,
never rescanning raw data.
"""

from __future__ import annotations

import json
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from .agg import merge_grouped_sketches
from .config import DEFAULT_SEED
from .sketches import SKETCH_TYPES, Sketch

_META_SUBDIR = "_sketch_meta"
_DATA_SUBDIR = "data"
_COMMIT_MARKER = "_COMMITTED"
_VERSION_FMT = "v_{:08d}"


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path class) for `path` via the JVM Hadoop FS API —
    the same abstraction Spark's own writers use, so existence checks,
    marker creation, and pruning work on ANY Spark-supported filesystem
    (file://, hdfs://, s3a://, ...), not just the driver's local disk."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jvm.org.apache.hadoop.fs.Path


def _versions(spark: SparkSession, path: str,
              committed_only: bool) -> list[int]:
    """Sorted version numbers of `v_NNNNNNNN` subdirs under a publish
    root; with committed_only, just those whose commit marker exists."""
    fs, Path = _hadoop_fs(spark, path)
    root = Path(path)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("v_")):
            continue
        try:
            n = int(name[2:])
        except ValueError:
            continue
        if committed_only and not fs.exists(
                Path(f"{path}/{name}/{_COMMIT_MARKER}")):
            continue
        out.append(n)
    return sorted(out)


def _sketch_params(proto: Sketch) -> dict:
    """Serialization params identify compatibility: same header params =>
    mergeable."""
    params, _ = proto._payload()
    return {"type_tag": proto.TYPE_TAG,
            "params_hex": params.hex(),
            "class": type(proto).__name__}


def save_sketch_table(table: DataFrame, path: str, *, keys: Sequence[str],
                      factory: Callable[[], Sketch],
                      seed: int = DEFAULT_SEED,
                      mode: str = "overwrite") -> None:
    """Persist a (keys..., sketch) table plus its compatibility metadata."""
    spark = table.sparkSession
    meta = {"keys": list(keys), "seed": int(seed),
            "sketch": _sketch_params(factory()), "format_version": 1}
    table.write.mode(mode).parquet(f"{path}/{_DATA_SUBDIR}")
    spark.createDataFrame([(json.dumps(meta),)], "meta string") \
         .coalesce(1).write.mode("overwrite").parquet(f"{path}/{_META_SUBDIR}")


def publish_sketch_table(table: DataFrame, path: str, *,
                         keys: Sequence[str],
                         factory: Callable[[], Sketch],
                         seed: int = DEFAULT_SEED, keep: int = 2) -> str:
    """Crash-safe republication of a sketch table that readers may hold
    open: the versioned alternative to ``save_sketch_table(mode=
    "overwrite")``, whose in-place rewrite tears the PREVIOUS copy the
    moment it starts — a job that dies mid-write (or a reader racing it)
    leaves/sees a half-table.

    Commit protocol (the metadata-pointer idea Iceberg builds a catalog
    around, reduced to one filesystem invariant): each publish writes a
    complete table into a fresh ``v_NNNNNNNN`` subdir, then creates a
    zero-byte ``_COMMITTED`` marker in it LAST. Readers (`
    resolve_sketch_table`, which `load_sketch_table`/`verify_sketch_table`
    call) only ever see the newest MARKED version, so a crash at any
    instant leaves them on the previous complete snapshot; the replayed
    epoch simply republishes. Marker creation is a single small-file
    create — atomic visibility on HDFS/POSIX and a single PUT on object
    stores; no rename-overwrite semantics are relied on anywhere.

    ``keep``: committed versions retained after a successful publish
    (default 2: current + one rollback). Older committed versions are
    pruned marker-first (so a lagging resolver never picks a half-deleted
    dir), along with uncommitted crash leftovers below the new commit.
    Single writer per root assumed — same as any path-addressed table
    without a lock service; concurrent publishers need a real catalog.

    Publishing onto a legacy flat `save_sketch_table` root is a
    supported upgrade: committed versions take resolve precedence, so
    readers move to the first publish immediately; the stale flat files
    stay in place, ignored (one-time disk cost, never pruned).

    Returns the committed version's path.
    """
    spark = table.sparkSession
    return _publish_version(
        spark, path, keep,
        lambda vdir: save_sketch_table(table, vdir, keys=keys,
                                       factory=factory, seed=seed))


def _publish_version(spark: SparkSession, path: str, keep: int,
                     write_version: Callable[[str], None]) -> str:
    """Shared commit protocol for any warehouse-layout table: write a
    complete version dir, mark it committed LAST, prune old versions
    marker-first plus uncommitted crash leftovers."""
    if keep < 1:
        raise ValueError("keep must be >= 1")
    n = (_versions(spark, path, committed_only=False) or [0])[-1] + 1
    vdir = f"{path}/{_VERSION_FMT.format(n)}"
    write_version(vdir)
    fs, Path = _hadoop_fs(spark, path)
    fs.create(Path(f"{vdir}/{_COMMIT_MARKER}"), True).close()
    committed = _versions(spark, path, committed_only=True)
    for old in _versions(spark, path, committed_only=False):
        if old >= n or old in committed[-keep:]:
            continue
        odir = f"{path}/{_VERSION_FMT.format(old)}"
        if old in committed:
            fs.delete(Path(f"{odir}/{_COMMIT_MARKER}"), False)
        fs.delete(Path(odir), True)
    return vdir


def resolve_sketch_table(spark: SparkSession, path: str,
                         version: int | None = None) -> str:
    """Newest committed version under a publish root (sketch tables and
    ivf_centroids share the layout), or `path` itself for a flat
    `save_*` table (back-compat) — uncommitted (torn) versions are
    invisible by construction.

    ``version``: pin a specific committed version instead of the newest
    (time travel within the retention window — with the default
    ``keep=2`` that is the one-publish rollback). Raises ValueError if
    that version is not committed/retained, listing what is.

    Committed versions take precedence over a root-level flat table:
    upgrading a job from `save_sketch_table` to `publish_sketch_table`
    on the SAME path must direct readers at the new publishes, not pin
    them to the stale pre-upgrade copy forever (the legacy flat files
    stay in place, ignored — a one-time disk cost, never pruned)."""
    committed = _versions(spark, path, committed_only=True)
    if version is not None:
        if version in committed:
            return f"{path}/{_VERSION_FMT.format(version)}"
        fs, Path = _hadoop_fs(spark, path)
        if not committed and fs.exists(Path(f"{path}/{_META_SUBDIR}")):
            raise ValueError(
                f"table at {path} is a flat save_sketch_table table — "
                "it has no versions to pin")
        raise ValueError(
            f"version {version} of {path} is not committed/retained; "
            f"available: {committed}")
    if committed:
        return f"{path}/{_VERSION_FMT.format(committed[-1])}"
    return path


def sketch_table_exists(spark: SparkSession, path: str) -> bool:
    """True iff `path` resolves to a readable sketch table (flat or
    versioned) — the FS-agnostic form of `os.path.exists(.../_sketch_meta)`
    for jobs that bootstrap from a previous run's snapshot."""
    fs, Path = _hadoop_fs(spark, path)
    return bool(fs.exists(
        Path(f"{resolve_sketch_table(spark, path)}/{_META_SUBDIR}")))


def load_sketch_table(spark: SparkSession, path: str,
                      expected_factory: Callable[[], Sketch] | None = None,
                      expected_seed: int | None = None, *,
                      version: int | None = None
                      ) -> tuple[DataFrame, dict]:
    """Load a saved sketch table; returns (DataFrame, metadata). If the
    caller states expectations, mismatches raise instead of corrupting a
    later merge. Versioned roots (`publish_sketch_table`) resolve to
    their newest committed version, or to ``version`` if pinned (time
    travel / rollback read within the retention window)."""
    path = resolve_sketch_table(spark, path, version=version)
    meta = json.loads(
        spark.read.parquet(f"{path}/{_META_SUBDIR}").first()["meta"])
    if expected_factory is not None:
        want = _sketch_params(expected_factory())
        if want != meta["sketch"]:
            raise ValueError(
                f"sketch table at {path} holds {meta['sketch']}, caller "
                f"expected {want} — refusing to mix incompatible sketches")
    if expected_seed is not None and int(expected_seed) != meta["seed"]:
        raise ValueError(
            f"sketch table at {path} was hashed with seed {meta['seed']}, "
            f"caller expected {expected_seed} — estimates would be garbage")
    return spark.read.parquet(f"{path}/{_DATA_SUBDIR}"), meta


def sketch_factory_from_meta(meta: dict) -> Callable[[], Sketch]:
    """Reconstruct the zero-sketch factory from saved metadata (the params
    header is the constructor state: parse an empty sketch of that type)."""
    cls = SKETCH_TYPES[meta["sketch"]["type_tag"]]
    params = bytes.fromhex(meta["sketch"]["params_hex"])
    proto = cls._from_payload(params, b"")

    def factory() -> Sketch:
        return type(proto).from_bytes(proto.to_bytes())
    return factory


def union_sketch_tables(spark: SparkSession, paths: Sequence[str]
                        ) -> tuple[DataFrame, dict]:
    """Merge N saved sketch tables (e.g. daily builds) into one logical
    table: unionByName + per-key sketch merge. All tables must carry
    identical metadata (seed, sketch params, keys) — verified before any
    merge. Returns (merged DataFrame, shared metadata)."""
    if not paths:
        raise ValueError("need at least one sketch table path")
    frames, metas = [], []
    for p in paths:
        df, m = load_sketch_table(spark, p)
        frames.append(df)
        metas.append(m)
    for p, m in zip(paths[1:], metas[1:]):
        if m != metas[0]:
            raise ValueError(
                f"sketch table {p} metadata {m} differs from {paths[0]} "
                f"metadata {metas[0]} — incompatible tables")
    meta = metas[0]
    factory = sketch_factory_from_meta(meta)
    unioned = frames[0]
    for f in frames[1:]:
        unioned = unioned.unionByName(f)
    merged = merge_grouped_sketches(unioned, meta["keys"], factory)
    return merged, meta


def save_ivf_centroids(spark: SparkSession, centroids, path: str,
                       *, mode: str = "overwrite") -> None:
    """Persist a trained IVF coarse quantizer ((n_lists, d) float32,
    `operators/similarity.ivf_train`) so assignment/search jobs run
    WITHOUT retraining — the quantizer is index state exactly like a
    sketch table: train once, reuse across ingest jobs, and never let
    two jobs assign against silently-different centroids. Stored one row
    per centroid as raw little-endian float32 bytes (bit-exact
    round-trip: Voronoi assignment ties resolve identically across
    jobs), with shape metadata riding with the data like
    `save_sketch_table`'s."""
    import numpy as np
    cn = np.ascontiguousarray(np.asarray(centroids, dtype=np.float32))
    if cn.ndim != 2 or not cn.size:
        raise ValueError(f"centroids must be (n_lists, d), got {cn.shape}")
    meta = {"kind": "ivf_centroids", "n_lists": int(cn.shape[0]),
            "dim": int(cn.shape[1]), "dtype": "<f4", "format_version": 1}
    rows = [(i, cn[i].astype("<f4").tobytes()) for i in range(len(cn))]
    (spark.createDataFrame(rows, "list_id int, centroid binary")
          .coalesce(1).write.mode(mode).parquet(f"{path}/{_DATA_SUBDIR}"))
    (spark.createDataFrame([(json.dumps(meta),)], "meta string")
          .coalesce(1).write.mode("overwrite")
          .parquet(f"{path}/{_META_SUBDIR}"))


def publish_ivf_centroids(spark: SparkSession, centroids, path: str,
                          *, keep: int = 2) -> str:
    """Crash-safe republication of an IVF quantizer (same commit protocol
    as `publish_sketch_table`): a retrained quantizer must never tear the
    copy concurrent assignment jobs hold open — half-new centroids would
    silently mis-assign a corpus, which is worse than a crash. Returns
    the committed version's path; `load_ivf_centroids` resolves to the
    newest committed version (or a pinned one)."""
    return _publish_version(
        spark, path, keep,
        lambda vdir: save_ivf_centroids(spark, centroids, vdir))


def verify_sketch_table(spark: SparkSession, path: str, *,
                        errors_per_partition: int = 5,
                        strict: bool = False,
                        meta: dict | None = None) -> dict:
    """Distributed integrity sweep (fsck) of a persisted sketch table.

    Every blob is re-parsed on the executors — which, for v3+ blobs,
    re-checks the CRC32 each writer stamped (v4: header included) — and then merge-probed
    against a zero sketch built from the table's own `_sketch_meta`, so a
    structurally-valid blob of the WRONG geometry (an hll(p=12) row inside
    an hll(p=14) table: parseable, un-mergeable, estimate-corrupting) is
    caught here rather than mid-rollup. At 100 TB a warehouse table
    crosses storage migrations, partial job failures, and manual surgery;
    this is the audit you run before pointing a quarter's rollups at it.

    Scale shape: one executor pass over the table, one partial row per
    partition back to the driver (counts + a bounded error sample) — the
    same O(partials) driver-traffic contract as the sketch builds. Blob
    parsing is per-sketch-row Python, which is O(keys), never O(turns).

    Returns {"path" (resolved), "meta", "rows", "ok", "corrupt", "nulls",
    "state_bytes", "errors": [...]} — errors carries up to
    ``errors_per_partition`` samples from EVERY partition (O(partitions)
    total), so distinct damage classes in different partitions all
    surface. With strict=True, raises ValueError when any row is corrupt
    or NULL instead of returning the report. Versioned roots resolve to
    their newest committed version; ``meta`` short-circuits the resolve +
    metadata read for callers that already did both (then ``path`` must
    be the resolved table dir).
    """
    import pandas as pd

    if meta is None:
        path = resolve_sketch_table(spark, path)
        meta = json.loads(
            spark.read.parquet(f"{path}/{_META_SUBDIR}").first()["meta"])
    if "sketch" not in meta:
        raise ValueError(f"table at {path} has no sketch metadata "
                         f"(kind={meta.get('kind')!r}) — not a sketch table")
    cls = SKETCH_TYPES[meta["sketch"]["type_tag"]]
    zero_params = bytes.fromhex(meta["sketch"]["params_hex"])
    df = spark.read.parquet(f"{path}/{_DATA_SUBDIR}")
    if "sketch" not in df.columns:
        raise ValueError(f"table at {path} has no 'sketch' column")
    cap = int(errors_per_partition)

    def scan(batches):
        # one zero per task, not per row (a dense CMS/Bloom zero is up to
        # MBs of allocation); the probe merges the zero INTO the parsed
        # row's sketch — same geometry guard, and the discarded row copy
        # absorbs the mutation so the zero never accumulates state
        zero = cls._from_payload(zero_params, b"")
        ok = bad = nulls = 0
        nbytes = 0
        errs: list[str] = []
        for pdf in batches:
            for b in pdf["sketch"]:
                if b is None:
                    nulls += 1
                    continue
                raw = bytes(b)
                try:
                    sk = cls.from_bytes(raw)
                    # merge-probe: the same per-family geometry guard a
                    # real rollup would hit (p/k/width mismatch, ...)
                    sk.merge(zero)
                except Exception as e:  # noqa: BLE001 — classified below
                    bad += 1
                    if len(errs) < cap:
                        errs.append(f"{type(e).__name__}: {str(e)[:200]}")
                    continue
                ok += 1
                nbytes += len(raw)
        yield pd.DataFrame({"ok": [ok], "bad": [bad], "nulls": [nulls],
                            "nbytes": [nbytes],
                            "errs": [json.dumps(errs)]})

    parts = df.select("sketch").mapInPandas(
        scan, "ok long, bad long, nulls long, nbytes long, errs string"
    ).collect()  # O(partitions) rows
    errors: list[str] = []
    for r in parts:
        errors.extend(json.loads(r["errs"]))
    report = {"path": path, "meta": meta,
              "rows": sum(r["ok"] + r["bad"] + r["nulls"] for r in parts),
              "ok": sum(r["ok"] for r in parts),
              "corrupt": sum(r["bad"] for r in parts),
              "nulls": sum(r["nulls"] for r in parts),
              "state_bytes": sum(r["nbytes"] for r in parts),
              "errors": errors}
    if strict and (report["corrupt"] or report["nulls"]):
        raise ValueError(
            f"sketch table at {path} failed integrity sweep: "
            f"{report['corrupt']} corrupt / {report['nulls']} NULL of "
            f"{report['rows']} rows; first errors: {report['errors'][:5]}")
    return report


def load_ivf_centroids(spark: SparkSession, path: str, *,
                       version: int | None = None):
    """Load a persisted IVF quantizer back into the (n_lists, d) float32
    ndarray `ivf_assign`/`ivf_topk` take. Raises on wrong table kind or
    shape-corrupted rows rather than mis-assigning a corpus. Versioned
    roots (`publish_ivf_centroids`) resolve to the newest committed
    version, or to a pinned ``version``."""
    import numpy as np
    path = resolve_sketch_table(spark, path, version=version)
    meta = json.loads(
        spark.read.parquet(f"{path}/{_META_SUBDIR}").first()["meta"])
    if meta.get("kind") != "ivf_centroids":
        raise ValueError(f"table at {path} is {meta.get('kind')!r}, "
                         "not ivf_centroids")
    rows = spark.read.parquet(f"{path}/{_DATA_SUBDIR}").collect()
    n, d = meta["n_lists"], meta["dim"]
    if len(rows) != n:
        raise ValueError(f"expected {n} centroid rows, found {len(rows)}")
    out = np.empty((n, d), dtype=np.float32)
    for r in rows:
        vec = np.frombuffer(bytes(r["centroid"]), dtype=meta["dtype"])
        if vec.size != d:
            raise ValueError(f"centroid {r['list_id']} has dim {vec.size}, "
                             f"expected {d}")
        out[r["list_id"]] = vec
    return out
