"""Sketch-warehouse persistence (warehouse.py): save/load round-trips,
metadata compatibility guards, incremental-union equals one-shot build."""

import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.agg import grouped_sketch_table
from bloomfilter_spark.sketches import HyperLogLog, ThetaSketch
from bloomfilter_spark.warehouse import (load_sketch_table, save_sketch_table,
                                         sketch_factory_from_meta,
                                         union_sketch_tables)


def test_save_load_roundtrip_byte_exact(spark, events, tmp_path):
    ev = events.where(F.col("user_id").isNotNull())
    tbl = grouped_sketch_table(ev, ["event_type"], ["user_id"],
                               lambda: ThetaSketch(256), salt=2)
    path = str(tmp_path / "wt")
    save_sketch_table(tbl, path, keys=["event_type"],
                      factory=lambda: ThetaSketch(256))
    back, meta = load_sketch_table(spark, path,
                                   expected_factory=lambda: ThetaSketch(256))
    orig = {r["event_type"]: bytes(r["sketch"]) for r in tbl.collect()}
    got = {r["event_type"]: bytes(r["sketch"]) for r in back.collect()}
    assert got == orig
    assert meta["keys"] == ["event_type"]
    # factory reconstructed from metadata builds the same zero sketch
    f = sketch_factory_from_meta(meta)
    assert f().to_bytes() == ThetaSketch(256).to_bytes()


def test_load_rejects_wrong_params_and_seed(spark, events, tmp_path):
    ev = events.where(F.col("user_id").isNotNull())
    tbl = grouped_sketch_table(ev, ["event_type"], ["user_id"],
                               lambda: HyperLogLog(10), salt=2)
    path = str(tmp_path / "wt2")
    save_sketch_table(tbl, path, keys=["event_type"],
                      factory=lambda: HyperLogLog(10))
    with pytest.raises(ValueError, match="incompatible"):
        load_sketch_table(spark, path,
                          expected_factory=lambda: HyperLogLog(12))
    with pytest.raises(ValueError, match="seed"):
        load_sketch_table(spark, path, expected_seed=123)


def test_incremental_union_equals_one_shot(spark, events, tmp_path):
    """Per-half builds saved separately, then union-merged, must equal the
    one-shot build byte-for-byte (canonical theta state)."""
    ev = events.where(F.col("user_id").isNotNull())
    paths = []
    for i in range(2):
        part = ev.where(F.col("event_id") % 2 == i)
        tbl = grouped_sketch_table(part, ["event_type"], ["user_id"],
                                   lambda: ThetaSketch(128), salt=2)
        p = str(tmp_path / f"day{i}")
        save_sketch_table(tbl, p, keys=["event_type"],
                          factory=lambda: ThetaSketch(128))
        paths.append(p)
    merged, meta = union_sketch_tables(spark, paths)
    oneshot = grouped_sketch_table(ev, ["event_type"], ["user_id"],
                                   lambda: ThetaSketch(128), salt=2)
    m = {r["event_type"]: bytes(r["sketch"]) for r in merged.collect()}
    o = {r["event_type"]: bytes(r["sketch"]) for r in oneshot.collect()}
    assert m == o


def test_union_rejects_mismatched_tables(spark, events, tmp_path):
    ev = events.where(F.col("user_id").isNotNull())
    specs = [lambda: ThetaSketch(128), lambda: ThetaSketch(256)]
    paths = []
    for i, f in enumerate(specs):
        tbl = grouped_sketch_table(ev, ["event_type"], ["user_id"], f, salt=2)
        p = str(tmp_path / f"m{i}")
        save_sketch_table(tbl, p, keys=["event_type"], factory=f)
        paths.append(p)
    with pytest.raises(ValueError, match="differs"):
        union_sketch_tables(spark, paths)


def test_mg_table_roundtrip_and_merge(spark, events, tmp_path):
    """Misra-Gries tables persist byte-exact through the warehouse and
    union_sketch_tables' merge keeps the deterministic bounds valid per
    key (MG merge = mergeable-summaries rule; order-dependent state, so
    the contract is bounds validity, not byte equality of the merge)."""
    from bloomfilter_spark.sketches import MisraGries
    from bloomfilter_spark.warehouse import union_sketch_tables

    ev = events.where(F.col("user_id").isNotNull())
    tbl = grouped_sketch_table(ev, ["event_type"], ["user_id"],
                               lambda: MisraGries(k=16))
    path = str(tmp_path / "mg_wt")
    save_sketch_table(tbl, path, keys=["event_type"],
                      factory=lambda: MisraGries(k=16))
    back, meta = load_sketch_table(spark, path,
                                   expected_factory=lambda: MisraGries(k=16))
    orig = {r["event_type"]: bytes(r["sketch"]) for r in tbl.collect()}
    got = {r["event_type"]: bytes(r["sketch"]) for r in back.collect()}
    assert got == orig
    assert sketch_factory_from_meta(meta)().to_bytes() == \
        MisraGries(k=16).to_bytes()

    # split the stream, build two tables, warehouse-merge them: the
    # merged summary's sandwich must hold vs exact full-stream counts
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    pa, pb = str(tmp_path / "mg_a"), str(tmp_path / "mg_b")
    save_sketch_table(
        grouped_sketch_table(a, ["event_type"], ["user_id"],
                             lambda: MisraGries(k=16)),
        pa, keys=["event_type"], factory=lambda: MisraGries(k=16))
    save_sketch_table(
        grouped_sketch_table(b, ["event_type"], ["user_id"],
                             lambda: MisraGries(k=16)),
        pb, keys=["event_type"], factory=lambda: MisraGries(k=16))
    merged, _meta = union_sketch_tables(spark, [pa, pb])
    exact = {(r["event_type"], r["user_id"]): r["cnt"] for r in
             ev.groupBy("event_type", "user_id")
               .agg(F.count("*").alias("cnt")).collect()}
    from bloomfilter_spark.agg import hash_col
    import numpy as np
    hashes = {r["user_id"]: r["h"] for r in
              ev.select("user_id",
                        hash_col([F.col("user_id")]).alias("h"))
                .distinct().collect()}
    for row in merged.collect():
        sk = MisraGries.from_bytes(bytes(row["sketch"]))
        for (etype, uid), cnt in exact.items():
            if etype != row["event_type"]:
                continue
            lo = int(sk.query(np.array([hashes[uid]],
                                       dtype=np.int64).view(np.uint64))[0])
            assert lo <= cnt <= lo + sk.dec


def test_streamed_blobs_warehouse_roundtrip(spark, events, tmp_path):
    """Streaming-built per-key blobs persist through the warehouse like any
    batch-built sketch table (the snapshot-for-downstream-jobs path): save
    with compatibility metadata, load under expected_factory/seed guards,
    and merging the loaded per-key blobs with the metadata-reconstructed
    factory equals the batch whole-table build byte for byte."""
    from bloomfilter_spark.jvm_build import cms_build_jvm
    from bloomfilter_spark.sketches.cms import CountMinSketch
    from bloomfilter_spark.streaming import stateful_grouped_cms

    src = str(tmp_path / "src")
    nn = events.where(F.col("user_id").isNotNull())
    nn.repartition(2).write.parquet(src)
    stream = (spark.readStream.schema(nn.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = stateful_grouped_cms(stream, "event_type", "user_id",
                               eps=1e-3, delta=1e-3)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("cms_wh_stream").trigger(availableNow=True).start())
    q.awaitTermination(120)
    final = spark.sql("""
        SELECT event_type, sketch FROM (
          SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY n_updates DESC) AS rk
          FROM cms_wh_stream) WHERE rk = 1""")

    path = str(tmp_path / "wt_stream")

    def factory():
        return CountMinSketch(eps=1e-3, delta=1e-3)

    save_sketch_table(final, path, keys=["event_type"], factory=factory)
    back, meta = load_sketch_table(spark, path, expected_factory=factory)
    with pytest.raises(ValueError, match="refusing"):
        load_sketch_table(
            spark, path,
            expected_factory=lambda: CountMinSketch(eps=1e-4, delta=1e-3))

    # per-key blobs merged with the metadata-reconstructed factory ==
    # one batch build over the whole table (keys partition the rows)
    merged = sketch_factory_from_meta(meta)()
    for r in back.collect():
        merged.merge(CountMinSketch.from_bytes(bytes(r["sketch"])))
    whole = cms_build_jvm(nn, ["user_id"], eps=1e-3, delta=1e-3)
    assert merged.to_bytes() == whole.to_bytes()


def test_ivf_centroids_roundtrip(spark, tmp_path):
    """The trained IVF quantizer persists bit-exact (float32 bytes), and
    assignment from the LOADED centroids equals assignment from the
    trained ones — the retrain-free later-job path."""
    import numpy as np
    from bloomfilter_spark.operators.similarity import ivf_assign, ivf_train
    from bloomfilter_spark.warehouse import (load_ivf_centroids,
                                             save_ivf_centroids)

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(400, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    cents = ivf_train(df, "embedding", n_lists=8, max_train=400)
    path = str(tmp_path / "ivf")
    save_ivf_centroids(spark, cents, path)
    loaded = load_ivf_centroids(spark, path)
    assert loaded.dtype == np.float32 and loaded.shape == cents.shape
    assert np.array_equal(loaded, np.asarray(cents, dtype=np.float32))

    a1 = {r["vec_id"]: r["list_id"]
          for r in ivf_assign(df, "vec_id", "embedding", cents).collect()}
    a2 = {r["vec_id"]: r["list_id"]
          for r in ivf_assign(df, "vec_id", "embedding", loaded).collect()}
    assert a1 == a2 and len(a1) == 400

    import pytest
    with pytest.raises(ValueError, match="ivf_centroids"):
        # a sketch table is not a quantizer
        from bloomfilter_spark.sketches import HyperLogLog
        from bloomfilter_spark.agg import grouped_sketch_table
        from bloomfilter_spark.warehouse import (load_sketch_table,
                                                 save_sketch_table)
        ev = spark.createDataFrame([("a", 1)], "k string, v long")
        t = grouped_sketch_table(ev, ["k"], ["v"],
                                 lambda: HyperLogLog(p=10))
        sk_path = str(tmp_path / "sk")
        save_sketch_table(t, sk_path, keys=["k"],
                          factory=lambda: HyperLogLog(p=10))
        load_ivf_centroids(spark, sk_path)


def test_verify_sketch_table_healthy_and_doctored(spark, events, tmp_path):
    """Warehouse fsck: a healthy table sweeps clean; a doctored copy with a
    bit-flipped blob (CRC failure), a NULL, and a wrong-geometry blob
    (parses fine, un-mergeable) reports each class of damage, and
    strict=True refuses the table outright."""
    import numpy as np
    from bloomfilter_spark.warehouse import verify_sketch_table

    ev = events.where(F.col("user_id").isNotNull())
    tbl = grouped_sketch_table(ev, ["event_type"], ["user_id"],
                               lambda: HyperLogLog(10), salt=2)
    healthy = str(tmp_path / "healthy")
    save_sketch_table(tbl, healthy, keys=["event_type"],
                      factory=lambda: HyperLogLog(10))
    rep = verify_sketch_table(spark, healthy)
    assert rep["corrupt"] == 0 and rep["nulls"] == 0
    assert rep["ok"] == rep["rows"] > 0
    assert rep["state_bytes"] > 0
    assert rep["meta"]["sketch"]["class"] == "HyperLogLog"

    flipped = bytearray(bytes(tbl.first()["sketch"]))
    flipped[-1] ^= 0xFF  # payload damage a length check cannot see
    wrong = HyperLogLog(12)  # parseable, but un-mergeable into a p=10 table
    wrong.update(np.arange(100, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    doctored_rows = spark.createDataFrame(
        [("k_crc", bytes(flipped)), ("k_null", None),
         ("k_geom", wrong.to_bytes())],
        "event_type string, sketch binary")
    doctored = str(tmp_path / "doctored")
    save_sketch_table(tbl.unionByName(doctored_rows), doctored,
                      keys=["event_type"], factory=lambda: HyperLogLog(10))
    rep = verify_sketch_table(spark, doctored)
    assert rep["corrupt"] == 2 and rep["nulls"] == 1
    assert rep["ok"] == rep["rows"] - 3
    assert any("CRC32" in e for e in rep["errors"])
    assert any("precision mismatch" in e for e in rep["errors"])
    with pytest.raises(ValueError, match="integrity sweep"):
        verify_sketch_table(spark, doctored, strict=True)


def test_verify_sketch_table_rejects_non_sketch_table(spark, tmp_path):
    """fsck refuses an ivf_centroids table (same warehouse layout, no
    sketch metadata) instead of mis-reporting it; the CLI's _discover
    finds tables one level down from a warehouse root."""
    import numpy as np
    from bloomfilter_spark.operators.similarity import ivf_train
    from bloomfilter_spark.warehouse import (save_ivf_centroids,
                                             verify_sketch_table)

    rng = np.random.default_rng(3)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in
         enumerate(rng.normal(size=(64, 4)).astype(np.float32))],
        "vec_id long, embedding array<float>")
    cents = ivf_train(df, "embedding", n_lists=4, max_train=64)
    root = tmp_path / "wh"
    root.mkdir()
    save_ivf_centroids(spark, cents, str(root / "ivf"))
    with pytest.raises(ValueError, match="not a sketch table"):
        verify_sketch_table(spark, str(root / "ivf"))

    ev = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    t = grouped_sketch_table(ev, ["k"], ["v"], lambda: HyperLogLog(p=10))
    save_sketch_table(t, str(root / "sk"), keys=["k"],
                      factory=lambda: HyperLogLog(p=10))

    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "fsck_warehouse", os.path.join(os.path.dirname(__file__), "..",
                                       "tools", "fsck_warehouse.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    found = mod._discover([str(root)])
    assert sorted(os.path.basename(p) for p in found) == ["ivf", "sk"]
    # a table path passed directly resolves to itself
    assert mod._discover([str(root / "sk")]) == [str(root / "sk")]


def test_publish_sketch_table_versioned_crash_safe(spark, events, tmp_path):
    """Crash-safe republication: each publish lands in a fresh committed
    version; an uncommitted (torn) version is invisible to readers;
    pruning keeps `keep` committed versions and clears crash leftovers."""
    import os

    from bloomfilter_spark.warehouse import (publish_sketch_table,
                                             resolve_sketch_table,
                                             sketch_table_exists,
                                             verify_sketch_table)

    root = str(tmp_path / "pub")
    assert not sketch_table_exists(spark, root)
    ev = events.where(F.col("user_id").isNotNull())
    fac = lambda: HyperLogLog(10)  # noqa: E731

    t1 = grouped_sketch_table(ev.limit(500), ["event_type"], ["user_id"], fac)
    v1 = publish_sketch_table(t1, root, keys=["event_type"], factory=fac)
    assert v1.endswith("v_00000001") and sketch_table_exists(spark, root)

    t2 = grouped_sketch_table(ev, ["event_type"], ["user_id"], fac)
    v2 = publish_sketch_table(t2, root, keys=["event_type"], factory=fac)
    assert resolve_sketch_table(spark, root) == v2

    # reader sees exactly the latest committed publish
    back, meta = load_sketch_table(spark, root, expected_factory=fac)
    assert ({r["event_type"]: bytes(r["sketch"]) for r in back.collect()}
            == {r["event_type"]: bytes(r["sketch"]) for r in t2.collect()})

    # torn write: a complete-looking version dir WITHOUT the marker —
    # readers stay on v2, fsck resolves past it, exists() still true
    save_sketch_table(t1, f"{root}/v_00000003", keys=["event_type"],
                      factory=fac)
    assert resolve_sketch_table(spark, root) == v2
    assert sketch_table_exists(spark, root)
    rep = verify_sketch_table(spark, root)
    assert rep["corrupt"] == 0 and rep["path"] == v2

    # next publish numbers past the torn dir; default keep=2 prunes the
    # oldest committed version AND the uncommitted leftover
    v4 = publish_sketch_table(t2, root, keys=["event_type"], factory=fac)
    assert v4.endswith("v_00000004")
    assert sorted(os.listdir(root)) == ["v_00000002", "v_00000004"]
    assert resolve_sketch_table(spark, root) == v4

    # keep=1 retains only the newest
    publish_sketch_table(t2, root, keys=["event_type"], factory=fac, keep=1)
    assert sorted(os.listdir(root)) == ["v_00000005"]
    with pytest.raises(ValueError, match="keep must be"):
        publish_sketch_table(t2, root, keys=["event_type"], factory=fac,
                             keep=0)

    # back-compat: a flat save_sketch_table path resolves to itself
    flat = str(tmp_path / "flat")
    save_sketch_table(t1, flat, keys=["event_type"], factory=fac)
    assert resolve_sketch_table(spark, flat) == flat
    assert sketch_table_exists(spark, flat)


def test_fsck_discovers_versioned_roots(spark, events, tmp_path):
    """The fsck CLI's discovery treats a publish root as one table and
    sweeps its newest committed version."""
    import importlib.util
    import os

    from bloomfilter_spark.warehouse import publish_sketch_table

    ev = events.where(F.col("user_id").isNotNull())
    fac = lambda: HyperLogLog(10)  # noqa: E731
    t = grouped_sketch_table(ev, ["event_type"], ["user_id"], fac)
    wh = tmp_path / "wh"
    wh.mkdir()
    publish_sketch_table(t, str(wh / "versioned"), keys=["event_type"],
                         factory=fac)
    save_sketch_table(t, str(wh / "flat"), keys=["event_type"], factory=fac)

    spec = importlib.util.spec_from_file_location(
        "fsck_warehouse", os.path.join(os.path.dirname(__file__), "..",
                                       "tools", "fsck_warehouse.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    found = mod._discover([str(wh)])
    assert sorted(os.path.basename(p) for p in found) == ["flat", "versioned"]
    # a versioned root passed directly resolves to itself as one table
    assert mod._discover([str(wh / "versioned")]) == [str(wh / "versioned")]


def test_publish_version_pinning_time_travel(spark, events, tmp_path):
    """A pinned `version=` reads the retained rollback publish; missing
    or pruned versions and flat tables reject the pin with the available
    list."""
    from bloomfilter_spark.warehouse import publish_sketch_table

    root = str(tmp_path / "tt")
    ev = events.where(F.col("user_id").isNotNull())
    fac = lambda: HyperLogLog(10)  # noqa: E731
    t1 = grouped_sketch_table(ev.limit(300), ["event_type"], ["user_id"], fac)
    t2 = grouped_sketch_table(ev, ["event_type"], ["user_id"], fac)
    publish_sketch_table(t1, root, keys=["event_type"], factory=fac)
    publish_sketch_table(t2, root, keys=["event_type"], factory=fac)

    old, _ = load_sketch_table(spark, root, expected_factory=fac, version=1)
    new, _ = load_sketch_table(spark, root, expected_factory=fac)
    assert ({r["event_type"]: bytes(r["sketch"]) for r in old.collect()}
            == {r["event_type"]: bytes(r["sketch"]) for r in t1.collect()})
    assert ({r["event_type"]: bytes(r["sketch"]) for r in new.collect()}
            == {r["event_type"]: bytes(r["sketch"]) for r in t2.collect()})

    with pytest.raises(ValueError, match=r"not committed/retained.*\[1, 2\]"):
        load_sketch_table(spark, root, version=7)
    # a third publish prunes v1 past keep=2 — the pin now rejects it
    publish_sketch_table(t2, root, keys=["event_type"], factory=fac)
    with pytest.raises(ValueError, match=r"available: \[2, 3\]"):
        load_sketch_table(spark, root, version=1)

    flat = str(tmp_path / "flat_tt")
    save_sketch_table(t1, flat, keys=["event_type"], factory=fac)
    with pytest.raises(ValueError, match="no versions to pin"):
        load_sketch_table(spark, flat, version=1)


def test_publish_ivf_centroids_versioned(spark, tmp_path):
    """A retrained quantizer republishes without tearing the copy readers
    hold: versioned commit, torn version invisible, rollback pinnable."""
    import numpy as np

    from bloomfilter_spark.operators.similarity import ivf_train
    from bloomfilter_spark.warehouse import (load_ivf_centroids,
                                             publish_ivf_centroids,
                                             save_ivf_centroids)

    rng = np.random.default_rng(11)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in
         enumerate(rng.normal(size=(128, 6)).astype(np.float32))],
        "vec_id long, embedding array<float>")
    c1 = ivf_train(df, "embedding", n_lists=4, max_train=128)
    c2 = ivf_train(df, "embedding", n_lists=8, max_train=128)
    root = str(tmp_path / "ivf_pub")
    publish_ivf_centroids(spark, c1, root)
    v2 = publish_ivf_centroids(spark, c2, root)
    assert v2.endswith("v_00000002")
    np.testing.assert_array_equal(load_ivf_centroids(spark, root), c2)
    np.testing.assert_array_equal(
        load_ivf_centroids(spark, root, version=1), c1)  # rollback read
    # torn retrain: complete-looking dir without the marker stays invisible
    save_ivf_centroids(spark, c1, f"{root}/v_00000003")
    np.testing.assert_array_equal(load_ivf_centroids(spark, root), c2)


def test_verify_sketch_table_all_families(spark, tmp_path):
    """fsck sweeps a healthy table of EVERY family clean — pins that each
    family's params-only zero reconstruction (the geometry probe, also
    the sketch_factory_from_meta path) works; KLL used to reject its own
    empty payload here and report healthy tables 100% corrupt."""
    import numpy as np

    from bloomfilter_spark.sketches import CountMinSketch, TDigest
    from bloomfilter_spark.sketches.counting import CountingBloomFilter
    from bloomfilter_spark.sketches.kll import KLL as KLLSketch
    from bloomfilter_spark.sketches.mg import MisraGries
    from bloomfilter_spark.sketches.scalable import ScalableBloomFilter
    from bloomfilter_spark.sketches.theta import ThetaSketch
    from bloomfilter_spark.sketches.bloom import BloomFilter
    from bloomfilter_spark.sketches.iblt import IBLT
    from bloomfilter_spark.sketches.ddsketch import DDSketch
    from bloomfilter_spark.sketches.fd import FrequentDirections
    from bloomfilter_spark.sketches.sample import SampleSketch
    from bloomfilter_spark.sketches.wsample import WeightedSampleSketch
    from bloomfilter_spark.warehouse import verify_sketch_table

    rng = np.random.default_rng(5)
    h = rng.integers(0, 2**63, 400, dtype=np.int64).view(np.uint64)
    v = rng.normal(size=400)
    factories = {
        "bloom": lambda: BloomFilter(1 << 12, 5),
        "hll": lambda: HyperLogLog(10),
        "cms": lambda: CountMinSketch(depth=3, width=64),
        "kll": lambda: KLLSketch(64),
        "tdigest": lambda: TDigest(50),
        "mg": lambda: MisraGries(8),
        "theta": lambda: ThetaSketch(64),
        "scalable": lambda: ScalableBloomFilter(0.01, initial_capacity=128),
        "counting_bloom": lambda: CountingBloomFilter(1 << 12, 5),
        "sample": lambda: SampleSketch(32),
        "weighted_sample": lambda: WeightedSampleSketch(32),
        "iblt": lambda: IBLT(256, 4),
        "ddsketch": lambda: DDSketch(0.01, bucket_limit=128),
        "fd": lambda: FrequentDirections(ell=8, d=10),
    }
    for name, fac in factories.items():
        rows = []
        for i in range(4):
            sk = fac()
            hh = h[i::4]
            if name == "weighted_sample":
                sk.update(hh, (hh % np.uint64(31)).astype(np.float64) + 1.0,
                          [b"x"] * len(hh))
            elif name == "fd":
                sk.update(v[i::4][:90].reshape(-1, 10))  # matrix rows
            else:
                sk.update(v[i::4] if not sk.HASH_KEYED else hh)
            rows.append((f"k{i}", sk.to_bytes()))
        tbl = spark.createDataFrame(rows, "k string, sketch binary")
        path = str(tmp_path / name)
        save_sketch_table(tbl, path, keys=["k"], factory=fac)
        rep = verify_sketch_table(spark, path, strict=True)
        assert rep["ok"] == rep["rows"] == 4 and rep["corrupt"] == 0, name


def test_publish_over_legacy_flat_root_upgrades_readers(spark, events,
                                                        tmp_path):
    """Upgrading a job from save_sketch_table to publish_sketch_table on
    the SAME path: committed versions take resolve precedence, so readers
    see the first publish immediately instead of being pinned to the
    stale flat copy forever."""
    from bloomfilter_spark.warehouse import (publish_sketch_table,
                                             resolve_sketch_table,
                                             verify_sketch_table)

    root = str(tmp_path / "upgrade")
    ev = events.where(F.col("user_id").isNotNull())
    fac = lambda: HyperLogLog(10)  # noqa: E731
    t_old = grouped_sketch_table(ev.limit(200), ["event_type"],
                                 ["user_id"], fac)
    t_new = grouped_sketch_table(ev, ["event_type"], ["user_id"], fac)
    save_sketch_table(t_old, root, keys=["event_type"], factory=fac)
    assert resolve_sketch_table(spark, root) == root  # flat until upgraded
    v1 = publish_sketch_table(t_new, root, keys=["event_type"], factory=fac)
    assert resolve_sketch_table(spark, root) == v1
    back, _ = load_sketch_table(spark, root, expected_factory=fac)
    assert ({r["event_type"]: bytes(r["sketch"]) for r in back.collect()}
            == {r["event_type"]: bytes(r["sketch"]) for r in t_new.collect()})
    assert verify_sketch_table(spark, root)["path"] == v1
