"""Multimodal (image/audio/video) column plumbing.

Convention: media rides as an opaque ``binary`` column plus a typed
metadata struct; decode / resize / frame-sample / feature-extract run as
Arrow-batched ``mapInPandas`` stages so the Spark-side plumbing (schema,
partitioning, batch shape) is identical to what a real codec-backed
pipeline would use.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this environment, so
the byte-level decode is a clearly-marked deterministic stub: it derives a
fake raster/waveform from a seeded hash of the payload bytes (stable across
runs and partitions) and raises ``NotImplementedError`` when
``strict=True``. Swapping in a real decoder only changes ``_decode_stub``
— every schema, signature, and stage stays as-is.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),    # image|audio|video
    T.StructField("format", T.StringType()),        # png|jpeg|wav|mp4|...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])

HAVE_REAL_CODECS = False  # flipped when PIL/ffmpeg become importable
try:  # pragma: no cover - not present in this environment
    import PIL.Image  # noqa: F401
    HAVE_REAL_CODECS = True
except ImportError:
    pass


def _decode_stub(payload: bytes, height: int, width: int, channels: int,
                 strict: bool = False) -> np.ndarray:
    """STUB decoder: deterministic pseudo-raster from the payload hash.

    A real deployment replaces this with PIL/libjpeg; the function contract
    (bytes -> HxWxC uint8) is the real one."""
    if strict:
        raise NotImplementedError(
            "real image/audio decoding requires PIL/ffmpeg, absent from this "
            "environment; rerun with strict=False for the deterministic stub")
    seed = int(pd.util.hash_array(np.array([payload], dtype=object))[0])
    rng = np.random.default_rng(seed & 0x7FFFFFFF)
    return rng.integers(0, 256, (height, width, channels), dtype=np.uint8)


def decode_and_featurize(df: DataFrame, media_col: str = "media",
                         meta_col: str = "meta", id_col: str = "media_id",
                         target: tuple[int, int] = (32, 32),
                         strict: bool = False) -> DataFrame:
    """binary -> decode(stub) -> resize(real numpy) -> channel-mean features.

    Output: (id, height int, width int, mean_intensity double,
    features array<float>) — the shape a CLIP-style embedding stage slots
    into."""
    th, tw = target
    id_field = df.schema[id_col]
    schema = (f"{id_col} {id_field.dataType.simpleString()}, height int, "
              f"width int, mean_intensity double, features array<float>")

    def fn(it: Iterable[pd.DataFrame]):
        for pdf in it:
            rows = {"id": [], "h": [], "w": [], "mi": [], "feat": []}
            for i, payload, meta in zip(pdf[id_col], pdf[media_col], pdf[meta_col]):
                h = int(meta["height"] or 16)
                w = int(meta["width"] or 16)
                c = int(meta["n_channels"] or 3)
                raster = _decode_stub(bytes(payload), h, w, c, strict)
                # real numpy resize: nearest-neighbor index sampling
                yi = (np.arange(th) * h // th)
                xi = (np.arange(tw) * w // tw)
                small = raster[yi][:, xi]
                rows["id"].append(i)
                rows["h"].append(h)
                rows["w"].append(w)
                rows["mi"].append(float(raster.mean()))
                rows["feat"].append(small.mean(axis=(0, 1)).astype(np.float32))
            yield pd.DataFrame({id_col: rows["id"], "height": rows["h"],
                                "width": rows["w"], "mean_intensity": rows["mi"],
                                "features": rows["feat"]})

    return df.select(id_col, media_col, meta_col).mapInPandas(fn, schema=schema)


def sample_video_frames(df: DataFrame, media_col: str = "media",
                        meta_col: str = "meta", id_col: str = "media_id",
                        every_ms: int = 1000, strict: bool = False) -> DataFrame:
    """Video frame sampling: one output row per sampled frame timestamp.
    Decode is the stub; the explode-by-timestamp plumbing is real."""
    id_field = df.schema[id_col]
    schema = (f"{id_col} {id_field.dataType.simpleString()}, frame_ms long, "
              f"frame_mean double")

    def fn(it: Iterable[pd.DataFrame]):
        for pdf in it:
            ids, ts, means = [], [], []
            for i, payload, meta in zip(pdf[id_col], pdf[media_col], pdf[meta_col]):
                dur = int(meta["duration_ms"] or 0)
                for t in range(0, max(dur, 1), every_ms):
                    frame = _decode_stub(bytes(payload) + t.to_bytes(8, "little"),
                                         16, 16, 3, strict)
                    ids.append(i)
                    ts.append(t)
                    means.append(float(frame.mean()))
            yield pd.DataFrame({id_col: ids, "frame_ms": ts, "frame_mean": means})

    return (df.where(F.col(meta_col)["media_type"] == "video")
              .select(id_col, media_col, meta_col).mapInPandas(fn, schema=schema))


def make_demo_media_df(spark, n: int = 64, seed: int = 7):
    """Deterministic synthetic media table for tests (payload = seeded
    bytes; metadata realistic)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        mt = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.integers(0, 256, 128, dtype=np.uint8))
        rows.append((i, payload, (mt, {"image": "png", "audio": "wav",
                                       "video": "mp4"}[mt],
                     8 + i % 16, 8 + (i * 3) % 16, 3,
                     3000 if mt == "video" else 0)))
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ])
    return spark.createDataFrame(rows, schema)
