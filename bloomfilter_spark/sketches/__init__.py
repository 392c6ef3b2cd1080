from .base import Sketch
from .bloom import BloomFilter
from .cms import CountMinSketch
from .ddsketch import DDSketch
from .fd import FrequentDirections
from .counting import CountingBloomFilter
from .hll import HyperLogLog
from .iblt import IBLT
from .kll import KLL
from .mg import MisraGries
from .sample import SampleSketch
from .scalable import ScalableBloomFilter
from .tdigest import TDigest
from .theta import ThetaSketch, theta_a_not_b, theta_intersect
from .wsample import WeightedSampleSketch

#: TYPE_TAG -> class, for parsing a sketch of unknown type (SQL surface,
#: mixed sketch tables). Tags are part of the serialization contract.
SKETCH_TYPES: dict[int, type] = {
    cls.TYPE_TAG: cls
    for cls in (BloomFilter, HyperLogLog, CountMinSketch, TDigest, KLL,
                ScalableBloomFilter, ThetaSketch, MisraGries, SampleSketch,
                CountingBloomFilter, WeightedSampleSketch, IBLT, DDSketch,
                FrequentDirections)
}


def sketch_from_bytes(buf: bytes) -> Sketch:
    """Parse any serialized sketch by its header tag (base.py layout:
    magic 4B, version 1B, TYPE_TAG 1B)."""
    if len(buf) < 6:
        raise ValueError("buffer too short for a sketch header")
    cls = SKETCH_TYPES.get(buf[5])
    if cls is None:
        raise ValueError(f"unknown sketch type tag {buf[5]}")
    return cls.from_bytes(buf)


__all__ = ["Sketch", "BloomFilter", "HyperLogLog", "CountMinSketch",
           "TDigest", "KLL", "MisraGries", "ScalableBloomFilter",
           "ThetaSketch", "SampleSketch", "CountingBloomFilter",
           "WeightedSampleSketch", "IBLT", "DDSketch", "FrequentDirections",
           "theta_intersect",
           "theta_a_not_b", "SKETCH_TYPES", "sketch_from_bytes"]
