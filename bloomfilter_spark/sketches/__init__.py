from .base import Sketch
from .bloom import BloomFilter
from .cms import CountMinSketch
from .hll import HyperLogLog
from .kll import KLL
from .tdigest import TDigest

__all__ = ["Sketch", "BloomFilter", "HyperLogLog", "CountMinSketch",
           "TDigest", "KLL"]
