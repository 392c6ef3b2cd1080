from .base import Sketch
from .bloom import BloomFilter
from .cms import CountMinSketch
from .hll import HyperLogLog
from .kll import KLL
from .tdigest import TDigest
from .theta import ThetaSketch, theta_a_not_b, theta_intersect

__all__ = ["Sketch", "BloomFilter", "HyperLogLog", "CountMinSketch",
           "TDigest", "KLL", "ThetaSketch", "theta_intersect",
           "theta_a_not_b"]
