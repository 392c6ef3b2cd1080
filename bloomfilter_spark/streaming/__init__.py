from .dedup_stream import BloomDedupStream
from .sketch_stream import SketchAccumulator, stateful_grouped_hll

__all__ = ["BloomDedupStream", "SketchAccumulator", "stateful_grouped_hll"]
