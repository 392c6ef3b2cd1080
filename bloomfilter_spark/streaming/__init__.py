from .sketch_stream import SketchAccumulator, stateful_grouped_hll

__all__ = ["SketchAccumulator", "stateful_grouped_hll"]
