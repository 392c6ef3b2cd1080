from .dedup_stream import BloomDedupStream, ScalableBloomDedupStream
from .index_stream import StreamingFileIndexer
from .sketch_stream import (SketchAccumulator,
                            stateful_decayed_heavy_hitters,
                            stateful_decayed_quantile,
                            stateful_grouped_cms,
                            stateful_grouped_ddsketch,
                            stateful_grouped_heavy_hitters,
                            stateful_grouped_hll,
                            stateful_grouped_iblt,
                            stateful_grouped_mg,
                            stateful_grouped_quantile,
                            stateful_grouped_sample,
                            stateful_grouped_theta,
                            stateful_grouped_weighted_sample)

__all__ = ["BloomDedupStream", "ScalableBloomDedupStream",
           "StreamingFileIndexer", "SketchAccumulator",
           "stateful_grouped_cms", "stateful_grouped_ddsketch",
           "stateful_grouped_hll",
           "stateful_grouped_quantile", "stateful_grouped_heavy_hitters",
           "stateful_grouped_mg", "stateful_grouped_theta",
           "stateful_grouped_sample", "stateful_grouped_weighted_sample",
           "stateful_grouped_iblt",
           "stateful_decayed_heavy_hitters", "stateful_decayed_quantile"]
