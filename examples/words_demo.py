#!/usr/bin/env python
"""The reference's Words example, Spark-first (examples/Words.hs:25-41).

Same three timed phases over a word list: (1) count the words, (2)
construct a Bloom filter at eps=0.01 sized by suggestSizing, (3) query
every inserted word and report misses — which MUST be zero (the
zero-false-negative guarantee the reference prints failures for).

Input: a text file of newline-separated words; with no file it uses the
FIXTURES.md §3 dictionary analog — 10^5 distinct seeded pseudo-words
(the sandbox has no /usr/share/dict/words; Words.hs reads ~10^5 words
from there).

    python examples/words_demo.py [words.txt ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    from pyspark.sql import functions as F

    from bloomfilter_spark.config import get_spark
    from bloomfilter_spark.easy import bloom_fit, bloom_membership

    spark = get_spark("words_demo", cores=8, shuffle_partitions=8)
    if argv:
        sources = [spark.read.text(f).select(F.col("value").alias("word"))
                   for f in argv]
    else:
        # FIXTURES.md §3: ~10^5 distinct seeded pseudo-words (id suffix
        # guarantees distinctness; the hash prefix makes them word-like)
        sources = [spark.range(100_000).select(
            F.concat(F.substring(F.sha1(F.concat(F.lit("w"),
                                                 F.col("id").cast("string"))),
                                 1, 7),
                     F.col("id").cast("string")).alias("word"))]

    for words in sources:
        words = words.persist()
        a = time.time()
        n = words.count()
        b = time.time()
        print(f"{n} words")
        print(f"{b - a:.3f}s to count words")
        filt = bloom_fit(words, ["word"], fpr=0.01, capacity=n)
        print(filt)
        c = time.time()
        print(f"{c - b:.3f}s to construct filter")
        misses = (bloom_membership(words, filt, ["word"])
                  .where(~F.col("is_member")).count())
        d = time.time()
        print(f"{d - c:.3f}s to query every element")
        print(f"{misses} misses (must be 0)")
        words.unpersist()
        if misses:
            return 1
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
