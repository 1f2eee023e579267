"""marlin_spark — a PySpark-native full-text index build + BM25 query engine.

A from-scratch reimplementation of the capabilities of marlinsearch/marlin
(reference at /root/reference, C, LMDB+trie based) re-expressed Spark-first:

- index build = DataFrame pipeline: tokenize (Arrow-vectorized pandas_udf)
  -> posexplode -> shuffle-partition by (term, doc-range) [explicit skew
  salting] -> sortWithinPartitions -> delta+varbyte block compression
  (mapInPandas, numpy) -> partitioned parquet ("Iceberg-like" local catalog)
  alongside doc-length + collection statistics.
- query = driver-side planner (same analyzer) -> partition-pruned postings
  scan -> block-max WAND scorer (mapInPandas over Arrow batches) or exact
  DataFrame scoring -> TakeOrderedAndProject global top-k.

Nothing is ported from the reference's C code; the reference defines WHAT
to compute (analyzer semantics, match semantics, filters, facets, aggs,
pagination) and this package re-derives HOW on Spark.
"""

__version__ = "0.1.0"

from marlin_spark._alloc import tune_allocator as _tune_allocator

_tune_allocator()  # see _alloc.py: page-fault-hostile host mitigation

from marlin_spark.config import EngineConfig  # noqa: F401
