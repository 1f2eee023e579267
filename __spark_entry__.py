"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  : flagship BM25 query over sf0.001.
queries()     : operator registry (SURVEY.md §2 + training-data ops) —
                each callable (spark, sf_dir) -> DataFrame, pure Catalyst
                (no Python UDFs, runnable under any session).
oracle_sql()  : DuckDB ANSI-SQL twin per entry (tables pre-registered as
                views). Definitions live in marlin_spark/entry_queries.py.

The full engine (marlin-fidelity analyzer, compressed block index,
block-max WAND) is exercised by `python -m pytest -x -q` and benchmarked
by bench.py; these entries are the UDF-free, oracle-checkable surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from marlin_spark.entry_queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["ft_bm25_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
