"""Distributed synthetic transcript generation (bench-scale corpora).

Because every row of the oracle corpus is regenerable from
(seed, conv, turn) alone (marlin_spark.oracle.corpus), generation
parallelizes perfectly: spark.range over conversations -> mapInPandas
emitting each conversation's turns. No data ever moves through the
driver; 10^6+ turns are generated where they will be tokenized.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def synthesize_transcripts(
    spark: SparkSession,
    n_convs: int,
    max_turns: int = 8,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism * 2

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from marlin_spark.oracle.corpus import n_turns_for, turn_record

        for pdf in batches:
            rows = []
            for conv in pdf["id"]:
                conv = int(conv)
                for t in range(n_turns_for(seed, conv, max_turns)):
                    rows.append(turn_record(seed, conv, t))
            if rows:
                yield pd.DataFrame(rows)

    return spark.range(n_convs, numPartitions=parts).mapInPandas(gen, SCHEMA)
