#!/usr/bin/env python
"""spark-submit entry point: build the inverted index from a transcript table.

    spark-submit --py-files marlin_spark.zip scripts/build_index.py \
        --input  <parquet/iceberg path of transcripts> \
        --index  <output index dir> \
        [--build-id b0] [--buckets 4096] [--groups 16] [--resume]

On a cluster, size --buckets to O(total-cores) and --groups so one group
is a few minutes of work (the resume checkpoint unit). Re-running with
the same --build-id --resume skips completed units.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--build-id", default="build-0")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--groups", type=int, default=1)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--analyzer", default="marlin")
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from marlin_spark.config import EngineConfig
    from marlin_spark.index.build import IndexBuilder
    from marlin_spark.session import get_spark

    spark = get_spark("marlin-build")
    cfg = EngineConfig(
        n_term_buckets=args.buckets,
        build_groups=args.groups,
        block_size=args.block_size,
        analyzer=args.analyzer,
    )
    trans = spark.read.parquet(args.input)
    counters = IndexBuilder(spark, args.index, cfg).build(
        trans, args.build_id, resume=not args.no_resume
    )
    json.dump(counters, sys.stdout, indent=1, default=str)
    print()
    spark.stop()


if __name__ == "__main__":
    main()
