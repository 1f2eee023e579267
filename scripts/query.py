#!/usr/bin/env python
"""spark-submit entry point: top-k BM25 query against a built index.

    spark-submit --py-files marlin_spark.zip scripts/query.py \
        --index <index dir> --q "hello world" [--k 10] [--mode any] \
        [--prefix-last] [--no-wand] [--filter '{"role": "user"}'] [--hydrate]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--q", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", choices=["any", "all"], default="any")
    ap.add_argument("--prefix-last", action="store_true")
    ap.add_argument("--no-wand", action="store_true")
    ap.add_argument("--filter", default=None, help="mongo-style JSON filter")
    ap.add_argument("--hydrate", action="store_true")
    args = ap.parse_args()

    from marlin_spark.query.engine import SearchEngine
    from marlin_spark.query.filters import filter_to_column
    from marlin_spark.session import get_spark

    spark = get_spark("marlin-query")
    eng = SearchEngine(spark, args.index)
    cond = filter_to_column(json.loads(args.filter)) if args.filter else None
    hits = eng.search(
        args.q,
        k=args.k,
        mode=args.mode,
        prefix_last=args.prefix_last,
        use_wand=not args.no_wand,
        filter_cond=cond,
    )
    if args.hydrate:
        rows = eng.hydrate(hits).select(
            "docid", "score", "conv_id", "turn_idx", "role", "text"
        ).collect()
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
    else:
        for r in hits.collect():
            print(json.dumps({"docid": r["docid"], "score": r["score"]}))
    spark.stop()


if __name__ == "__main__":
    main()
