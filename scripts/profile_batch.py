#!/usr/bin/env python
"""Dissect the batched-WAND query path's fixed cost: build (or reuse) a
small index, run search_many_wand once, dump per-stage wall/task-time
from the UI REST API plus driver-side phase timers."""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("MARLIN_SPARK_UI", "true")

import bench  # noqa: E402
from marlin_spark.session import get_spark  # noqa: E402


def main():
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    corpus = os.path.join("/dev/shm", f"marlin_scaling_corpus_{turns}")
    idx = os.path.join("/dev/shm", f"marlin_prof_idx_{turns}")
    spark = get_spark("profile-batch", master=f"local[{cores}]",
                      shuffle_partitions=2 * cores)
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        bench.stage_corpus(spark, turns, corpus)
    from marlin_spark.config import EngineConfig
    from marlin_spark.index.build import IndexBuilder
    from marlin_spark.query.engine import SearchEngine

    cfg = EngineConfig(n_term_buckets=32,
                       build_partitions=int(spark.conf.get("spark.sql.shuffle.partitions")))
    if not os.path.exists(os.path.join(idx, "counters.json")):
        IndexBuilder(spark, idx, cfg).build(
            spark.read.parquet(corpus), "prof", source_path=corpus)
    eng = SearchEngine(spark, idx, cfg)
    qs = bench.bench_queries(n_q)
    # warm python workers
    eng.search_many_wand(dict(list(qs.items())[:5]), k=10).count()
    for rep in range(3):
        pre = {s["stage"] for s in bench._stage_metrics(spark)}
        t0 = time.time()
        df = eng.search_many_wand(qs, k=10)
        t_plan = time.time() - t0
        df.count()
        dt = time.time() - t0
        stages = [s for s in bench._stage_metrics(spark) if s["stage"] not in pre]
        print(f"rep{rep}: total {dt:.2f}s plan {t_plan:.2f}s "
              f"job {dt - t_plan:.2f}s  qps {n_q/dt:.1f}")
        for s in stages:
            print("   ", json.dumps(s))
    spark.stop()


if __name__ == "__main__":
    main()
