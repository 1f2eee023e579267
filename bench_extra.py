#!/usr/bin/env python
"""Round-6 optimization harness (bench.py is frozen; extra evidence only).

Modes:
  --plans [names...]   write .explain("formatted") for headline queries to
                       plans/r06/<name>_<tag>.txt
  --time  [names...]   time each query with the SAME methodology as
                       bench.py's run_headline (warm session, .count()),
                       N repeats, print per-query seconds (min/median)
  --jobs  [names...]   count Spark jobs each query triggers (definition
                       + action), via the status tracker
  --jpeg               per-image JPEG decode throughput (no Spark):
                       256x256 RGB at 4:4:4 and 4:2:0, ms/image
  --png                per-image PNG decode throughput (no Spark):
                       256x256 RGB per filter type 0-4, ms/image
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from bench import HEADLINE  # noqa: E402


def get_session():
    from marlin_spark.session import get_spark

    return get_spark(
        "marlin-bench-extra", master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
    )


def warm(spark):
    from marlin_spark.operators.bm25_df import bm25_topk

    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bm25_topk(docs, "warm session throwaway", k=5).count()


def bench_jpeg() -> dict:
    """Per-image decode ms for a deterministic 256x256 RGB fixture
    (VERDICT r5 Missing #4: make the decode cost visible)."""
    from marlin_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    img = _fixture_rgb()
    out = {}
    for name, sub in (("444", False), ("420", True)):
        buf = encode_jpeg(img, quality=85, subsample=sub, restart_interval=8)
        decode_jpeg(buf)  # warm (huffman LUT cache)
        t0 = time.time()
        n = 0
        while time.time() - t0 < 3:
            decode_jpeg(buf)
            n += 1
        out[name] = {
            "bytes": len(buf),
            "ms_per_image": round((time.time() - t0) / n * 1000, 2),
            "iters": n,
        }
        print(f"jpeg {name}: {out[name]['ms_per_image']} ms/img "
              f"({len(buf)} bytes, {n} iters)", flush=True)
    return out


def _fixture_rgb():
    import numpy as np

    rng = np.random.default_rng(42)
    x = np.linspace(0, 255, 256)
    g = (np.add.outer(x, x) / 2).astype(np.uint8)
    img = np.stack(
        [g, g.T, ((g.astype(int) + g.T) // 2).astype(np.uint8)], axis=-1
    )
    return np.clip(
        img.astype(int) + rng.integers(-20, 20, img.shape), 0, 255
    ).astype(np.uint8)


def bench_png() -> dict:
    """Per-image PNG decode ms per filter type (sequential-filter cost)."""
    from marlin_spark.multimodal.binary import _decode_png, encode_png

    img = _fixture_rgb()
    out = {}
    for ft in range(5):
        buf = encode_png(img, filter_type=ft)
        assert (_decode_png(buf) == img).all()
        t0 = time.time()
        n = 0
        while time.time() - t0 < 3:
            _decode_png(buf)
            n += 1
        out[str(ft)] = {
            "bytes": len(buf),
            "ms_per_image": round((time.time() - t0) / n * 1000, 2),
            "iters": n,
        }
        print(f"png filter={ft}: {out[str(ft)]['ms_per_image']} ms/img "
              f"({len(buf)} bytes, {n} iters)", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", action="store_true")
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--jobs", action="store_true")
    ap.add_argument("--jpeg", action="store_true")
    ap.add_argument("--png", action="store_true")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = args.names or HEADLINE

    if args.jpeg or args.png:
        res = {"tag": args.tag}
        if args.jpeg:
            res["jpeg_decode"] = bench_jpeg()
        if args.png:
            res["png_decode"] = bench_png()
        print(json.dumps(res))
        if not (args.plans or args.time or args.jobs):
            return

    from marlin_spark.entry_queries import QUERIES

    spark = get_session()
    warm(spark)
    sc = spark.sparkContext

    if args.plans:
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"plans/r06/{name}_{args.tag}.txt", "w") as f:
                f.write(plan)
            nex = plan.count("Exchange")
            print(f"{name}: {nex} Exchange, {plan.count('BatchEvalPython')} "
                  f"BatchEvalPython -> plans/r06/{name}_{args.tag}.txt")

    if args.jobs:
        st = sc.statusTracker()
        for name in names:
            pre = len(st.getJobIdsForGroup() or [])
            sc.setJobGroup(f"jobs_{name}", name)
            n = QUERIES[name](spark, SF_DIR).count()
            jobs = len(st.getJobIdsForGroup(f"jobs_{name}") or [])
            sc.setJobGroup(None, None)
            print(f"{name}: {jobs} jobs ({n} rows)")

    if args.time:
        out = {}
        for name in names:
            sc.setJobDescription(f"time:{name}")
            samples = []
            for _ in range(args.repeats):
                t0 = time.time()
                QUERIES[name](spark, SF_DIR).count()
                samples.append(round(time.time() - t0, 3))
            out[name] = samples
            print(f"{name}: min={min(samples):.3f} samples={samples}",
                  flush=True)
        tot_min = sum(min(s) for s in out.values())
        tot_med = sum(sorted(s)[len(s) // 2] for s in out.values())
        print(json.dumps({"tag": args.tag, "total_min": round(tot_min, 3),
                          "total_median": round(tot_med, 3), "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
