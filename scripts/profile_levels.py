#!/usr/bin/env python
"""Quick local[N] two-level profile of the engine bench: surfaces the
per-stage fixed costs that cap N->4N scaling efficiency. Not evidence —
a diagnosis tool (single JVM); the standalone harness is the measure."""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_level(cores: int, turns: int, corpus: str) -> dict:
    code = f"""
import json, sys, tempfile
sys.path.insert(0, {REPO!r})
from marlin_spark.session import get_spark
import bench
spark = get_spark("profile", master="local[{cores}]", shuffle_partitions={2*cores})
with tempfile.TemporaryDirectory(prefix="marlin_prof_", dir="/dev/shm") as wd:
    res = bench.run_engine_bench(spark, {turns}, wd, {corpus!r})
spark.stop()
print("PROFILE_JSON:" + json.dumps(res))
"""
    env = dict(os.environ, SPARK_GRAFT_SKIP_AUX="1",
               SPARK_GRAFT_BATCH_QUERIES=os.environ.get("SPARK_GRAFT_BATCH_QUERIES", "1000"))
    p = subprocess.run([sys.executable, "-c", code], text=True,
                       stdout=subprocess.PIPE, stderr=subprocess.PIPE, timeout=3000, env=env)
    for ln in p.stdout.splitlines():
        if ln.startswith("PROFILE_JSON:"):
            return json.loads(ln[len("PROFILE_JSON:"):])
    sys.stderr.write(p.stderr[-4000:])
    raise RuntimeError("no profile json")


def main():
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    pair = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "2,8").split(",")]
    corpus = os.path.join("/dev/shm", f"marlin_scaling_corpus_{turns}")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        from marlin_spark.session import get_spark
        import bench
        s = get_spark("stage-corpus", master="local[32]", shuffle_partitions=64)
        bench.stage_corpus(s, turns, corpus)
        s.stop()
    res = {}
    for c in pair:
        res[c] = run_level(c, turns, corpus)
        print(f"--- local[{c}]: build {res[c]['build_sec']}s "
              f"{res[c]['stage_seconds']} batch_qps {res[c]['bm25_batch_qps']} "
              f"plan {res[c]['batch_plan_sec']}", flush=True)
    lo, hi = pair
    ratio = hi / lo
    r_lo, r_hi = res[lo], res[hi]
    print(json.dumps({
        "build_eff": round(r_lo["build_sec"] / (ratio * r_hi["build_sec"]) * 1, 3)
        if r_hi["build_sec"] else None,
        "build_eff_true": round(r_hi["build_turns_per_sec"] / (ratio * r_lo["build_turns_per_sec"]), 3),
        "query_eff": round(r_hi["bm25_batch_qps"] / (ratio * r_lo["bm25_batch_qps"]), 3),
        "stage_eff": {
            k: round(r_lo["stage_seconds"][k] / (ratio * r_hi["stage_seconds"][k]), 3)
            for k in r_lo["stage_seconds"]
        },
    }, indent=1))


if __name__ == "__main__":
    main()
