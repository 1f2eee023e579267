#!/usr/bin/env python
"""Bandwidth-sensitivity A/B of the postings kernel, no Spark.

Runs the doc-range builder kernel (index/blocks.py) over one identical
in-memory partition in P parallel taskset-pinned processes, P in
{2, 8}: every process does the SAME work, so per-process wall time is
flat in P iff the kernel is not starved by a shared resource (DRAM
bandwidth on this host — the compute control is L1-resident and scales
clean). Reports per-path parallel efficiency t(P=2)/t(P=8): the direct
measure of the build phase behavior that caps the standalone N->4N
number. Usage: python scripts/kernel_scaling_probe.py [n_docs]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(path_kind: str, n_docs: int) -> None:
    import numpy as np
    import pandas as pd
    from marlin_spark.index.blocks import make_doc_range_builder

    rng = np.random.default_rng(17)
    vocab = [f"tok{i}" for i in range(30_000)]
    # zipf-ish multinomial over the vocab, ~20 tokens/doc
    probs = 1.0 / np.arange(1, len(vocab) + 1)
    probs /= probs.sum()
    texts = []
    choices = rng.choice(len(vocab), size=(n_docs, 20), p=probs)
    varr = np.asarray(vocab, dtype=object)
    for i in range(n_docs):
        texts.append(" ".join(varr[choices[i]]))
    pdf = pd.DataFrame({
        "docid": np.arange(1, n_docs + 1, dtype=np.int64),
        "dl": np.full(n_docs, 20, dtype=np.int64),
        "text": texts,
    })
    builder = make_doc_range_builder(
        "marlin", 1.2, 0.75, 20.0, 128, 1 << 16,
        fields=["text"], _force_generic=(path_kind == "generic"),
    )
    # warm one small run (imports, JIT-ish numpy paths)
    list(builder(iter([pdf.iloc[:500]])))
    t0 = time.time()
    list(builder(iter([pdf])))
    print(json.dumps({"wall": time.time() - t0}))


def run_level(path_kind: str, procs: int, n_docs: int) -> float:
    ps = []
    for i in range(procs):
        lo, hi = 2 * i, 2 * i + 1
        cmd = ["taskset", "-c", f"{lo},{hi}", sys.executable,
               os.path.abspath(__file__), "--child", path_kind, str(n_docs)]
        ps.append(subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True))
    walls = []
    for p in ps:
        out, _ = p.communicate()
        walls.append(json.loads(out.strip().splitlines()[-1])["wall"])
    return sum(walls) / len(walls)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    import bench
    res = {"n_docs": n_docs,
           "ctl_pre": round(bench._compute_control(2, seconds=3) / 2)}
    for kind in ("slab", "generic"):
        t2 = run_level(kind, 1, n_docs)   # 1 proc x 2 cores pinned
        t8 = run_level(kind, 4, n_docs)   # 4 procs x 2 cores pinned
        res[kind] = {"wall_1proc": round(t2, 2), "wall_4proc": round(t8, 2),
                     "parallel_eff": round(t2 / t8, 3)}
    res["ctl_post"] = round(bench._compute_control(2, seconds=3) / 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
