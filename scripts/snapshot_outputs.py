#!/usr/bin/env python
"""Snapshot (or verify) every registry query's exact output.

  python scripts/snapshot_outputs.py save [names...]
  python scripts/snapshot_outputs.py check [names...]

Snapshots collected rows (values + schema simpleString) per query per SF
to /tmp/r06_snapshots/<sf>/<name>.pkl. `check` recomputes and compares
exactly (row values, column names, Spark types) — the round-6 guarantee
that an optimization changed no query's result.
"""

from __future__ import annotations

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAP = "/tmp/r06_snapshots"
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def rows_key(rows):
    return [tuple(r) for r in rows]


def main():
    mode = sys.argv[1]
    names = sys.argv[2:]
    from marlin_spark.entry_queries import QUERIES
    from marlin_spark.session import get_spark

    spark = get_spark("snapshot", master="local[32]", shuffle_partitions=64)
    todo = names or sorted(QUERIES)
    n_bad = 0
    for sf_dir in SFS:
        sf = os.path.basename(sf_dir)
        os.makedirs(f"{SNAP}/{sf}", exist_ok=True)
        for name in todo:
            df = QUERIES[name](spark, sf_dir)
            cur = {
                "schema": df.schema.simpleString(),
                "rows": rows_key(df.collect()),
            }
            path = f"{SNAP}/{sf}/{name}.pkl"
            if mode == "save":
                with open(path, "wb") as f:
                    pickle.dump(cur, f)
                print(f"saved {sf}/{name}: {len(cur['rows'])} rows")
            else:
                with open(path, "rb") as f:
                    ref = pickle.load(f)
                ok_schema = ref["schema"] == cur["schema"]
                # unordered-tail tolerance: every query has a deterministic
                # ORDER BY, but ties beyond the sort keys may legally
                # permute under a different plan — compare as multisets
                # AND as ordered lists, report which differs
                ok_rows = ref["rows"] == cur["rows"]
                ok_set = sorted(map(repr, ref["rows"])) == sorted(
                    map(repr, cur["rows"])
                )
                tag = "OK" if (ok_schema and ok_rows) else (
                    "OK-unordered" if (ok_schema and ok_set) else "MISMATCH"
                )
                if tag == "MISMATCH":
                    n_bad += 1
                    if not ok_schema:
                        print(f"  schema ref={ref['schema']}")
                        print(f"  schema cur={cur['schema']}")
                    else:
                        diff = [
                            (i, a, b)
                            for i, (a, b) in enumerate(
                                zip(ref["rows"], cur["rows"])
                            )
                            if a != b
                        ][:3]
                        print(f"  first diffs: {diff}; "
                              f"nrows {len(ref['rows'])} vs {len(cur['rows'])}")
                print(f"{tag} {sf}/{name} ({len(cur['rows'])} rows)", flush=True)
    spark.stop()
    if mode == "check" and n_bad:
        sys.exit(f"{n_bad} MISMATCHES")


if __name__ == "__main__":
    main()
