"""Resumable-build manifest: per-stage / per-partition-group checkpoints.

The reference's durability unit is one LMDB write txn per document batch
(si_write_end, /root/reference/src/main/sindex.c:184-254) on a
single-writer thread. Distributed, the unit is a *stage × bucket-group*:
each completed unit writes an atomic JSON record; a restarted build skips
completed units (north rule: "resumable from per-partition checkpoints
with lineage and counters").

Counters are collected via Spark accumulators during the stage and
persisted into the record — postings emitted, bytes compressed, blocks
built, merge fan-in.
"""

from __future__ import annotations

import json
import os
import time


class BuildManifest:
    def __init__(self, index_dir: str, build_id: str):
        self.dir = os.path.join(index_dir, "manifest")
        self.build_id = build_id
        os.makedirs(self.dir, exist_ok=True)

    def _rec_path(self, unit: str) -> str:
        return os.path.join(self.dir, f"{self.build_id}__{unit}.json")

    def is_done(self, unit: str) -> bool:
        return os.path.exists(self._rec_path(unit))

    def mark_done(self, unit: str, counters: dict | None = None) -> None:
        rec = {
            "build_id": self.build_id,
            "unit": unit,
            "status": "done",
            "finished_at": time.time(),
            "counters": counters or {},
        }
        tmp = self._rec_path(unit) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=1)
        os.replace(tmp, self._rec_path(unit))

    def records(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self.dir)):
            if fn.startswith(self.build_id) and fn.endswith(".json"):
                with open(os.path.join(self.dir, fn)) as f:
                    out.append(json.load(f))
        return out

    def counters(self) -> dict:
        total: dict = {}
        for rec in self.records():
            for k, v in rec.get("counters", {}).items():
                if isinstance(v, dict):  # sub-phase timing maps pass through
                    total[k] = v
                else:
                    total[k] = total.get(k, 0) + v
        return total
