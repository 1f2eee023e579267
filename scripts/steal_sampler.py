#!/usr/bin/env python
"""Per-core steal/busy sampler: appends one JSON line per interval with
jiffy deltas for cores 0-7 (the pinned worker ranges of the standalone
scaling harness). Diagnosis tool for the bimodal-host investigation —
run alongside scripts/standalone_scaling.py, then correlate spikes with
the w1/w4 leg timestamps in the level logs."""
import json
import sys
import time

CORES = list(range(8))


def snap():
    out = {}
    with open("/proc/stat") as f:
        for ln in f:
            p = ln.split()
            if p and p[0].startswith("cpu") and p[0] != "cpu":
                c = int(p[0][3:])
                if c in CORES:
                    vals = [int(x) for x in p[1:]]
                    # user nice system idle iowait irq softirq steal
                    out[c] = {
                        "busy": vals[0] + vals[1] + vals[2],
                        "idle": vals[3],
                        "iowait": vals[4],
                        "steal": vals[7] if len(vals) > 7 else 0,
                    }
    return out


def spin_rate(ms: float = 25.0) -> float:
    """Calibrated integer spin: iterations/ms of pure ALU work. Runs on
    whatever core the scheduler picks (pin externally with taskset).
    ~25 ms per call = negligible load at a 5 s interval; a drop in this
    rate during a leg means the GUEST's cycles themselves slowed (freq
    cap / hypervisor throttle), independent of the memory path."""
    end = time.perf_counter() + ms / 1000.0
    n = 0
    x = 1
    while time.perf_counter() < end:
        for _ in range(10000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 10000
    return n / ms


def main():
    interval = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/steal_samples.jsonl"
    prev = snap()
    while True:
        time.sleep(interval)
        cur = snap()
        rec = {"ts": round(time.time(), 1),
               "spin_per_ms": round(spin_rate(), 0)}
        tot_busy = tot_steal = tot_idle = tot_io = 0
        for c in CORES:
            d = {k: cur[c][k] - prev[c][k] for k in cur[c]}
            tot_busy += d["busy"]
            tot_steal += d["steal"]
            tot_idle += d["idle"]
            tot_io += d["iowait"]
        denom = max(1, tot_busy + tot_steal + tot_idle + tot_io)
        rec["busy_pct"] = round(100 * tot_busy / denom, 1)
        rec["steal_pct"] = round(100 * tot_steal / denom, 1)
        rec["iowait_pct"] = round(100 * tot_io / denom, 1)
        prev = cur
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
