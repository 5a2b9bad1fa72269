"""Measure this boot's aggregate memory-copy bandwidth at several process
counts (each child taskset-pinned to its own core, copying between
PREFAULTED 64 MiB buffers — see bench_scaling._probe_child).

The scaling campaign's honest N vs 4N choice depends on the machine's
linear region: the round-1 boot collapsed above 8 busy memory-heavy procs
(16 GB/s @ 8p, 4 GB/s @ 16p), which fixed the recorded pair at 2 vs 8
cores.  Each new boot/host placement can move that ceiling, so re-measure
before choosing.  Usage:

    python scripts/membw_sweep.py [seconds_per_leg] [--out FILE.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_SCALING = os.path.join(REPO, "scripts", "bench_scaling.py")


def sweep_point(procs: int, seconds: float) -> dict:
    children = []
    for i in range(procs):
        children.append(
            subprocess.Popen(
                ["taskset", "-c", str(i), sys.executable, BENCH_SCALING,
                 "--probe-one", str(seconds)],
                stdout=subprocess.PIPE,
                text=True,
            )
        )
    per = []
    for ch in children:
        out, _ = ch.communicate(timeout=seconds * 10 + 120)
        per.append(json.loads(out.strip().splitlines()[-1])["gbps"])
    return {
        "procs": procs,
        "aggregate_gbps": round(sum(per), 2),
        "per_proc_min": round(min(per), 2),
        "per_proc_max": round(max(per), 2),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = dict(zip(sys.argv[1:-1], sys.argv[2:]))
    seconds = float(args[0]) if args else 3.0
    out_path = flags.get("--out")
    points = []
    for procs in (1, 2, 4, 8, 16, 32):
        pt = sweep_point(procs, seconds)
        pt["ts"] = time.time()
        points.append(pt)
        print(json.dumps(pt), flush=True)
    agg = {p["procs"]: p["aggregate_gbps"] for p in points}
    summary = {
        "event": "membw_sweep",
        "seconds_per_leg": seconds,
        "aggregate_gbps": agg,
        "scaling_2_to_8": round(agg[8] / agg[2], 2) if agg.get(2) else None,
        "scaling_8_to_32": round(agg[32] / agg[8], 2) if agg.get(8) else None,
    }
    print(json.dumps(summary), flush=True)
    if out_path:
        with open(out_path, "a") as fh:
            fh.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
