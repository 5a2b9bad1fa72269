"""Independent-copies scaling ceiling: run P concurrent, fully independent
single-core copies of the index build (each its own JVM, own Spark local[1],
pinned to its own core, zero communication between them) and compare the
aggregate throughput to P x the solo rate.

This isolates HARDWARE scaling from JOB scaling: the copies share nothing
but the machine, so any shortfall from P x solo is a property of the box
(memory bandwidth, shared L3, hypervisor steal), not of the pipeline's
shuffles.  If the real N->4N legs match this ceiling, the pipeline adds no
serialization penalty of its own — the strongest statement a single box can
make about the two-cluster-size criterion.

    python scripts/indep_copies.py [n_turns] [procs...] [--out FILE.jsonl]

Each copy runs protocol v4 (200k-turn unmeasured warmup build in the same
JVM, then one measured full-size run), bracketed by the campaign's weather
probes so cleanliness is on record.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench_scaling import fixture_path, probes  # noqa: E402


def run_copies(procs: int, tpath: str, n_turns: int, warmup_path: str) -> dict:
    env = dict(os.environ, SCALING_WARMUP_PATH=warmup_path)
    children = []
    t0 = time.time()
    for i in range(procs):
        children.append(
            subprocess.Popen(
                ["taskset", "-c", str(i), sys.executable,
                 os.path.join(REPO, "scripts", "bench_scaling.py"),
                 "--one", "1", tpath, str(n_turns), "sorted"],
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                text=True,
                env=env,
            )
        )
    secs = []
    for ch in children:
        out, _ = ch.communicate(timeout=7200)
        line = [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
        secs.append(json.loads(line)["seconds"])
    return {
        "procs": procs,
        "wall_s": round(time.time() - t0, 1),
        "per_copy_seconds": [round(s, 1) for s in secs],
        "aggregate_tps": round(sum(n_turns / s for s in secs), 1),
        "per_copy_tps_min": round(n_turns / max(secs), 1),
        "per_copy_tps_max": round(n_turns / min(secs), 1),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = dict(zip(sys.argv[1:-1], sys.argv[2:]))
    n_turns = int(args[0]) if args else 1_000_000
    proc_counts = [int(a) for a in args[1:]] or [1, 4]
    out_path = flags.get(
        "--out", os.path.join(REPO, "BENCH", "indep_copies.jsonl")
    )
    tpath = fixture_path(n_turns)
    warmup_path = fixture_path(200_000)
    with open(out_path, "a") as fh:
        for procs in proc_counts:
            pr0 = probes()
            res = run_copies(procs, tpath, n_turns, warmup_path)
            pr1 = probes()
            rec = {"event": "indep_copies", "n_turns": n_turns,
                   "probe_pre": pr0, "probe_post": pr1, **res}
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
