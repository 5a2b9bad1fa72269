"""Probe-gated headline-bench runner (round-3 weather protocol, applied to
bench.py): run ``bench.py`` only in windows where both weather probes are
clean, bracketing each run with the same probes the scaling campaign uses,
and record every run to a JSONL.  The best CLEAN run is the official
headline record; dirty runs are kept for context only.

    python scripts/bench_gated.py [n_clean] [--out FILE.jsonl]
                                  [--gate-bw GBPS] [--gate-fault MBPS]
                                  [--max-seconds S]

Probes (see scripts/bench_scaling.py for the two measured host pathologies):
``agg_bw_gbps`` — 8-process aggregate prefaulted-copy bandwidth (sees
hypervisor memory contention a 1-process probe misses); ``fault_mbps`` —
fresh-allocation rate in a new process (lazy page-materialization health).
A run is CLEAN only if the probes before AND after it clear both gates AND
the in-run fault-service samples — taken every 20 s for the DURATION of
the bench by ``bench_scaling._InlegSampler`` — clear the protocol-v8
CALIBRATED rule (``bench_scaling.inleg_clean``: overall median AND
second-half median >= ``--gate-inleg-median``, default 100 MB/s).  The
round-4 pinned-burn experiment proved the old v7 absolute min>=300 floor
mislabels every busy run: a local[32] bench saturates the box and
depresses the probe to a ~130-260 MB/s busy-baseline even in a healthy
window (BENCH/BASELINE.md round-4/round-5 sections).  Bracketing probes
cannot see a window closing mid-run; the second-half-median term catches
exactly that (the observed collapse run's second-half median was 79.3).
The full sample list is recorded per run as ``inleg_fault_mbps``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench_scaling import (  # noqa: E402
    DEFAULT_GATE_BW,
    DEFAULT_GATE_FAULT,
    DEFAULT_GATE_INLEG_MEDIAN,
    _InlegSampler,
    inleg_clean,
    probes,
)


def run_bench() -> tuple[dict | None, list[float]]:
    """One bench.py run (local[$SPARK_GRAFT_CPUS], sf $SPARK_GRAFT_SF_DIR)
    under the in-run fault sampler; returns (parsed result line or None
    on failure, in-run fault-service samples MB/s)."""
    # gated runs are already probe-bracketed and window-scarce: one rep
    # per run keeps a clean window cheap (bench.py's default 2 reps serve
    # the driver's ungated per-round record).  BENCH_INLEG_SAMPLER=0
    # suppresses bench.py's own internal sampler: two concurrent probes
    # pinned to the same core on the same 20 s period would collide and
    # depress each other's readings (round-4 ADVICE); the outer sampler
    # here is the one whose samples gate cleanliness.
    env = dict(os.environ, BENCH_REPS="1", BENCH_WAIT_CLEAN_SECONDS="0",
               BENCH_INLEG_SAMPLER="0")
    with _InlegSampler() as sampler:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=1800,
            env=env,
        )
    if proc.returncode != 0:
        return None, sampler.samples
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line), sampler.samples
    return None, sampler.samples


def main() -> None:
    args: list[str] = []
    flags: dict[str, str] = {}
    rest = sys.argv[1:]
    i = 0
    while i < len(rest):
        if rest[i].startswith("--") and i + 1 < len(rest):
            flags[rest[i]] = rest[i + 1]
            i += 2
        else:
            args.append(rest[i])
            i += 1
    n_clean = int(args[0]) if args else 3
    gate_bw = float(flags.get("--gate-bw", DEFAULT_GATE_BW))
    gate_fault = float(flags.get("--gate-fault", DEFAULT_GATE_FAULT))
    gate_inleg = float(flags.get("--gate-inleg-median", DEFAULT_GATE_INLEG_MEDIAN))
    max_seconds = float(flags.get("--max-seconds", 2 * 3600))
    out_path = flags.get("--out", os.path.join(REPO, "BENCH", "bench_r3_gated.jsonl"))

    clean_runs: list[dict] = []
    t_start = time.time()
    with open(out_path, "a") as fh:

        def emit(line: dict) -> None:
            print(json.dumps(line), flush=True)
            fh.write(json.dumps(line) + "\n")
            fh.flush()

        emit({"event": "bench_campaign_start", "want_clean": n_clean,
              "gate_bw_gbps": gate_bw, "gate_fault_mbps": gate_fault,
              "gate_inleg_median_mbps": gate_inleg, "protocol": "v8"})
        while len(clean_runs) < n_clean and time.time() - t_start < max_seconds:
            pr0 = probes()
            if (
                pr0["agg_bw_gbps"] is None
                or pr0["agg_bw_gbps"] < gate_bw
                or pr0["fault_mbps"] < gate_fault
            ):
                emit({"event": "skip_dirty_window", **pr0})
                time.sleep(30)
                continue
            res, inleg = run_bench()
            pr1 = probes()
            if res is None:
                emit({"event": "bench_failed", "probe_pre": pr0,
                      "probe_post": pr1, "inleg_fault_mbps": inleg})
                continue
            clean = (
                all(
                    p["agg_bw_gbps"] is not None
                    and p["agg_bw_gbps"] >= gate_bw
                    and p["fault_mbps"] >= gate_fault
                    for p in (pr0, pr1)
                )
                and inleg_clean(inleg, gate_inleg)
            )
            if clean:
                clean_runs.append(res)
            emit({"event": "bench_run", "clean": clean, "probe_pre": pr0,
                  "probe_post": pr1, "inleg_fault_mbps": inleg,
                  "result": res, "clean_recorded": len(clean_runs)})
        if clean_runs:
            best = min(clean_runs, key=lambda r: r["value"])
            emit({"event": "summary", "clean_runs": len(clean_runs),
                  "best_total_sec": best["value"], "best": best})


if __name__ == "__main__":
    main()
