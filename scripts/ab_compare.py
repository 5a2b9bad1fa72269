"""Interleaved A/B throughput comparison of two git revisions of the
build path, robust to slow weather drift.

Round 2 -> 3 left one open question (BENCH/BASELINE.md): warm 8-core 4M
throughput measured ~20.5k turns/s in round 3 vs 27.7-29.5k in round-1
clean windows — host weather, or a regression from the hashed-term-key
build commit?  A single-sample comparison cannot answer this on a box
with +-30% weather; this harness answers the RELATIVE question by
interleaving the two revisions leg-by-leg (B A B A ...) on the same
pinned cores and same fixture, and reporting per-pair warm-throughput
ratios.  Weather that drifts slower than one pair (~5-15 min) cancels in
the ratio; the median ratio over pairs is the verdict.

    python scripts/ab_compare.py <rev_b> [n_pairs] [n_turns] [cores]
                                 [--out FILE.jsonl]

rev A = the current working tree (HEAD).  rev B is materialized once via
``git worktree add`` under /tmp and removed afterwards.  Each leg shells
to that tree's own scripts/bench_scaling.py --one (warm = 2nd build in
one JVM), taskset-pinned to cores 0..cores-1, bracketed by the fault
probe so every leg's weather is on record.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench_scaling import FOREGROUND_LOCK, fault_probe, fixture_path  # noqa: E402


def run_leg(tree: str, cores: int, tpath: str, n_turns: int) -> dict | None:
    cpu_list = f"0-{cores - 1}"
    proc = subprocess.run(
        [
            "taskset", "-c", cpu_list,
            sys.executable, os.path.join(tree, "scripts", "bench_scaling.py"),
            "--one", str(cores), tpath, str(n_turns), "sorted",
        ],
        capture_output=True,
        text=True,
        cwd=tree,
        timeout=3600,
    )
    if proc.returncode != 0:
        print(proc.stderr[-2000:], file=sys.stderr)
        return None
    line = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")][-1]
    d = json.loads(line)
    return {
        "warm_tps": round(n_turns / d["seconds"], 1),
        "cold_tps": round(n_turns / d["seconds_cold"], 1),
    }


def main() -> None:
    # --flag VALUE pairs first; positionals are whatever is left over
    # (a flag's value must not leak into the positional list)
    flags: dict[str, str] = {}
    args: list[str] = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i].startswith("--"):
            if i + 1 >= len(argv):
                raise SystemExit(f"flag {argv[i]} needs a value")
            flags[argv[i]] = argv[i + 1]
            i += 2
        else:
            args.append(argv[i])
            i += 1
    rev_b = args[0]
    n_pairs = int(args[1]) if len(args) > 1 else 4
    n_turns = int(args[2]) if len(args) > 2 else 1_000_000
    cores = int(args[3]) if len(args) > 3 else 8
    out_path = flags.get("--out", os.path.join(REPO, "BENCH", "ab_compare.jsonl"))

    tree_b = f"/tmp/ab_tree_{rev_b.replace('/', '_')}"
    if not os.path.exists(tree_b):
        subprocess.run(
            ["git", "worktree", "add", "--detach", tree_b, rev_b],
            cwd=REPO, check=True, capture_output=True,
        )
    # the leg runner is part of the HARNESS, not the code under test: use
    # the current one on both sides so the warm-run protocol and the
    # keep-resident env tuning are identical (old revisions of the script
    # measured a single cold run)
    import shutil

    shutil.copy(
        os.path.join(REPO, "scripts", "bench_scaling.py"),
        os.path.join(tree_b, "scripts", "bench_scaling.py"),
    )
    tpath = os.path.abspath(fixture_path(n_turns))

    # hold the campaign interlock: the gated scaling campaign pauses while
    # this file exists, so our legs neither poison nor steal its windows
    with open(FOREGROUND_LOCK, "w") as lf:
        lf.write(f"ab_compare pid {os.getpid()}\n")
    try:
        _run_pairs(rev_b, tree_b, tpath, n_pairs, n_turns, cores, out_path)
    finally:
        # never leave the interlock behind on a crash/Ctrl-C — the campaign
        # would skip every window forever
        if os.path.exists(FOREGROUND_LOCK):
            os.remove(FOREGROUND_LOCK)


def _run_pairs(rev_b, tree_b, tpath, n_pairs, n_turns, cores, out_path) -> None:
    ratios = []
    with open(out_path, "a") as fh:
        header = {
            "event": "ab_start", "rev_a": "HEAD", "rev_b": rev_b,
            "n_turns": n_turns, "cores": cores, "n_pairs": n_pairs,
            "ts": time.time(),
        }
        fh.write(json.dumps(header) + "\n")
        fh.flush()
        print(json.dumps(header), flush=True)
        for pair in range(n_pairs):
            # alternate which side goes first so a monotone weather trend
            # biases neither side
            order = [("b", tree_b), ("a", REPO)]
            if pair % 2:
                order.reverse()
            rec: dict = {"event": "ab_pair", "pair": pair,
                         "fault_pre": fault_probe()}
            for side, tree in order:
                leg = run_leg(tree, cores, tpath, n_turns)
                rec[side] = leg
                rec[f"fault_post_{side}"] = fault_probe()
            if rec.get("a") and rec.get("b"):
                rec["ratio_a_over_b"] = round(
                    rec["a"]["warm_tps"] / rec["b"]["warm_tps"], 3
                )
                ratios.append(rec["ratio_a_over_b"])
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(json.dumps(rec), flush=True)
        summary = {
            "event": "ab_summary",
            "median_ratio_a_over_b": round(statistics.median(ratios), 3)
            if ratios else None,
            "ratios": ratios,
        }
        fh.write(json.dumps(summary) + "\n")
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
