"""Pre-heat the sandbox VM's physical memory pool before benchmarking.

This container is a lazily-backed microVM: guest-physical pages are
materialized by the host ON FIRST TOUCH, and in degraded windows that
materialization runs at single-digit MB/s per process (measured round 3:
a fresh 64 MiB numpy allocation took 11-12 s, ~770 us/page, while
PREFAULTED memcpy bandwidth was a healthy 18+ GB/s — the pathology is
page-fault cost, not memory bandwidth).  Pages materialized once stay
materialized VM-wide: after a process exits, its frames return to the
kernel free list already host-backed, and any later process reuses them
at normal minor-fault speed (verified cross-process).

So the honest way to benchmark Spark jobs on this box — which a warm,
long-running cluster host never pays this cost; it is a cold-sandbox
artifact — is to materialize a working-set-sized pool ONCE, then run the
probe-gated measurement campaign inside it.  Faulting parallelizes
(~5 MB/s x1 proc -> ~80 MB/s x48 procs), so the heater fans out.

Children HOLD their chunks until every sibling finishes (file barrier):
an early-exiting child would return its frames to the free list and the
still-faulting siblings would reuse those instead of materializing new
ones, silently capping the pool at the concurrent-resident size.

Usage: python scripts/preheat.py [gib_total=60] [procs=48]
Self-mode (internal): --child <gib> <barrier_dir> <id> <procs>
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time


def child(gib: float, barrier_dir: str, cid: int, procs: int) -> None:
    import numpy as np

    chunks = []
    n = max(1, int(gib * 4))
    for _ in range(n):
        c = np.empty(256 * 1024 * 1024 // 8)
        c[:] = 1.0
        chunks.append(c)
    open(os.path.join(barrier_dir, f"done_{cid}"), "w").close()
    # hold resident until every sibling has materialized its share
    deadline = time.time() + 3600
    while time.time() < deadline:
        if len(os.listdir(barrier_dir)) >= procs:
            return
        time.sleep(1)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(float(sys.argv[2]), sys.argv[3], int(sys.argv[4]), int(sys.argv[5]))
        return

    gib_total = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    procs = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    barrier_dir = tempfile.mkdtemp(prefix="preheat_")
    per = gib_total / procs
    t0 = time.time()
    ps = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child",
             str(per), barrier_dir, str(i), str(procs)]
        )
        for i in range(procs)
    ]
    for p in ps:
        p.wait()
    print(f"preheated {gib_total} GiB with {procs} procs in "
          f"{time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
