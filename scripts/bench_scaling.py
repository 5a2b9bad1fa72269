"""Scaling-efficiency evidence for the north rule (no real cluster in the
sandbox): run the SAME index-build job on the SAME input at N and 4N cores
and report throughput at both plus efficiency eff = tput_4N / (4 * tput_N).

Each measurement runs in a subprocess pinned with ``taskset`` to exactly the
measured core count — otherwise a local[8] run's Python UDF workers would
silently borrow the machine's idle cores and understate the true 4x speedup.

Weather-controlled protocol (round 3).  Two independent host pathologies
were measured on this sandbox (README "Benchmark weather protocol"):

  1. shared-memory contention (hypervisor neighbors) — visible only to
     AGGREGATE multi-core traffic;
  2. lazy page materialization — first touch of never-backed guest memory
     costs up to ~770 us/page (~5 MB/s/proc) while prefaulted bandwidth is
     normal; freed pages are returned to the host and refault cold, so the
     pathology cannot be pre-heated away process-to-process.

So each trial is bracketed by TWO probes — ``agg_bw_gbps`` (8 pinned procs
copying between PREFAULTED buffers, summed: pure bandwidth/contention,
healthy ~90-102 GB/s on this boot) and ``fault_mbps`` (one fresh 64 MiB
allocation in a new process: lazy-backing health, healthy >1000 MB/s,
throttled 2-160) —
and each leg runs the build TWICE in one warmed JVM: run 1 (logged) pays
the cold-fault tax and faults the JVM heap / Python worker arenas to the
job's real high-water mark; run 2 is the recorded measurement, as on a
long-lived cluster where executors are warm.  A trial is recorded as CLEAN
only when every bracketing probe clears both gates; hopeless windows are
skipped at probe cost instead of poisoning a ~20 min trial.  The campaign
appends every event to a JSONL (restart-safe, accumulates across sessions)
and keeps sampling until the requested number of clean trials is recorded.
Per-leg medians over clean trials are the official numbers.

Usage (campaign): python scripts/bench_scaling.py [n_turns] [N] [clean_trials]
                    [mode] [--gate-bw GBPS] [--gate-fault MBPS]
                    [--gate-inleg-median MBPS] [--have-n K] [--have-4n K]
                    [--out FILE.jsonl] [--max-attempts K]
  mode: "sorted" (default — build_index(assume_sorted=True), the production
        path for an Iceberg/parquet table sorted by its key; the build
        VERIFIES the ordering and falls back if it doesn't hold) or
        "general" (range-shuffle zipWithIndex path).
Self-modes (internal):
  --one <cores> <tpath> <n_turns> <mode>   one pinned leg (cold+warm runs)
  --probe-one <seconds>                    one prefaulted-copy child (GB/s)
  --fault-one                              one fresh-alloc child (MB/s)
  --probe                                  print both probe metrics
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

# Observed on THIS boot (idle guest): 8-proc aggregate prefaulted copy reads
# ~90-102 GB/s; the earlier 16-20 figure in older notes was itself taken in a
# contended window.  Fresh-alloc fault rate is bimodal: ~1000-3700 MB/s when
# the host backs pages eagerly, 2-160 MB/s when it throttles.  Trial 1 of the
# round-3 campaign proved gate_fault=300 too loose: its pre-probe read 3629
# but the window closed immediately after — the 2-core COLD run crawled at
# 2.4k turns/s (pure fault tax: ~20 GB of heap/arena at ~12 MB/s is exactly
# the observed 1600 s) and the mid probe read 782, still "clean" under 300.
# Gates are now set at the healthy regime, not at "not catastrophic".
HEALTHY_BW_GBPS = 90.0  # 8-proc aggregate prefaulted copy, idle guest
DEFAULT_GATE_BW = 45.0  # worst bw reading ever observed on this boot is 61.8
DEFAULT_GATE_FAULT = 1000.0  # healthy lazy-backing regime; throttled = 2-160
# In-leg gate (protocol v8, round 5 — calibrated): the round-4 pinned-burn
# experiment (BENCH/BASELINE.md "the in-leg fault probe is depressed by the
# leg's own activity") proved the v7 absolute min>=300 floor mislabels every
# busy-but-healthy leg: ANY running leg depresses the probe to a ~130-260
# MB/s busy-baseline with occasional one-sample dips (observed min 15.9 on
# a leg whose warm throughput BEAT the clean-pool median).  Calibration over
# the 13 bracket-green warm>=cold-green legs with recorded samples: in-leg
# medians 130.5-262.8 MB/s; the one observed genuine mid-run collapse (the
# round-4 smoke run [4839.5, 176.8, 168.6, 41.4, 79.3, 93.3]) has a
# second-half median of 79.3.  v8 rule: median(samples) >= floor AND
# median(second half of samples) >= floor, floor 100 MB/s — half the lowest
# healthy busy-baseline median, above the collapsed/throttled regime.  The
# second-half term catches the bracket-invisible pathology v7 was built
# for (a window that closes MID-leg) without punishing transient dips.
DEFAULT_GATE_INLEG_MEDIAN = 100.0


def inleg_clean(samples: list[float] | None, floor: float = DEFAULT_GATE_INLEG_MEDIAN) -> bool:
    """Protocol v8 in-leg cleanliness (see DEFAULT_GATE_INLEG_MEDIAN)."""
    if not samples:
        return True
    return (
        _median(samples) >= floor
        and _median(samples[len(samples) // 2 :]) >= floor
    )
# touched by foreground experiments (pytest, ab_compare) so the campaign
# pauses instead of measuring a window we contended ourselves
FOREGROUND_LOCK = os.path.join(REPO, "BENCH", ".foreground_lock")
# Longest legitimate foreground job (sf0.1 gate) is ~20 min; a lock older
# than this means its holder died without cleaning up (it happened: a dead
# session's lock consumed an entire campaign window as 518 skips).  The
# campaign self-heals by removing the stale lock and continuing.
STALE_LOCK_S = 2 * 3600
SKIP_BW = 8.0  # below these the window is hopeless: skip the trial
SKIP_FAULT = 40.0


def _foreground_locked(emit_fn, fh) -> bool:
    """True while a LIVE foreground lock is held; stale locks are removed."""
    try:
        age = time.time() - os.path.getmtime(FOREGROUND_LOCK)
    except OSError:  # no lock
        return False
    if age <= STALE_LOCK_S:
        return True
    try:
        os.remove(FOREGROUND_LOCK)
        emit_fn(fh, {"event": "stale_foreground_lock_removed", "age_s": round(age)})
    except OSError:  # raced with the holder / another poller
        pass
    return False


def run_build_once(cores: int, tpath: str, n_turns: int, mode: str = "sorted") -> None:
    """Child mode: one pinned leg — the build runs TWICE in the same JVM.
    Run 1 (cold, logged) faults heap/arena memory to the job's high-water
    mark and pays the lazy-backing tax; run 2 (warm, recorded) measures the
    steady state a long-lived cluster executor actually runs in.

    Keep-memory-resident settings: on this sandbox, pages RETURNED to the
    OS are handed back to the host and refault cold (README weather
    protocol), so any allocator that trims/uncommits re-pays the
    materialization tax every run.  glibc trim is disabled and the mmap
    threshold raised (worker/driver pandas buffers stay in reusable
    arenas), pyarrow uses the system allocator (its jemalloc pool decays
    dirty pages back to the OS), and the JVM runs -Xms==-Xmx (G1 never
    uncommits regions).  On a normal host these are no-ops for
    correctness and standard long-lived-executor tuning."""
    os.environ["MALLOC_TRIM_THRESHOLD_"] = "-1"
    os.environ["MALLOC_MMAP_THRESHOLD_"] = str(256 * 1024 * 1024)
    os.environ["ARROW_DEFAULT_MEMORY_POOL"] = "system"

    from pyspark.sql import SparkSession

    from baguetter_spark.config import SparseIndexConfig, TextPreprocessorConfig
    from baguetter_spark.operators.indexer import build_index

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"scaling-{cores}")
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SCALING_SHUFFLE_PARTITIONS", str(max(cores * 2, 16))),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "20g")
        .config("spark.driver.extraJavaOptions", "-Xms20g")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "-1")
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", str(256 * 1024 * 1024))
        .config("spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL", "system")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.parquet(tpath)
    # JVM codegen + Python worker pool warm-up (a tiny pandas UDF through
    # every core so worker processes exist and pandas/numpy are imported)
    warm = transcripts.limit(64 * cores).repartition(cores)

    def _noop(batches):
        for pdf in batches:
            yield pdf[["conv_id"]]

    warm.mapInPandas(_noop, schema="conv_id string").count()

    def one_build(df) -> float:
        t0 = time.time()
        idx = build_index(
            spark,
            df,
            SparseIndexConfig(preprocessor=TextPreprocessorConfig()),
            assume_sorted=(mode == "sorted"),
        )
        idx.postings.count()
        idx.doc_map.count()  # materialize the full index, not just postings
        dt = time.time() - t0
        idx.postings.unpersist()
        idx.doc_map.unpersist()
        idx.vocab.unpersist()
        # drop build-internal persists (tf, term_stats) too: the next run
        # must not sit under this run's lingering storage pressure, and
        # must redo the identical work from the parquet scan
        spark.catalog.clearCache()
        return dt

    warmup_path = os.environ.get("SCALING_WARMUP_PATH")
    if warmup_path:
        # protocol v4 (clean windows shorter than a full-size double run):
        # warm codegen / worker arenas / shuffle paths with a SMALL
        # unmeasured build, then measure ONE full-size run.  In the clean
        # windows where legs record, page faults are cheap (>1 GB/s), so
        # the full-size cold run the old protocol used as warmup bought
        # little and doubled the window length a leg needs — the measured
        # single run sits within ~7% of a fully-warm run (BASELINE.md,
        # round-3 leg forensics).
        one_build(spark.read.parquet(warmup_path))
        dt = one_build(transcripts)
        print(json.dumps({"seconds": dt, "seconds_cold": None,
                          "warmup": os.path.basename(warmup_path)}))
    else:
        times = [one_build(transcripts) for _run in range(2)]
        print(json.dumps({"seconds": times[1], "seconds_cold": times[0]}))
    spark.stop()


def _probe_child(seconds: float) -> None:
    """One bandwidth worker: copy between two PREFAULTED 64 MiB buffers
    (np.copyto — no allocation in the loop, so lazy page materialization
    cannot masquerade as low bandwidth; 128 MiB working set per proc
    overflows L3, so the loop measures DRAM, not cache), print GB/s."""
    import numpy as np

    src = np.ones(64 * 1024 * 1024 // 8, dtype=np.float64)
    dst = np.empty_like(src)
    np.copyto(dst, src)  # prefault dst
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        np.copyto(dst, src)
        n += 1
    dt = time.time() - t0
    print(json.dumps({"gbps": n * 2 * src.nbytes / dt / 1e9}))


def _fault_child() -> None:
    """One lazy-backing worker: fresh 64 MiB allocation + fill, print MB/s.
    Healthy minor-fault regime >1000 MB/s; host-throttled windows 5-160."""
    import numpy as np

    t0 = time.time()
    c = np.empty(64 * 1024 * 1024 // 8)
    c[:] = 1.0
    dt = time.time() - t0
    print(json.dumps({"mbps": 64.0 / dt}))


def membw_probe_aggregate(nprocs: int = 8, seconds: float = 1.2) -> float:
    """AGGREGATE prefaulted bandwidth (GB/s): nprocs concurrent copy
    children, each taskset-pinned to its own core, summed.  This is the
    probe that sees hypervisor contention — a single-process probe reads
    healthy while the shared memory controller is saturated (round-2
    series B, trial 4: best 1p probe, worst 8-core leg)."""
    procs = [
        subprocess.Popen(
            [
                "taskset", "-c", str(i),
                sys.executable, os.path.abspath(__file__),
                "--probe-one", str(seconds),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for i in range(nprocs)
    ]
    total = 0.0
    for p in procs:
        out, _ = p.communicate(timeout=120)
        total += json.loads(out.strip().splitlines()[-1])["gbps"]
    return round(total, 2)


def fault_probe() -> float:
    """Fresh-allocation rate (MB/s) in a brand-new process — measures the
    host's lazy page-materialization health, the pathology that dominates
    cold windows on this sandbox (cannot be pre-heated: freed pages are
    returned to the host and refault cold)."""
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--fault-one"],
        capture_output=True,
        text=True,
        check=True,
        timeout=300,
    )
    return round(json.loads(out.stdout.strip().splitlines()[-1])["mbps"], 1)


def _alloc_warmup(seconds: float = 12.0, nprocs: int = 4) -> None:
    """Protocol v9 (round 5): wake the host's fault-service QoS with a
    short allocation-heavy burst before probing.

    Measured same-session: idle fault probes read 65-470 MB/s for HOURS
    (129 consecutive dirty skips) while 8-core legs were running at
    34-42k turns/s — record-level throughput — and every post-LEG probe
    read healthy (1039/1557/2097/1914/3231/2615).  A controlled check
    then read **4613 MB/s immediately after a 12 s 4-proc alloc+fill
    warmup** vs 65-470 idle minutes before.  Model: the hypervisor
    grants fault service in proportion to the VM's RECENT MEMORY
    ACTIVITY — an idle VM's probe underreads the service an allocating
    job would actually receive (the round-4 pinned-burn depression used
    zero-allocation spinners: CPU-busy but memory-idle, consistent).
    The probe exists to predict the service a LEG gets, and a leg is
    allocation-heavy — so the warmed probe measures the right quantity.
    Genuine host throttle cannot be warmed away: round-3 throttled legs
    crawled at 2-6k turns/s WHILE allocating tens of GB (their in-leg
    samples read 3-200 throughout), so a warmed probe still reads low
    in that mode.  Gate thresholds are UNCHANGED."""
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c",
             "import numpy as np, time\n"
             f"t0=time.time()\n"
             f"while time.time()-t0<{seconds}:\n"
             " c=np.empty(64*1024*1024//8); c[:]=1.0; del c"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        for i in range(nprocs)
    ]
    for p in procs:
        p.wait(timeout=seconds * 10 + 60)


def probes(warmed: bool = True) -> dict[str, float | None]:
    """Fault probe first (one 64 MiB alloc — cheap even when throttled);
    the bandwidth probe prefaults 1 GiB across its children, so it only
    runs when the window isn't already hopeless by the fault gate.
    ``warmed`` (protocol v9 default) runs the allocation warmup first —
    see ``_alloc_warmup``; the emitted dict records the mode."""
    if warmed:
        _alloc_warmup()
    fault = fault_probe()
    bw = membw_probe_aggregate() if fault >= SKIP_FAULT else None
    return {"fault_mbps": fault, "agg_bw_gbps": bw,
            "alloc_warmed": bool(warmed)}


class LegTimeout(Exception):
    pass


def _leg_timeout_s(cores: int, n_turns: int) -> float:
    """Hard cap per leg: ~2.5x a healthy double-run (healthy ≈ 3500
    turns/s/core) + startup.  A leg that cannot finish inside the cap is
    running in weather the probes missed — abort instead of burning hours
    on a trial that can never be recorded as clean."""
    healthy_run = n_turns / (3500.0 * cores)
    return 2.0 * 2 * healthy_run + 180


INLEG_SAMPLER_CORE = 31  # far from leg cores 0-(c-1); fault probe only
INLEG_SAMPLE_PERIOD_S = 20.0


def _fault_probe_once(core: int = INLEG_SAMPLER_CORE, timeout: float = 120.0) -> float | None:
    """One fresh-allocation fault-service reading (MB/s), pinned to a core
    the leg does not use.  A 64 MiB alloc+fill costs <0.1 s healthy and
    steals no measurable bandwidth from the leg; in a throttled window it
    takes 11-27 s and reads 3-200 — exactly the signal we need mid-leg."""
    try:
        out = subprocess.run(
            ["taskset", "-c", str(core), sys.executable,
             os.path.abspath(__file__), "--fault-one"],
            capture_output=True, text=True, timeout=timeout,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])["mbps"]
    except Exception:
        return None


class _InlegSampler:
    """Protocol v7: sample lazy-backing fault service every
    INLEG_SAMPLE_PERIOD_S for the DURATION of a leg, from a spare core.
    Bracketing probes cannot see a window closing mid-leg (observed: legs
    recorded 'clean' at 30% below warm-pool medians with green brackets);
    the in-leg minimum is a pre-registered external health measure,
    independent of the leg's own result."""

    def __init__(self) -> None:
        import threading

        self.samples: list[float] = []
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while not self._stop.is_set():
            mbps = _fault_probe_once()
            if mbps is not None:
                self.samples.append(round(mbps, 1))
            self._stop.wait(INLEG_SAMPLE_PERIOD_S)

    def __enter__(self) -> "_InlegSampler":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._thread.join(timeout=130.0)


def measure(
    cores: int, tpath: str, n_turns: int, mode: str = "sorted"
) -> tuple[float, float, list[float]]:
    """Returns (warm turns/s — recorded, cold turns/s — logged, in-leg
    fault-service samples MB/s).  Raises LegTimeout (after killing the
    leg's process group) if the leg exceeds its weather cap."""
    import signal

    cpu_list = f"0-{cores - 1}"
    proc = subprocess.Popen(
        [
            "taskset", "-c", cpu_list,
            sys.executable, os.path.abspath(__file__),
            "--one", str(cores), tpath, str(n_turns), mode,
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        cwd=REPO,
        start_new_session=True,  # own pgid: the JVM grandchild dies with it
    )
    try:
        with _InlegSampler() as sampler:
            out, err = proc.communicate(timeout=_leg_timeout_s(cores, n_turns))
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()
        raise LegTimeout(f"{cores}-core leg exceeded {_leg_timeout_s(cores, n_turns):.0f}s")
    if proc.returncode != 0:
        tail = " | ".join(err.strip().splitlines()[-15:])
        raise RuntimeError(f"{cores}-core leg failed rc={proc.returncode}: {tail}")
    last = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(last)
    cold = rec.get("seconds_cold")
    return n_turns / rec["seconds"], (n_turns / cold if cold else 0.0), sampler.samples


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    mid = len(s) // 2
    return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2


def fixture_path(n_turns: int) -> str:
    cache_dir = os.path.join(REPO, ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    tpath = os.path.join(cache_dir, f"transcripts_{n_turns}_seed42.parquet")
    if not os.path.exists(tpath):
        from baguetter_spark.fixtures import gen_transcripts

        # row_group_size: a real sorted table has many files/row groups; one
        # giant pandas-default row group would collapse the presorted path's
        # scan parallelism (every row in one split)
        gen_transcripts(n_turns, seed=42, vocab_size=20_000).to_parquet(
            tpath, index=False, row_group_size=125_000
        )
    return tpath


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        mode = sys.argv[5] if len(sys.argv) > 5 else "sorted"
        run_build_once(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]), mode)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--probe-one":
        _probe_child(float(sys.argv[2]))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--fault-one":
        _fault_child()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        print(json.dumps(probes()))
        return

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

    n_turns = int(args[0]) if len(args) > 0 else 4_000_000
    n_cores = int(args[1]) if len(args) > 1 else 2
    want_clean = int(args[2]) if len(args) > 2 else 8
    mode = args[3] if len(args) > 3 else "sorted"
    gate_bw = float(flags.get("--gate-bw", DEFAULT_GATE_BW))
    gate_fault = float(flags.get("--gate-fault", DEFAULT_GATE_FAULT))
    gate_inleg = float(flags.get("--gate-inleg-median", DEFAULT_GATE_INLEG_MEDIAN))
    # clean legs already recorded in the jsonl by prior sessions: seeds the
    # side-picker so a resumed campaign spends scarce clean windows on the
    # side whose POOL (not in-run count) is thinner
    have_n = int(flags.get("--have-n", "0"))
    have_4n = int(flags.get("--have-4n", "0"))
    max_attempts = int(flags.get("--max-attempts", want_clean * 4))
    max_seconds = float(flags.get("--max-seconds", 6 * 3600))
    # Dirty-window re-probe interval.  Round-5 measurements: a 5-min
    # series of fault-ONLY probes at 20 s cadence read 65-470 MB/s (no
    # healthy reading), the same as probes taken 150 s apart — so the
    # probe pair does NOT meaningfully depress itself, and the dominant
    # weather mode here is "mostly-depressed with brief healthy bursts"
    # (a one-shot 4135 and a campaign leg-start occurred within minutes
    # of depressed readings).  A medium cadence catches burst onsets
    # without probe-load concerns; evidence gates are untouched.
    skip_sleep = float(flags.get("--skip-sleep", "45"))
    out_path = flags.get(
        "--out", os.path.join(REPO, "BENCH", f"scaling_r3_{n_turns}_gated.jsonl")
    )
    bench_jsonl = flags.get("--bench-jsonl")

    tpath = fixture_path(n_turns)

    clean_n: list[float] = []
    clean_4n: list[float] = []
    attempts = 0
    skips = 0

    def emit(fh, line: dict) -> None:
        print(json.dumps(line), flush=True)
        fh.write(json.dumps(line) + "\n")
        fh.flush()

    leg_mode = bool(int(flags.get("--leg-mode", "0")))

    with open(out_path, "a") as fh:
        emit(fh, {"event": "campaign_start", "n_turns": n_turns,
                  "cores_N": n_cores, "cores_4N": n_cores * 4,
                  "want_clean": want_clean, "gate_bw_gbps": gate_bw,
                  "gate_fault_mbps": gate_fault,
                  "gate_inleg_median_mbps": gate_inleg, "protocol": "v8",
                  "have_n": have_n, "have_4n": have_4n, "mode": mode,
                  "leg_mode": leg_mode})
        t_start = time.time()
        warmup_turns = int(flags.get("--warmup-turns", "200000"))
        if leg_mode and warmup_turns:
            # protocol v4: legs warm up on a small build and measure one
            # full-size run (fits legs into this box's ~6 min clean windows)
            os.environ["SCALING_WARMUP_PATH"] = fixture_path(warmup_turns)
        if leg_mode:
            # Protocol v3: gate LEGS independently instead of same-window
            # trial pairs.  A full trial needs one ~25 min clean window (4N
            # cold+warm, probes, N cold+warm); on a box whose clean windows
            # are scarce and short that records nothing.  The claim under
            # test is about the JOB at each parallelism, not about pairs
            # measured in the same instant — so each leg is bracketed by
            # its own probes, records clean on its own, and the official
            # eff = median(clean 4N legs) / (4 * median(clean N legs))
            # (summarize_scaling.py re-derives this from the event log).
            n_bench = 0
            while (
                (
                    have_n + len(clean_n) < want_clean
                    or have_4n + len(clean_4n) < want_clean
                )
                and attempts < max_attempts
                and time.time() - t_start < max_seconds
            ):
                # interlock: a foreground experiment (pytest, A/B harness)
                # holds this lockfile so the campaign neither measures a
                # self-contended window nor records a leg poisoned by our
                # own load (probes can't tell host weather from our load)
                if _foreground_locked(emit, fh):
                    emit(fh, {"event": "skip_foreground_lock"})
                    time.sleep(30)
                    continue
                pr0 = probes()
                if (
                    pr0["agg_bw_gbps"] is None
                    or pr0["agg_bw_gbps"] < gate_bw
                    or pr0["fault_mbps"] < gate_fault
                ):
                    skips += 1
                    emit(fh, {"event": "skip_dirty_window", **pr0,
                              "skips": skips})
                    time.sleep(skip_sleep)
                    continue
                attempts += 1
                # the side with the thinner POOL (prior sessions' clean
                # legs via --have-n/--have-4n + this run's) gets the
                # window; tie → alternate by attempt (round 4: an all-dirty
                # stretch — flap mode — previously pinned every attempt to
                # 4N and starved the N side of same-weather context legs;
                # the first tie still goes to the weather-sensitive 4N leg)
                tot_n = have_n + len(clean_n)
                tot_4n = have_4n + len(clean_4n)
                if tot_4n != tot_n:
                    is_4n = tot_4n < tot_n
                else:
                    is_4n = attempts % 2 == 1
                cores = n_cores * 4 if is_4n else n_cores
                try:
                    warm, cold, inleg = measure(cores, tpath, n_turns, mode)
                except LegTimeout as exc:
                    emit(fh, {"event": "leg_aborted", "attempt": attempts,
                              "cores": cores, "reason": str(exc),
                              "probe_pre": pr0})
                    continue
                except RuntimeError as exc:
                    emit(fh, {"event": "leg_failed", "attempt": attempts,
                              "cores": cores, "reason": str(exc)[:2000]})
                    time.sleep(20)
                    continue
                pr1 = probes()
                # protocol v6: the recorded (warm, 2nd) run must not be
                # slower than its own cold run — identical work in the same
                # JVM with caches/arenas warm can only lose to the cold run
                # if the window degraded MID-LEG, which the bracketing
                # probes can miss (observed: a 4c leg warm 18.4k vs cold
                # 22.5k with both probes green).  Not applicable to v4
                # single-run legs (cold == 0).
                # protocol v8: the leg's in-leg fault-service samples must
                # clear the CALIBRATED median rule (see inleg_clean /
                # DEFAULT_GATE_INLEG_MEDIAN) — the bracketing probes cannot
                # see a window that closes mid-leg, and the v7 absolute
                # floor mislabeled every busy-but-healthy leg.
                clean = all(
                    p["agg_bw_gbps"] is not None
                    and p["agg_bw_gbps"] >= gate_bw
                    and p["fault_mbps"] >= gate_fault
                    for p in (pr0, pr1)
                ) and (cold <= 0 or warm >= cold) and inleg_clean(inleg, gate_inleg)
                if clean:
                    (clean_4n if is_4n else clean_n).append(warm)
                emit(fh, {
                    "event": "leg", "attempt": attempts, "cores": cores,
                    "is_4n": is_4n, "clean": clean,
                    "probe_pre": pr0, "probe_post": pr1,
                    "turns_per_sec": round(warm, 1),
                    "turns_per_sec_coldrun": round(cold, 1),
                    "inleg_fault_mbps": inleg,
                    "clean_recorded_N": len(clean_n),
                    "clean_recorded_4N": len(clean_4n),
                })
                if clean and bench_jsonl and n_bench < 3:
                    from bench_gated import run_bench

                    res, b_inleg = run_bench()
                    pr2b = probes()
                    bclean = res is not None and all(
                        p["agg_bw_gbps"] is not None
                        and p["agg_bw_gbps"] >= gate_bw
                        and p["fault_mbps"] >= gate_fault
                        for p in (pr1, pr2b)
                    ) and inleg_clean(b_inleg, gate_inleg)
                    if bclean:
                        n_bench += 1
                    with open(bench_jsonl, "a") as bfh:
                        bline = {"event": "bench_run", "clean": bclean,
                                 "probe_pre": pr1, "probe_post": pr2b,
                                 "inleg_fault_mbps": b_inleg,
                                 "result": res, "after_leg": attempts}
                        bfh.write(json.dumps(bline) + "\n")
                    print(json.dumps(bline), flush=True)
            summary = {
                "event": "summary", "leg_mode": True,
                "clean_legs_N": len(clean_n),
                "clean_legs_4N": len(clean_4n),
            }
            if clean_n and clean_4n:
                med_n = sorted(clean_n)[len(clean_n) // 2]
                med_4n = sorted(clean_4n)[len(clean_4n) // 2]
                summary["eff"] = round(med_4n / (4 * med_n), 3)
            emit(fh, summary)
            return
        while (
            len(clean_n) < want_clean
            and attempts < max_attempts
            and time.time() - t_start < max_seconds
        ):
            # same interlock leg mode has: a foreground experiment (pytest,
            # A/B harness) holds this lockfile so a trial neither measures
            # a self-contended window nor records legs poisoned by our own
            # load (probes cannot tell host weather from our load)
            if _foreground_locked(emit, fh):
                emit(fh, {"event": "skip_foreground_lock"})
                time.sleep(30)
                continue
            pr0 = probes()
            # A trial only STARTS when the window already meets the full
            # CLEAN gates — a merely "not hopeless" window (the old skip
            # thresholds) starts a doomed trial that burns an hour and can
            # never be recorded.
            if (
                pr0["agg_bw_gbps"] is None
                or pr0["agg_bw_gbps"] < gate_bw
                or pr0["fault_mbps"] < gate_fault
            ):
                skips += 1
                emit(fh, {"event": "skip_dirty_window", **pr0, "skips": skips})
                time.sleep(30)
                continue
            attempts += 1
            # 4N leg FIRST: it is the weather-sensitive one (4x the aggregate
            # bandwidth demand and 4x the worker-arena fault surface) while
            # the N leg is nearly weather-stable (±7% across round-1 trials).
            # Trial order used to give the freshest probe-verified window to
            # the N leg and leave the 4N leg running ~40 min later in
            # whatever the window had decayed to — biasing eff DOWN.
            try:
                w_4n, c_4n, inleg_4n = measure(n_cores * 4, tpath, n_turns, mode)
                pr1 = probes()
                w_n, c_n, inleg_n = measure(n_cores, tpath, n_turns, mode)
                pr2 = probes()
            except LegTimeout as exc:
                emit(fh, {"event": "trial_aborted", "attempt": attempts,
                          "reason": str(exc), "probe_pre": pr0})
                continue
            except RuntimeError as exc:
                emit(fh, {"event": "trial_failed", "attempt": attempts,
                          "reason": str(exc)[:2000], "probe_pre": pr0})
                time.sleep(20)
                continue
            all_bw = [p["agg_bw_gbps"] for p in (pr0, pr1, pr2)]
            all_fault = [p["fault_mbps"] for p in (pr0, pr1, pr2)]
            clean = (
                all(b is not None and b >= gate_bw for b in all_bw)
                and min(all_fault) >= gate_fault
                # protocol v6: warm >= cold per leg (see leg-mode comment)
                and (c_4n <= 0 or w_4n >= c_4n)
                and (c_n <= 0 or w_n >= c_n)
                # protocol v8: calibrated in-leg median rule (see leg mode)
                and inleg_clean(inleg_4n, gate_inleg)
                and inleg_clean(inleg_n, gate_inleg)
            )
            if clean:
                clean_n.append(w_n)
                clean_4n.append(w_4n)
            emit(fh, {
                "event": "trial",
                "attempt": attempts,
                "clean": clean,
                "probe_pre": pr0, "probe_mid": pr1, "probe_post": pr2,
                "turns_per_sec_N": round(w_n, 1),
                "turns_per_sec_4N": round(w_4n, 1),
                "turns_per_sec_N_coldrun": round(c_n, 1),
                "turns_per_sec_4N_coldrun": round(c_4n, 1),
                "inleg_fault_mbps_N": inleg_n,
                "inleg_fault_mbps_4N": inleg_4n,
                "eff": round(w_4n / (4 * w_n), 3),
                "clean_recorded": len(clean_n),
            })
            if clean and bench_jsonl:
                # a clean post-trial probe means the window is still open —
                # the cheapest moment all campaign to grab the ~90 s gated
                # headline bench the round also owes (same record format
                # as scripts/bench_gated.py)
                from bench_gated import run_bench

                res, b_inleg = run_bench()
                pr3 = probes()
                bclean = res is not None and all(
                    p["agg_bw_gbps"] is not None
                    and p["agg_bw_gbps"] >= gate_bw
                    and p["fault_mbps"] >= gate_fault
                    for p in (pr2, pr3)
                ) and inleg_clean(b_inleg, gate_inleg)
                with open(bench_jsonl, "a") as bfh:
                    bline = {"event": "bench_run", "clean": bclean,
                             "probe_pre": pr2, "probe_post": pr3,
                             "inleg_fault_mbps": b_inleg,
                             "result": res, "after_trial": attempts}
                    bfh.write(json.dumps(bline) + "\n")
                print(json.dumps(bline), flush=True)

        summary = {
            "event": "summary",
            "n_turns": n_turns,
            "cores_N": n_cores,
            "cores_4N": n_cores * 4,
            "mode": mode,
            "gate_bw_gbps": gate_bw,
            "gate_fault_mbps": gate_fault,
            "healthy_bw_gbps": HEALTHY_BW_GBPS,
            "attempts": attempts,
            "dirty_skips": skips,
            "clean_trials": len(clean_n),
            "pinned": "taskset",
            "measured_run": "2nd build in warmed JVM (cold run logged)",
        }
        if clean_n:
            tput_n, tput_4n = _median(clean_n), _median(clean_4n)
            summary.update(
                {
                    "turns_per_sec_N": round(tput_n, 1),
                    "turns_per_sec_4N": round(tput_4n, 1),
                    "scaling_efficiency": round(tput_4n / (4 * tput_n), 3),
                    "best_N": round(max(clean_n), 1),
                    "best_4N": round(max(clean_4n), 1),
                    "scaling_efficiency_best": round(
                        max(clean_4n) / (4 * max(clean_n)), 3
                    ),
                }
            )
        emit(fh, summary)


if __name__ == "__main__":
    main()
