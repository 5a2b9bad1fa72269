"""Compute the official scaling summary from a campaign JSONL.

The campaign (scripts/bench_scaling.py) appends every event — probe skips,
aborted/failed trials, clean and dirty trials — to a JSONL that accumulates
across sessions and survives campaign restarts.  The in-process summary event
is only written when a campaign run exits normally; this script recomputes
the same medians-over-clean-trials from the event log itself, so the record
is reproducible from the raw JSONL regardless of how the campaign ended:

    python scripts/summarize_scaling.py BENCH/scaling_r3_4000000_gated.jsonl

Prints one JSON line: per-leg medians over CLEAN trials (every bracketing
probe cleared both the aggregate-bandwidth and fault-rate gates), the
efficiency eff = median(tput_4N) / (4 * median(tput_N)), plus the dirty-trial
numbers for context (reported, never recorded as evidence).
"""

from __future__ import annotations

import json
import sys


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    mid = len(s) // 2
    return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2


def summarize(path: str) -> dict:
    starts: list[dict] = []
    trials: list[dict] = []
    legs: list[dict] = []
    skips = aborted = failed = 0
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            ev = json.loads(line)
            kind = ev.get("event")
            if kind == "campaign_start":
                starts.append(ev)
            elif kind == "trial":
                trials.append(ev)
            elif kind == "leg":
                legs.append(ev)
            elif kind == "skip_dirty_window":
                skips += 1
            elif kind in ("trial_aborted", "leg_aborted"):
                aborted += 1
            elif kind in ("trial_failed", "leg_failed"):
                failed += 1
    if not starts:
        raise SystemExit(f"no campaign_start in {path}")
    cfg = starts[-1]

    # Re-derive cleanliness from each trial's RECORDED probe readings under
    # the LATEST campaign's gates, so trials appended by earlier sessions
    # under looser gates are re-classified consistently (the jsonl keeps all
    # bracketing probes per trial precisely so the gate can be re-applied).
    gate_bw = float(cfg["gate_bw_gbps"])
    gate_fault = float(cfg["gate_fault_mbps"])
    # protocol v8 (round 5, calibrated in-leg rule): enforced only on events
    # that recorded samples — earlier events didn't measure mid-leg health
    # and remain gated by their brackets alone.  The round-4 pinned-burn
    # experiment (BENCH/BASELINE.md "the in-leg fault probe is depressed by
    # the leg's own activity") proved the v7 absolute min>=300 floor
    # mislabels every busy-but-healthy leg: ANY running leg depresses the
    # probe to a ~130-260 MB/s busy-baseline with occasional one-sample
    # dips (observed min 15.9 on a leg whose throughput BEAT the clean-pool
    # median).  Calibration over the 13 bracket-green warm>=cold-green legs
    # with samples: in-leg medians 130.5-262.8; the one observed genuine
    # mid-run collapse (BASELINE.md round-4 smoke run) has a second-half
    # median of 79.3.  v8 rule: median(samples) >= floor AND
    # median(second half) >= floor, floor = 100 MB/s — half the lowest
    # healthy busy-baseline median, above the collapsed regime.
    gate_inleg = float(cfg.get("gate_inleg_median_mbps", 100.0))

    def _inleg_ok(samples: list | None) -> bool:
        if not samples:
            return True
        return (
            _median(samples) >= gate_inleg
            and _median(samples[len(samples) // 2 :]) >= gate_inleg
        )

    def _warm_ge_cold(warm: float | None, cold: float | None) -> bool:
        # protocol v6: the recorded warm (2nd) run must not be slower than
        # its own cold run — same work, same JVM, caches warm; warm < cold
        # means the window degraded mid-leg in a way the bracketing probes
        # missed.  v4 single-run legs record cold == 0 -> not applicable.
        if warm is None or not cold or cold <= 0:
            return True
        return warm >= cold

    def is_clean(t: dict) -> bool:
        ps = [t.get("probe_pre"), t.get("probe_mid"), t.get("probe_post")]
        if any(p is None for p in ps):
            return bool(t.get("clean"))
        return (
            all(
                p.get("agg_bw_gbps") is not None
                and p["agg_bw_gbps"] >= gate_bw
                and p.get("fault_mbps", 0.0) >= gate_fault
                for p in ps
            )
            and _warm_ge_cold(
                t.get("turns_per_sec_N"), t.get("turns_per_sec_N_coldrun")
            )
            and _warm_ge_cold(
                t.get("turns_per_sec_4N"), t.get("turns_per_sec_4N_coldrun")
            )
            and _inleg_ok(t.get("inleg_fault_mbps_N"))
            and _inleg_ok(t.get("inleg_fault_mbps_4N"))
        )

    def leg_is_clean(t: dict) -> bool:
        ps = [t.get("probe_pre"), t.get("probe_post")]
        if any(p is None for p in ps):
            return bool(t.get("clean"))
        return all(
            p.get("agg_bw_gbps") is not None
            and p["agg_bw_gbps"] >= gate_bw
            and p.get("fault_mbps", 0.0) >= gate_fault
            for p in ps
        ) and _warm_ge_cold(
            t.get("turns_per_sec"), t.get("turns_per_sec_coldrun")
        ) and _inleg_ok(t.get("inleg_fault_mbps"))

    clean = [t for t in trials if is_clean(t)]
    dirty = [t for t in trials if not is_clean(t)]
    # protocol v3: independently-gated legs; clean trials contribute their
    # two legs to the same per-leg pools.
    #
    # Protocol homogeneity: v5/v6 double-run legs record the SECOND
    # (warm, steady-state) build; v4 single-run legs (small warmup, one
    # full-size run) measure a colder state — observed 10-25% below warm
    # legs on both sides.  Pooling the two would mix measurands, so each
    # protocol gets its own pool; the headline efficiency comes from the
    # warm pool whenever one exists (the documented official measurand),
    # with the single-run pool reported alongside.
    clean_legs = [t for t in legs if leg_is_clean(t)]
    dirty_legs = [t for t in legs if not leg_is_clean(t)]

    def _is_singlerun(t: dict) -> bool:
        return not t.get("turns_per_sec_coldrun")

    warm_legs = [t for t in clean_legs if not _is_singlerun(t)]
    sr_legs = [t for t in clean_legs if _is_singlerun(t)]
    pool_n = [t["turns_per_sec_N"] for t in clean] + [
        t["turns_per_sec"] for t in warm_legs if not t["is_4n"]
    ]
    pool_4n = [t["turns_per_sec_4N"] for t in clean] + [
        t["turns_per_sec"] for t in warm_legs if t["is_4n"]
    ]
    sr_pool_n = [t["turns_per_sec"] for t in sr_legs if not t["is_4n"]]
    sr_pool_4n = [t["turns_per_sec"] for t in sr_legs if t["is_4n"]]
    if not (pool_n and pool_4n) and (sr_pool_n and sr_pool_4n):
        # single-run-only log (v4 campaigns): that pool IS the record
        pool_n, pool_4n = sr_pool_n, sr_pool_4n
        sr_pool_n = sr_pool_4n = []
        out_measured = "single full-size run after small warmup (v4)"
    else:
        out_measured = "2nd build in warmed JVM (cold run logged)"
    out = {
        "source": path,
        "n_turns": cfg["n_turns"],
        "cores_N": cfg["cores_N"],
        "cores_4N": cfg["cores_4N"],
        "mode": cfg.get("mode"),
        "gate_bw_gbps": cfg["gate_bw_gbps"],
        "gate_fault_mbps": cfg["gate_fault_mbps"],
        "trials_total": len(trials),
        "trials_clean": len(clean),
        "trials_dirty": len(dirty),
        "dirty_skips": skips,
        "aborted": aborted,
        "failed": failed,
        "pinned": "taskset",
        "measured_run": out_measured,
        "inleg_rule": (
            f"v8: median>={gate_inleg} & 2nd-half median>={gate_inleg} MB/s "
            "(calibrated busy-baseline, BENCH/BASELINE.md round-5)"
        ),
    }
    out["legs_total"] = len(legs)
    out["legs_clean_N"] = len(pool_n) - len(clean)
    out["legs_clean_4N"] = len(pool_4n) - len(clean)
    if sr_pool_n or sr_pool_4n:
        out["singlerun_legs_clean_N"] = len(sr_pool_n)
        out["singlerun_legs_clean_4N"] = len(sr_pool_4n)
        if sr_pool_n and sr_pool_4n:
            out["singlerun_turns_per_sec_N"] = round(_median(sr_pool_n), 1)
            out["singlerun_turns_per_sec_4N"] = round(_median(sr_pool_4n), 1)
            out["singlerun_scaling_efficiency"] = round(
                _median(sr_pool_4n) / (4 * _median(sr_pool_n)), 3
            )
    if pool_n and pool_4n:
        out.update(
            {
                "turns_per_sec_N": round(_median(pool_n), 1),
                "turns_per_sec_4N": round(_median(pool_4n), 1),
                "scaling_efficiency": round(
                    _median(pool_4n) / (4 * _median(pool_n)), 3
                ),
                "n_samples_N": len(pool_n),
                "n_samples_4N": len(pool_4n),
                "best_N": round(max(pool_n), 1),
                "best_4N": round(max(pool_4n), 1),
            }
        )
    if clean:
        out["per_trial_eff"] = [t["eff"] for t in clean]
        out["eff_median_of_trials"] = round(
            _median([t["eff"] for t in clean]), 3
        )
    if dirty:
        out["dirty_eff_for_context"] = [t["eff"] for t in dirty]
    if dirty_legs:
        out["dirty_legs_for_context"] = [
            {"cores": t["cores"], "turns_per_sec": t["turns_per_sec"]}
            for t in dirty_legs
        ]

    # CONTEXT VIEW ONLY (official number above is unchanged): legs whose
    # brackets + warm>=cold are green but whose v7 in-leg samples failed
    # the absolute floor.  The round-4 pinned-burn experiment
    # (BENCH/BASELINE.md "the in-leg fault probe is depressed by the leg's
    # own activity") showed a busy-but-healthy box reads ~300 MB/s on that
    # probe, so the absolute in-leg floor conflates activity-depression
    # with genuine throttling; this view shows the pool sensitivity to it.
    def leg_bracket_clean(t: dict) -> bool:
        ps = [t.get("probe_pre"), t.get("probe_post")]
        if any(p is None for p in ps):
            return bool(t.get("clean"))
        return all(
            p.get("agg_bw_gbps") is not None
            and p["agg_bw_gbps"] >= gate_bw
            and p.get("fault_mbps", 0.0) >= gate_fault
            for p in ps
        ) and _warm_ge_cold(
            t.get("turns_per_sec"), t.get("turns_per_sec_coldrun")
        )

    bc_legs = [t for t in legs if leg_bracket_clean(t) and not _is_singlerun(t)]
    bc_n = [t["turns_per_sec"] for t in bc_legs if not t["is_4n"]] + [
        t["turns_per_sec_N"] for t in clean
    ]
    bc_4n = [t["turns_per_sec"] for t in bc_legs if t["is_4n"]] + [
        t["turns_per_sec_4N"] for t in clean
    ]
    if bc_n and bc_4n and (len(bc_n) > len(pool_n) or len(bc_4n) > len(pool_4n)):
        out["bracketclean_view"] = {
            "note": "in-leg floor ignored (busy-baseline confound); context only",
            "legs_N": len(bc_n),
            "legs_4N": len(bc_4n),
            "turns_per_sec_N": round(_median(bc_n), 1),
            "turns_per_sec_4N": round(_median(bc_4n), 1),
            "scaling_efficiency": round(_median(bc_4n) / (4 * _median(bc_n)), 3),
        }
    return out


if __name__ == "__main__":
    print(json.dumps(summarize(sys.argv[1])))
