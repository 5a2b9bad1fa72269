"""Fusion operators vs a driver-side replica of the reference Fuser
(`baguetter/fuser/fuser.py` formulas, incl. pre/post min-max normalization)."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from baguetter_spark.operators.fuser import ALGORITHMS, fuse

# runs fixture: (query_id, run, doc_id, score) with distinct scores (the
# reference's tie order is dict-insertion dependent — avoided here)
RUNS = [
    ("q1", "bm25", "d1", 9.0),
    ("q1", "bm25", "d2", 7.5),
    ("q1", "bm25", "d3", 5.0),
    ("q1", "bm25", "d4", 2.0),
    ("q1", "dense", "d2", 0.93),
    ("q1", "dense", "d5", 0.81),
    ("q1", "dense", "d1", 0.54),
    ("q2", "bm25", "d6", 3.0),
    ("q2", "bm25", "d7", 1.5),
    ("q2", "dense", "d7", 0.7),
    ("q2", "dense", "d8", 0.2),
]

WEIGHTS = {"bm25": 0.7, "dense": 1.3}


def reference_fuse(rows, algorithm, weights=None, top_k=100):
    """Driver-side replica of fuser.py:22-178 on (run -> sorted results)."""
    by_query = defaultdict(lambda: defaultdict(list))
    for q, run, d, s in rows:
        by_query[q][run].append((d, s))
    out = {}
    for q, runs in by_query.items():
        names = sorted(runs)  # deterministic run order
        results = []
        for name in names:
            items = sorted(runs[name], key=lambda t: -t[1])
            keys = [d for d, _ in items]
            scores = np.array([s for _, s in items], dtype=np.float64)
            mn, mx = scores.min(), scores.max()
            nscores = (scores - mn) / max(mx - mn, 1e-9)
            results.append((keys, nscores))
        w = [weights[n] for n in names] if weights else [1.0] * len(names)
        fused = defaultdict(float)
        if algorithm == "reciprocal_rank":
            for keys, ns in results:
                for r, (d, s) in enumerate(zip(keys, ns)):
                    fused[d] += 1 / (r + s)
        elif algorithm == "weighted":
            for wi, (keys, ns) in zip(w, results):
                for d, s in zip(keys, ns):
                    fused[d] += wi * s
        elif algorithm == "weighted_reciprocal_rank":
            for wi, (keys, ns) in zip(w, results):
                for r, (d, s) in enumerate(zip(keys, ns)):
                    fused[d] += (1 / (r + s)) * wi
        elif algorithm == "comb_sum":
            for keys, ns in results:
                for d, s in zip(keys, ns):
                    fused[d] += s
        elif algorithm == "comb_mnz":
            cnt = defaultdict(int)
            for keys, ns in results:
                for d, s in zip(keys, ns):
                    fused[d] += s
                    cnt[d] += 1
            for d in fused:
                fused[d] *= cnt[d]
        elif algorithm == "borda_count":
            for keys, _ in results:
                n = len(keys)
                for r, d in enumerate(keys):
                    fused[d] += n - r
        elif algorithm == "z_score":
            for keys, ns in results:
                z = (ns - np.mean(ns)) / np.std(ns)
                for d, zi in zip(keys, z):
                    fused[d] += zi
        elif algorithm == "isr":
            for keys, _ in results:
                for r, d in enumerate(keys, start=1):
                    fused[d] += 1 / r**2
        elif algorithm == "median_rank":
            ranks = defaultdict(list)
            for keys, _ in results:
                for r, d in enumerate(keys, start=1):
                    ranks[d].append(r)
            fused = {d: float(np.median(rs)) for d, rs in ranks.items()}
        ordered = sorted(fused.items(), key=lambda t: (-t[1], t[0]))[:top_k]
        n_runs = len(results)
        out[q] = [(d, s / max(n_runs, 1e-9)) for d, s in ordered]
    return out


@pytest.mark.parametrize("algorithm", ALGORITHMS)
def test_fusion_matches_reference_semantics(spark, algorithm):
    runs_df = spark.createDataFrame(
        pd.DataFrame(RUNS, columns=["query_id", "run", "doc_id", "score"])
    )
    weights = WEIGHTS if "weighted" in algorithm else None
    got = fuse(runs_df, algorithm, weights=weights, top_k=100).collect()
    by_q = defaultdict(list)
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q[r["query_id"]].append((r["doc_id"], r["score"]))
    expected = reference_fuse(RUNS, algorithm, weights=weights)
    assert set(by_q) == set(expected)
    for q in expected:
        assert [d for d, _ in by_q[q]] == [d for d, _ in expected[q]], (
            algorithm,
            q,
            by_q[q],
            expected[q],
        )
        for (_, gs), (_, es) in zip(by_q[q], expected[q]):
            assert abs(gs - es) < 1e-9


def test_top_k_truncation(spark):
    runs_df = spark.createDataFrame(
        pd.DataFrame(RUNS, columns=["query_id", "run", "doc_id", "score"])
    )
    got = fuse(runs_df, "comb_sum", top_k=2).collect()
    per_q = defaultdict(int)
    for r in got:
        per_q[r["query_id"]] += 1
    assert all(v == 2 for v in per_q.values())
