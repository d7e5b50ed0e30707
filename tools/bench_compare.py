"""Calibration-normalized cross-round bench comparison.

Raw wall-clock is NOT comparable across rounds on this host: the VM's
effective CPU speed varies 1.3-2.6x within/between sessions (control
experiment in BASELINE.md — identical code re-measured 92-106 s vs a
recorded 69.9 s).  ``bench.py`` therefore emits a ``calibration`` block
(fixed single-core Python loop + fixed Spark shuffle round) with every
run; this tool divides the new run's per-query walls by the machine-speed
ratio implied by the calibration blocks before comparing.

The spark_shuffle_ms probe is the normalizer (it exercises the same
JVM+shuffle path the queries do); py_loop_ms is reported as a sanity
cross-check.  Same-session A/B remains the standard for optimization
claims — this normalization only bounds cross-round drift claims.

Usage:
  python tools/bench_compare.py OLD_BENCH.json NEW_BENCH.json [--md]

Accepts either a raw bench.py stdout line or a driver BENCH_r{N}.json
record (whose ``tail`` field holds a possibly front-truncated JSON tail —
per-query pairs are recovered by regex).
"""

from __future__ import annotations

import json
import re
import statistics
import sys


# Recorded cross-run noise band for single-run per-query walls on this
# VM (SCALE.md round-7 noise section: same-code sibling runs spread
# p10/p90 = 0.68/1.57x, with individual queries seen at 4-5x on VM
# stalls). A SINGLE-run per-query ratio inside this band is noise, not
# evidence — compare() refuses to call it a regression (VERDICT r07
# item 7). Min-of-N runs (bench.py --runs 2+) tighten per-query evidence
# and are exempt.
SINGLE_RUN_NOISE_P90 = 1.57


def load_bench(path: str) -> dict:
    """Return {'queries': {name: sec}, 'calibration': {...},
    'queries_runs': {...}|None, 'n_runs': int} from either a bench.py
    JSON line or a driver record with a truncated 'tail'."""
    with open(path) as f:
        raw = f.read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = {"tail": raw}
    if "queries" in d and isinstance(d["queries"], dict) and d["queries"]:
        return {
            "queries": d["queries"],
            "calibration": d.get("calibration"),
            "queries_runs": d.get("queries_runs"),
            "n_runs": d.get("n_runs", 1),
        }
    tail = d.get("tail", "")
    queries = {
        m.group(1): float(m.group(2))
        for m in re.finditer(r'"(q[0-9]+[a-z_0-9]*)":\s*([0-9.]+)', tail)
    }
    cal = None
    mc = re.search(
        r'"calibration":\s*(\{[^}]*\})', tail
    )
    if mc:
        cal = json.loads(mc.group(1))
    mn = re.search(r'"n_runs":\s*(\d+)', tail)
    return {
        "queries": queries,
        "calibration": cal,
        "queries_runs": None,
        "n_runs": int(mn.group(1)) if mn else 1,
    }


def compare(old: dict, new: dict) -> dict:
    co, cn = old.get("calibration"), new.get("calibration")
    if not (co and cn):
        raise SystemExit("both runs need calibration blocks to normalize")
    speed_ratio = cn["spark_shuffle_ms"] / co["spark_shuffle_ms"]
    py_ratio = cn["py_loop_ms"] / co["py_loop_ms"]
    common = sorted(set(old["queries"]) & set(new["queries"]))
    # a per-query ratio is regression EVIDENCE only when both sides are
    # min-of-N (n_runs >= 2) or the ratio clears the recorded single-run
    # noise band — otherwise it's a "possible-noise" observation
    min_of_n = min(old.get("n_runs", 1), new.get("n_runs", 1)) >= 2
    rows = []
    for q in common:
        o, n = old["queries"][q], new["queries"][q]
        norm = round((n / speed_ratio) / o, 2) if o else None
        verdict = None
        if norm is not None and norm > 1.0:
            if min_of_n or norm > SINGLE_RUN_NOISE_P90:
                verdict = "regression"
            else:
                verdict = "inside-single-run-noise-band"
        rows.append(
            {
                "query": q,
                "old_s": o,
                "new_s": n,
                "raw_ratio": round(n / o, 2) if o else None,
                "norm_ratio": norm,
                "verdict": verdict,
            }
        )
    norm = [r["norm_ratio"] for r in rows if r["norm_ratio"]]
    tot_o = sum(old["queries"][q] for q in common)
    tot_n = sum(new["queries"][q] for q in common)
    if not common or tot_o == 0 or not norm:
        # rotated-apart query sets (or a truncated tail recovery) can
        # leave no comparable queries — report that instead of crashing
        return {
            "n_common": len(common),
            "speed_ratio_shuffle": round(speed_ratio, 3),
            "speed_ratio_pyloop": round(py_ratio, 3),
            "total_old_s": round(tot_o, 1),
            "total_new_s": round(tot_n, 1),
            "total_raw_ratio": None,
            "total_norm_ratio": None,
            "median_norm_ratio": None,
            "min_of_n_evidence": min_of_n,
            "regressions": [],
            "worst": [],
            "rows": rows,
            "note": "no comparable queries between the two runs",
        }
    return {
        "n_common": len(common),
        "speed_ratio_shuffle": round(speed_ratio, 3),
        "speed_ratio_pyloop": round(py_ratio, 3),
        "total_old_s": round(tot_o, 1),
        "total_new_s": round(tot_n, 1),
        "total_raw_ratio": round(tot_n / tot_o, 3),
        "total_norm_ratio": round(tot_n / speed_ratio / tot_o, 3),
        "median_norm_ratio": round(statistics.median(norm), 2),
        "min_of_n_evidence": min_of_n,
        # only rows with a REGRESSION verdict (min-of-N evidence, or a
        # single-run ratio beyond the recorded noise band) — the list a
        # round's "what regressed" claim may cite
        "regressions": sorted(
            (r for r in rows if r["verdict"] == "regression"),
            key=lambda r: -(r["norm_ratio"] or 0),
        )[:10],
        "worst": sorted(
            rows, key=lambda r: -(r["norm_ratio"] or 0)
        )[:5],
        "rows": rows,
    }


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    md = "--md" in sys.argv
    old, new = load_bench(args[0]), load_bench(args[1])
    rep = compare(old, new)
    if md:
        print(
            f"| common queries | {rep['n_common']} | machine ratio (shuffle probe) "
            f"{rep['speed_ratio_shuffle']}x, py-loop {rep['speed_ratio_pyloop']}x |"
        )
        print(
            f"| total | {rep['total_old_s']} s -> {rep['total_new_s']} s | raw "
            f"{rep['total_raw_ratio']}x, normalized {rep['total_norm_ratio']}x "
            f"(median query {rep['median_norm_ratio']}x) |"
        )
        for r in rep["worst"]:
            print(
                f"| worst: {r['query']} | {r['old_s']} -> {r['new_s']} s | raw "
                f"{r['raw_ratio']}x, normalized {r['norm_ratio']}x |"
            )
    else:
        print(json.dumps({k: v for k, v in rep.items() if k != "rows"}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
