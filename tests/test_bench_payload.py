"""Driver-tail survivability of bench.py's JSON payload (VERDICT r06
item 7).

The driver records only the last ~2 KB of bench.py's stdout. With ~206
per-query timings the JSON line is ~8 KB, so the FRONT is cut: the
payload must keep every headline key (metric/unit/value, n_queries,
n_skipped, truncated, calibration, sf) in the surviving tail, and
tools/bench_compare.load_bench must recover the calibration block and
the tail's per-query pairs from the cut string.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench import BENCH_SKIP, build_payload  # noqa: E402
from bench_compare import load_bench  # noqa: E402

TAIL_BYTES = 2048  # driver keeps ~2 KB; headline keys must fit well inside


def _fake_run(n_queries: int = 206) -> str:
    """A payload line shaped like a real trimmed sf0.1 run."""
    times = {f"q{i:03d}_some_operator_name": round(0.5 + (i % 17) * 0.173, 3) for i in range(n_queries)}
    calibration = {"py_loop_ms": 512.3, "spark_shuffle_ms": 781.7}
    payload = build_payload(
        times, dict(BENCH_SKIP), calibration, 0.1, False, "benched_query_wall_sec"
    )
    return "\n" + json.dumps(payload)


def test_payload_headline_keys_survive_tail_cut():
    line = _fake_run()
    assert len(line) > TAIL_BYTES, "test must exercise a genuine front cut"
    tail = line[-TAIL_BYTES:]
    # headline keys are emitted LAST so they live in the tail verbatim
    for key in (
        '"calibration"',
        '"sf"',
        '"n_queries"',
        '"n_skipped"',
        '"truncated"',
        '"metric"',
        '"unit"',
        '"value"',
    ):
        assert key in tail, f"{key} fell off the driver's 2KB tail"
    # and the metric/value pair is regex-recoverable with exact values
    import re

    m = re.search(r'"metric":\s*"([a-z_]+)".*"value":\s*([0-9.]+)', tail)
    assert m and m.group(1) == "benched_query_wall_sec"
    full = json.loads(line)
    assert float(m.group(2)) == full["value"]


def test_bench_compare_recovers_from_truncated_tail(tmp_path):
    line = _fake_run()
    tail = line[-TAIL_BYTES:]
    p = tmp_path / "BENCH_tail.json"
    p.write_text(tail)
    rec = load_bench(str(p))
    assert rec["calibration"] == {"py_loop_ms": 512.3, "spark_shuffle_ms": 781.7}
    # the tail holds the LAST per-query pairs; all recovered pairs must
    # carry the true values from the full payload
    full = json.loads(line)["queries"]
    assert rec["queries"], "no per-query pairs recovered from the tail"
    for q, sec in rec["queries"].items():
        assert q in full and full[q] == sec


def test_trimmed_metric_name_is_not_comparable_with_full_registry():
    """ADVICE r06: a run that skips queries must NOT publish under the
    rounds-1-5 full-registry metric name."""
    times = {"q01_pricing_summary": 1.0}
    trimmed = build_payload(times, dict(BENCH_SKIP), {}, 0.1, False, "benched_query_wall_sec")
    full = build_payload(times, {}, {}, 0.1, False, "total_query_wall_sec")
    assert trimmed["metric"] != "total_query_wall_sec"
    assert trimmed["n_skipped"] == len(BENCH_SKIP) > 0
    assert full["metric"] == "total_query_wall_sec" and full["n_skipped"] == 0


def test_headline_keys_are_last_in_serialization_order():
    payload = build_payload({}, {}, {}, 0.1, False, "benched_query_wall_sec")
    keys = list(payload)
    assert keys[-3:] == ["metric", "unit", "value"]
    assert keys.index("queries") < keys.index("calibration") < keys.index("metric")


def test_multi_run_payload_min_and_tail_safety():
    """--runs N: 'queries' holds the per-query min; the bulky
    'queries_runs' block rides FIRST so a tail cut eats samples before
    headline keys; n_runs survives in the tail."""
    times = {f"q{i:03d}_x": 1.0 for i in range(206)}
    runs = {f"q{i:03d}_x": [1.4, 1.0] for i in range(206)}
    payload = build_payload(
        times, dict(BENCH_SKIP), {"py_loop_ms": 1, "spark_shuffle_ms": 1},
        0.1, False, "benched_query_wall_sec", all_runs=runs, n_runs=2,
    )
    keys = list(payload)
    assert keys[0] == "queries_runs" and keys[-1] == "value"
    line = "\n" + json.dumps(payload)
    tail = line[-TAIL_BYTES:]
    for key in ('"n_runs"', '"metric"', '"value"'):
        assert key in tail


def test_bench_compare_refuses_single_run_noise_verdicts(tmp_path):
    """A single-run per-query ratio inside the recorded noise band is
    'inside-single-run-noise-band', never 'regression'; min-of-2 runs
    make the same ratio regression evidence (VERDICT r07 item 7)."""
    from bench_compare import SINGLE_RUN_NOISE_P90, compare

    cal = {"py_loop_ms": 100.0, "spark_shuffle_ms": 100.0}
    old = {"queries": {"q1_a": 1.0, "q2_b": 1.0}, "calibration": cal, "n_runs": 1}
    new = {"queries": {"q1_a": 1.4, "q2_b": 3.0}, "calibration": cal, "n_runs": 1}
    rep = compare(old, new)
    by_q = {r["query"]: r for r in rep["rows"]}
    assert by_q["q1_a"]["verdict"] == "inside-single-run-noise-band"
    assert by_q["q2_b"]["verdict"] == "regression"  # beyond the band
    assert [r["query"] for r in rep["regressions"]] == ["q2_b"]
    assert 1.4 < SINGLE_RUN_NOISE_P90 < 3.0
    # min-of-2 evidence: the same 1.4x ratio becomes a real verdict
    old2 = dict(old, n_runs=2)
    new2 = dict(new, n_runs=2)
    rep2 = compare(old2, new2)
    by_q2 = {r["query"]: r for r in rep2["rows"]}
    assert by_q2["q1_a"]["verdict"] == "regression"
    assert rep2["min_of_n_evidence"] is True
