"""The driver captures bench.py's single stdout JSON line with a
bounded buffer (observed: a 2000-char tail; r4-r6's 5k+ lines came
back `parsed: null` while r2/r3's ~2k lines parsed). This pins the
printed line's budget against the committed full payload so adding
queries can't silently push the line past the driver's capture again.

No Spark needed — pure payload-shaping logic.
"""

import json
import os

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LINE_BUDGET = 2000


def test_compact_line_under_budget_on_committed_payload():
    with open(os.path.join(REPO, "BENCH_local.json")) as fh:
        payload = json.load(fh)
    line = json.dumps(bench.compact_line(payload), separators=(",", ":"))
    assert len(line) < LINE_BUDGET, (
        f"bench stdout line is {len(line)} chars; the driver's capture "
        f"truncated every line over ~2k (BENCH_r04-r06 parsed: null). "
        f"Move detail into BENCH_local.json, not the printed line."
    )
    # and it round-trips as strict JSON (no NaN/Infinity)
    parsed = json.loads(line, parse_constant=lambda c: (_ for _ in ()).throw(ValueError(c)))
    assert parsed["metric"] == payload["metric"]
    # near-full coverage: at most ~12% of the CHEAPEST queries may be
    # dropped from the line (explicitly counted; full dict is in
    # BENCH_local.json) — every multi-second query must be on the line.
    # The bound scales with corpus size: the char budget is fixed, so a
    # growing registry necessarily drops more of the sub-second tail.
    assert parsed["queries_omitted"] <= max(15, parsed["queries_n"] // 8)
    assert parsed["queries_n"] == len(payload["queries"])
    assert len(parsed["queries"]) + parsed["queries_omitted"] == parsed["queries_n"]
    slowest = sorted(payload["queries"].values())[-20:]
    assert all(
        any(abs(v - s) < 0.011 for v in parsed["queries"].values()) for s in slowest
    )


def test_compact_line_degrades_costliest_first():
    """Worst case (200 double-digit-second queries) exceeds the budget;
    the line must stay parseable, drop only the CHEAPEST queries, and
    say how many it dropped."""
    payload = {
        "metric": "declared_query_suite_total",
        "value": 9999.999,
        "unit": "sec",
        "queries": {
            f"q{i:03d}_some_long_query_name": 88.88 + i for i in range(200)
        },
        "spread_ok": {f"q{i:03d}": True for i in range(200)},
        "cache": {"cold_sec": 12.345, "hit_sec": 0.567},
        "sf": 0.1,
        "runs": 3,
        "agg": "median",
    }
    out = bench.compact_line(payload)
    line = json.dumps(out, separators=(",", ":"))
    assert len(line) < LINE_BUDGET
    assert out["queries_n"] == 200
    assert out["queries_omitted"] == 200 - len(out["queries"])
    assert 0 < out["queries_omitted"] < 200
    # the omitted ones are exactly the cheapest
    kept_costs = sorted(out["queries"].values())
    assert kept_costs[0] > 88.88 + out["queries_omitted"] - 1 - 1e-9
