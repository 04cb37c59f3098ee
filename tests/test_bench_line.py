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
    # near-full coverage: only the CHEAPEST tail may be dropped from
    # the line (explicitly counted; full dict is in BENCH_local.json)
    # — every multi-second query must be on the line. The bound is
    # bench.max_omitted, a single policy shared with the emitter so
    # the two cannot drift (r10: a hand-scaled copy here failed by 1).
    assert parsed["queries_omitted"] <= bench.max_omitted(parsed["queries_n"])
    assert parsed["queries_n"] == len(payload["queries"])
    assert len(parsed["queries"]) + parsed["queries_omitted"] == parsed["queries_n"]
    slowest = sorted(payload["queries"].values())[-20:]
    # each must appear exactly as the emitter renders it (1 decimal
    # below 10s, 2 at or above — r11 compaction policy)
    rendered = set(parsed["queries"].values())
    assert all(
        (round(s, 2) if s >= 10 else round(s, 1)) in rendered for s in slowest
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


def test_child_retry_records_first_crash(monkeypatch):
    """A child that crashes once and passes on retry must land in
    CHILD_RETRIES (→ payload["child_retries"]): a crash-then-pass round
    is JVM-instability evidence the judge should see, not silently
    replaced numbers (ADVICE r7 / VERDICT r8 item 8). Also pins the
    ADVICE r8 first_rc initialization: the recorded entry carries the
    actual first-attempt return code."""

    class FakeResult:
        def __init__(self, rc):
            self.returncode = rc

    calls = {"n": 0}

    def fake_run(cmd, stdout=None):
        calls["n"] += 1
        return FakeResult(137 if calls["n"] == 1 else 0)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "CHILD_RETRIES", [])
    bench._run_child(["--slice", "0", "1", "/tmp/x.json"])
    assert calls["n"] == 2
    assert bench.CHILD_RETRIES == [
        {"args": ["--slice", "0", "1", "/tmp/x.json"], "first_attempt_rc": 137}
    ]


def test_child_failing_twice_raises(monkeypatch):
    class FakeResult:
        returncode = 1

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: FakeResult())
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "CHILD_RETRIES", [])
    import pytest

    with pytest.raises(RuntimeError, match="failed twice"):
        bench._run_child(["--cache", "/tmp/y.json"])
    assert bench.CHILD_RETRIES == []


# --- round-12 probe rotation (wall-budget guard, VERDICT r11 #1) ----------


def test_probe_rotation_stalest_first_and_self_correcting():
    """Deferred units strictly gain priority: simulate rounds at a
    fixed budget and assert every unit is measured within 3 rounds of
    its last run (no starvation), the selection is deterministic, and
    the stalest unit always wins a slot it fits in."""
    units = {f"q{i:03d}": {"last_seq": 0, "cost_sec": 100.0} for i in range(10)}
    units["skew"] = {"last_seq": 0, "cost_sec": 600.0}
    state = {"seq": 0, "units": units}
    names = sorted(units)
    for rnd in range(1, 7):
        sel, defer = bench.select_probe_units(state, names, 700.0)
        assert sel, "budget of 700 must fit at least one unit"
        # stalest-first: nothing selected is fresher than something
        # deferred-that-would-fit
        min_sel = min(state["units"][u]["last_seq"] for u in sel)
        for d in defer:
            assert state["units"][d]["last_seq"] >= min_sel or (
                state["units"][d]["cost_sec"] > 700.0
            )
        for u in sel:
            state["units"][u]["last_seq"] = rnd
    staleness = {u: 6 - v["last_seq"] for u, v in state["units"].items()}
    assert max(staleness.values()) <= 3, f"starved units: {staleness}"


def test_probe_rotation_expensive_units_do_not_starve():
    """Equal staleness → cost-descending: the 600s skew unit must be
    taken FIRST at a uniform state, not squeezed out by cheap units."""
    units = {f"q{i:03d}": {"last_seq": 0, "cost_sec": 50.0} for i in range(20)}
    units["skew"] = {"last_seq": 0, "cost_sec": 600.0}
    sel, _ = bench.select_probe_units(
        {"seq": 0, "units": units}, sorted(units), 700.0
    )
    assert sel[0] == "skew"


def test_probe_rotation_never_measured_first():
    """A unit with no state entry (new probe this round) outranks every
    previously measured unit."""
    units = {"q_old": {"last_seq": 5, "cost_sec": 10.0}}
    sel, _ = bench.select_probe_units(
        {"seq": 5, "units": units}, ["q_old", "q_new"], 10_000.0
    )
    assert sel[0] == "q_new"


def test_probe_rotation_zero_budget_defers_everything():
    units = {"a": {"last_seq": 0, "cost_sec": 50.0}}
    sel, defer = bench.select_probe_units(
        {"seq": 0, "units": units}, ["a"], 0.0
    )
    assert sel == [] and defer == ["a"]


def test_probe_state_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(
        bench, "PROBE_STATE_PATH", str(tmp_path / "state.json")
    )
    assert bench.load_probe_state() == {"seq": 0, "units": {}}
    st = {"seq": 3, "units": {"skew": {"last_seq": 3, "cost_sec": 601.4}}}
    bench.save_probe_state(st)
    assert bench.load_probe_state() == st
