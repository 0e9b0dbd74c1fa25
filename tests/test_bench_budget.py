"""The bench regression gate (bench.py:budget_offenders): catches multi-x
per-query blow-ups, exempts sub-second jitter, ignores unknown names."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import HEADLINE, budget_offenders  # noqa: E402


def test_flags_only_real_blowups():
    budget = {"queries": {"a": 2.0, "b": 5.0, "c": 0.4}}
    timings = {
        "a": 6.5,   # 3.25x  -> offender
        "b": 14.9,  # 2.98x  -> fine
        "c": 9.0,   # sub-second budget -> exempt by floor
        "d": 99.0,  # not budgeted -> ignored
    }
    out = budget_offenders(timings, budget, factor=3.0)
    assert out == [("a", 6.5, 2.0, 3.0)]


def test_empty_when_within_budget():
    budget = {"queries": {"a": 2.0}}
    assert budget_offenders({"a": 5.9}, budget, factor=3.0) == []


def test_committed_budget_file_covers_headline():
    """BENCH_BUDGET.json must keep covering the (growing) headline set —
    a new headline entry with no budget would silently escape the gate.
    New entries get a budget on the next intentional refresh; allow a
    small lag but not drift."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_BUDGET.json")) as f:
        budget = json.load(f)
    missing = [n for n in HEADLINE if n not in budget["queries"]]
    assert len(missing) <= 5, f"refresh BENCH_BUDGET.json; unbudgeted: {missing}"
    assert budget["factor"] >= 1.5


def test_per_query_factors_tighten_the_ceiling():
    """budget["factors"] overrides the global factor per query: a low-variance
    query at 2.0x must fire at 2.5x-of-budget even when the global factor
    is 3.0; unlisted queries keep the global ceiling."""
    budget = {"queries": {"tight": 2.0, "loose": 2.0}, "factors": {"tight": 2.0}}
    timings = {"tight": 5.0, "loose": 5.0}  # both 2.5x of budget
    out = budget_offenders(timings, budget, factor=3.0)
    assert out == [("tight", 5.0, 2.0, 2.0)]


def test_committed_factors_hold_for_all_recorded_runs():
    """Zero false-positive trips: every per-query ceiling must clear every
    observation it was derived from, with the calibrator's minimum 30%
    headroom over the worst one (r8 design: ceiling = max(2*median,
    1.3*max, max+1s) over builder AND driver run history — see
    tools/calibrate_bench_budget.py). The latest local run is re-checked
    directly as the freshest observation."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_BUDGET.json")) as f:
        budget = json.load(f)
    with open(os.path.join(here, "BENCH_LOCAL.json")) as f:
        local = json.load(f).get("queries", {})
    for name, fct in budget.get("factors", {}).items():
        b = budget["queries"][name]
        # recorded is the max observation, so >=1.3x factor IS the headroom
        assert fct >= 1.3
        if name in local:
            assert local[name] <= fct * b, (name, local[name], fct, b)


def test_calibrator_ceilings_clear_every_era_run():
    """The calibrator's own invariant, re-derived from git history: no
    recorded run (builder or driver) may trip the committed ceilings —
    a regression here means someone hand-edited BENCH_BUDGET.json below
    an observation and the driver's next record would carry rc 1."""
    import subprocess

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(here, "tools"))
    try:
        from calibrate_bench_budget import collect_runs
    except ImportError:
        pytest.skip("calibrate_bench_budget not importable from tools/")
    probe = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=here, capture_output=True, text=True
    )
    if probe.returncode != 0:
        pytest.skip("no git repository — calibrator would refuse too")
    with open(os.path.join(here, "BENCH_BUDGET.json")) as f:
        budget = json.load(f)
    for commit, timings in collect_runs():
        offenders = budget_offenders(timings, budget, budget.get("factor", 3.0))
        assert not offenders, (commit, offenders)


def test_calibrator_check_mode_matches_committed_budget():
    """`--check --committed-only` must pass on a freshly calibrated tree
    (the committed gate file and the recomputed-from-committed-history
    budget agree) and must not rewrite the file. Hermetic by design (r9
    advice): a fresh, not-yet-adopted worktree BENCH_LOCAL.json — the
    normal state right after running bench.py — must not turn this red;
    only a COMMITTED record newer than the committed budget does.

    This doubles as the round-start driver-record ingest gate (r9 verdict
    ask #4): the driver commits its end-of-round BENCH_LOCAL.json, so the
    first full pytest of the next round fails here until the budget is
    recalibrated over it (tools/calibrate_bench_budget.py, write mode) —
    the budget/record disagreement class is structurally loud, without
    ever tripping on uncommitted worktree state."""
    import subprocess

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "BENCH_BUDGET.json")
    with open(path) as f:
        before = f.read()
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(here, "tools", "calibrate_bench_budget.py"),
            "--check",
            "--committed-only",
        ],
        capture_output=True,
        text=True,
        cwd=here,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    with open(path) as f:
        assert f.read() == before


def test_collect_runs_committed_only_excludes_worktree_record():
    """committed_only=True must never surface the synthetic "worktree"
    run id — that flag exists precisely so the agreement tests above stay
    hermetic to uncommitted bench output — while default mode may append
    at most that one extra (deduped) worktree record on top of the same
    committed history."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(here, "tools"))
    try:
        from calibrate_bench_budget import collect_runs
    except ImportError:
        pytest.skip("calibrate_bench_budget not importable from tools/")
    import subprocess

    probe = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=here, capture_output=True, text=True
    )
    if probe.returncode != 0:
        pytest.skip("no git repository — calibrator would refuse too")
    committed = collect_runs(committed_only=True)
    assert all(c != "worktree" for c, _ in committed)
    default = collect_runs()
    assert [r for r in default if r[0] != "worktree"] == committed
    assert len(default) - len(committed) in (0, 1)


def test_calibrator_rejects_unknown_arguments_without_writing():
    """Unknown argv must be an argparse error (exit 2), not a silent
    recalibration — `--help`-style invocations used to overwrite the
    committed gate file."""
    import subprocess

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "BENCH_BUDGET.json")
    with open(path) as f:
        before = f.read()
    proc = subprocess.run(
        [sys.executable, os.path.join(here, "tools", "calibrate_bench_budget.py"), "--bogus"],
        capture_output=True,
        text=True,
        cwd=here,
    )
    assert proc.returncode == 2
    with open(path) as f:
        assert f.read() == before


def test_retry_clears_unreproduced_excursion():
    """A one-off excursion (fast on retry) must clear the gate, with both
    measurements preserved and the min recorded — the r7/r8 rc-1 pattern."""
    from bench import retry_over_ceiling

    budget = {"queries": {"a": 2.0, "b": 2.0}, "factors": {"a": 2.0, "b": 2.0}}
    timings = {"a": 9.0, "b": 3.5}  # a over 4.0 ceiling; b under
    retries, offenders = retry_over_ceiling(timings, budget, 3.0, lambda n: 2.1)
    assert retries == {"a": [9.0, 2.1]}
    assert timings == {"a": 2.1, "b": 3.5}
    assert offenders == []


def test_retry_keeps_reproduced_regression_as_offender():
    """A genuine regression reproduces on the retry and must still trip."""
    from bench import retry_over_ceiling

    budget = {"queries": {"a": 2.0}, "factors": {"a": 2.0}}
    timings = {"a": 9.0}
    retries, offenders = retry_over_ceiling(timings, budget, 3.0, lambda n: 8.7)
    assert retries == {"a": [9.0, 8.7]}
    assert offenders == [("a", 8.7, 2.0, 2.0)]


def test_retry_noop_without_budget():
    from bench import retry_over_ceiling

    timings = {"a": 9.0}
    assert retry_over_ceiling(timings, None, 3.0, lambda n: 0.1) == ({}, [])
    assert timings == {"a": 9.0}


def test_floor_exempt_spike_triggers_absolute_excursion_retry():
    """The r15 shard_manifest_integrity blind spot: a query recorded at
    0.51 s (under the 1 s enforcement floor) spiked to 10.54 s on the
    driver and was never retried, so the one-off spike stood as the
    recorded max. The absolute-excursion rule must retry it — and since
    the retry comes back fast, the recorded timing is the fast one and
    the gate stays clear."""
    from bench import excursion_offenders, retry_over_ceiling

    budget = {"queries": {"shard": 0.51}, "factors": {"shard": 2.961}}
    timings = {"shard": 10.54}
    # excursion trigger fires: 10.54 > max(2.961*0.51=1.51, 0.51+5=5.51)
    assert [o[0] for o in excursion_offenders(timings, budget, 3.0)] == ["shard"]
    # ...even though the enforcement gate (floor=1.0) exempts it
    assert budget_offenders(timings, budget, 3.0) == []
    retries, offenders = retry_over_ceiling(timings, budget, 3.0, lambda n: 0.6)
    assert retries == {"shard": [10.54, 0.6]}
    assert timings == {"shard": 0.6}
    assert offenders == []


def test_subsecond_jitter_does_not_trigger_excursion_retry():
    """Multiplicative jitter on a sub-second query (0.3 s -> 1.1 s, a
    3.7x ratio but only +0.8 s absolute) must NOT trigger a retry: the
    recorded+slack term absorbs it, so the bench doesn't waste re-runs
    on scheduler noise."""
    from bench import excursion_offenders, retry_over_ceiling

    budget = {"queries": {"tiny": 0.3}, "factors": {"tiny": 2.0}}
    timings = {"tiny": 1.1}
    assert excursion_offenders(timings, budget, 3.0) == []
    retries, offenders = retry_over_ceiling(timings, budget, 3.0, lambda n: 0.3)
    assert retries == {} and offenders == []
    assert timings == {"tiny": 1.1}


def test_reproduced_floor_exempt_spike_stays_exempt_from_enforcement():
    """A floor-exempt spike that REPRODUCES on retry records the min and
    is visible in the retries map, but must not flip the enforcement
    gate — sub-second budgets stay exempt from the rc!=0 path."""
    from bench import retry_over_ceiling

    budget = {"queries": {"shard": 0.51}, "factors": {"shard": 2.961}}
    timings = {"shard": 10.54}
    retries, offenders = retry_over_ceiling(timings, budget, 3.0, lambda n: 9.8)
    assert retries == {"shard": [10.54, 9.8]}
    assert timings == {"shard": 9.8}
    assert offenders == []


def test_enforced_offender_not_retried_twice_when_also_excursion():
    """A query over BOTH triggers gets exactly one retry (union, deduped
    by name) — double re-running would skew the recorded min's meaning."""
    from bench import retry_over_ceiling

    calls = []

    def rerun(name):
        calls.append(name)
        return 2.1

    budget = {"queries": {"a": 2.0}, "factors": {"a": 2.0}}
    timings = {"a": 9.0}  # over 4.0 enforced ceiling AND over 2.0+5=7.0
    retries, offenders = retry_over_ceiling(timings, budget, 3.0, rerun)
    assert calls == ["a"]
    assert retries == {"a": [9.0, 2.1]}
    assert offenders == []


def test_unbudgeted_registration_spike_triggers_excursion_retry(capsys):
    """r16 advice: a newly registered query absent from budget["queries"]
    previously got neither ceiling nor excursion retry, so its first
    measured spike became its first recorded timing (and the next
    calibration's seed). The absolute unbudgeted threshold (2x slack =
    10 s) must retry the spike; enforcement still ignores the name."""
    from bench import excursion_offenders, retry_over_ceiling

    budget = {"queries": {"old": 2.0}, "factors": {"old": 2.0}}
    timings = {"old": 1.0, "brand_new": 30.3}  # the sql_surface_listagg shape
    assert excursion_offenders(timings, budget, 3.0) == [
        ("brand_new", 30.3, 0.0, 3.0)
    ]
    assert budget_offenders(timings, budget, 3.0) == []  # enforcement unchanged
    retries, offenders = retry_over_ceiling(timings, budget, 3.0, lambda n: 1.04)
    assert retries == {"brand_new": [30.3, 1.04]}
    assert timings["brand_new"] == 1.04
    assert offenders == []
    # the visibility line names the unbudgeted query
    assert "brand_new" in capsys.readouterr().err


def test_unbudgeted_registration_normal_timing_not_retried():
    """A new registration running at a normal multi-second pace (under
    the 10 s absolute threshold) is logged but NOT retried — the bench
    doesn't waste a re-run on every first-round query."""
    from bench import excursion_offenders, retry_over_ceiling

    budget = {"queries": {"old": 2.0}, "factors": {"old": 2.0}}
    timings = {"old": 1.0, "brand_new": 6.5}
    assert excursion_offenders(timings, budget, 3.0) == []
    retries, offenders = retry_over_ceiling(timings, budget, 3.0, lambda n: 0.1)
    assert retries == {} and offenders == []
    assert timings["brand_new"] == 6.5


def test_calibrator_ceiling_formula_term_dominance(monkeypatch):
    """Pins ceiling = max(2*median, 1.3*max, max+1s) per query, one
    synthetic history per dominance case: a stable multi-second query gets
    the 2x-median ceiling, a spiky one the 1.3x-worst ceiling, a ~1s one
    the additive +1s ceiling. recorded is always the per-query max."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(here, "tools"))
    import calibrate_bench_budget as c

    q_med, q_spike, q_small = HEADLINE[0], HEADLINE[1], HEADLINE[2]
    runs = [
        ("r1", {q_med: 10.0, q_spike: 2.0, q_small: 1.0}),
        ("r2", {q_med: 10.2, q_spike: 2.1, q_small: 1.1}),
        ("r3", {q_med: 10.4, q_spike: 9.0, q_small: 1.2}),
    ]
    monkeypatch.setattr(c, "collect_runs", lambda committed_only=False: runs)
    budget = c.compute_budget()

    def ceiling(name):
        return budget["factors"][name] * budget["queries"][name]

    assert budget["queries"][q_med] == 10.4  # recorded = max observation
    # stable: 2*median(10.2) = 20.4 beats 1.3*10.4 and 10.4+1
    assert abs(ceiling(q_med) - 20.4) < 0.05
    # spiky: 1.3*9.0 = 11.7 beats 2*median(2.1)=4.2 and 9+1
    assert abs(ceiling(q_spike) - 11.7) < 0.05
    # small: max+1 = 2.2 beats 2*median(1.1)=2.2... use strict max term
    assert abs(ceiling(q_small) - max(2 * 1.1, 1.3 * 1.2, 1.2 + 1.0)) < 0.05


def test_compact_summary_line_fits_driver_tail():
    """r18 verdict ask #2: the driver persists only a 2000-char stdout
    tail, so the final stdout line must be a complete JSON object under
    that cap even at the full 199-query registry with the real streaming
    block and a worst-case retry/offender roster. Built from the committed
    BENCH_LOCAL.json so the assertion tracks the actual registry size."""
    from bench import compact_summary_line

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_LOCAL.json")) as f:
        rec = json.load(f)
    timings = rec["queries"]
    # worst plausible roster: every recorded retry plus 10 named offenders
    retries = {k: [v, v] for k, v in list(timings.items())[:10]}
    offenders = [(k, v, v, 2.0) for k, v in list(timings.items())[:10]]
    line = compact_summary_line(
        timings, rec["value"], rec["sf"], rec["streaming"], retries, offenders
    )
    assert len(line) < 2000, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_sec"
    assert parsed["value"] == rec["value"]
    assert parsed["n_queries"] == len(timings)
    assert len(parsed["queries"]) == 10
    # the 10 kept entries are exactly the slowest 10
    slowest = sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert parsed["queries"] == {k: round(v, 3) for k, v in slowest}
    assert parsed["streaming"] == rec["streaming"]


def test_compact_summary_line_degrades_rather_than_overflow():
    """Pathologically long query names must trigger the headline-only
    fallback, never an over-limit line."""
    from bench import compact_summary_line

    timings = {("q" * 400) + str(i): float(i) for i in range(12)}
    line = compact_summary_line(timings, 66.0, 0.1, {}, {}, [], limit=2000)
    assert len(line) < 2000
    parsed = json.loads(line)
    assert parsed["n_queries"] == 12 and parsed["value"] == 66.0
    assert "queries" not in parsed
