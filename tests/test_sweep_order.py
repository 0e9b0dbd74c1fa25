"""Guards for the driver-sweep rotation in __spark_entry__ (no Spark).

The driver sweeps ``queries()`` in dict order under a ~50-query cap, so the
ordering IS the coverage policy: FRESH impl changes first (a closure blob
no driver-record tree has ever seen, by targetedness), then old drift and
the unchanged tail together in oldest-last-green order, then
least-checked, then seniority. Fingerprints are git blob SHAs of the
query's module closure vs the tree at the commit that ADDED its last
green CORRECTNESS record. These tests pin the contract against the real
CORRECTNESS_r* files in the repo root plus synthetic fingerprint
scenarios.
"""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entry_mod
from flink_stream_processing_spark import queries as q

_PKG = "flink_stream_processing_spark"


def _green_rows() -> tuple[dict[str, int], dict[str, str], dict[str, int]]:
    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    counts: dict[str, int] = {}
    last: dict[str, str] = {}
    rounds: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        base = os.path.basename(path)
        rnd = int(base[len("CORRECTNESS_r") : -len(".json")])
        with open(path) as f:
            for name, row in json.load(f).items():
                # green rows only — a failed row queues the query for a
                # re-verifying sweep (mirrors _sweep_order)
                if (
                    isinstance(row, dict)
                    and not row.get("err")
                    and row.get("rows_match") is not False
                    and row.get("schema_match") is not False
                    and row.get("hash_match") is not False
                ):
                    counts[name] = counts.get(name, 0) + 1
                    last[name] = base
                    rounds[name] = rnd
    return counts, last, rounds


def test_queries_is_complete_permutation():
    names = list(entry_mod.queries())
    assert sorted(names) == sorted(q.QUERIES)
    assert len(names) == len(set(names))


def _max_record_round() -> int:
    """Newest CORRECTNESS file round by FILENAME (not newest green row —
    an all-red record must still age every cohort; r12 review fix)."""
    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    rounds = [0]
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        base = os.path.basename(path)
        try:
            rounds.append(int(base[len("CORRECTNESS_r") : -len(".json")]))
        except ValueError:
            pass
    return max(rounds)


def _critical(rounds: dict[str, int]) -> set[str]:
    """Mirror of the tier-0 computation in entry_mod._sweep_order —
    including its restriction to REGISTERED names (`for n in names`): a
    deregistered row lives on in the CORRECTNESS history but holds no
    sweep slot (the r19 swap is exactly the vacate-a-slot move the
    worked example's arithmetic relies on)."""
    next_round = 1 + _max_record_round()
    ceiling = -(-len(q.QUERIES) // entry_mod._SWEEP_CAP)
    return {
        n
        for n, r in rounds.items()
        if n in q.QUERIES and next_round - r >= ceiling
    }


def test_invariant_critical_rows_lead_the_sweep_oldest_first():
    """Tier 0 (r12): any query whose last green row would reach the
    ceil(N/50)-round freshness ceiling if the upcoming sweep skipped it
    precedes EVERYTHING — fresh code changes included (the r12 wide
    refactor flagged 113 fresh closures; strict fresh-first would have
    stranded the 22-row r7 cohort past the invariant). Oldest last-green
    first within the tier."""
    counts, last, rounds = _green_rows()
    critical = _critical(rounds)
    names = list(entry_mod.queries())
    if not critical:
        return  # freshly swept tree — nothing at the boundary
    last_crit = max(names.index(n) for n in critical)
    assert last_crit == len(critical) - 1, (
        "critical rows must occupy a contiguous leading block"
    )
    crit_rounds = [rounds[n] for n in names[: len(critical)]]
    assert crit_rounds == sorted(crit_rounds)


def test_fresh_queries_sweep_before_everything_else_except_critical():
    """Every FRESH query (a closure blob no driver record tree has seen —
    an edit since the last sweep, or never-green) precedes every non-fresh
    query outside the invariant-critical tier. Old drift deliberately does
    NOT get this priority: it merges with the unchanged tail in staleness
    order (an unchanged query with an r4 green row needs the slot more
    than a drift query re-greened in r6)."""
    counts, last, rounds = _green_rows()
    changed, fresh = entry_mod._changed_and_fresh(list(q.QUERIES), last)
    for n in q.QUERIES:
        if counts.get(n, 0) == 0:
            fresh.add(n)
    critical = _critical(rounds)
    names = [n for n in entry_mod.queries() if n not in critical]
    fresh -= critical
    if not fresh:
        return  # nothing edited since the last sweep — nothing to pin
    last_fresh = max(names.index(n) for n in fresh)
    non_fresh = [n for n in names if n not in fresh]
    if non_fresh:
        first_non_fresh = min(names.index(n) for n in non_fresh)
        assert last_fresh < first_non_fresh


def test_order_is_sorted_by_the_priority_key():
    """The emitted order is exactly the documented key: (not-critical,
    round-if-critical, not-fresh, -targetedness-if-fresh,
    last-green-round, -targetedness, checked-count, seniority, registry
    position)."""
    counts, last, rounds = _green_rows()
    changed, fresh = entry_mod._changed_and_fresh(list(q.QUERIES), last)
    for n in q.QUERIES:  # never-green queries outrank everything (inf score)
        if counts.get(n, 0) == 0:
            changed[n] = float("inf")
            fresh.add(n)
    critical = _critical(rounds)
    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    with open(os.path.join(here, "QUERY_LEDGER.json")) as f:
        seniority = {n: i for i, n in enumerate(json.load(f))}
    pos = {n: i for i, n in enumerate(q.QUERIES)}
    names = list(entry_mod.queries())
    keys = [
        (
            n not in critical,
            rounds.get(n, 0) if n in critical else 0,
            n not in fresh,
            -changed.get(n, 0.0) if n in fresh else 0.0,
            rounds.get(n, 0),
            -changed.get(n, 0.0),
            counts.get(n, 0),
            seniority.get(n, len(seniority)),
            pos[n],
        )
        for n in names
    ]
    assert keys == sorted(keys), "queries() order must follow the priority key"


def test_old_drift_changes_queue_by_staleness_not_targetedness():
    """The r8 fresh/drift split: changed queries whose working-tree blobs
    all appear in some prior driver-record tree (old drift — sibling
    queries have swept green against them for rounds) order by last-green
    round, so shared-module drift cannot starve the r02/r03 staleness
    tail out of the 50-slot sweep budget."""
    counts, last, rounds = _green_rows()
    changed, fresh = entry_mod._changed_and_fresh(list(q.QUERIES), last)
    drift = [n for n in changed if n not in fresh and counts.get(n, 0) > 0]
    if len(drift) < 2:
        return  # tree too clean to exercise the split
    names = list(entry_mod.queries())
    drift_rounds = [rounds[n] for n in names if n in set(drift)]
    assert drift_rounds == sorted(drift_rounds)


def test_unchanged_queries_sweep_oldest_green_row_first():
    """Staleness burn-down (r8): among unchanged-and-checked queries, last
    green rounds are non-decreasing down the sweep — a query last greened
    in r02 must precede one last greened in r06, regardless of how many
    total green rows each has."""
    counts, last, rounds = _green_rows()
    changed = entry_mod._changed_since_last_green(list(q.QUERIES), last)
    names = list(entry_mod.queries())
    unchanged_rounds = [
        rounds[n] for n in names if n not in changed and n in rounds
    ]
    assert unchanged_rounds == sorted(unchanged_rounds)


def test_record_commit_anchor_is_the_add_commit():
    """_blob_shas_at_record_commit anchors on the commit that ADDED the
    record file, so a later incidental touch (reformat, snapshot amend)
    cannot advance the staleness baseline past intervening code changes.
    Verified against git directly for a record old enough to have seen
    later snapshot commits."""
    import subprocess

    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    probe = subprocess.run(
        ["git", "log", "--diff-filter=A", "-1", "--format=%H", "--",
         "CORRECTNESS_r02.json"],
        cwd=here, capture_output=True, text=True,
    )
    if probe.returncode != 0 or not probe.stdout.strip():
        return  # no git / shallow history — fallback path covers it
    add_commit = probe.stdout.strip()
    listing = subprocess.run(
        ["git", "ls-tree", "-r", add_commit, "--", _PKG],
        cwd=here, capture_output=True, text=True,
    ).stdout
    expected = {}
    prefix = entry_mod._git_prefix()
    for line in listing.splitlines():
        meta, path = line.split("\t", 1)
        if prefix and path.startswith(prefix):
            path = path[len(prefix):]
        expected[path] = meta.split()[2]
    got = entry_mod._blob_shas_at_record_commit("CORRECTNESS_r02.json")
    assert got == expected


def test_ledger_self_heals_with_new_names():
    """queries() appends registry names missing from the ledger, so the
    ledger IS the registration history going forward."""
    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    with open(os.path.join(here, "QUERY_LEDGER.json")) as f:
        ledger = json.load(f)
    assert set(ledger) >= set(q.QUERIES)
    assert len(ledger) == len(set(ledger))


def test_oracle_cover_matches_registry():
    assert sorted(entry_mod.oracle_sql()) == sorted(q.QUERIES)


def test_ledger_write_guarded_for_dry_runs(monkeypatch, tmp_path):
    """SPARK_GRAFT_LEDGER_READONLY=1 must suppress the self-heal WRITE
    (the r14 ADVICE side effect: a dry run that decorates prepared
    queries at runtime committed their names in dry-run order) while the
    in-memory seniority map still covers the extra names. The entry
    module's ledger path is monkeypatched at a COPY in tmp_path, so even
    a guard REGRESSION writes only the copy — the committed
    QUERY_LEDGER.json is never at risk (r15 ADVICE)."""
    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    src = os.path.join(here, "QUERY_LEDGER.json")
    with open(src) as f:
        original = f.read()
    copy = tmp_path / "QUERY_LEDGER.json"
    copy.write_text(original)
    monkeypatch.setattr(entry_mod, "_LEDGER_PATH", str(copy))
    fake_name = "zz_dry_run_only_query"
    assert fake_name not in q.QUERIES
    monkeypatch.setenv("SPARK_GRAFT_LEDGER_READONLY", "1")
    q.QUERIES[fake_name] = lambda spark, sf_dir: None
    q.ORACLE_SQL[fake_name] = "SELECT 1 AS one"
    try:
        names = list(entry_mod.queries())
        assert fake_name in names
        assert copy.read_text() == original, "guarded dry run mutated the ledger"
        with open(src) as f:
            assert f.read() == original
    finally:
        del q.QUERIES[fake_name]
        del q.ORACLE_SQL[fake_name]


def test_ledger_self_heal_writes_through_patchable_path(monkeypatch, tmp_path):
    """The UNGUARDED self-heal path, exercised safely for the first time:
    with the ledger path pointed at a tmp copy and no readonly guard, a
    registry name missing from the ledger must be appended to the COPY
    (durable seniority) while the committed file stays untouched."""
    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    src = os.path.join(here, "QUERY_LEDGER.json")
    with open(src) as f:
        original = f.read()
    copy = tmp_path / "QUERY_LEDGER.json"
    copy.write_text(original)
    monkeypatch.setattr(entry_mod, "_LEDGER_PATH", str(copy))
    monkeypatch.delenv("SPARK_GRAFT_LEDGER_READONLY", raising=False)
    fake_name = "zz_self_heal_probe_query"
    assert fake_name not in q.QUERIES
    q.QUERIES[fake_name] = lambda spark, sf_dir: None
    q.ORACLE_SQL[fake_name] = "SELECT 1 AS one"
    try:
        names = list(entry_mod.queries())
        assert fake_name in names
        healed = json.loads(copy.read_text())
        assert healed[-1] == fake_name, "self-heal did not append to the copy"
        with open(src) as f:
            assert f.read() == original, "self-heal leaked to the committed ledger"
    finally:
        del q.QUERIES[fake_name]
        del q.ORACLE_SQL[fake_name]


# ---------------------------------------------------------------------------
# Fingerprint machinery


def test_imported_pkg_files_resolves_relative_operator_imports():
    files = entry_mod._imported_pkg_files(f"{_PKG}/queries_impl/llm_dedup.py")
    assert f"{_PKG}/operators/dedup.py" in files
    assert f"{_PKG}/sources/batch.py" in files
    # non-package imports (pyspark etc.) never appear
    assert all(f.startswith(_PKG + "/") for f in files)


def test_module_closure_is_transitive_and_excludes_registry():
    cache: dict[str, set[str]] = {}
    cl = entry_mod._module_closure(f"{_PKG}/queries_impl/llm_dedup.py", cache)
    assert f"{_PKG}/queries_impl/llm_dedup.py" in cl
    assert f"{_PKG}/operators/dedup.py" in cl
    # queries.py imports every query module; it must be excluded or every
    # closure becomes the whole package
    assert f"{_PKG}/queries.py" not in cl
    assert len(cl) < 15


def test_working_tree_blob_shas_match_git_for_committed_files():
    """The no-git blob hash must agree with git's own object ids, or the
    changed-detection would flag everything forever."""
    import subprocess

    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    ours = entry_mod._working_tree_blob_shas()
    out = subprocess.run(
        ["git", "ls-tree", "-r", "HEAD", "--", _PKG],
        cwd=here,
        capture_output=True,
        text=True,
    )
    if out.returncode != 0:
        return  # no git in this environment — detection degrades gracefully
    theirs = {
        line.split("\t", 1)[1]: line.split()[2]
        for line in out.stdout.splitlines()
    }
    common = set(ours) & set(theirs)
    assert len(common) > 20
    dirty = subprocess.run(
        ["git", "diff", "--name-only", "HEAD", "--", _PKG],
        cwd=here,
        capture_output=True,
        text=True,
    ).stdout.split()
    clean = [f for f in common if f not in dirty]
    assert clean, "need at least one committed-unmodified package file"
    for f in clean:
        assert ours[f] == theirs[f], f"blob sha mismatch for {f}"


def test_synthetic_change_flags_exactly_the_dependent_queries(monkeypatch):
    """Altering one operator module's recorded SHA flags precisely the
    queries whose closure contains it, and they jump to the sweep front."""
    counts, last, rounds = _green_rows()
    target = f"{_PKG}/operators/graph.py"
    current = entry_mod._working_tree_blob_shas()

    def fake_record_shas(_record):
        fake = dict(current)
        fake[target] = "0" * 40  # pretend the record commit had other code
        return fake

    monkeypatch.setattr(
        entry_mod, "_blob_shas_at_record_commit", fake_record_shas
    )
    changed = entry_mod._changed_since_last_green(list(q.QUERIES), last)
    cache: dict[str, set[str]] = {}
    for name in q.QUERIES:
        if name not in last:
            continue  # never-green queries are not fingerprinted
        mod = q.QUERIES[name].__module__
        rel = mod.replace(".", "/") + ".py"
        depends = target in entry_mod._module_closure(rel, cache)
        assert (name in changed) == depends, name
    if changed:
        # the synthetic blob ("0"*40 in every fake record tree) is FRESH,
        # so the flagged queries must jump ahead of every other query
        # outside the invariant-critical tier (which outranks fresh by
        # design — see test_invariant_critical_rows_lead_the_sweep)
        critical = _critical(rounds)
        order = [n for n in entry_mod._sweep_order(list(q.QUERIES)) if n not in critical]
        flagged = [c for c in changed if c not in critical]
        others = [
            n for n in order if n not in changed and counts.get(n, 0) > 0
        ]
        if others and flagged:
            first_other = min(order.index(n) for n in others)
            assert max(order.index(c) for c in flagged) < first_other


def test_deleted_closure_file_flags_queries_fresh(monkeypatch):
    """A closure file DELETED from the working tree (current blob sha
    None) is a change no driver sweep has seen — its queries must flag
    changed AND fresh, not silently drop out of the diff (the None vs
    recorded-sha comparison and the None-not-in-recorded-blobs freshness
    check both have to hold)."""
    counts, last, rounds = _green_rows()
    target = f"{_PKG}/operators/graph.py"
    current = entry_mod._working_tree_blob_shas()
    assert target in current  # precondition: the file exists today

    deleted = {k: v for k, v in current.items() if k != target}
    monkeypatch.setattr(entry_mod, "_working_tree_blob_shas", lambda: deleted)
    # record trees keep the file as it was committed
    monkeypatch.setattr(
        entry_mod, "_blob_shas_at_record_commit", lambda _rec: dict(current)
    )
    changed, fresh = entry_mod._changed_and_fresh(list(q.QUERIES), last)
    cache: dict[str, set[str]] = {}
    for name in q.QUERIES:
        if name not in last:
            continue
        rel = q.QUERIES[name].__module__.replace(".", "/") + ".py"
        depends = target in entry_mod._module_closure(rel, cache)
        assert (name in changed) == depends, name
        if depends:
            assert name in fresh, name


def test_registry_respects_sustainable_cap():
    """Post-saturation policy (r17, OPERATORS.md "Registry policy after
    saturation"): the driver re-greens at most _SWEEP_CAP queries per
    round and the published invariant is max green-row age <= 5 rounds,
    so the registry can never exceed _SWEEP_CAP * 5 = 250 names — past
    that, the age ceiling ceil(N/50) itself grows past 5 and the
    invariant becomes arithmetically undeliverable. New capability after
    saturation ships as library functions + law tests + scale rungs; a
    future must-register query requires DEREGISTERING a low-value row
    (ledger entry removed, swap documented) first."""
    n = len(q.QUERIES)
    assert n <= entry_mod._SWEEP_CAP * 5, (
        f"registry at {n} exceeds the sustainable cap "
        f"{entry_mod._SWEEP_CAP * 5}; deregister before registering"
    )
    age_ceiling = -(-n // entry_mod._SWEEP_CAP)
    assert age_ceiling <= 5, age_ceiling


def test_age_invariant_deliverable_by_upcoming_sweep():
    """The <= 5-round freshness invariant against the LIVE registry and
    the real committed CORRECTNESS history: no registered query's last
    green row is already PAST the age ceiling (a stranded row could
    never be healed by one sweep), and the upcoming sweep head has room
    for the whole at-the-boundary cohort plus every never-checked
    registration — i.e. the invariant holds now and the next sweep
    keeps it."""
    counts, last, rounds = _green_rows()
    next_round = 1 + _max_record_round()
    ceiling = -(-len(q.QUERIES) // entry_mod._SWEEP_CAP)
    stranded = {
        n: next_round - r for n, r in rounds.items()
        if n in q.QUERIES and next_round - r > ceiling
    }
    assert not stranded, f"green rows already past the age ceiling: {stranded}"
    never_checked = set(q.QUERIES) - set(rounds)
    critical = _critical(rounds)
    demand = len(critical) + len(never_checked)
    assert demand <= entry_mod._SWEEP_CAP, (
        f"boundary cohort ({len(critical)}) + never-checked "
        f"({len(never_checked)}) = {demand} exceeds the "
        f"{entry_mod._SWEEP_CAP}-slot sweep"
    )
    head = set(list(entry_mod.queries())[: entry_mod._SWEEP_CAP])
    assert critical <= head and never_checked <= head
