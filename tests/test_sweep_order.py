"""Guards for the driver-sweep rotation in __spark_entry__ (no Spark).

The driver sweeps ``queries()`` in dict order under a ~50-query cap, so the
ordering IS the coverage policy: impl-changed-since-last-green first
(git-blob-SHA fingerprint of the query's module closure vs the tree at the
commit that wrote its last green CORRECTNESS row), then least-checked, then
seniority. These tests pin the contract against the real CORRECTNESS_r*
files in the repo root plus synthetic fingerprint scenarios.
"""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entry_mod
from flink_stream_processing_spark import queries as q

_PKG = "flink_stream_processing_spark"


def _green_rows() -> tuple[dict[str, int], dict[str, str]]:
    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    counts: dict[str, int] = {}
    last: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
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
                    last[name] = os.path.basename(path)
    return counts, last


def test_queries_is_complete_permutation():
    names = list(entry_mod.queries())
    assert sorted(names) == sorted(q.QUERIES)
    assert len(names) == len(set(names))


def test_changed_queries_sweep_before_unchanged():
    """Every query flagged impl-changed-since-last-green precedes every
    unchanged-and-checked query (never-checked queries count as changed
    priority via count 0, so they are exempt from the split)."""
    counts, last = _green_rows()
    changed = entry_mod._changed_since_last_green(list(q.QUERIES), last)
    names = list(entry_mod.queries())
    if not changed:
        return  # working tree matches every record commit — nothing to pin
    last_changed = max(names.index(n) for n in changed)
    unchanged_checked = [
        n for n in names if n not in changed and counts.get(n, 0) > 0
    ]
    if unchanged_checked:
        first_unchanged = min(names.index(n) for n in unchanged_checked)
        assert last_changed < first_unchanged


def test_order_is_sorted_by_the_priority_key():
    """The emitted order is exactly the documented key: (unchanged,
    -targetedness, checked-count, seniority, registry position)."""
    counts, last = _green_rows()
    changed = entry_mod._changed_since_last_green(list(q.QUERIES), last)
    for n in q.QUERIES:  # never-green queries outrank everything (inf score)
        if counts.get(n, 0) == 0:
            changed[n] = float("inf")
    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    with open(os.path.join(here, "QUERY_LEDGER.json")) as f:
        seniority = {n: i for i, n in enumerate(json.load(f))}
    pos = {n: i for i, n in enumerate(q.QUERIES)}
    names = list(entry_mod.queries())
    keys = [
        (
            n not in changed,
            -changed.get(n, 0.0),
            counts.get(n, 0),
            seniority.get(n, len(seniority)),
            pos[n],
        )
        for n in names
    ]
    assert keys == sorted(keys), "queries() order must follow the priority key"


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
    counts, last = _green_rows()
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
        order = entry_mod._sweep_order(list(q.QUERIES))
        unchanged_checked = [
            n for n in order if n not in changed and counts.get(n, 0) > 0
        ]
        if unchanged_checked:
            first_unchanged = min(order.index(n) for n in unchanged_checked)
            assert max(order.index(c) for c in changed) < first_unchanged
