"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's windowed metrics
aggregate, SURVEY.md §2.5) on sf0.001. ``queries()`` maps every implemented
operator from SURVEY.md §2 to a (spark, sf_dir) -> DataFrame callable;
``oracle_sql()`` gives the DuckDB-equivalent SQL for the correctness gate.
Column names/aliases match between both sides (driver hash-compares after
sorting columns by name).
"""

from __future__ import annotations

import ast
import glob
import hashlib
import json
import os
import subprocess
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_stream_processing_spark import queries as q

_PKG = "flink_stream_processing_spark"
_HERE = os.path.dirname(os.path.abspath(__file__))
# Module-level so tests can monkeypatch it at a tmp COPY: the self-heal
# write below must be exercisable without ever risking the committed file.
_LEDGER_PATH = os.path.join(_HERE, "QUERY_LEDGER.json")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q.QUERIES["window_metrics"](spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# Change-aware sweep ordering (round-5 verdict ask #1).
#
# The driver checks <=50 queries per round, in the dict order queries()
# returns — so the ordering IS the verification-coverage policy. Priority:
#   0. INVARIANT-CRITICAL rows (r12): queries whose last green driver row
#      would reach the freshness ceiling — age ceil(N/50) rounds — if the
#      UPCOMING sweep skips them. These outrank even fresh code changes:
#      the bounded-age invariant is the published contract the judge
#      audits, while fresh-first is only the mechanism for fast hard
#      signal on edits; when a wide refactor flags more fresh closures
#      than one sweep can absorb (r12: the circular-import extraction
#      flagged 113), strict fresh-first would silently strand the oldest
#      cohort past the ceiling. Oldest last-green first within the tier.
#      In steady state at most one ~50-row cohort reaches the boundary
#      per round, but a multi-round backlog (consecutive all-red infra
#      rounds that land records without re-greening rows) can grow the
#      tier past the sweep budget — then the ordering degrades to pure
#      oldest-first across the whole budget and the backlog drains one
#      50-row cohort per round while fresh-change slots wait; the
#      invariant is violated for exactly the backlog rounds and
#      self-heals, which is the intended failure mode (r12 advice).
#   1. FRESH impl changes (some closure file's working-tree blob appears
#      in NO driver-record commit tree — the edit landed after the last
#      sweep and nothing has a green row against it; never-checked
#      queries also land here): a post-sweep code fix automatically
#      re-queues its queries for a fresh hard signal. Within the fresh
#      group, higher targetedness score first (changed files weighted
#      inversely by how many queries they flag) — materially-reworked
#      operators beat a tail flagged only through one shared module;
#   2. OLDEST last-green driver row first (r8, per the r7 verdict's
#      staleness burn-down). The freshness INVARIANT this ordering can
#      actually deliver (r10, restated per the r9 verdict; counts as of
#      r11: with 220 registered queries and a 50-slot driver sweep, max
#      green-row age cannot be held under ceil(220/50) = 5 rounds —
#      the earlier "no row older than 3 rounds" target was unreachable
#      arithmetic) is: every query is re-greened at least once per 5
#      rounds, and the oldest cohort is always swept first unless a
#      fresh code change outranks it. OLD-DRIFT changed queries (their changed blobs all
#      sat in some prior record tree while sibling queries swept green
#      against them) queue HERE by staleness, not by targetedness —
#      without that split, r4-era drift through one shared module
#      flagged half the registry and starved the r02/r03 tail out of
#      the 50-slot budget. Within one round cohort, drift outranks
#      truly-unchanged (higher targetedness first);
#   3. least driver-checked (green CORRECTNESS_r*.json rows) first;
#   4. seniority (QUERY_LEDGER.json registration order), then registry
#      order — a wave of new queries must not displace an older
#      never-checked one from the sweep budget.
#
# "Changed" is computed from git, not guessed: each CORRECTNESS_r{N}.json
# was committed by the driver against that round's final tree, so the blob
# SHAs of the query's implementation modules AT THAT COMMIT (one
# `git ls-tree -r` per round) vs the working tree (git blob SHA = sha1 of
# b"blob <len>\\0" + content, computable without git) decide staleness
# exactly. A query's "implementation modules" are the transitive
# intra-package imports of its defining module (AST-resolved; queries.py —
# the registry that imports every query module — is a non-expanding leaf,
# else every closure would be the whole package).
# --------------------------------------------------------------------------


def _git(*args: str) -> str | None:
    try:
        out = subprocess.run(
            ["git", *args], cwd=_HERE, capture_output=True, text=True, timeout=30
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    return out.stdout if out.returncode == 0 else None


def _git_prefix() -> str:
    """Path of _HERE relative to the git toplevel ('' when _HERE IS the
    toplevel). git ls-tree/log paths are toplevel-relative while the
    working-tree blob keys are _HERE-relative; without this anchor a
    checkout nested inside a larger repo would mismatch every path and
    flag every query changed every round."""
    out = _git("rev-parse", "--show-prefix")
    return out.strip() if out else ""


def _imported_pkg_files(relpath: str) -> set[str]:
    """Package-internal .py files (repo-relative) imported by ``relpath``."""
    try:
        with open(os.path.join(_HERE, relpath)) as f:
            tree = ast.parse(f.read())
    except (OSError, SyntaxError, ValueError):
        return set()
    pkg_parts = relpath.split("/")[:-1]
    out: set[str] = set()

    def add(parts: list[str]) -> bool:
        if not parts or parts[0] != _PKG:
            return False
        as_mod = "/".join(parts) + ".py"
        as_pkg = "/".join(parts) + "/__init__.py"
        for p in (as_mod, as_pkg):
            if os.path.exists(os.path.join(_HERE, p)):
                out.add(p)
                return True
        return False

    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                add(a.name.split("."))
        elif isinstance(node, ast.ImportFrom):
            if node.level == 0:
                base = node.module.split(".") if node.module else []
            else:
                anchor = pkg_parts[: len(pkg_parts) - (node.level - 1)]
                base = anchor + (node.module.split(".") if node.module else [])
            for a in node.names:
                # `from X import name`: name may itself be a module file,
                # else it's a symbol defined in X.
                if not add(base + [a.name]):
                    add(base)
    return out


def _module_closure(relpath: str, cache: dict[str, set[str]]) -> set[str]:
    """Transitive intra-package import closure of a module file."""
    if relpath in cache:
        return cache[relpath]
    closure: set[str] = set()
    stack = [relpath]
    while stack:
        f = stack.pop()
        if f in closure:
            continue
        # queries.py is EXCLUDED outright, not just unexpanded: it imports
        # every queries_impl module (expansion would make every closure the
        # whole package), and it changes on every registration — as a leaf
        # it would flag every query older than the latest registry edit,
        # collapsing "changed" back into "stale". The decorator carries no
        # query semantics; a rare genuine change to it is covered by the
        # in-repo parity gate.
        if f == f"{_PKG}/queries.py":
            continue
        closure.add(f)
        stack.extend(_imported_pkg_files(f) - closure)
    cache[relpath] = closure
    return closure


def _working_tree_blob_shas() -> dict[str, str]:
    """Git blob SHA of every package .py file in the working tree.

    Prefers one batched ``git hash-object --stdin-paths`` call: git applies
    its content filters (core.autocrlf, clean/smudge), so the working-tree
    sha matches the committed blob even in a filtered checkout — hashing
    raw on-disk bytes there would compare unequal for EVERY file and flag
    every query changed every round, silently replacing the staleness
    rotation with targetedness ordering. Raw sha1 is the no-git fallback
    (blob shas are plain sha1 of ``b"blob <len>\\0" + content``)."""
    pat = os.path.join(_HERE, _PKG, "**", "*.py")
    rels = sorted(
        os.path.relpath(p, _HERE).replace(os.sep, "/")
        for p in glob.glob(pat, recursive=True)
    )
    try:
        out = subprocess.run(
            ["git", "hash-object", "--stdin-paths"],
            cwd=_HERE,
            capture_output=True,
            text=True,
            timeout=60,
            input="".join(r + "\n" for r in rels),
        )
    except (OSError, subprocess.TimeoutExpired):
        out = None
    if out is not None and out.returncode == 0:
        hashes = out.stdout.split()
        if len(hashes) == len(rels):
            return dict(zip(rels, hashes))
    shas: dict[str, str] = {}
    for rel in rels:
        try:
            with open(os.path.join(_HERE, rel), "rb") as f:
                data = f.read()
        except OSError:
            continue
        h = hashlib.sha1(b"blob %d\0" % len(data))
        h.update(data)
        shas[rel] = h.hexdigest()
    return shas


def _blob_shas_at_record_commit(record_basename: str) -> dict[str, str] | None:
    """Package blob SHAs at the commit that ADDED a CORRECTNESS file (the
    driver writes each record exactly once, against that round's final
    tree). Anchoring on the ADD commit — not last-touch — means a later
    incidental touch of an old record (reformat, snapshot amend, trailing-
    newline fix) cannot silently advance the baseline tree past
    intervening code changes and un-flag queries that should re-verify.
    Last-touch remains the fallback when no add-commit is visible
    (shallow/grafted history). Paths are returned _HERE-relative (the
    `_git_prefix` anchor is stripped) so they compare directly against
    `_working_tree_blob_shas` keys."""
    prefix = _git_prefix()
    commit = _git(
        "log", "--diff-filter=A", "-1", "--format=%H", "--",
        prefix + record_basename,
    )
    if not commit or not commit.strip():
        commit = _git("log", "-1", "--format=%H", "--", prefix + record_basename)
    if not commit or not commit.strip():
        return None
    listing = _git("ls-tree", "-r", commit.strip(), "--", prefix + _PKG)
    if listing is None:
        return None
    shas: dict[str, str] = {}
    for line in listing.splitlines():
        # "<mode> blob <sha>\t<path>"
        try:
            meta, path = line.split("\t", 1)
            sha = meta.split()[2]
        except (ValueError, IndexError):
            continue
        if prefix and path.startswith(prefix):
            path = path[len(prefix):]
        shas[path] = sha
    return shas


def _changed_since_last_green(
    names: list[str], last_green_file: dict[str, str]
) -> dict[str, float]:
    """For each name whose implementation-module closure differs (by git
    blob SHA) from the tree at its last green driver row's commit: a
    TARGETEDNESS score = sum over its changed closure files of
    1 / (how many queries that file flags). A file that moved under six
    queries (a targeted operator rework) scores those six high; a shared
    infrastructure module that moved under a hundred queries contributes
    almost nothing to each — so materially-reworked operators re-sweep
    first and the broad tail degrades to plain least-checked order."""
    scores, _fresh = _changed_and_fresh(names, last_green_file)
    return scores


def _changed_and_fresh(
    names: list[str], last_green_file: dict[str, str]
) -> tuple[dict[str, float], set[str]]:
    """Targetedness scores (see _changed_since_last_green) plus the FRESH
    subset of the changed queries.

    A changed query is "fresh" when at least one of its changed closure
    files has a working-tree blob that appears in NO driver-record commit
    tree — i.e. the edit landed after the last driver sweep and no query
    anywhere has a green row against it. Everything else in the changed
    group is OLD DRIFT: the blob was already present in some prior
    record's tree, so sibling queries sharing the module have been
    sweeping green against it for whole rounds. Fresh changes carry the
    original "a post-sweep code fix re-queues its queries immediately"
    priority; old-drift queries re-verify in staleness order instead
    (r8 — without the split, drift through one shared module flagged half
    the registry and starved the r02/r03 staleness tail out of the
    driver's 50-slot sweep budget)."""
    current = _working_tree_blob_shas()
    tree_cache: dict[str, dict[str, str] | None] = {}
    closure_cache: dict[str, set[str]] = {}
    changed_files: dict[str, list[str]] = {}
    for name in names:
        record = last_green_file.get(name)
        if record is None:
            continue  # never green: count 0 already sweeps it first
        if record not in tree_cache:
            tree_cache[record] = _blob_shas_at_record_commit(record)
        old = tree_cache[record]
        if old is None:
            continue  # git unavailable: fall back to count ordering
        fn = q.QUERIES.get(name)
        mod = getattr(fn, "__module__", None)
        if not mod or not mod.startswith(_PKG):
            continue
        rel = mod.replace(".", "/") + ".py"
        if not os.path.exists(os.path.join(_HERE, rel)):
            rel = mod.replace(".", "/") + "/__init__.py"
        diff = [
            f
            for f in _module_closure(rel, closure_cache)
            if current.get(f) != old.get(f)
        ]
        if diff:
            changed_files[name] = diff
    flag_freq: dict[str, int] = {}
    for diff in changed_files.values():
        for f in diff:
            flag_freq[f] = flag_freq.get(f, 0) + 1
    scores = {
        name: sum(1.0 / flag_freq[f] for f in diff)
        for name, diff in changed_files.items()
    }
    # Freshness: union of every record tree ever committed (not just the
    # ones referenced by a last-green row) — a blob present in ANY of them
    # has been seen by a driver sweep.
    for rec in (
        os.path.basename(p)
        for p in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")))
    ):
        if rec not in tree_cache:
            tree_cache[rec] = _blob_shas_at_record_commit(rec)
    recorded_blobs: dict[str, set[str]] = {}
    for tree in tree_cache.values():
        if tree:
            for f, sha in tree.items():
                recorded_blobs.setdefault(f, set()).add(sha)
    fresh = {
        name
        for name, diff in changed_files.items()
        if any(current.get(f) not in recorded_blobs.get(f, set()) for f in diff)
    }
    return scores, fresh


# The driver's per-round sweep budget (it checks the first ~50 entries of
# queries()); also the denominator of the freshness-ceiling arithmetic.
_SWEEP_CAP = 50


def _sweep_order(names: list[str]) -> list[str]:
    """Invariant-critical rows first, then changed-since-last-green, then
    OLDEST-last-green, then least-driver-checked, then seniority (see
    module-level comment block)."""
    checked: dict[str, int] = {}
    last_green_file: dict[str, str] = {}
    last_green_round: dict[str, int] = {}
    max_record_round = 0
    for path in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        base = os.path.basename(path)
        try:
            rnd = int(base[len("CORRECTNESS_r") : -len(".json")])
        except ValueError:
            rnd = 0
        max_record_round = max(max_record_round, rnd)
        for name, row in rows.items():
            # Only GREEN rows count as "checked": a failed row (hash/rows/
            # schema mismatch) means the query still needs a verifying
            # sweep after its fix lands — it must queue with the
            # never-checked queries, not behind every once-green one.
            if (
                isinstance(row, dict)
                and not row.get("err")
                and row.get("rows_match") is not False
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            ):
                checked[name] = checked.get(name, 0) + 1
                last_green_file[name] = base
                last_green_round[name] = rnd
    changed, fresh = _changed_and_fresh(names, last_green_file)
    # A NEVER-green query has no hard signal at all — it outranks every
    # changed-since-green query (which at least once matched its oracle):
    # infinite targetedness keeps the old "new queries sweep first"
    # invariant now that the changed group precedes the count ordering.
    for name in names:
        if checked.get(name, 0) == 0:
            changed[name] = float("inf")
            fresh.add(name)
    # Tie-break zero/equal-count queries by SENIORITY (QUERY_LEDGER.json:
    # first-registered first), not registry order: a wave of brand-new
    # queries must not push an older never-checked query out of the
    # driver's per-round sweep budget. Names missing from the ledger
    # (added after the last ledger refresh) are appended best-effort so
    # the ledger stays the registration history.
    ledger_path = _LEDGER_PATH
    try:
        with open(ledger_path) as f:
            ledger = json.load(f)
    except (OSError, ValueError):
        ledger = []
    known = set(ledger)
    missing = [n for n in names if n not in known]
    if missing:
        ledger = ledger + missing
        # The self-heal write exists so a REGISTERED query added after the
        # last ledger refresh gets durable seniority. A dry run that
        # decorates prepared queries at runtime hits the same path and
        # would commit their names in dry-run order (the r14 ADVICE
        # finding: 15 names landed in the ledger as a side effect, out of
        # the planned flip order). Harnesses that enlarge the registry
        # without registering must set SPARK_GRAFT_LEDGER_READONLY=1; the
        # in-memory seniority map still covers the extra names either way.
        if not os.environ.get("SPARK_GRAFT_LEDGER_READONLY"):
            try:
                with open(ledger_path, "w") as f:
                    json.dump(ledger, f, indent=0)
            except OSError:
                pass
    seniority = {n: i for i, n in enumerate(ledger)}
    pos = {n: i for i, n in enumerate(names)}
    # Invariant-critical tier (priority 0, r12 — see the module comment):
    # a green row ages to (next_round - its round) once the upcoming
    # record lands, and the published invariant bounds that age by
    # ceil(N / _SWEEP_CAP). Any row that would hit the ceiling if skipped
    # THIS sweep outranks everything, fresh included — otherwise a wide
    # refactor (113 fresh closures in r12) strands the oldest cohort.
    # Never-green names are absent from last_green_round, so they stay in
    # the fresh tier with infinite targetedness, directly after critical.
    # next_round derives from the newest record FILE, not the newest green
    # row — an all-red record (infra-failure round) must still age every
    # cohort by one, or the ceiling guard fires a round late (r12 review).
    next_round = 1 + max_record_round
    age_ceiling = -(-len(names) // _SWEEP_CAP)  # ceil division
    critical = {
        n
        for n in names
        if n in last_green_round
        and next_round - last_green_round[n] >= age_ceiling
    }
    return sorted(
        names,
        key=lambda n: (
            # Tier 0: rows at the freshness-ceiling boundary, oldest
            # first (degrades to pure oldest-first if a backlog ever
            # exceeds the budget).
            n not in critical,
            last_green_round.get(n, 0) if n in critical else 0,
            # FRESH changes (working-tree blobs no driver sweep has ever
            # seen; includes never-green queries) sweep first, by
            # targetedness — a post-sweep code fix re-queues its queries
            # immediately. Everything else — old drift AND truly
            # unchanged — merges into ONE staleness ordering below: the
            # freshness objective is bounded green-row AGE, and an
            # unchanged query with an r4 row needs the slot more than a
            # drift query re-greened in r6 (the review probe found 203
            # such inversions under the earlier changed-first key).
            n not in fresh,
            -changed.get(n, 0.0) if n in fresh else 0.0,
            # Staleness burn-down (r8): oldest last green driver row
            # first. Never-green names sort in the fresh group (inf) so
            # the 0 default is unreachable.
            last_green_round.get(n, 0),
            # Within one round cohort, higher targetedness first (old
            # drift still carries more risk than no change at all).
            -changed.get(n, 0.0),
            checked.get(n, 0),
            seniority.get(n, len(ledger)),
            pos[n],
        ),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: q.QUERIES[n] for n in _sweep_order(list(q.QUERIES))}


def oracle_sql() -> dict[str, str]:
    return dict(q.ORACLE_SQL)
