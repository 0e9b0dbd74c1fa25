"""Guards for the driver-sweep rotation in __spark_entry__ (no Spark).

The driver sweeps ``queries()`` in dict order under a ~50-query cap, so the
ordering IS the coverage policy: least-driver-checked first, registry order
as tiebreak. These tests pin that contract against the real CORRECTNESS_r*
files in the repo root.
"""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entry_mod
from flink_stream_processing_spark import queries as q


def _checked_counts() -> dict[str, int]:
    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    counts: dict[str, int] = {}
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
    return counts


def test_queries_is_complete_permutation():
    names = list(entry_mod.queries())
    assert sorted(names) == sorted(q.QUERIES)
    assert len(names) == len(set(names))


def test_least_checked_sweep_first():
    counts = _checked_counts()
    names = list(entry_mod.queries())
    seq = [counts.get(n, 0) for n in names]
    assert seq == sorted(seq), "sweep order must be ascending in checked-count"


def test_ties_keep_seniority_then_registry_order():
    """Equal checked-count queries order by the registration ledger (older
    first — a wave of new queries must not displace an older never-checked
    query from the sweep budget), then registry order for same-age."""
    counts = _checked_counts()
    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    with open(os.path.join(here, "QUERY_LEDGER.json")) as f:
        ledger = {n: i for i, n in enumerate(json.load(f))}
    pos = {n: i for i, n in enumerate(q.QUERIES)}
    names = list(entry_mod.queries())
    for a, b in zip(names, names[1:]):
        if counts.get(a, 0) == counts.get(b, 0):
            ka = (ledger.get(a, len(ledger)), pos[a])
            kb = (ledger.get(b, len(ledger)), pos[b])
            assert ka < kb, f"tie ({a}, {b}) broke seniority order"


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
