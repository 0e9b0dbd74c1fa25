"""Behavioral tests for the substring-level dedup operator
(duplicate_ngram_spans) and the SCD2 run-length collapse (scd2_collapse):
hand-computable fixtures pin the duplicate definition, the island merge,
and the validity-interval chaining; plan tests pin the shuffle budget."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.dedup import duplicate_ngram_spans
from flink_stream_processing_spark.operators.temporal import scd2_collapse


def _spans(spark, docs, window):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    )
    out = duplicate_ngram_spans(df, window=window).orderBy("doc_id")
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_ngram_spans_shared_run_covered_and_merged(spark):
    # docs 0 and 1 share the 6-token run "a b c d e f"; window=3 gives 4
    # duplicated windows per doc at starts 0..3 -> ONE merged island of
    # length 3+3 = 6 tokens.
    shared = "a b c d e f"
    got = _spans(spark, [shared + " x y z", shared + " p q r"], window=3)
    for d in (0, 1):
        assert got[d]["n_tokens"] == 9
        assert got[d]["n_windows"] == 7
        assert got[d]["dup_windows"] == 4
        assert got[d]["dup_tokens"] == 6
        assert abs(got[d]["dup_token_frac"] - round(6 / 9, 6)) < 1e-9


def test_ngram_spans_short_doc_zero_windows(spark):
    got = _spans(spark, ["one two", "one two"], window=5)
    for d in (0, 1):
        assert got[d]["n_windows"] == 0
        assert got[d]["dup_windows"] == 0
        assert got[d]["dup_tokens"] == 0
        assert got[d]["dup_token_frac"] == 0.0


def test_ngram_spans_within_doc_repeat_counts(spark):
    # the run "a b c" occurs twice INSIDE one doc (disjoint) and nowhere
    # else: both occurrences are duplicates, two separate islands.
    got = _spans(spark, ["a b c x y z a b c"], window=3)
    assert got[0]["dup_windows"] == 2
    assert got[0]["dup_tokens"] == 6


def test_ngram_spans_disjoint_islands_not_merged(spark):
    # two duplicated runs separated by a unique gap longer than the window
    # must stay two islands: coverage is 3+3, not end-start.
    a = "a b c g1 g2 g3 g4 d e f"
    b = "a b c h1 h2 h3 h4 d e f"
    got = _spans(spark, [a, b], window=3)
    for d in (0, 1):
        assert got[d]["dup_windows"] == 2
        assert got[d]["dup_tokens"] == 6


def test_ngram_spans_unique_doc_zero(spark):
    got = _spans(spark, ["u1 u2 u3 u4 u5", "v1 v2 v3 v4 v5"], window=3)
    for d in (0, 1):
        assert got[d]["n_windows"] == 3
        assert got[d]["dup_windows"] == 0


def _ts(s):
    return datetime.datetime(2024, 1, 1, 0, 0, s)


def test_scd2_collapse_runs_and_intervals(spark):
    rows = [
        # user 1: A A B A  -> versions 1(A,2 events) 2(B,1) 3(A,1 open)
        Row(user_id=1, ts=_ts(0), event_id=1, state="A"),
        Row(user_id=1, ts=_ts(1), event_id=2, state="A"),
        Row(user_id=1, ts=_ts(2), event_id=3, state="B"),
        Row(user_id=1, ts=_ts(3), event_id=4, state="A"),
        # user 2: single run, stays current
        Row(user_id=2, ts=_ts(0), event_id=5, state="X"),
        Row(user_id=2, ts=_ts(9), event_id=6, state="X"),
    ]
    out = scd2_collapse(
        spark.createDataFrame(rows),
        key="user_id",
        attr="state",
        ts="ts",
        tiebreak="event_id",
    ).orderBy("user_id", "version")
    got = [r.asDict() for r in out.collect()]
    u1 = [g for g in got if g["user_id"] == 1]
    assert [(g["version"], g["state"], g["n_events"]) for g in u1] == [
        (1, "A", 2),
        (2, "B", 1),
        (3, "A", 1),
    ]
    # valid_to chains to the next version's valid_from; last is open.
    assert u1[0]["valid_to"] == u1[1]["valid_from"] == _ts(2)
    assert u1[1]["valid_to"] == u1[2]["valid_from"] == _ts(3)
    assert u1[2]["valid_to"] is None and u1[2]["is_current"]
    assert not u1[0]["is_current"] and not u1[1]["is_current"]
    u2 = [g for g in got if g["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["n_events"] == 2 and u2[0]["is_current"]


def test_scd2_null_states_form_their_own_runs(spark):
    # NULL is a real state: A NULL NULL A must be THREE runs (A / NULL-run
    # of 2 / A), not "NULL merges into preceding A" + "post-NULL always
    # splits" (the null-unsafe lag() construction). Also covers a NULL in
    # row 1 of a key.
    rows = [
        Row(user_id=1, ts=_ts(0), event_id=1, state="A"),
        Row(user_id=1, ts=_ts(1), event_id=2, state=None),
        Row(user_id=1, ts=_ts(2), event_id=3, state=None),
        Row(user_id=1, ts=_ts(3), event_id=4, state="A"),
        Row(user_id=2, ts=_ts(0), event_id=5, state=None),
        Row(user_id=2, ts=_ts(1), event_id=6, state=None),
    ]
    out = scd2_collapse(
        spark.createDataFrame(rows), "user_id", "state", "ts", "event_id"
    ).orderBy("user_id", "version")
    got = [r.asDict() for r in out.collect()]
    u1 = [g for g in got if g["user_id"] == 1]
    assert [(g["version"], g["state"], g["n_events"]) for g in u1] == [
        (1, "A", 1),
        (2, None, 2),
        (3, "A", 1),
    ]
    u2 = [g for g in got if g["user_id"] == 2]
    assert [(g["version"], g["state"], g["n_events"], g["is_current"]) for g in u2] == [
        (1, None, 2, True)
    ]


def test_scd2_tiebreak_orders_equal_timestamps(spark):
    # equal ts: event_id breaks the tie, so the run order is A then B.
    rows = [
        Row(user_id=1, ts=_ts(0), event_id=2, state="B"),
        Row(user_id=1, ts=_ts(0), event_id=1, state="A"),
    ]
    out = scd2_collapse(
        spark.createDataFrame(rows), "user_id", "state", "ts", "event_id"
    ).orderBy("version")
    assert [r["state"] for r in out.collect()] == ["A", "B"]


def test_scd2_single_exchange(spark):
    from flink_stream_processing_spark.queries import QUERIES

    from .conftest import SF_DIR

    plan = (
        QUERIES["scd2_user_state"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_ngram_spans_shuffle_budget(spark):
    """Two hash exchanges (window-hash count, per-doc islands) + one
    broadcast of the small aggregated side — the text column must never
    appear in a shuffle."""
    from flink_stream_processing_spark.queries import QUERIES

    from .conftest import SF_DIR

    plan = (
        QUERIES["duplicate_ngram_spans"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("BroadcastExchange") == 1, plan
