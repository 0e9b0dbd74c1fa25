"""Property-based test (hypothesis): the churn-modulated pacing join
equals a brute-force Python model on random frontiers and host signals.

The deterministic tests in test_recrawl.py pin the interval laws
(monotone in churn, floored at window/divisor, politeness-equal at zero
churn) on chosen shapes; this sweeps random frontiers — hosts missing
from the signal (inner-join drop), ranks past the quota boundary, churn
counts straddling the floor crossover — against the closed-form model:
interval = max(floor(W / (1 + n)), W // div), slot = ceil(rank / quota),
scheduled = last + interval * slot. The arithmetic is exact integers on
both sides (the Spark plan divides doubles then floors; for the window
magnitudes the operator contracts this is exact, which is itself part
of what the sweep certifies)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_stream_processing_spark.queries_impl.recrawl import (
    _RECRAWL_MIN_DIVISOR,
    churn_recrawl_schedule,
)

HOSTS = [f"h{i}.example.com" for i in range(4)]

RANKED_ROW = st.tuples(
    st.sampled_from(HOSTS),
    st.integers(min_value=0, max_value=9),  # url suffix
    st.integers(min_value=0, max_value=1_000_000),  # priority
    st.integers(min_value=1, max_value=7),  # rank
)
SIGNAL_ROW = st.tuples(
    st.sampled_from(HOSTS),
    st.integers(min_value=0, max_value=10**9),  # last_window_start
    st.integers(min_value=0, max_value=50),  # n_changes
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ranked_rows=st.lists(RANKED_ROW, min_size=0, max_size=12),
    signal_rows=st.lists(SIGNAL_ROW, min_size=0, max_size=4, unique_by=lambda r: r[0]),
    quota=st.integers(min_value=1, max_value=3),
    window_ms=st.sampled_from([600_000, 240_000]),
)
def test_churn_schedule_equals_python_model(
    spark_global, ranked_rows, signal_rows, quota, window_ms
):
    spark = spark_global
    ranked = spark.createDataFrame(
        [(h, f"https://{h}/p{u}", p, r) for h, u, p, r in ranked_rows],
        "host string, canonical_url string, priority long, rank long",
    )
    signal = spark.createDataFrame(
        signal_rows, "host string, last_window_start long, n_changes long"
    )
    got = {
        (r["host"], r["canonical_url"], r["priority"], r["rank"]): (
            r["n_changes"],
            r["interval_ms"],
            r["scheduled_start"],
        )
        for r in churn_recrawl_schedule(
            ranked, signal, quota=quota, window_ms=window_ms
        ).collect()
    }

    sig = {h: (last, n) for h, last, n in signal_rows}
    expected = {}
    for h, u, p, rank in ranked_rows:
        if h not in sig:
            continue  # inner join: unknown hosts carry no schedule
        last, n = sig[h]
        interval = max(window_ms // (1 + n), window_ms // _RECRAWL_MIN_DIVISOR)
        slot = (rank + quota - 1) // quota
        expected[(h, f"https://{h}/p{u}", p, rank)] = (
            n,
            interval,
            last + interval * slot,
        )
    assert got == expected
