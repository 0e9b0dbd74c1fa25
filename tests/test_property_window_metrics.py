"""Property-based test (hypothesis): the flagship window aggregate equals a
direct Python reimplementation of the reference's AllWindowFunction loop
(StreamJob.java:112-173) on arbitrary small inputs — including all-failure
windows, boundary timestamps, and empty groups."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_stream_processing_spark.operators.window_metrics import window_metrics

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def reference_semantics(rows):
    """Direct transcription of the reference's per-window loop."""
    windows = defaultdict(list)
    for tx_id, amount, rate, offset_ms in rows:
        windows[offset_ms // 10000 * 10000] += [(amount, rate)]
    out = {}
    for wstart, events in windows.items():
        total_amount = total_rate = 0.0
        success = failed = 0
        min_a, max_a = None, None
        for amount, rate in events:
            if rate == 0:  # StreamJob.java:125-127
                failed += 1
                continue
            success += 1
            total_amount += amount
            total_rate += rate
            min_a = amount if min_a is None else min(min_a, amount)
            max_a = amount if max_a is None else max(max_a, amount)
        out[wstart] = {
            "cnt": success + failed,
            "success_count": success,
            "failure_count": failed,
            "avg_amount": total_amount / success if success else 0.0,  # :141
            "avg_exchange_rate": total_rate / success if success else 0.0,  # :142
            "min_amount": min_a if min_a is not None else 0.0,  # :144-147
            "max_amount": max_a if max_a is not None else 0.0,
        }
    return out


tx_strategy = st.lists(
    st.tuples(
        st.text(alphabet="abc", min_size=1, max_size=3),
        st.floats(0, 1000, allow_nan=False, width=32),
        st.sampled_from([0.0, 0.92, 1.0, 83.2]),
        st.integers(0, 60_000),  # event-time offset ms within a minute
    ),
    min_size=0,
    max_size=30,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(tx_strategy)
def test_window_metrics_matches_reference_loop(spark_global, rows):
    spark = spark_global
    data = [
        (tx_id, float(amount), rate, EPOCH.fromtimestamp(EPOCH.timestamp() + off / 1000, tz=timezone.utc))
        for tx_id, amount, rate, off in rows
    ]
    df = spark.createDataFrame(
        data, "transactionId string, amount double, exchangeRate double, ts timestamp"
    )
    got = {r["window_start"]: r.asDict() for r in window_metrics(df).collect()}
    want = reference_semantics(rows)
    base = int(EPOCH.timestamp() * 1000)
    assert set(got) == {base + w for w in want}
    for wstart, exp in want.items():
        g = got[base + wstart]
        for k in ("cnt", "success_count", "failure_count"):
            assert g[k] == exp[k], (k, g, exp)
        for k in ("avg_amount", "avg_exchange_rate", "min_amount", "max_amount"):
            assert math.isclose(g[k], round(exp[k], 6), abs_tol=1e-6), (k, g, exp)
