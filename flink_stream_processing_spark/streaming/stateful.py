"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for per-key state machines that windowed aggregation and
``dropDuplicates`` can't express (SURVEY.md §2.6: the reference has no
keyed state at all; this is capability-core coverage).

Operator: per-key running event counter with a cumulative running count
carried in GroupState across micro-batches. Each input event is emitted
with its 1-based position in its key's lifetime — i.e., the streaming,
incremental form of ``row_number() OVER (PARTITION BY key ORDER BY ts)``
— plus a per-key total in state that survives batch boundaries (and, with
a checkpoint, restarts).

Scale design: state is ONE long per distinct key, sharded by the groupBy
hash partitioning; per batch, each key's rows move as one Arrow batch into
Python. This is the `applyInPandasWithState` contract a real custom
operator (sessionizer with custom merge logic, per-entity CEP, online
dedup with TTL) builds on; the counter keeps the harness honest because
its result is exactly checkable against a batch window function.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

RUNNING_COUNT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("running_count", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("n", LongType())])


def _count_events(
    key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    (user_id,) = key
    n = state.get[0] if state.exists else 0
    # A key's rows within one micro-batch may arrive as several Arrow chunks
    # in arbitrary order — concatenate ALL chunks, sort once over the whole
    # batch, then assign counts, so the numbering matches the batch oracle's
    # row_number() OVER (ORDER BY ts, event_id) regardless of chunking.
    # State size is unchanged (one long per key); only per-batch buffering
    # grows, bounded by one key's rows in one micro-batch.
    chunks = [pdf for pdf in pdfs if not pdf.empty]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        counts = n + pd.RangeIndex(1, len(pdf) + 1)
        n += len(pdf)
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": pdf["event_id"].to_numpy(),
                "running_count": counts,
            }
        )
    state.update((n,))


def running_event_counts(events: DataFrame) -> DataFrame:
    """Per-user running event counter (see module docstring). Input needs
    (user_id, event_id, ts) columns; output is one row per input event."""
    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _count_events,
            outputStructType=RUNNING_COUNT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class _RunningCountProcessor:
    """``transformWithStateInPandas`` twin of ``_count_events`` — the
    arbitrary-state API that supersedes ``applyInPandasWithState`` (typed
    value/list/map state handles, timers, TTL, initial state). The operator
    logic is identical: one long of state per key, rows numbered in
    (ts, event_id) order across micro-batches. Implemented against the
    Spark 4.x StatefulProcessor contract."""

    def init(self, handle) -> None:
        self._n = handle.getValueState("n", "n BIGINT")

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd

        (user_id,) = key
        n = self._n.get()[0] if self._n.exists() else 0
        chunks = [pdf for pdf in rows if not pdf.empty]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
            counts = n + pd.RangeIndex(1, len(pdf) + 1)
            n += len(pdf)
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "event_id": pdf["event_id"].to_numpy(),
                    "running_count": counts,
                }
            )
        self._n.update((n,))

    def close(self) -> None:
        pass


def running_event_counts_tws(events: DataFrame) -> DataFrame:
    """Per-user running event counter on the transformWithState API (see
    ``_RunningCountProcessor``); same contract as ``running_event_counts``
    so both implementations gate against the same batch oracle."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # Subclass registration kept local so importing this module never pulls
    # the stateful-processor machinery unless the operator is used.
    proc = type(
        "RunningCountProcessor", (_RunningCountProcessor, StatefulProcessor), {}
    )()
    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=RUNNING_COUNT_SCHEMA,
            outputMode="append",
            timeMode="None",
        )
    )


CEP_MATCH_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("purchase_id", LongType()),
        StructField("view_ms", LongType()),
        StructField("click_ms", LongType()),
        StructField("purchase_ms", LongType()),
    ]
)

# state: latest view ts, latest qualifying-click ts, that click's view ts
# (all epoch-nanos; sentinel = "none yet")
_CEP_STATE_SCHEMA = StructType(
    [
        StructField("lv", LongType()),
        StructField("lqc", LongType()),
        StructField("lqc_view", LongType()),
    ]
)

_CEP_NONE = -(2**62)
_CEP_WITHIN_NS = 600 * 10**9  # the pattern's 10-minute within-clause


def _cep_match_events(
    key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    """Streaming CEP: view -> click -> purchase (relaxed contiguity, each
    step within 10 min of the previous) as a per-key incremental scan.
    Instead of an NFA object per key, the pattern's progress is three
    longs of state, advanced VECTORIZED over the batch: 'last view',
    'last qualifying click' and its view are shifted cummax arrays (all
    three are non-decreasing in event order, so a running max IS the
    sequential state machine). Matches batch `cep_funnel_sequences`
    exactly on a finite stream."""
    import numpy as np
    import pandas as pd

    (user_id,) = key
    lv0, lqc0, lqcv0 = state.get if state.exists else (_CEP_NONE, _CEP_NONE, _CEP_NONE)
    chunks = [pdf for pdf in pdfs if not pdf.empty]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        ts = pdf["ts"].to_numpy("datetime64[ns]").astype(np.int64)
        typ = pdf["event_type"].to_numpy()
        eid = pdf["event_id"].to_numpy()
        n = len(ts)

        view_ts = np.where(typ == "view", ts, _CEP_NONE)
        lv = np.empty(n, dtype=np.int64)
        lv[0], lv[1:] = lv0, view_ts[:-1]  # strictly-preceding
        lv = np.maximum.accumulate(lv)

        qual_click = (typ == "click") & (lv > _CEP_NONE) & (ts - lv <= _CEP_WITHIN_NS)
        qts = np.where(qual_click, ts, _CEP_NONE)
        vlv = np.where(qual_click, lv, _CEP_NONE)
        lqc = np.empty(n, dtype=np.int64)
        lqc[0], lqc[1:] = lqc0, qts[:-1]
        lqc = np.maximum.accumulate(lqc)
        lqc_view = np.empty(n, dtype=np.int64)
        lqc_view[0], lqc_view[1:] = lqcv0, vlv[:-1]
        lqc_view = np.maximum.accumulate(lqc_view)

        match = (
            (typ == "purchase")
            & (lqc > _CEP_NONE)
            & (ts - lqc <= _CEP_WITHIN_NS)
        )
        if match.any():
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "purchase_id": eid[match],
                    "view_ms": lqc_view[match] // 1_000_000,
                    "click_ms": lqc[match] // 1_000_000,
                    "purchase_ms": ts[match] // 1_000_000,
                }
            )
        state.update(
            (
                int(max(lv[-1], view_ts[-1])),
                int(max(lqc[-1], qts[-1])),
                int(max(lqc_view[-1], vlv[-1])),
            )
        )
    else:
        state.update((lv0, lqc0, lqcv0))


def cep_funnel_matches(events: DataFrame) -> DataFrame:
    """Streaming CEP pattern matcher (see ``_cep_match_events``): input
    needs (user_id, event_id, ts, event_type); output one row per matched
    pattern occurrence (keyed by the purchase event)."""
    return (
        events.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _cep_match_events,
            outputStructType=CEP_MATCH_SCHEMA,
            stateStructType=_CEP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EWMA_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("ewma", DoubleType()),
    ]
)

_EWMA_STATE_SCHEMA = StructType(
    [StructField("has_prev", LongType()), StructField("prev", DoubleType())]
)


def _ewma_events(
    key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    """Streaming EWMA (α=0.2): one double of state per key (the previous
    smoothed value); each micro-batch continues the recursion exactly
    where the last one stopped, with the batch's rows sorted once —
    identical operand order to the batch operator and its recursive-CTE
    oracle, so all three agree bit-for-bit on a finite stream."""
    import pandas as pd

    (user_id,) = key
    has_prev, prev = state.get if state.exists else (0, 0.0)
    chunks = [pdf for pdf in pdfs if not pdf.empty]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        vals = pdf["value"].to_numpy()
        out = vals.copy()
        if has_prev:
            out[0] = 0.2 * vals[0] + 0.8 * prev
        for i in range(1, len(out)):
            out[i] = 0.2 * vals[i] + 0.8 * out[i - 1]
        has_prev, prev = 1, float(out[-1])
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": pdf["event_id"].to_numpy(),
                "value": vals.round(6),
                "ewma": out.round(6),
            }
        )
    state.update((has_prev, prev))


def ewma_events(events: DataFrame) -> DataFrame:
    """Streaming per-key EWMA (see ``_ewma_events``): input needs
    (user_id, event_id, ts, value); output one smoothed row per event."""
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _ewma_events,
            outputStructType=EWMA_SCHEMA,
            stateStructType=_EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


ZSCORE_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
        StructField("zscore", DoubleType()),
    ]
)

# state: the key's trailing window of raw values (bounded ring buffer)
_ZSCORE_STATE_SCHEMA = StructType(
    [StructField("window", ArrayType(DoubleType()))]
)

_Z_FRAME = 20
_Z_THRESH = 2.5


def _zscore_events(
    key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    """Streaming trailing-window z-score: per key, a bounded ring buffer
    of the last 20 raw values is the ENTIRE state (O(frame) per key — the
    same bound the batch ROWS frame holds); each event scores against the
    buffer BEFORE being pushed, i.e. a strictly out-of-sample deviation.
    Statistics use the textbook two-pass mean/ssq per event over the
    20-value buffer — identical math to the batch oracle's windowed
    avg/stddev_samp up to the 4-decimal rounding both sides apply."""
    import numpy as np
    import pandas as pd

    (user_id,) = key
    buf = list(state.get[0]) if state.exists else []
    chunks = [pdf for pdf in pdfs if not pdf.empty]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        out_ids, out_vals, out_z = [], [], []
        for eid, v in zip(pdf["event_id"].to_numpy(), pdf["value"].to_numpy()):
            if len(buf) == _Z_FRAME:
                arr = np.asarray(buf)
                mu = arr.mean()
                sigma = arr.std(ddof=1)
                if sigma > 0:
                    z = (v - mu) / sigma
                    if abs(z) > _Z_THRESH:
                        out_ids.append(int(eid))
                        out_vals.append(round(float(v), 6))
                        out_z.append(round(float(z), 4))
            buf.append(float(v))
            if len(buf) > _Z_FRAME:
                buf.pop(0)
        if out_ids:
            yield pd.DataFrame(
                {
                    "event_id": out_ids,
                    "user_id": user_id,
                    "value": out_vals,
                    "zscore": out_z,
                }
            )
    state.update((buf,))


def zscore_anomaly_stream(events: DataFrame) -> DataFrame:
    """Streaming anomaly detector (see ``_zscore_events``): input needs
    (user_id, event_id, ts, value); output one row per flagged event."""
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _zscore_events,
            outputStructType=ZSCORE_SCHEMA,
            stateStructType=_ZSCORE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
