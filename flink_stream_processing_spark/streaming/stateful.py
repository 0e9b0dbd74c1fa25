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
from pyspark.sql.types import LongType, StructField, StructType

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
