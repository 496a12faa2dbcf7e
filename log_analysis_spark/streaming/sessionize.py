"""Custom stateful streaming operator: gap-based sessionization.

Spark has no built-in gap-session aggregation with arbitrary per-session
payloads, so this is the one place the engine uses a custom stateful
operator — ``applyInPandasWithState`` (Arrow-batched, grouped state), per
the brief's guidance for operators the built-ins can't express. Batch
equivalent: ``__spark_entry__.q_sessionize`` (lag + running-sum windows).

Semantics: events for a key are grouped into sessions whenever the gap
between consecutive event times exceeds ``gap_sec``. A session is EMITTED
when the event-time watermark passes its close (last_ts + gap) — late rows
beyond the watermark are dropped by Spark before reaching the operator, so
emission is deterministic. State per key is O(1): the open session's
(start, last, count).

Scale notes: state lives in the state store partitioned by key hash —
10^9 concurrent keys is fine because each key holds 3 numbers; the
watermark bounds state lifetime (idle sessions finalize and are freed).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_sec", T.DoubleType(), True),
        T.StructField("last_sec", T.DoubleType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """events stream -> closed sessions stream.

    ``events`` must be a streaming DataFrame with an event-time column.
    Sessions close via the processing of later events (gap exceeded) or via
    state timeout once the watermark passes the open session's horizon.
    """
    ev = events.withWatermark(ts_col, watermark).select(
        F.col(key_col).alias("user_id"), F.col(ts_col).alias("ts")
    )

    def _update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_sec, last_sec, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_sec, unit="s")],
                    "session_end": [pd.Timestamp(last_sec, unit="s")],
                    "n_events": [n],
                }
            )
            return
        ts = pd.concat([b["ts"] for b in batches]).sort_values()
        secs = ts.astype("int64") / 1e9  # ns -> fractional seconds
        out_start, out_end, out_n = [], [], []
        if state.exists:
            start_sec, last_sec, n = state.get
        else:
            start_sec = last_sec = float(secs.iloc[0])
            n = 0
            secs = secs.iloc[0:]
        for s in secs:
            s = float(s)
            if n > 0 and s - last_sec > gap_sec:
                out_start.append(pd.Timestamp(start_sec, unit="s"))
                out_end.append(pd.Timestamp(last_sec, unit="s"))
                out_n.append(n)
                start_sec, n = s, 0
            last_sec = s
            n += 1
        state.update((start_sec, last_sec, n))
        # finalize via timeout once the watermark passes last + gap
        state.setTimeoutTimestamp(int((last_sec + gap_sec) * 1000))
        if out_n:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_n),
                    "session_start": out_start,
                    "session_end": out_end,
                    "n_events": out_n,
                }
            )

    return ev.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
