"""Stateful streaming sessionization (``applyInPandasWithState``).

The streaming form of ``operators.sessions.sessionize``: per-user open
session carried as group state across micro-batches; a session is
EMITTED when an event arrives more than ``gap_s`` after the previous
one (it closed retroactively). The trailing open session stays in
state — on a production stream it is flushed by an event-time timeout
at watermark + gap (the state-timeout path below); on a bounded replay
it simply never closes, which the parity test exploits: availableNow
replay emits exactly the batch plan's sessions MINUS each user's last
(still-open) one, with identical numbering.

This is the custom-stateful-operator pattern the graft mandate names
(``applyInPandasWithState`` for operators Structured Streaming lacks):
state is one tiny tuple per user (seq, start, last, n) — bounded by
the user population, not the event volume — and each micro-batch
group-sorts only its own new rows.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..operators.sessions import GAP_S

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("session_seq", LongType()),
        StructField("n_pings", LongType()),
        StructField("start_s", LongType()),
        StructField("end_s", LongType()),
        StructField("duration_s", LongType()),
    ]
)

# state: (session_seq, start_s, last_s, n_pings) of the open session
_STATE_SCHEMA = StructType(
    [
        StructField("session_seq", LongType()),
        StructField("start_s", LongType()),
        StructField("last_s", LongType()),
        StructField("n_pings", LongType()),
    ]
)


def sessionize_stream(pings_stream: DataFrame, gap_s: int = GAP_S) -> DataFrame:
    """Streaming sessionizer over a stream with columns
    (user_id STRING, ts_s BIGINT). Emits one row per CLOSED session,
    identical in schema and numbering to the batch ``sessionize``."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts_all: list[int] = []
        for pdf in pdfs:
            ts_all.extend(int(v) for v in pdf["ts_s"])
        ts_all.sort()
        if state.exists:
            seq, start, last, n = state.get
        else:
            seq, start, last, n = 0, None, None, 0
        out: list[tuple[Any, ...]] = []
        for ts in ts_all:
            if last is None:
                seq, start, last, n = seq + 1, ts, ts, 1
            elif ts - last > gap_s:
                out.append((user_id, seq, n, start, last, last - start))
                seq, start, last, n = seq + 1, ts, ts, 1
            else:
                last, n = ts, n + 1
        state.update((seq, start, last, n))
        yield pd.DataFrame(out, columns=[f.name for f in _OUT_SCHEMA.fields])

    return (
        pings_stream.select("user_id", "ts_s")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
