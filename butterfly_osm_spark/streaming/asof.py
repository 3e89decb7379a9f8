"""Stateful streaming as-of join (``applyInPandasWithState``).

The streaming form of ``operators.asof.asof_purchases``: the per-user
carry ("latest purchase seen so far") is exactly one tiny state tuple,
so the union-tag batch window becomes a stateful map over the live
event stream — the shape a production pipeline uses to enrich a
click stream with the most recent reference row (the reference's
traffic layer consumes edge-speed snapshots the same way).

Event-time caveat (documented, same discipline as sessions.py): the
carry is correct for rows processed in event-time order. On a real
stream that means watermark + per-user buffer (sort within the allowed
lateness before folding); on the bounded availableNow replay used by
the parity test a single micro-batch delivers each user's full history
to one fold call, which sorts it — emitting EXACTLY the batch plan's
output. State is bounded by the user population, never event volume.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("event_type", StringType()),
        StructField("asof_purchase_id", LongType()),
        StructField("asof_value", DoubleType()),
    ]
)

# state: (purchase_id, purchase_value) of the user's latest purchase
_STATE_SCHEMA = StructType(
    [
        StructField("p_id", LongType()),
        StructField("p_value", DoubleType()),
    ]
)


def asof_purchases_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming as-of enrichment over a stream with columns
    (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING,
    value DOUBLE). Emits one row per NON-purchase event, identical in
    schema and values to the batch ``asof_purchases``."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("ts", kind="mergesort")
        p_id, p_val = state.get if state.exists else (None, None)
        out = []
        for r in rows.itertuples(index=False):
            ts_us = int(pd.Timestamp(r.ts).value // 1000)
            if r.event_type == "purchase":
                p_id, p_val = int(r.event_id), float(r.value)
            else:
                out.append(
                    (int(r.event_id), int(user_id), ts_us, r.event_type, p_id, p_val)
                )
        state.update((p_id, p_val))
        yield pd.DataFrame(out, columns=[f.name for f in _OUT_SCHEMA.fields])

    return (
        events_stream.select("event_id", "ts", "user_id", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
