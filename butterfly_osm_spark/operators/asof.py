"""As-of (temporal) join — the union-tag single-shuffle plan.

The reference's traffic layer looks up "the edge speed in effect at
time t" when customizing weights (route/src/customizer feeds
edge_speeds.parquet snapshots; docs/architecture.md traffic section):
that lookup is an AS-OF join — for each probe row, the latest state row
with state.ts <= probe.ts for the same key. Spark has no native ASOF
join operator; the naive formulations are both scale-killers:

- range-join (``l.ts >= r.ts`` theta-join + max-per-left): Catalyst
  plans a broadcast-nested-loop or cartesian — O(|L|x|R|) per key;
- per-key ``collect_list`` + UDF binary search: Python hot path and a
  skew magnet.

The scalable shape used here is the classic union-tag plan: tag both
sides, UNION them (no join at all), and run ONE window over
(key ORDER BY ts, tag) carrying ``last(right_payload, ignoreNulls)``
forward — every left row picks up the most recent right row. Exactly
one exchange (hash by key), one sort, zero joins; AQE handles key skew
by splitting oversized partitions, and a pathologically hot key would
be salted by coarse time bucket with a per-bucket boundary carry pass
(same two-level trick as the heatmap separable pass).

At equal timestamps the right row sorts FIRST (tag desc) so the
SQL-standard ``l.ts >= r.ts`` inclusive match holds. Right-side ties on
(key, ts) would be ambiguous in any ASOF engine (DuckDB included); the
events fixture guarantees (user_id, ts) unique, and the window's
deterministic tie-break (right event_id ascending -> last() takes the
max id) is documented for inputs that violate it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    left_cols: list[str],
    right_payload: dict[str, str],
) -> DataFrame:
    """Left as-of join: for every ``left`` row, attach the payload of the
    latest ``right`` row with ``right.ts <= left.ts`` for the same
    ``key`` (NULLs when no prior right row exists).

    ``left_cols`` are carried through from the left side;
    ``right_payload`` maps right column -> output alias.
    Plan shape: union-tag + one window — a single hash exchange on
    ``key``, no join anywhere.
    """
    r_tagged = right.select(
        F.col(key).alias(key),
        F.col(ts).alias(ts),
        F.lit(1).alias("is_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(src).alias(f"_r_{alias}") for src, alias in right_payload.items()],
    )
    l_tagged = left.select(
        F.col(key).alias(key),
        F.col(ts).alias(ts),
        F.lit(0).alias("is_r"),
        *left_cols,
        *[
            F.lit(None).cast(right.schema[src].dataType).alias(f"_r_{alias}")
            for src, alias in right_payload.items()
        ],
    )
    # right rows sort before left rows at equal ts (inclusive <= match)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        key,
        ts,
        "is_r",
        *left_cols,
        *[
            F.last(f"_r_{alias}", ignorenulls=True).over(w).alias(alias)
            for alias in right_payload.values()
        ],
    )
    return carried.filter(F.col("is_r") == 0).drop("is_r")


def asof_purchases(events: DataFrame) -> DataFrame:
    """Registered query: every non-purchase event joined as-of to the
    user's most recent prior (or simultaneous) purchase.

    Output: (event_id, user_id, ts_us, event_type, asof_purchase_id,
    asof_value); ts exported as epoch microseconds so the differential
    hash is timezone-proof.
    """
    left = events.filter(F.col("event_type") != "purchase")
    right = events.filter(F.col("event_type") == "purchase")
    out = asof_join(
        left,
        right,
        key="user_id",
        ts="ts",
        left_cols=["event_id", "event_type"],
        right_payload={"event_id": "asof_purchase_id", "value": "asof_value"},
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
        "asof_purchase_id",
        "asof_value",
    )


def asof_purchases_oracle_sql() -> str:
    """DuckDB native ASOF LEFT JOIN over the same `events` view."""
    return """
SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, l.event_type,
       r.event_id AS asof_purchase_id, r.value AS asof_value
FROM (SELECT * FROM events WHERE event_type <> 'purchase') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""
