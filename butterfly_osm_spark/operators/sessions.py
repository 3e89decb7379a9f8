"""Sessionization: gap-based event grouping (batch + streaming-stateful).

The training-data analog of the reference's trace segmentation (its
map-matcher cuts GPS traces on time/distance gaps before HMM matching —
route/src/server/mapmatch.rs gap handling); for a web-scale ingest
pipeline this is THE canonical stateful operator: group a user's events
into sessions split on idle gaps > threshold.

Batch form (this module): the classic one-shuffle islands plan —
``lag`` over (user, ts) marks gap starts, a running ``sum`` of the
marks numbers the sessions, one ``groupBy`` aggregates. All three steps
share the SAME (user_id) hash partitioning, so Catalyst plans exactly
one exchange for the windows and reuses it for the final aggregation;
nothing is driver-side. Skew posture: per-user row counts are bounded
(a user's event rate is physical), so user_id hashing balances; a
pathological firehose user would be salted by session-day first.

Streaming form (streaming/sessions.py): the same semantics as an
``applyInPandasWithState`` operator with per-user open-session state —
parity with this batch plan is pytest-asserted on a replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GAP_S = 1800  # idle gap (seconds) that closes a session


def sessionize(pings: DataFrame, gap_s: int = GAP_S) -> DataFrame:
    """(user_id, session_seq, n_pings, start_s, end_s, duration_s):
    events split into sessions wherever the per-user time gap exceeds
    ``gap_s``. session_seq is 1-based in time order."""
    w = Window.partitionBy("user_id").orderBy("ts_s")
    gap = F.col("ts_s") - F.lag("ts_s").over(w)
    marked = pings.select(
        "user_id",
        "ts_s",
        F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0).alias("new_s"),
    ).withColumn("session_seq", F.sum("new_s").over(w))
    return (
        marked.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_pings"),
            F.min("ts_s").alias("start_s"),
            F.max("ts_s").alias("end_s"),
        )
        .withColumn("duration_s", F.col("end_s") - F.col("start_s"))
    )


def sessionize_oracle_sql(fix: str, gap_s: int = GAP_S) -> str:
    """Identical islands construction in DuckDB over the pings parquet."""
    return f"""
WITH lagged AS (
  SELECT user_id, ts_s,
         CASE WHEN ts_s - lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) > {gap_s}
              OR lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM read_parquet('{fix}/pings.parquet')
), numbered AS (
  SELECT user_id, ts_s,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_s
                          ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM lagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(count(*) AS BIGINT) AS n_pings,
       min(ts_s) AS start_s, max(ts_s) AS end_s,
       max(ts_s) - min(ts_s) AS duration_s
FROM numbered
GROUP BY user_id, session_seq
"""


# ---------------------------------------------------------------------------
# stay-point detection (mobility analytics over the pings table)
# ---------------------------------------------------------------------------

STAY_CELL_E7 = 500000  # ~5.5 km of latitude per grid cell (neighborhood scale)
STAY_MIN_S = 900  # minimum dwell to count as a stay
STAY_MIN_PINGS = 3


def stay_points(
    pings: DataFrame,
    cell_e7: int = STAY_CELL_E7,
    min_s: int = STAY_MIN_S,
    min_pings: int = STAY_MIN_PINGS,
) -> DataFrame:
    """Per-user stay-point detection: maximal runs of consecutive pings
    inside one coarse grid cell, kept when the dwell lasts >= ``min_s``
    seconds over >= ``min_pings`` pings. The classic mobility-mining
    primitive (Zheng et al. GeoLife) and the reference's trace
    preprocessing analog: its map-matcher collapses stationary GPS
    clusters before HMM matching (route/src/server/mapmatch.rs gap and
    dwell handling) — here expressed as the same one-exchange islands
    plan as :func:`sessionize` (the run marker is "cell changed" instead
    of "gap exceeded"), so windows + groupBy + the final re-rank all
    reuse a single hash exchange on user_id. Nothing driver-side; skew
    bounded by physical per-user ping rates.

    Output: (user_id, stay_seq, n_pings, start_s, end_s, dwell_s,
    lat_c, lon_c) — stay_seq 1-based in time order over KEPT stays;
    centroids are exact-integer sums divided as doubles (deterministic
    across engines and partitionings).
    """
    cx = F.floor(F.col("lon_e7") / F.lit(float(cell_e7)))
    cy = F.floor(F.col("lat_e7") / F.lit(float(cell_e7)))
    w = Window.partitionBy("user_id").orderBy("ts_s")
    marked = pings.select(
        "user_id",
        "ts_s",
        "lat_e7",
        "lon_e7",
        cx.alias("cx"),
        cy.alias("cy"),
    ).withColumn(
        "new_s",
        F.when(
            F.lag("cx").over(w).isNull()
            | (F.lag("cx").over(w) != F.col("cx"))
            | (F.lag("cy").over(w) != F.col("cy")),
            1,
        ).otherwise(0),
    ).withColumn("run_id", F.sum("new_s").over(w))
    runs = (
        marked.groupBy("user_id", "run_id")
        .agg(
            F.count(F.lit(1)).alias("n_pings"),
            F.min("ts_s").alias("start_s"),
            F.max("ts_s").alias("end_s"),
            F.sum(F.col("lat_e7").cast("long")).alias("sum_lat"),
            F.sum(F.col("lon_e7").cast("long")).alias("sum_lon"),
        )
        .filter(
            (F.col("end_s") - F.col("start_s") >= min_s) & (F.col("n_pings") >= min_pings)
        )
    )
    w_keep = Window.partitionBy("user_id").orderBy("start_s")
    return runs.select(
        "user_id",
        F.row_number().over(w_keep).cast("long").alias("stay_seq"),
        "n_pings",
        "start_s",
        "end_s",
        (F.col("end_s") - F.col("start_s")).alias("dwell_s"),
        (F.col("sum_lat").cast("double") / F.col("n_pings")).alias("lat_c"),
        (F.col("sum_lon").cast("double") / F.col("n_pings")).alias("lon_c"),
    )


def stay_points_oracle_sql(
    fix: str,
    cell_e7: int = STAY_CELL_E7,
    min_s: int = STAY_MIN_S,
    min_pings: int = STAY_MIN_PINGS,
) -> str:
    """Identical islands construction in DuckDB over the pings parquet."""
    return f"""
WITH cells AS (
  SELECT user_id, ts_s, lat_e7, lon_e7,
         floor(lon_e7 / {float(cell_e7)}) AS cx,
         floor(lat_e7 / {float(cell_e7)}) AS cy
  FROM read_parquet('{fix}/pings.parquet')
), marked AS (
  SELECT *, CASE WHEN lag(cx) OVER w IS NULL
                   OR lag(cx) OVER w <> cx OR lag(cy) OVER w <> cy
                 THEN 1 ELSE 0 END AS new_s
  FROM cells
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_s)
), numbered AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_s
                             ROWS UNBOUNDED PRECEDING) AS run_id
  FROM marked
), runs AS (
  SELECT user_id, run_id, count(*) AS n_pings,
         min(ts_s) AS start_s, max(ts_s) AS end_s,
         sum(CAST(lat_e7 AS BIGINT)) AS sum_lat,
         sum(CAST(lon_e7 AS BIGINT)) AS sum_lon
  FROM numbered GROUP BY user_id, run_id
  HAVING max(ts_s) - min(ts_s) >= {min_s} AND count(*) >= {min_pings}
)
SELECT user_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY start_s) AS BIGINT)
         AS stay_seq,
       CAST(n_pings AS BIGINT) AS n_pings,
       start_s, end_s, end_s - start_s AS dwell_s,
       CAST(sum_lat AS DOUBLE) / n_pings AS lat_c,
       CAST(sum_lon AS DOUBLE) / n_pings AS lon_c
FROM runs
"""


# ---------------------------------------------------------------------------
# interval containment join (bin-and-filter range join)
# ---------------------------------------------------------------------------

CHUNK_S = 3600  # time-bin width for the equi-join prefilter


def interval_join(pings: DataFrame, chunk_s: int = CHUNK_S) -> DataFrame:
    """(user_id, ts_s, stay_seq): every ping labeled with the stay
    interval containing it — an interval-containment join, the temporal
    twin of the spatial J9 radius prefilter.

    Spark has no native range-join operator: the naive
    ``ON p.user >= s.user AND p.ts BETWEEN s.start AND s.end`` plan
    degrades to broadcast-nested-loop (O(|P| x |S|) per key). The
    scalable shape is bin-and-filter: intervals explode to the fixed
    time chunks they overlap (``sequence`` — bounded fan-out: dwell /
    chunk_s rows per stay), probes map to their single chunk, and the
    join becomes a plain (user_id, chunk) EQUI-join Catalyst can
    hash/sort-merge and AQE can skew-split, followed by the exact
    containment filter. Same two-level discipline as the spatial cell
    equi-join + raycast refinement (pip.py): coarse discrete key first,
    exact predicate second.

    Per-user stays are disjoint and a probe occupies one chunk, so no
    post-join dedup is needed (at most one candidate row matches).
    """
    stays = stay_points(pings).select(
        "user_id",
        "stay_seq",
        "start_s",
        "end_s",
        F.explode(
            F.sequence(
                F.floor(F.col("start_s") / F.lit(float(chunk_s))).cast("long"),
                F.floor(F.col("end_s") / F.lit(float(chunk_s))).cast("long"),
            )
        ).alias("chunk"),
    )
    probes = pings.select(
        "user_id",
        "ts_s",
        F.floor(F.col("ts_s") / F.lit(float(chunk_s))).cast("long").alias("chunk"),
    )
    return (
        probes.join(stays, ["user_id", "chunk"])
        .filter((F.col("ts_s") >= F.col("start_s")) & (F.col("ts_s") <= F.col("end_s")))
        .select("user_id", "ts_s", "stay_seq")
    )


def interval_join_oracle_sql(fix: str) -> str:
    """Plain range join in DuckDB over the identical stay derivation
    (small-scale semantics of the bin-and-filter plan)."""
    stays = stay_points_oracle_sql(fix)
    return f"""
WITH stays AS ({stays})
SELECT p.user_id, p.ts_s, s.stay_seq
FROM read_parquet('{fix}/pings.parquet') p
JOIN stays s
  ON p.user_id = s.user_id AND p.ts_s BETWEEN s.start_s AND s.end_s
"""


# ---------------------------------------------------------------------------
# origin-destination matrix from consecutive stays
# ---------------------------------------------------------------------------


def od_matrix(pings: DataFrame, cell_e7: int = STAY_CELL_E7) -> DataFrame:
    """(from_cx, from_cy, to_cx, to_cy, n_trips): trip counts between
    consecutive stay cells per user — the mobility OD matrix, the
    demand-side twin of the reference's supply-side travel-time matrix
    (its bucket M2M answers "how long between zones"; this answers "how
    many actually went"). Built entirely on the stay_points derivation:
    one lag window over (user, stay_seq) pairs consecutive stays, then
    a cell-keyed count aggregate. The stays table is already
    user_id-partitioned from its own windows, so the lag adds NO new
    exchange; only the final (small, zone-pair-keyed) aggregate
    shuffles.
    """
    stays = stay_points(pings, cell_e7=cell_e7)
    fx = F.floor(F.col("lon_c") / F.lit(float(cell_e7))).alias("to_cx")
    fy = F.floor(F.col("lat_c") / F.lit(float(cell_e7))).alias("to_cy")
    w = Window.partitionBy("user_id").orderBy("stay_seq")
    trans = stays.select("user_id", "stay_seq", fx, fy).select(
        "user_id",
        F.lag("to_cx").over(w).alias("from_cx"),
        F.lag("to_cy").over(w).alias("from_cy"),
        "to_cx",
        "to_cy",
    )
    return (
        trans.filter(F.col("from_cx").isNotNull())
        .groupBy("from_cx", "from_cy", "to_cx", "to_cy")
        .agg(F.count(F.lit(1)).alias("n_trips"))
    )


def od_matrix_oracle_sql(fix: str, cell_e7: int = STAY_CELL_E7) -> str:
    stays = stay_points_oracle_sql(fix, cell_e7=cell_e7)
    return f"""
WITH stays AS ({stays}),
cells AS (
  SELECT user_id, stay_seq,
         CAST(floor(lon_c / {float(cell_e7)}) AS BIGINT) AS to_cx,
         CAST(floor(lat_c / {float(cell_e7)}) AS BIGINT) AS to_cy
  FROM stays
), trans AS (
  SELECT user_id,
         lag(to_cx) OVER (PARTITION BY user_id ORDER BY stay_seq) AS from_cx,
         lag(to_cy) OVER (PARTITION BY user_id ORDER BY stay_seq) AS from_cy,
         to_cx, to_cy
  FROM cells
)
SELECT from_cx, from_cy, to_cx, to_cy, CAST(count(*) AS BIGINT) AS n_trips
FROM trans WHERE from_cx IS NOT NULL
GROUP BY from_cx, from_cy, to_cx, to_cy
"""
