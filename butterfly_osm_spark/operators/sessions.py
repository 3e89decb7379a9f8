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


# ---------------------------------------------------------------------------
# trajectory resampling + speed/outlier screening
# ---------------------------------------------------------------------------

TICK_S = 600  # resample grid (seconds)
MAX_INTERP_GAP_S = 3600  # never interpolate across a broken trajectory
SPEED_OUTLIER_MMS = 50_000  # 50 m/s — physically implausible for ground GPS


def traj_resample(pings: DataFrame, tick_s: int = TICK_S, max_gap_s: int = MAX_INTERP_GAP_S) -> DataFrame:
    """(user_id, t_s, lat_i, lon_i): each trajectory linearly resampled
    onto the fixed ``tick_s`` time grid — the regularization step every
    trajectory-mining pipeline runs before map-matching or stay mining
    (the reference's HMM matcher equally assumes near-uniform probe
    cadence, route/src/server/mapmatch.rs). Ticks are taken strictly
    after the segment start and up to its end ((t1, t2] — adjacent
    segments never double-emit a tick), and segments longer than
    ``max_gap_s`` are treated as trajectory breaks and not interpolated.

    Pure window + bounded explode (fan-out <= max_gap_s / tick_s per
    segment, a compile-time constant): one user_id exchange for the
    lead window, map-only after; interpolation is a single per-row
    IEEE expression (no aggregation), so results are bit-identical
    under any partitioning. Coordinates rounded to 1e-2 e7 units, the
    interp_midpoint convention.
    """
    w = Window.partitionBy("user_id").orderBy("ts_s")
    seg = pings.select(
        "user_id",
        "ts_s",
        "lat_e7",
        "lon_e7",
        F.lead("ts_s").over(w).alias("t2"),
        F.lead("lat_e7").over(w).alias("lat2"),
        F.lead("lon_e7").over(w).alias("lon2"),
    ).filter(F.col("t2").isNotNull() & (F.col("t2") - F.col("ts_s") <= max_gap_s))
    k1 = (F.floor(F.col("ts_s") / F.lit(float(tick_s))) + 1).cast("long")
    k2 = F.floor(F.col("t2") / F.lit(float(tick_s))).cast("long")
    ticks = seg.select(
        "user_id",
        "ts_s",
        "lat_e7",
        "lon_e7",
        "t2",
        "lat2",
        "lon2",
        F.explode(
            F.when(k1 <= k2, F.sequence(k1, k2)).otherwise(F.array().cast("array<long>"))
        ).alias("k"),
    )
    t = (F.col("k") * tick_s).alias("t_s")
    frac = (F.col("k") * tick_s - F.col("ts_s")).cast("double") / (
        F.col("t2") - F.col("ts_s")
    ).cast("double")
    return ticks.select(
        "user_id",
        t,
        F.round(F.col("lat_e7") + (F.col("lat2") - F.col("lat_e7")) * frac, 2).alias("lat_i"),
        F.round(F.col("lon_e7") + (F.col("lon2") - F.col("lon_e7")) * frac, 2).alias("lon_i"),
    )


def traj_resample_oracle_sql(
    fix: str, tick_s: int = TICK_S, max_gap_s: int = MAX_INTERP_GAP_S
) -> str:
    return f"""
WITH seg AS (
  SELECT user_id, ts_s, lat_e7, lon_e7,
         lead(ts_s) OVER w AS t2,
         lead(lat_e7) OVER w AS lat2,
         lead(lon_e7) OVER w AS lon2
  FROM read_parquet('{fix}/pings.parquet')
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_s)
), ok AS (
  SELECT * FROM seg WHERE t2 IS NOT NULL AND t2 - ts_s <= {max_gap_s}
), ticks AS (
  SELECT *, unnest(range(CAST(floor(ts_s / {float(tick_s)}) AS BIGINT) + 1,
                         CAST(floor(t2 / {float(tick_s)}) AS BIGINT) + 1)) AS k
  FROM ok
)
SELECT user_id, k * {tick_s} AS t_s,
       round(lat_e7 + (lat2 - lat_e7) * (CAST(k * {tick_s} - ts_s AS DOUBLE) / (t2 - ts_s)), 2) AS lat_i,
       round(lon_e7 + (lon2 - lon_e7) * (CAST(k * {tick_s} - ts_s AS DOUBLE) / (t2 - ts_s)), 2) AS lon_i
FROM ticks
"""


def ping_speed(pings: DataFrame, outlier_mms: int = SPEED_OUTLIER_MMS) -> DataFrame:
    """(user_id, ts_s, dt_s, speed_mms, is_outlier): per-ping ground
    speed from the previous fix (haversine over the segment, integer
    mm/s) and the physical-plausibility flag GPS cleaning drops on —
    the probe-screening step ahead of map-matching (the reference's
    matcher downweights implausible jumps; here they are made explicit
    and filterable). One user_id window exchange; speed is the proven
    round-to-integer haversine discipline (extract length_mm), so the
    flag can never flip between engines.
    """
    w = Window.partitionBy("user_id").orderBy("ts_s")
    lagged = pings.select(
        "user_id",
        "ts_s",
        "lat_e7",
        "lon_e7",
        F.lag("ts_s").over(w).alias("t0"),
        F.lag("lat_e7").over(w).alias("lat0"),
        F.lag("lon_e7").over(w).alias("lon0"),
    ).filter(F.col("t0").isNotNull() & (F.col("ts_s") > F.col("t0")))
    from ..geo import haversine_m_col

    speed = F.round(
        haversine_m_col("lon0", "lat0", "lon_e7", "lat_e7")
        * 1000.0
        / (F.col("ts_s") - F.col("t0"))
    ).cast("long")
    return lagged.select(
        "user_id",
        "ts_s",
        (F.col("ts_s") - F.col("t0")).alias("dt_s"),
        speed.alias("speed_mms"),
        (speed > outlier_mms).alias("is_outlier"),
    )


def ping_speed_oracle_sql(fix: str, outlier_mms: int = SPEED_OUTLIER_MMS) -> str:
    from ..geo import haversine_m_sql

    hav = haversine_m_sql("lon0", "lat0", "lon_e7", "lat_e7")
    return f"""
WITH lagged AS (
  SELECT user_id, ts_s, lat_e7, lon_e7,
         lag(ts_s) OVER w AS t0,
         lag(lat_e7) OVER w AS lat0,
         lag(lon_e7) OVER w AS lon0
  FROM read_parquet('{fix}/pings.parquet')
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_s)
)
SELECT user_id, ts_s, ts_s - t0 AS dt_s,
       CAST(round({hav} * 1000.0 / (ts_s - t0)) AS BIGINT) AS speed_mms,
       CAST(round({hav} * 1000.0 / (ts_s - t0)) AS BIGINT) > {outlier_mms} AS is_outlier
FROM lagged WHERE t0 IS NOT NULL AND ts_s > t0
"""


TRAJ_CELL_E7 = 100_000  # ~1.1 km grid for trajectory signatures
TRAJ_JACCARD_NUM = 1  # keep pairs with inter/union >= 1/5 ...
TRAJ_JACCARD_DEN = 5  # ... tested as DEN*inter >= NUM*union (exact ints)


def traj_sim_join(
    pings: DataFrame,
    cell_e7: int = TRAJ_CELL_E7,
    num: int = TRAJ_JACCARD_NUM,
    den: int = TRAJ_JACCARD_DEN,
) -> DataFrame:
    """(user_a, user_b, inter, uni, jaccard): trajectory-similarity
    self-join — user pairs whose DISTINCT-visited-cell sets overlap with
    Jaccard >= num/den. The mobility sibling of the dedup mandate's
    n-gram Jaccard: a trajectory's shingle set is the grid cells it
    visits, and co-travellers / duplicate devices surface as high-
    overlap pairs (the reference's trace preprocessing dedups repeated
    uploads of the same drive the same way).

    Scale shape: pings reduce to the per-user DISTINCT cell vocabulary
    first (one partial-agg exchange; pings themselves never self-join);
    candidates come from the CELL INVERTED INDEX (co-visited cell
    equi-join, a.user < b.user), so only geographically co-located
    pairs are ever scored — geography bounds the candidate fan-out the
    way LSH bands bound minhash (a pathological single-cell hotspot
    salts/AQE-splits like every other cell-keyed join here). The
    threshold is evaluated as ``den*inter >= num*union`` in EXACT
    integer arithmetic — no float ever decides membership; the jaccard
    column is a display-only 6 dp division.
    """
    cells_df = pings.select(
        "user_id",
        F.floor(F.col("lon_e7") / F.lit(float(cell_e7))).alias("cx"),
        F.floor(F.col("lat_e7") / F.lit(float(cell_e7))).alias("cy"),
    ).distinct()
    sizes = cells_df.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    a = cells_df.alias("a")
    b = cells_df.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.cx") == F.col("b.cx"))
            & (F.col("a.cy") == F.col("b.cy"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(F.col("a.user_id").alias("user_a"), F.col("b.user_id").alias("user_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("user_id").alias("user_a"), F.col("n").alias("na")), "user_a")
        .join(sizes.select(F.col("user_id").alias("user_b"), F.col("n").alias("nb")), "user_b")
        .withColumn("uni", F.col("na") + F.col("nb") - F.col("inter"))
        .filter(F.lit(den) * F.col("inter") >= F.lit(num) * F.col("uni"))
        .select(
            "user_a",
            "user_b",
            "inter",
            "uni",
            F.round(F.col("inter").cast("double") / F.col("uni").cast("double"), 6).alias(
                "jaccard"
            ),
        )
    )


def traj_sim_join_oracle_sql(
    fix: str,
    cell_e7: int = TRAJ_CELL_E7,
    num: int = TRAJ_JACCARD_NUM,
    den: int = TRAJ_JACCARD_DEN,
) -> str:
    """Identical signature/inverted-index construction in DuckDB (floor
    routed through BIGINT — the Spark-floor-vs-DuckDB-floor cast)."""
    return f"""
WITH c AS (
  SELECT DISTINCT user_id,
         CAST(floor(lon_e7 / {float(cell_e7)}) AS BIGINT) AS cx,
         CAST(floor(lat_e7 / {float(cell_e7)}) AS BIGINT) AS cy
  FROM read_parquet('{fix}/pings.parquet')
),
sz AS (SELECT user_id, count(*) AS n FROM c GROUP BY user_id),
i AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b, count(*) AS inter
  FROM c a JOIN c b ON a.cx = b.cx AND a.cy = b.cy AND a.user_id < b.user_id
  GROUP BY 1, 2
)
SELECT user_a, user_b, inter, sa.n + sb.n - inter AS uni,
       round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
FROM i JOIN sz sa ON sa.user_id = user_a JOIN sz sb ON sb.user_id = user_b
WHERE {den} * inter >= {num} * (sa.n + sb.n - inter)
"""
