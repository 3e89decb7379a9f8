"""Catchment / calibration / flow aggregation operators (A6-A12).

Reference semantics, each as native DataFrame algebra with a DuckDB
oracle where SQL can express it:

- ``sector_lasso`` (A10/W4): farthest client per 20-degree bearing
  sector around each store — the "road hull" of
  route/src/server/catchment.rs:209-276. Deterministic ties via
  ``max(struct(dist, id))`` (the lex-min/max packing trick of
  docs/architecture.md:229-251, A5).
- ``percentile_threshold`` (A6): per-store p-th percentile of client
  distances (catchment.rs:489-645 uses the p-th percentile of client
  travel times as the coverage threshold).
- ``knn_iqr_filter`` (A8): IQR outlier fence over per-store client
  distances (catchment.rs:81-148), keep clients under the fence.
  Rounded to mm on BOTH engines so the fence comparison is
  fp-stable cross-engine.
- ``convex_hull`` (A9): Andrew monotone chain per store in
  applyInPandas (catchment.rs:150-207) — sequential per group, tiny
  groups; no SQL oracle (verified by containment invariants in tests).
- ``weighted_median_ratio`` (A11): sample-weighted median of
  observed/model speed ratios per density class, clamped to [0.5, 1.5]
  (route/src/calibrate.rs:281-462). The median picks an actual data
  value (first ratio whose cumulative weight reaches half the total) —
  no interpolation, so Spark and DuckDB agree exactly.
- ``flow_accumulation`` (A12): deposit per-way traversal weights onto
  undirected arcs and sum (route/src/server/flow.rs:1-30 —
  ``explode(path) -> groupBy(edge).sum(weight)``; Spark's partial agg
  replaces the bespoke shortcut cascade).

Scale notes: everything below is window + equi-join + hash agg; the
only UDF is the per-group hull (bounded group size). Client candidate
generation reuses the bounded cell-rectangle radius join (J9), so no
cross product ever materializes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StringType, StructField, StructType

from ..geo import bearing_deg_col, bearing_deg_sql, equirect_d2_col, equirect_d2_sql
from .tiles import radius_prefilter

SECTOR_DEG = 20
CATCH_RADIUS_M = 2000.0


def _clients(stores: DataFrame, points: DataFrame, radius_m: float) -> DataFrame:
    """(query_id, point_id, dist_m) candidate clients via the J9 radius join."""
    return radius_prefilter(stores, points, radius_m)


def sector_lasso(
    stores: DataFrame, points: DataFrame, radius_m: float = CATCH_RADIUS_M
) -> DataFrame:
    """(query_id, sector, image_id, dist_m): farthest client per 20-deg
    bearing sector; ties broken by id (deterministic struct max)."""
    cand = _clients(stores, points, radius_m)
    s = stores.select("query_id", F.col("lon_e7").alias("slon"), F.col("lat_e7").alias("slat"))
    p = points.select(
        F.col("image_id").alias("point_id"),
        F.col("lon_e7").alias("plon"),
        F.col("lat_e7").alias("plat"),
    )
    j = cand.join(s, "query_id").join(p, "point_id")
    bearing = bearing_deg_col("slon", "slat", "plon", "plat")
    sect = F.floor(bearing / F.lit(float(SECTOR_DEG))).cast("int")
    best = (
        j.select(
            "query_id",
            sect.alias("sector"),
            F.struct(F.col("dist_m"), F.col("point_id")).alias("dm"),
        )
        .groupBy("query_id", "sector")
        .agg(F.max("dm").alias("m"))
    )
    return best.select(
        "query_id", "sector", F.col("m.point_id").alias("image_id"), F.col("m.dist_m").alias("dist_m")
    )


def sector_lasso_oracle_sql(fix: str, radius_m: float = CATCH_RADIUS_M) -> str:
    d2 = equirect_d2_sql("q.lon_e7", "q.lat_e7", "p.lon_e7", "p.lat_e7")
    brg = bearing_deg_sql("q.lon_e7", "q.lat_e7", "p.lon_e7", "p.lat_e7")
    from ..geo import M_PER_DEG_LAT, M_PER_DEG_LON

    dlon = int(radius_m / M_PER_DEG_LON * 1e7)
    dlat = int(radius_m / M_PER_DEG_LAT * 1e7)
    return f"""
WITH cand AS (
  SELECT q.query_id, p.image_id, round(sqrt({d2}), 3) AS dist_m,
         CAST(floor(({brg}) / {float(SECTOR_DEG)}) AS INT) AS sector
  FROM read_parquet('{fix}/query_points.parquet') q
  JOIN read_parquet('{fix}/image_geo.parquet') p
    ON p.lon_e7 BETWEEN q.lon_e7 - {dlon} AND q.lon_e7 + {dlon}
   AND p.lat_e7 BETWEEN q.lat_e7 - {dlat} AND q.lat_e7 + {dlat}
  WHERE {d2} <= {radius_m * radius_m!r}
), best AS (
  SELECT query_id, sector, max({{'dist_m': dist_m, 'point_id': image_id}}) AS m
  FROM cand GROUP BY query_id, sector)
SELECT query_id, sector, m.point_id AS image_id, m.dist_m AS dist_m FROM best
"""


def percentile_threshold(
    stores: DataFrame, points: DataFrame, p: float = 0.9, radius_m: float = CATCH_RADIUS_M
) -> DataFrame:
    """(query_id, n_clients, p_dist_m): per-store p-th percentile client
    distance — the catchment coverage threshold (A6)."""
    cand = _clients(stores, points, radius_m)
    return cand.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_clients"),
        F.round(F.expr(f"percentile(dist_m, {p})"), 3).alias("p_dist_m"),
    )


def percentile_threshold_oracle_sql(fix: str, p: float = 0.9, radius_m: float = CATCH_RADIUS_M) -> str:
    d2 = equirect_d2_sql("q.lon_e7", "q.lat_e7", "p.lon_e7", "p.lat_e7")
    from ..geo import M_PER_DEG_LAT, M_PER_DEG_LON

    dlon = int(radius_m / M_PER_DEG_LON * 1e7)
    dlat = int(radius_m / M_PER_DEG_LAT * 1e7)
    return f"""
WITH cand AS (
  SELECT q.query_id, round(sqrt({d2}), 3) AS dist_m
  FROM read_parquet('{fix}/query_points.parquet') q
  JOIN read_parquet('{fix}/image_geo.parquet') p
    ON p.lon_e7 BETWEEN q.lon_e7 - {dlon} AND q.lon_e7 + {dlon}
   AND p.lat_e7 BETWEEN q.lat_e7 - {dlat} AND q.lat_e7 + {dlat}
  WHERE {d2} <= {radius_m * radius_m!r})
SELECT query_id, count(*) AS n_clients, round(quantile_cont(dist_m, {p}), 3) AS p_dist_m
FROM cand GROUP BY query_id
"""


def knn_iqr_filter(
    stores: DataFrame, points: DataFrame, radius_m: float = CATCH_RADIUS_M
) -> DataFrame:
    """(query_id, image_id, dist_m): clients under the per-store IQR fence
    q75 + 1.5*(q75-q25) over client distances (A8). Fence and distances
    are mm-rounded on both engines before comparison."""
    cand = _clients(stores, points, radius_m)
    q = cand.groupBy("query_id").agg(
        F.expr("percentile(dist_m, 0.25)").alias("q1"),
        F.expr("percentile(dist_m, 0.75)").alias("q3"),
    )
    fence = F.round(F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")), 3)
    return (
        cand.join(q, "query_id")
        .filter(F.col("dist_m") <= fence)
        .select("query_id", F.col("point_id").alias("image_id"), "dist_m")
    )


def knn_iqr_oracle_sql(fix: str, radius_m: float = CATCH_RADIUS_M) -> str:
    d2 = equirect_d2_sql("q.lon_e7", "q.lat_e7", "p.lon_e7", "p.lat_e7")
    from ..geo import M_PER_DEG_LAT, M_PER_DEG_LON

    dlon = int(radius_m / M_PER_DEG_LON * 1e7)
    dlat = int(radius_m / M_PER_DEG_LAT * 1e7)
    return f"""
WITH cand AS (
  SELECT q.query_id, p.image_id, round(sqrt({d2}), 3) AS dist_m
  FROM read_parquet('{fix}/query_points.parquet') q
  JOIN read_parquet('{fix}/image_geo.parquet') p
    ON p.lon_e7 BETWEEN q.lon_e7 - {dlon} AND q.lon_e7 + {dlon}
   AND p.lat_e7 BETWEEN q.lat_e7 - {dlat} AND q.lat_e7 + {dlat}
  WHERE {d2} <= {radius_m * radius_m!r}
), fences AS (
  SELECT query_id, round(quantile_cont(dist_m, 0.75)
         + 1.5 * (quantile_cont(dist_m, 0.75) - quantile_cont(dist_m, 0.25)), 3) AS fence
  FROM cand GROUP BY query_id)
SELECT c.query_id, c.image_id, c.dist_m
FROM cand c JOIN fences f ON c.query_id = f.query_id
WHERE c.dist_m <= f.fence
"""


_HULL_SCHEMA = StructType(
    [
        StructField("query_id", StringType()),
        StructField("seq", IntegerType()),
        StructField("lon_e7", IntegerType()),
        StructField("lat_e7", IntegerType()),
    ]
)


def convex_hull(
    stores: DataFrame, points: DataFrame, radius_m: float = CATCH_RADIUS_M
) -> DataFrame:
    """(query_id, seq, lon_e7, lat_e7): Andrew monotone-chain hull of each
    store's clients (A9), CCW from the lexicographically smallest vertex."""
    cand = _clients(stores, points, radius_m)
    p = points.select(
        F.col("image_id").alias("point_id"),
        F.col("lon_e7").alias("plon"),
        F.col("lat_e7").alias("plat"),
    )
    pts = cand.join(p, "point_id").select("query_id", "plon", "plat")

    def hull(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        xy = np.unique(
            np.stack([pdf["plon"].to_numpy(np.int64), pdf["plat"].to_numpy(np.int64)], axis=1),
            axis=0,
        )  # sorted lexicographically by (x, y)
        if len(xy) <= 2:
            out = xy
        else:

            def half(pts_arr):
                h: list[np.ndarray] = []
                for pt in pts_arr:
                    while len(h) >= 2 and np.cross(h[-1] - h[-2], pt - h[-2]) <= 0:
                        h.pop()
                    h.append(pt)
                return h

            lower = half(xy)
            upper = half(xy[::-1])
            out = np.array(lower[:-1] + upper[:-1], dtype=np.int64)
        return pd.DataFrame(
            {
                "query_id": key[0],
                "seq": np.arange(len(out), dtype=np.int32),
                "lon_e7": out[:, 0].astype(np.int32),
                "lat_e7": out[:, 1].astype(np.int32),
            }
        )

    from ..partitioning import repartition_for_python_groups

    pts = repartition_for_python_groups(pts, "query_id")
    return pts.groupBy("query_id").applyInPandas(hull, schema=_HULL_SCHEMA)


def convex_hull_oracle_sql(fix: str, radius_m: float = CATCH_RADIUS_M) -> str:
    """Differential SQL oracle for the monotone-chain hull: a point pair
    (a,b) is a hull edge iff every other candidate lies strictly left of
    a->b, or on the segment strictly between them (exact BIGINT
    cross/dot products — matches the chain's `cross <= 0` pop, which
    drops collinear mid-edge points). Hull vertices = edge endpoints;
    CCW seq recovered by angle around the vertex centroid starting from
    the lexicographically smallest vertex (identical to Andrew's
    lower-then-upper order for a strictly convex result)."""
    d2 = equirect_d2_sql("q.lon_e7", "q.lat_e7", "p.lon_e7", "p.lat_e7")
    from ..geo import M_PER_DEG_LAT, M_PER_DEG_LON

    dlon = int(radius_m / M_PER_DEG_LON * 1e7)
    dlat = int(radius_m / M_PER_DEG_LAT * 1e7)
    cross = (
        "(CAST(b.x - a.x AS BIGINT) * (p.y - a.y) - CAST(b.y - a.y AS BIGINT) * (p.x - a.x))"
    )
    dot = "(CAST(p.x - a.x AS BIGINT) * (b.x - a.x) + CAST(p.y - a.y AS BIGINT) * (b.y - a.y))"
    len2 = "(CAST(b.x - a.x AS BIGINT) * (b.x - a.x) + CAST(b.y - a.y AS BIGINT) * (b.y - a.y))"
    return f"""
WITH cand AS (
  SELECT DISTINCT q.query_id, p.lon_e7 AS x, p.lat_e7 AS y
  FROM read_parquet('{fix}/query_points.parquet') q
  JOIN read_parquet('{fix}/image_geo.parquet') p
    ON p.lon_e7 BETWEEN q.lon_e7 - {dlon} AND q.lon_e7 + {dlon}
   AND p.lat_e7 BETWEEN q.lat_e7 - {dlat} AND q.lat_e7 + {dlat}
  WHERE {d2} <= {radius_m * radius_m!r}
), nn AS (
  SELECT query_id, count(*) AS n FROM cand GROUP BY query_id
), small AS (
  SELECT c.query_id,
         CAST(row_number() OVER (PARTITION BY c.query_id ORDER BY c.x, c.y) - 1 AS INT) AS seq,
         c.x AS lon_e7, c.y AS lat_e7
  FROM cand c JOIN nn USING (query_id) WHERE nn.n <= 2
), edges AS (
  SELECT a.query_id, a.x AS ax, a.y AS ay
  FROM cand a JOIN cand b ON a.query_id = b.query_id AND (a.x <> b.x OR a.y <> b.y)
  JOIN nn ON nn.query_id = a.query_id AND nn.n >= 3
  WHERE NOT EXISTS (
    SELECT 1 FROM cand p
    WHERE p.query_id = a.query_id
      AND (p.x <> a.x OR p.y <> a.y) AND (p.x <> b.x OR p.y <> b.y)
      AND NOT ({cross} > 0
               OR ({cross} = 0 AND {dot} > 0 AND {dot} < {len2}))
  )
), hv AS (
  SELECT DISTINCT query_id, ax AS x, ay AS y FROM edges
), cent AS (
  SELECT query_id, avg(CAST(x AS DOUBLE)) AS cx, avg(CAST(y AS DOUBLE)) AS cy
  FROM hv GROUP BY query_id
), ang AS (
  SELECT hv.query_id, hv.x, hv.y, atan2(hv.y - c.cy, hv.x - c.cx) AS th
  FROM hv JOIN cent c USING (query_id)
), th0 AS (
  SELECT query_id, th AS th0 FROM (
    SELECT query_id, th, row_number() OVER (PARTITION BY query_id ORDER BY x, y) AS rn
    FROM ang) WHERE rn = 1
), big AS (
  SELECT a.query_id,
         CAST(row_number() OVER (PARTITION BY a.query_id
              ORDER BY CASE WHEN a.th - t.th0 < 0 THEN a.th - t.th0 + 2 * pi()
                            ELSE a.th - t.th0 END) - 1 AS INT) AS seq,
         a.x AS lon_e7, a.y AS lat_e7
  FROM ang a JOIN th0 t USING (query_id)
)
SELECT * FROM small UNION ALL SELECT * FROM big
"""


# ---------------------------------------------------------------------------
# A11: sample-weighted median speed ratio per density class (calibrate.rs)
# ---------------------------------------------------------------------------


def weighted_median_ratio(observations: DataFrame, way_attrs: DataFrame) -> DataFrame:
    """(density_class, ratio): weighted median of observed/model car speed
    per class, clamped to [0.5, 1.5]. Median = the first ratio (ordered by
    ratio, then way_id for determinism) whose cumulative sample weight
    reaches half the class total — an actual data value, exact on both
    engines."""
    j = observations.join(
        way_attrs.select("way_id", "density_class", "speed_car_kmh"), "way_id"
    ).filter(F.col("speed_car_kmh").isNotNull())
    r = j.select(
        "density_class",
        "way_id",
        (F.col("observed_kmh") / F.col("speed_car_kmh")).alias("ratio"),
        F.col("samples").cast("long").alias("w"),
    )
    win = Window.partitionBy("density_class").orderBy("ratio", "way_id")
    tot = Window.partitionBy("density_class")
    med = (
        r.withColumn("cum", F.sum("w").over(win))
        .withColumn("half", F.sum("w").over(tot) / 2.0)
        .filter(F.col("cum") >= F.col("half"))
        .groupBy("density_class")
        .agg(F.min(F.struct("ratio", "way_id")).alias("m"))
    )
    clamped = F.least(F.greatest(F.col("m.ratio"), F.lit(0.5)), F.lit(1.5))
    return med.select("density_class", F.round(clamped, 6).alias("ratio")).orderBy("density_class")


def weighted_median_oracle_sql(fix: str, way_attrs_sql: str) -> str:
    """Oracle over the observations fixture + the way_attrs oracle CTE."""
    return f"""
WITH wa AS ({way_attrs_sql}),
j AS (
  SELECT wa.density_class, o.way_id,
         o.observed_kmh / wa.speed_car_kmh AS ratio,
         CAST(o.samples AS BIGINT) AS w
  FROM read_parquet('{fix}/observations.parquet') o
  JOIN wa ON o.way_id = wa.way_id
  WHERE wa.speed_car_kmh IS NOT NULL
), c AS (
  SELECT density_class, way_id, ratio, w,
         sum(w) OVER (PARTITION BY density_class ORDER BY ratio, way_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(w) OVER (PARTITION BY density_class) / 2.0 AS half
  FROM j
), m AS (
  SELECT density_class, min({{'ratio': ratio, 'way_id': way_id}}) AS m
  FROM c WHERE cum >= half GROUP BY density_class)
SELECT density_class, round(least(greatest(m.ratio, 0.5), 1.5), 6) AS ratio
FROM m ORDER BY density_class
"""


# ---------------------------------------------------------------------------
# A12: flow accumulation (explode paths -> groupBy arc -> sum weight)
# ---------------------------------------------------------------------------


def flow_accumulation(way_nodes: DataFrame) -> DataFrame:
    """(u, v, flow): traversal count per undirected arc across all ways —
    each way deposits weight 1 on each of its consecutive node pairs;
    arcs are keyed (min, max) so opposing directions accumulate together."""
    w = Window.partitionBy("way_id").orderBy("seq")
    pairs = way_nodes.select(
        "way_id", "node_id", F.lead("node_id").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    return (
        pairs.select(
            F.least("node_id", "nxt").alias("u"), F.greatest("node_id", "nxt").alias("v")
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("flow"))
    )


def flow_accumulation_oracle_sql(fix: str) -> str:
    return f"""
WITH pairs AS (
  SELECT node_id, lead(node_id) OVER (PARTITION BY way_id ORDER BY seq) AS nxt
  FROM read_parquet('{fix}/way_nodes.parquet'))
SELECT least(node_id, nxt) AS u, greatest(node_id, nxt) AS v, count(*) AS flow
FROM pairs WHERE nxt IS NOT NULL GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# P12: fuzzy name match (levenshtein suggestion, butterfly-common/src/fuzzy.rs)
# ---------------------------------------------------------------------------

MISSPELLED = ["Wya 12", "way 100", "Wey 1", "waay 2000"]


def fuzzy_name_match(way_tags: DataFrame, queries: list[str] | None = None) -> DataFrame:
    """(query, suggestion, distance): closest way name by levenshtein,
    ties broken lexicographically — the CLI region-name suggestion."""
    queries = queries or MISSPELLED
    names = way_tags.filter(F.col("key") == "name").select(F.col("value").alias("name")).distinct()
    q = F.explode(F.array(*[F.lit(s) for s in queries])).alias("query")
    pairs = names.select(q, "name").withColumn("distance", F.levenshtein("query", "name"))
    w = Window.partitionBy("query").orderBy("distance", "name")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query", F.col("name").alias("suggestion"), F.col("distance").cast("int").alias("distance"))
    )


def fuzzy_name_oracle_sql(fix: str, queries: list[str] | None = None) -> str:
    queries = queries or MISSPELLED
    vals = ", ".join(f"('{s}')" for s in queries)
    return f"""
WITH names AS (
  SELECT DISTINCT value AS name FROM read_parquet('{fix}/way_tags.parquet') WHERE key = 'name'
), q(query) AS (VALUES {vals}),
ranked AS (
  SELECT q.query, n.name, levenshtein(q.query, n.name) AS distance,
         row_number() OVER (PARTITION BY q.query ORDER BY levenshtein(q.query, n.name), n.name) AS rn
  FROM q CROSS JOIN names n)
SELECT query, name AS suggestion, CAST(distance AS INT) AS distance FROM ranked WHERE rn = 1
"""
