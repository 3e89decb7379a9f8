"""Bucket-mediated many-to-many join (J11 analog) + bbox aggregate (A2).

The reference's matrix engine deposits per-source distance buckets on
meeting nodes, then the backward pass joins buckets:
``d(s,t) = min_m d(s,m) + d(m,t)`` with prefix-sum bucket layout
(route/src/matrix/bucket_ch.rs:1-19; docs/architecture.md:155-168).
Structurally that is a two-phase aggregate-join: fwd JOIN bwd ON
meeting-key, GROUP BY (s, t), AGG min — a shuffle hash join + partial
aggregation, which is exactly what Spark executes here.

``same_way_matrix`` instantiates it with WAYS as the meeting buckets
and prefix-sum arc positions as the bucket payload: for node pairs
sharing a way, the along-way distance is |cum_s - cum_t|, minimised
over all shared ways. The prefix-sum position column mirrors the
reference's prefix-sum bucket layout 1:1.

At 10^12 scale the join shuffles on way_id (bounded bucket sizes — a
way has <= ~2000 vertices) and the aggregation is partial+final hash
agg; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..geo import haversine_m_col, haversine_m_sql

SRC_MOD = 97  # deterministic node samples: id % MOD == 0
DST_MOD = 89


def way_positions(way_nodes: DataFrame, nodes: DataFrame) -> DataFrame:
    """(way_id, node_id, pos_mm): prefix-sum arc position of every vertex
    along its way (the bucket payload)."""
    wv = way_nodes.join(nodes, way_nodes.node_id == nodes.id).select(
        "way_id", "seq", "node_id", "lon_e7", "lat_e7"
    )
    w = Window.partitionBy("way_id").orderBy("seq")
    seg = wv.select(
        "way_id",
        "seq",
        "node_id",
        F.coalesce(
            haversine_m_col(
                F.lag("lon_e7").over(w), F.lag("lat_e7").over(w), F.col("lon_e7"), F.col("lat_e7")
            ),
            F.lit(0.0),
        ).alias("seg_m"),
    )
    return seg.select(
        "way_id",
        "node_id",
        F.round(F.sum("seg_m").over(w.rowsBetween(Window.unboundedPreceding, 0)) * 1000, 0)
        .cast("long")
        .alias("pos_mm"),
    )


def same_way_matrix(way_nodes: DataFrame, nodes: DataFrame) -> DataFrame:
    """(src_id, dst_id, dist_mm): min along-way distance over shared ways
    for the deterministic node sample (src: id%97==0, dst: id%89==0)."""
    pos = way_positions(way_nodes, nodes)
    fwd = pos.filter(F.col("node_id") % SRC_MOD == 0).select(
        "way_id", F.col("node_id").alias("src_id"), F.col("pos_mm").alias("src_pos")
    )
    bwd = pos.filter(F.col("node_id") % DST_MOD == 0).select(
        "way_id", F.col("node_id").alias("dst_id"), F.col("pos_mm").alias("dst_pos")
    )
    return (
        fwd.join(bwd, "way_id")
        .filter(F.col("src_id") != F.col("dst_id"))
        .groupBy("src_id", "dst_id")
        .agg(F.min(F.abs(F.col("src_pos") - F.col("dst_pos"))).alias("dist_mm"))
    )


def same_way_matrix_oracle_sql(fix: str) -> str:
    hav = haversine_m_sql("plon", "plat", "lon_e7", "lat_e7")
    return f"""
WITH wv AS (
  SELECT w.way_id, w.seq, w.node_id, n.lon_e7, n.lat_e7
  FROM read_parquet('{fix}/way_nodes.parquet') w
  JOIN read_parquet('{fix}/osm_nodes.parquet') n ON w.node_id = n.id
), seg AS (
  SELECT way_id, seq, node_id, lon_e7, lat_e7,
         lag(lon_e7) OVER (PARTITION BY way_id ORDER BY seq) AS plon,
         lag(lat_e7) OVER (PARTITION BY way_id ORDER BY seq) AS plat
  FROM wv
), pos AS (
  SELECT way_id, node_id,
         CAST(round(sum(CASE WHEN plon IS NULL THEN 0.0 ELSE {hav} END)
              OVER (PARTITION BY way_id ORDER BY seq
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000, 0) AS BIGINT) AS pos_mm
  FROM seg)
SELECT f.node_id AS src_id, b.node_id AS dst_id, min(abs(f.pos_mm - b.pos_mm)) AS dist_mm
FROM pos f JOIN pos b ON f.way_id = b.way_id
WHERE f.node_id % {SRC_MOD} = 0 AND b.node_id % {DST_MOD} = 0 AND f.node_id <> b.node_id
GROUP BY 1, 2
"""


PHANTOM_RADIUS_M = 500.0


def phantom_positions(
    queries: DataFrame, way_nodes: DataFrame, nodes: DataFrame, radius_m: float = PHANTOM_RADIUS_M
) -> DataFrame:
    """G10 phantom endpoints (reference route/src/server/phantom.rs:1-24):
    snap each query point to its nearest way SEGMENT (clamped orthogonal
    projection in equirect metre space) and emit the exact fractional
    arc position pos_mm = cum_before + t * seg_len — the partial-edge
    cost the reference injects at matrix boundaries instead of rounding
    to the nearest vertex.

    Candidate rule (bounded join, mirrored exactly by the SQL oracle):
    segments whose FIRST endpoint lies within ``radius_m`` of the query
    (bbox/cell prefilter + exact check). Ties on the projected distance
    break by (way_id, seq).

    Output: (query_id, way_id, seq, t, pos_mm, snap_d2).
    """
    from ..geo import E7, M_PER_DEG_LAT, M_PER_DEG_LON
    from .tiles import radius_prefilter

    w = Window.partitionBy("way_id").orderBy("seq")
    wv = way_nodes.join(nodes, way_nodes.node_id == nodes.id).select(
        "way_id", "seq", "lon_e7", "lat_e7"
    )
    segs = (
        wv.select(
            "way_id",
            "seq",
            F.col("lon_e7").alias("x1"),
            F.col("lat_e7").alias("y1"),
            F.lead("lon_e7").over(w).alias("x2"),
            F.lead("lat_e7").over(w).alias("y2"),
        )
        .filter(F.col("x2").isNotNull())
        .withColumn("seg_m", haversine_m_col("x1", "y1", "x2", "y2"))
        .withColumn(
            "cum_before",
            F.coalesce(F.sum("seg_m").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0.0)),
        )
    )
    seg_pts = segs.select(
        F.concat_ws("#", F.col("way_id").cast("string"), F.col("seq").cast("string")).alias(
            "seg_key"
        ),
        F.col("x1").alias("lon_e7"),
        F.col("y1").alias("lat_e7"),
    )
    cand = radius_prefilter(queries, seg_pts, radius_m, point_id="seg_key").select(
        "query_id", F.col("point_id").alias("seg_key")
    )
    q = queries.select("query_id", F.col("lon_e7").alias("qlon"), F.col("lat_e7").alias("qlat"))
    segk = segs.withColumn(
        "seg_key",
        F.concat_ws("#", F.col("way_id").cast("string"), F.col("seq").cast("string")),
    )
    j = cand.join(q, "query_id").join(segk, "seg_key")
    ax = (F.col("qlon") - F.col("x1")).cast("double") * F.lit(M_PER_DEG_LON) / F.lit(float(E7))
    ay = (F.col("qlat") - F.col("y1")).cast("double") * F.lit(M_PER_DEG_LAT) / F.lit(float(E7))
    bx = (F.col("x2") - F.col("x1")).cast("double") * F.lit(M_PER_DEG_LON) / F.lit(float(E7))
    by = (F.col("y2") - F.col("y1")).cast("double") * F.lit(M_PER_DEG_LAT) / F.lit(float(E7))
    len2 = bx * bx + by * by
    t_raw = F.when(len2 > 0, (ax * bx + ay * by) / len2).otherwise(F.lit(0.0))
    t = F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
    proj = j.select(
        "query_id",
        "way_id",
        "seq",
        t.alias("t"),
        ((ax - t * bx) * (ax - t * bx) + (ay - t * by) * (ay - t * by)).alias("snap_d2"),
        "cum_before",
        "seg_m",
    )
    best = Window.partitionBy("query_id").orderBy("snap_d2", "way_id", "seq")
    return (
        proj.withColumn("rn", F.row_number().over(best))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            "way_id",
            F.col("seq").cast("int").alias("seq"),
            F.round("t", 6).alias("t"),
            F.round((F.col("cum_before") + F.col("t") * F.col("seg_m")) * 1000, 0)
            .cast("long")
            .alias("pos_mm"),
            "snap_d2",
        )
    )


def phantom_matrix(
    queries: DataFrame, way_nodes: DataFrame, nodes: DataFrame, radius_m: float = PHANTOM_RADIUS_M
) -> DataFrame:
    """(src_id, dst_id, way_id, dist_mm): exact along-way distances
    between phantom-snapped query points sharing a way — both endpoints
    carry their FRACTIONAL edge cost (t * seg_len), the G10 semantic the
    vertex-rounding J11 matrix approximates away."""
    ph = phantom_positions(queries, way_nodes, nodes, radius_m).select(
        "query_id", "way_id", "pos_mm"
    )
    a = ph.select("way_id", F.col("query_id").alias("src_id"), F.col("pos_mm").alias("pa"))
    b = ph.select("way_id", F.col("query_id").alias("dst_id"), F.col("pos_mm").alias("pb"))
    return (
        a.join(b, "way_id")
        .filter(F.col("src_id") < F.col("dst_id"))
        .select("src_id", "dst_id", "way_id", F.abs(F.col("pa") - F.col("pb")).alias("dist_mm"))
    )


def phantom_matrix_oracle_sql(fix: str, radius_m: float = PHANTOM_RADIUS_M) -> str:
    from ..geo import E7, M_PER_DEG_LAT, M_PER_DEG_LON

    hav = haversine_m_sql("x1", "y1", "x2", "y2")
    dlon = int(radius_m / M_PER_DEG_LON * 1e7)
    dlat = int(radius_m / M_PER_DEG_LAT * 1e7)
    d2 = (
        f"(CAST(CAST(q.lat_e7 AS BIGINT) - CAST(s.y1 AS BIGINT) AS DOUBLE) * {M_PER_DEG_LAT!r} / {float(E7)!r}) * "
        f"(CAST(CAST(q.lat_e7 AS BIGINT) - CAST(s.y1 AS BIGINT) AS DOUBLE) * {M_PER_DEG_LAT!r} / {float(E7)!r}) + "
        f"(CAST(CAST(q.lon_e7 AS BIGINT) - CAST(s.x1 AS BIGINT) AS DOUBLE) * {M_PER_DEG_LON!r} / {float(E7)!r}) * "
        f"(CAST(CAST(q.lon_e7 AS BIGINT) - CAST(s.x1 AS BIGINT) AS DOUBLE) * {M_PER_DEG_LON!r} / {float(E7)!r})"
    )
    return f"""
WITH wv AS (
  SELECT w.way_id, w.seq, n.lon_e7, n.lat_e7
  FROM read_parquet('{fix}/way_nodes.parquet') w
  JOIN read_parquet('{fix}/osm_nodes.parquet') n ON w.node_id = n.id
), sraw AS (
  SELECT way_id, seq, lon_e7 AS x1, lat_e7 AS y1,
         lead(lon_e7) OVER (PARTITION BY way_id ORDER BY seq) AS x2,
         lead(lat_e7) OVER (PARTITION BY way_id ORDER BY seq) AS y2
  FROM wv
), seg AS (
  SELECT *, {hav} AS seg_m,
         coalesce(sum({hav}) OVER (PARTITION BY way_id ORDER BY seq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS cum_before
  FROM sraw WHERE x2 IS NOT NULL
), cand AS (
  SELECT q.query_id, s.way_id, s.seq, s.x2, s.y2, s.seg_m, s.cum_before,
         (CAST(CAST(q.lon_e7 AS BIGINT) - CAST(s.x1 AS BIGINT) AS DOUBLE) * {M_PER_DEG_LON!r} / {float(E7)!r}) AS ax,
         (CAST(CAST(q.lat_e7 AS BIGINT) - CAST(s.y1 AS BIGINT) AS DOUBLE) * {M_PER_DEG_LAT!r} / {float(E7)!r}) AS ay,
         (CAST(CAST(s.x2 AS BIGINT) - CAST(s.x1 AS BIGINT) AS DOUBLE) * {M_PER_DEG_LON!r} / {float(E7)!r}) AS bx,
         (CAST(CAST(s.y2 AS BIGINT) - CAST(s.y1 AS BIGINT) AS DOUBLE) * {M_PER_DEG_LAT!r} / {float(E7)!r}) AS by
  FROM read_parquet('{fix}/query_points.parquet') q
  JOIN seg s
    ON s.x1 BETWEEN q.lon_e7 - {dlon} AND q.lon_e7 + {dlon}
   AND s.y1 BETWEEN q.lat_e7 - {dlat} AND q.lat_e7 + {dlat}
  WHERE {d2} <= {radius_m * radius_m!r}
), proj AS (
  SELECT query_id, way_id, seq, cum_before, seg_m,
         least(greatest(CASE WHEN bx * bx + by * by > 0
                             THEN (ax * bx + ay * by) / (bx * bx + by * by)
                             ELSE 0.0 END, 0.0), 1.0) AS t,
         (ax - least(greatest(CASE WHEN bx * bx + by * by > 0
                                   THEN (ax * bx + ay * by) / (bx * bx + by * by)
                                   ELSE 0.0 END, 0.0), 1.0) * bx)
       * (ax - least(greatest(CASE WHEN bx * bx + by * by > 0
                                   THEN (ax * bx + ay * by) / (bx * bx + by * by)
                                   ELSE 0.0 END, 0.0), 1.0) * bx)
       + (ay - least(greatest(CASE WHEN bx * bx + by * by > 0
                                   THEN (ax * bx + ay * by) / (bx * bx + by * by)
                                   ELSE 0.0 END, 0.0), 1.0) * by)
       * (ay - least(greatest(CASE WHEN bx * bx + by * by > 0
                                   THEN (ax * bx + ay * by) / (bx * bx + by * by)
                                   ELSE 0.0 END, 0.0), 1.0) * by) AS snap_d2
  FROM cand
), best AS (
  SELECT query_id, way_id,
         CAST(round((cum_before + t * seg_m) * 1000, 0) AS BIGINT) AS pos_mm,
         row_number() OVER (PARTITION BY query_id ORDER BY snap_d2, way_id, seq) AS rn
  FROM proj
), ph AS (SELECT query_id, way_id, pos_mm FROM best WHERE rn = 1)
SELECT a.query_id AS src_id, b.query_id AS dst_id, a.way_id,
       abs(a.pos_mm - b.pos_mm) AS dist_mm
FROM ph a JOIN ph b ON a.way_id = b.way_id AND a.query_id < b.query_id
"""


def bbox_aggregate(nodes: DataFrame) -> DataFrame:
    """A2: the nodes.sa header bbox (route/src/formats/nodes_sa.rs:129-152)."""
    return nodes.agg(
        F.min("lon_e7").alias("min_lon"),
        F.min("lat_e7").alias("min_lat"),
        F.max("lon_e7").alias("max_lon"),
        F.max("lat_e7").alias("max_lat"),
        F.count(F.lit(1)).alias("n_nodes"),
    )


def bbox_aggregate_oracle_sql(fix: str) -> str:
    return f"""
SELECT min(lon_e7) AS min_lon, min(lat_e7) AS min_lat,
       max(lon_e7) AS max_lon, max(lat_e7) AS max_lat, count(*) AS n_nodes
FROM read_parquet('{fix}/osm_nodes.parquet')
"""
