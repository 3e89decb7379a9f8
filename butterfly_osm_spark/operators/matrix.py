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
