"""kNN snap via k-ring expansion join (J5) with iterative widening.

Reference semantics: concentric cell rings around the query cell with an
early exit once the accepted k-th best distance beats the next ring's
inner edge (route/src/server/snap_index.rs:833-904 ``iterate_rings``;
k-th-best tracking :625-754 ``snap_k_with_info_filtered_role``, the #525
dense-cell fix), under a 5 km snap cutoff (route/src/server/spatial.rs:9).

Spark-first shape (SURVEY.md §7.1 step 5):
- phase 1: queries x (3x3 k-ring) exploded -> cell-equi join against the
  cell-keyed node table -> window ``row_number() OVER (PARTITION BY query
  ORDER BY d2, node_id)`` (W1: deterministic ties by id).
- a query is DONE if its k-th candidate distance is strictly inside the
  guaranteed-covered radius (the ring-bound contract: every unexplored
  cell is at least one full cell edge away — snap_index.rs:891-902).
- phase 2 (the few unsatisfied queries, typically <10%): one bounded
  rectangle of cells that provably covers the full 5 km cutoff. No loop
  beyond this because the cutoff bounds the search a priori.

Ranking uses the reference's equirectangular metric with FIXED constants
(spatial.rs:226-230) — pure arithmetic on fixed-point ints, bit-identical
across Spark / numpy / DuckDB, so ranks match the SQL oracle exactly.
Reported dist_m is the same metric (sqrt), rounded to mm.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import cells
from ..geo import M_PER_DEG_LAT, M_PER_DEG_LON, equirect_d2_col, equirect_d2_sql

DEFAULT_RES = 10  # ~892 m lon edge, ~1387 m lat edge at res 10
CUTOFF_M = 5_000.0  # reference SNAP_CUTOFF (spatial.rs:9)


def _edge_m(res: int) -> tuple[float, float]:
    deg = cells.SIZE_E7[res] / 1e7
    return deg * M_PER_DEG_LON, deg * M_PER_DEG_LAT


def _cover_rect(res: int, cutoff_m: float) -> tuple[int, int]:
    """(rx, ry) such that every point within cutoff_m of the query lies in a
    cell with |dx|<=rx and |dy|<=ry of the query cell (floor-grid bound:
    coordinate delta d implies cell delta <= floor(d/size)+1)."""
    s = cells.SIZE_E7[res]
    dlon_e7 = cutoff_m / M_PER_DEG_LON * 1e7
    dlat_e7 = cutoff_m / M_PER_DEG_LAT * 1e7
    return int(dlon_e7 // s) + 1, int(dlat_e7 // s) + 1


def _candidates(queries: DataFrame, targets_cells: DataFrame, res: int, rx: int, ry: int) -> DataFrame:
    """Explode queries by the (2rx+1)x(2ry+1) cell rectangle and equi-join
    the cell-keyed targets."""
    offsets = F.array(
        *[
            F.lit(dy * (1 << cells.Y_SHIFT) + dx)
            for dx in range(-rx, rx + 1)
            for dy in range(-ry, ry + 1)
        ]
    )
    q = (
        queries.withColumn("qcell", cells.cell_col("lon_e7", "lat_e7", res))
        .select(
            "query_id",
            F.col("lon_e7").alias("qlon"),
            F.col("lat_e7").alias("qlat"),
            "k",
            "qcell",
            F.explode(offsets).alias("off"),
        )
        .select(
            "query_id", "qlon", "qlat", "k", (F.col("qcell") + F.col("off")).alias("cell_id")
        )
    )
    j = q.join(targets_cells, "cell_id", "inner")
    return j.select(
        "query_id",
        "k",
        "node_id",
        equirect_d2_col("qlon", "qlat", "nlon", "nlat").alias("d2"),
    )


def _rank_topk(cand: DataFrame, cutoff_m: float) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy("d2", "node_id")
    return (
        cand.filter(F.col("d2") <= F.lit(cutoff_m * cutoff_m))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
    )


def knn_join(
    queries: DataFrame,
    targets: DataFrame,
    res: int = DEFAULT_RES,
    cutoff_m: float = CUTOFF_M,
    target_id: str = "id",
) -> DataFrame:
    """Top-k nearest targets per query point under the snap cutoff.

    Output: (query_id, rank, node_id, dist_m) — rank 1-based by
    (d2, node_id); dist_m rounded to mm. Queries with no target inside
    the cutoff produce no rows (reference empty-snap semantics).
    """
    tc = targets.select(
        F.col(target_id).alias("node_id"),
        F.col("lon_e7").alias("nlon"),
        F.col("lat_e7").alias("nlat"),
        cells.cell_col("lon_e7", "lat_e7", res).alias("cell_id"),
    )

    edge_lon_m, edge_lat_m = _edge_m(res)
    # ring-bound: after scanning the 3x3 neighborhood, any unexplored point
    # is at least one full (smaller) cell edge away
    bound_m = min(edge_lon_m, edge_lat_m, cutoff_m)

    phase1 = _rank_topk(_candidates(queries, tc, res, 1, 1), cutoff_m).persist()
    kth = phase1.groupBy("query_id").agg(
        F.max("rank").alias("n_found"), F.max("d2").alias("kth_d2"), F.first("k").alias("k")
    )
    done_q = kth.filter(
        (F.col("n_found") >= F.col("k")) & (F.col("kth_d2") < F.lit(bound_m * bound_m))
    ).select("query_id")

    done = phase1.join(done_q, "query_id", "left_semi")
    todo = queries.join(done_q, "query_id", "left_anti")

    rx, ry = _cover_rect(res, cutoff_m)
    phase2 = _rank_topk(_candidates(todo, tc, res, rx, ry), cutoff_m)

    out = done.unionByName(phase2).select(
        "query_id",
        F.col("rank").cast("int").alias("rank"),
        "node_id",
        F.round(F.sqrt("d2"), 3).alias("dist_m"),
    )
    return out


def knn_oracle_sql(fix: str, cutoff_m: float = CUTOFF_M) -> str:
    """Brute-force oracle with bbox prefilter; identical metric/tie-break."""
    d2 = equirect_d2_sql("q.lon_e7", "q.lat_e7", "n.lon_e7", "n.lat_e7")
    dlon = int(cutoff_m / M_PER_DEG_LON * 1e7)
    dlat = int(cutoff_m / M_PER_DEG_LAT * 1e7)
    return f"""
WITH cand AS (
  SELECT q.query_id, q.k, n.id AS node_id, {d2} AS d2
  FROM read_parquet('{fix}/query_points.parquet') q
  JOIN read_parquet('{fix}/osm_nodes.parquet') n
    ON n.lon_e7 BETWEEN q.lon_e7 - {dlon} AND q.lon_e7 + {dlon}
   AND n.lat_e7 BETWEEN q.lat_e7 - {dlat} AND q.lat_e7 + {dlat}
), ranked AS (
  SELECT query_id, k, node_id, d2,
         row_number() OVER (PARTITION BY query_id ORDER BY d2, node_id) AS rank
  FROM cand WHERE d2 <= {cutoff_m * cutoff_m!r})
SELECT query_id, CAST(rank AS INT) AS rank, node_id, round(sqrt(d2), 3) AS dist_m
FROM ranked WHERE rank <= k
"""
