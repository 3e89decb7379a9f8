"""Point-in-polygon join (J8): cover-cell equi-join + ray-casting refine.

Reference semantics: bbox/grid envelope prefilter (J7,
route/src/server/snap_index.rs:767-812 ``samples_in_envelope``) then
even-odd ray casting per candidate (route/src/server/avoid.rs:521-550
``find_avoided_edges``; standalone even-odd PIP
route/src/server/catchment.rs:439-460,
route/src/range/sparse_contour.rs:920-933).

Spark-first design (SURVEY.md §7.1 step 4):
1. polygons -> cover cells at an adaptive resolution (reference adaptive
   cell sizing, sparse_contour.rs:515-545). Cells are ``full`` (entirely
   inside: no edge bbox touches the cell AND the cell center is inside)
   or ``partial``. The classifier is conservative — anything not provably
   full is partial, so correctness never depends on it, only the amount
   of ray-casting work.
2. points join cover cells on cell_id (res is packed inside the id) — a
   broadcast equi-join (cover set is tiny vs the point table).
3. ``full``-cell candidates pass with ZERO per-point work (the big win at
   scale); ``partial``-cell candidates are ray-cast by a JVM higher-order
   expression over the polygon's broadcast edge array (even-odd parity =
   ``size(filter(edges, crossing)) % 2`` — no Python boundary, no extra
   exchange in the refine path).

The ray-cast uses the exact expression ``px < (x2-x1)*(py-y1)/(y2-y1)+x1``
in float64 so the DuckDB oracle (same expression in SQL) matches
bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import cells

# Adaptive resolution: finest res whose cover for the polygon bbox stays
# under this cell count.
MAX_COVER_CELLS = 256
MIN_RES, MAX_RES = 7, 13
# broadcast the polygon cover set only below this row count (same gate
# rationale as operators.knn.BROADCAST_MAX_ROWS: the "request-sized
# polygon set" assumption is an input property, not an invariant — a
# million-polygon overlay must shuffle-join on cell_id instead)
BROADCAST_MAX_ROWS = 4_000_000

_COVER_SCHEMA = StructType(
    [
        StructField("polygon_id", StringType()),
        StructField("res", IntegerType()),
        StructField("cell_id", LongType()),
        StructField("coverage", StringType()),  # 'full' | 'partial'
    ]
)

def _raycast_np(px: np.ndarray, py: np.ndarray, x1, y1, x2, y2) -> np.ndarray:
    """Even-odd crossing parity for points (px,py) vs an edge set —
    vectorized (n_points x n_edges). Expression order matches the SQL
    oracle exactly (IEEE determinism)."""
    px = px[:, None]
    py = py[:, None]
    cond = (y1[None, :] > py) != (y2[None, :] > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1)[None, :] * (py - y1[None, :]) / (y2 - y1)[None, :] + x1[None, :]
    crossing = cond & (px < xint)
    return (crossing.sum(axis=1) % 2).astype(bool)


def _pick_res(min_x: int, max_x: int, min_y: int, max_y: int) -> int:
    for res in range(MAX_RES, MIN_RES - 1, -1):
        s = cells.SIZE_E7[res]
        nx = (max_x + cells.OFF_LON_E7) // s - (min_x + cells.OFF_LON_E7) // s + 1
        ny = (max_y + cells.OFF_LAT_E7) // s - (min_y + cells.OFF_LAT_E7) // s + 1
        if nx * ny <= MAX_COVER_CELLS:
            return res
    return MIN_RES


def _cover_one(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("seq")
    pid = pdf["polygon_id"].iloc[0]
    vx = pdf["x"].to_numpy(np.int64)
    vy = pdf["y"].to_numpy(np.int64)
    ex1, ey1 = vx, vy
    ex2, ey2 = np.roll(vx, -1), np.roll(vy, -1)
    res = _pick_res(int(vx.min()), int(vx.max()), int(vy.min()), int(vy.max()))
    s = cells.SIZE_E7[res]
    gx, gy = cells.cover_bbox_py(int(vx.min()), int(vy.min()), int(vx.max()), int(vy.max()), res)
    bx0 = (np.minimum(ex1, ex2) + cells.OFF_LON_E7) // s
    bx1 = (np.maximum(ex1, ex2) + cells.OFF_LON_E7) // s
    by0 = (np.minimum(ey1, ey2) + cells.OFF_LAT_E7) // s
    by1 = (np.maximum(ey1, ey2) + cells.OFF_LAT_E7) // s
    touch = (
        (gx[:, None] >= bx0[None, :])
        & (gx[:, None] <= bx1[None, :])
        & (gy[:, None] >= by0[None, :])
        & (gy[:, None] <= by1[None, :])
    ).any(axis=1)
    cx = (gx * s - cells.OFF_LON_E7 + s // 2).astype(np.float64)
    cy = (gy * s - cells.OFF_LAT_E7 + s // 2).astype(np.float64)
    inside = _raycast_np(
        cx, cy, ex1.astype(np.float64), ey1.astype(np.float64), ex2.astype(np.float64), ey2.astype(np.float64)
    )
    keep = touch | inside
    return pd.DataFrame(
        {
            "polygon_id": pid,
            "res": np.full(int(keep.sum()), res, dtype=np.int32),
            "cell_id": cells.pack_np(gx, gy, res)[keep],
            "coverage": np.where(touch[keep], "partial", "full"),
        }
    )


def polygon_cover_cells(polygons: DataFrame) -> DataFrame:
    """(polygon_id, res, cell_id, coverage) — distributed, one group per
    polygon, pure numpy per group. The gather keeps explicit parallelism
    (tiny bytes, real per-group compute — see partitioning.py)."""
    from ..partitioning import repartition_for_python_groups

    exploded = polygons.select("polygon_id", F.posexplode("ring").alias("seq", "v")).select(
        "polygon_id", "seq", F.col("v.lon_e7").alias("x"), F.col("v.lat_e7").alias("y")
    )
    exploded = repartition_for_python_groups(exploded, "polygon_id")
    return exploded.groupBy("polygon_id").applyInPandas(_cover_one, schema=_COVER_SCHEMA)


def polygon_edges_df(polygons: DataFrame) -> DataFrame:
    """Closed edge list from the nested ring column (wrap-around edge via
    lead + first over the ring window)."""
    w = Window.partitionBy("polygon_id").orderBy("seq")
    v = polygons.select("polygon_id", F.posexplode("ring").alias("seq", "v")).select(
        "polygon_id", "seq", F.col("v.lon_e7").alias("x1"), F.col("v.lat_e7").alias("y1")
    )
    return v.select(
        "polygon_id",
        "seq",
        "x1",
        "y1",
        F.coalesce(F.lead("x1").over(w), F.first("x1").over(w)).alias("x2"),
        F.coalesce(F.lead("y1").over(w), F.first("y1").over(w)).alias("y2"),
    )


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    id_col: str = "image_id",
    lon_col: str = "lon_e7",
    lat_col: str = "lat_e7",
) -> DataFrame:
    """(point_id, polygon_id) pairs where the point is inside the polygon
    (even-odd). Points exactly on edges follow the raycast convention.

    Round-6 refine: the former cogrouped applyInPandas (2 exchanges +
    2 sorts + REFINE_SALTS skew machinery) is replaced by a shuffle-free
    ``mapInPandas`` over the candidate stream with the polygon edge
    arrays shipped once per executor via ``sc.broadcast`` — same
    vectorized numpy kernel, zero added exchanges. Beyond the broadcast
    gate (unbounded polygon sets, nothing may be collected) the refine
    instead joins per-polygon edge arrays and evaluates the even-odd
    parity as a JVM higher-order expression. Both paths use the exact
    float64 op order of the SQL oracle (``(x2-x1)*(py-y1)/(y2-y1)+x1``),
    so results stay bit-exact (parity pytest covers the fallback)."""
    cover = polygon_cover_cells(polygons).persist()
    # one cached-scan aggregate serves both driver decisions: the
    # resolutions present (point explode fan-out) and the total row count
    # (broadcast gate — cover is bounded per polygon by MAX_COVER_CELLS
    # but NOT in polygon count, so past the gate the cover join falls
    # back to a shuffle join on cell_id)
    res_counts = cover.groupBy("res").count().collect()
    res_list = sorted(r["res"] for r in res_counts)
    cover_rows = sum(r["count"] for r in res_counts)

    # ONE point scan + ONE broadcast join: each point emits its cell id at
    # every resolution present in the cover (res is packed inside the id,
    # so distinct resolutions can never collide on the join key). Fan-out
    # is |res_list| <= 7, vs the previous per-res scan+join+union chain.
    pts = points.select(
        F.col(id_col).alias("point_id"),
        F.col(lon_col).cast("double").alias("px"),
        F.col(lat_col).cast("double").alias("py"),
        F.explode(
            F.array(*[cells.cell_col(lon_col, lat_col, res) for res in res_list])
        ).alias("cell_id"),
    )
    cov_sel = cover.select("cell_id", "polygon_id", "coverage")
    if cover_rows <= BROADCAST_MAX_ROWS:
        cov_sel = F.broadcast(cov_sel)
    cand = pts.join(cov_sel, "cell_id", "inner").select(
        "point_id", "px", "py", "polygon_id", "coverage"
    )

    full_hits = cand.filter(F.col("coverage") == "full").select("point_id", "polygon_id")
    partial = cand.filter(F.col("coverage") == "partial").select(
        "point_id", "px", "py", "polygon_id"
    )

    if cover_rows <= BROADCAST_MAX_ROWS:
        # request-sized polygon set: ship the closed edge arrays to every
        # task as ONE torrent broadcast (not a per-task closure) and
        # ray-cast the candidate stream in-place with the vectorized
        # numpy kernel — mapInPandas directly over the broadcast cover
        # join output, so the refine path adds ZERO exchanges and no
        # per-polygon task skew (any task refines any polygon's rows).
        rows = polygons.select("polygon_id", "ring").collect()
        edge_map = {}
        for r in rows:
            vx = np.array([v["lon_e7"] for v in r["ring"]], dtype=np.float64)
            vy = np.array([v["lat_e7"] for v in r["ring"]], dtype=np.float64)
            edge_map[r["polygon_id"]] = (vx, vy, np.roll(vx, -1), np.roll(vy, -1))
        bc = points.sparkSession.sparkContext.broadcast(edge_map)

        def refine_stream(batches):
            em = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                hits = []
                for pid, g in pdf.groupby("polygon_id", sort=False):
                    x1, y1, x2, y2 = em[pid]
                    inside = _raycast_np(
                        g["px"].to_numpy(np.float64), g["py"].to_numpy(np.float64), x1, y1, x2, y2
                    )
                    if inside.any():
                        hits.append(g.loc[inside, ["point_id", "polygon_id"]])
                if hits:
                    yield pd.concat(hits, ignore_index=True)

        refined = partial.mapInPandas(refine_stream, schema="point_id string, polygon_id string")
    else:
        # unbounded polygon set: no driver-side collect — shuffle-join the
        # candidates to per-polygon edge arrays (built by ``transform``
        # over the ring, zero shuffles) and evaluate the even-odd parity
        # as a JVM higher-order expression. Same float64 op order as the
        # numpy kernel/oracle; NaN/Inf from a horizontal edge (y2 == y1)
        # is neutralized by the conjunction exactly as in numpy (cond is
        # false whenever y1 == y2).
        n_ring = F.size("ring")
        nxt = lambda i: ((i + F.lit(1)) % n_ring) + F.lit(1)  # noqa: E731
        edges_arr = F.transform(
            "ring",
            lambda v, i: F.struct(
                v["lon_e7"].cast("double").alias("x1"),
                v["lat_e7"].cast("double").alias("y1"),
                F.element_at(F.col("ring"), nxt(i))["lon_e7"].cast("double").alias("x2"),
                F.element_at(F.col("ring"), nxt(i))["lat_e7"].cast("double").alias("y2"),
            ),
        )
        poly_edges = polygons.select("polygon_id", edges_arr.alias("edges"))

        def _crossing(e):
            cond = (e["y1"] > F.col("py")) != (e["y2"] > F.col("py"))
            xint = (e["x2"] - e["x1"]) * (F.col("py") - e["y1"]) / (e["y2"] - e["y1"]) + e["x1"]
            return cond & (F.col("px") < xint)

        refined = (
            partial.join(poly_edges, "polygon_id")
            .filter(F.size(F.filter("edges", _crossing)) % 2 == 1)
            .select("point_id", "polygon_id")
        )
    # materialize the pair result once (cached), then release the cover —
    # repeated pip_join callers (warm-cache misses, incremental refreshes)
    # previously pinned one cover RDD per call for the session lifetime,
    # the same leak class the knn phase partials had. The returned frame
    # stays cached (bounded: one row per (point, polygon) hit); callers
    # that loop for a session lifetime should unpersist it when consumed.
    out = full_hits.unionByName(refined).persist()
    out.count()
    cover.unpersist()
    return out


def pip_oracle_sql(fix: str, point_table: str = "image_geo", id_col: str = "image_id", out_id: str = "point_id") -> str:
    """DuckDB oracle: bbox prefilter + the identical even-odd raycast,
    expressed relationally over the normalized polygon_edges fixture."""
    return f"""
WITH bbox AS (
  SELECT polygon_id, min(least(x1, x2)) AS minx, max(greatest(x1, x2)) AS maxx,
         min(least(y1, y2)) AS miny, max(greatest(y1, y2)) AS maxy
  FROM read_parquet('{fix}/polygon_edges.parquet') GROUP BY polygon_id
), cand AS (
  SELECT p.{id_col} AS {out_id}, CAST(p.lon_e7 AS DOUBLE) AS px, CAST(p.lat_e7 AS DOUBLE) AS py, b.polygon_id
  FROM read_parquet('{fix}/{point_table}.parquet') p JOIN bbox b
    ON p.lon_e7 >= b.minx AND p.lon_e7 <= b.maxx AND p.lat_e7 >= b.miny AND p.lat_e7 <= b.maxy
), crossings AS (
  SELECT c.{out_id}, c.polygon_id, count(*) AS n
  FROM cand c JOIN read_parquet('{fix}/polygon_edges.parquet') e ON c.polygon_id = e.polygon_id
  WHERE (CAST(e.y1 AS DOUBLE) > c.py) <> (CAST(e.y2 AS DOUBLE) > c.py)
    AND c.px < CAST(e.x2 - e.x1 AS DOUBLE) * (c.py - CAST(e.y1 AS DOUBLE)) / CAST(e.y2 - e.y1 AS DOUBLE) + CAST(e.x1 AS DOUBLE)
  GROUP BY c.{out_id}, c.polygon_id)
SELECT {out_id}, polygon_id FROM crossings WHERE n % 2 = 1
"""
