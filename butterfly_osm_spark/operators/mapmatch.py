"""HMM map-matching (J13) — candidate generation as a cell-equi join,
Viterbi as a per-trace applyInPandas DP.

Reference: route/src/server/map_match.rs — per-GPS-point candidates from
the spatial index (:104-208), Viterbi over emission (perpendicular
distance) x transition (route-vs-great-circle discrepancy) (:210-242,
:366-493). Spark-first shape (SURVEY.md J13 row):

1. way segments -> cover cells (bounded bbox explode, segments are
   short); GPS points -> 3x3 k-ring at the same resolution; candidates
   = cell equi-join + EXACT point-to-segment distance in pure Column
   arithmetic (projection clamp — no UDF).
2. top-K candidates per point via W1 window.
3. Viterbi per trace in applyInPandas — sequential DP within a group,
   groups are tiny (the reference's per-trace sequential core).

Emission cost d^2 / (2 sigma^2); transition cost |straight-line step of
the matched positions - GPS step| / beta (the great-circle proxy of the
reference's route-distance transition).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import cells
from ..geo import E7, M_PER_DEG_LAT, M_PER_DEG_LON

RES = 11  # ~446 m lon edge: 3x3 ring covers the 100 m candidate radius
MAX_CAND_DIST_M = 100.0
TOP_K = 5
SIGMA_M = 15.0
BETA_M = 30.0

_OUT_SCHEMA = StructType(
    [
        StructField("trace_id", StringType()),
        StructField("seq", IntegerType()),
        StructField("way_id", LongType()),
        StructField("seg_seq", IntegerType()),
        StructField("dist_m", DoubleType()),
    ]
)


def _meters(lon_col: str, lat_col: str) -> tuple:
    x = F.col(lon_col).cast("double") * F.lit(M_PER_DEG_LON / E7)
    y = F.col(lat_col).cast("double") * F.lit(M_PER_DEG_LAT / E7)
    return x, y


def way_segments(way_nodes: DataFrame, nodes: DataFrame) -> DataFrame:
    """(way_id, seg_seq, ax, ay, bx, by) — segment endpoints in equirect
    metres, plus e7 endpoints for cell covering."""
    wv = way_nodes.join(nodes, way_nodes.node_id == nodes.id).select(
        "way_id", "seq", "lon_e7", "lat_e7"
    )
    w = Window.partitionBy("way_id").orderBy("seq")
    pairs = wv.select(
        "way_id",
        F.col("seq").cast("int").alias("seg_seq"),
        "lon_e7",
        "lat_e7",
        F.lead("lon_e7").over(w).alias("nlon"),
        F.lead("lat_e7").over(w).alias("nlat"),
    ).filter(F.col("nlon").isNotNull())
    ax, ay = _meters("lon_e7", "lat_e7")
    bx, by = _meters("nlon", "nlat")
    return pairs.select(
        "way_id", "seg_seq", "lon_e7", "lat_e7", "nlon", "nlat",
        ax.alias("ax"), ay.alias("ay"), bx.alias("bx"), by.alias("by"),
    )


def _segment_cover(segs: DataFrame, res: int = RES) -> DataFrame:
    s = cells.SIZE_E7[res]
    ranges = segs.select(
        "way_id", "seg_seq", "ax", "ay", "bx", "by",
        ((F.least("lon_e7", "nlon") + F.lit(cells.OFF_LON_E7)).cast("long") / F.lit(s)).cast("long").alias("x0"),
        ((F.greatest("lon_e7", "nlon") + F.lit(cells.OFF_LON_E7)).cast("long") / F.lit(s)).cast("long").alias("x1"),
        ((F.least("lat_e7", "nlat") + F.lit(cells.OFF_LAT_E7)).cast("long") / F.lit(s)).cast("long").alias("y0"),
        ((F.greatest("lat_e7", "nlat") + F.lit(cells.OFF_LAT_E7)).cast("long") / F.lit(s)).cast("long").alias("y1"),
    )
    cx = ranges.select("way_id", "seg_seq", "ax", "ay", "bx", "by", F.explode(F.sequence("x0", "x1")).alias("cx"), "y0", "y1")
    cxy = cx.select("way_id", "seg_seq", "ax", "ay", "bx", "by", "cx", F.explode(F.sequence("y0", "y1")).alias("cy"))
    return cxy.select(
        "way_id", "seg_seq", "ax", "ay", "bx", "by",
        (F.lit(res << cells.RES_SHIFT) + F.col("cy") * F.lit(1 << cells.Y_SHIFT) + F.col("cx")).alias("cell_id"),
    )


def candidates(traces: DataFrame, way_nodes: DataFrame, nodes: DataFrame) -> DataFrame:
    """Top-K way-segment candidates per GPS point, exact clamped
    point-to-segment distance — all Column arithmetic."""
    segs = _segment_cover(way_segments(way_nodes, nodes))
    px, py = _meters("lon_e7", "lat_e7")
    offsets = F.array(
        *[F.lit(dy * (1 << cells.Y_SHIFT) + dx) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    )
    pts = traces.select(
        "trace_id",
        "seq",
        px.alias("px"),
        py.alias("py"),
        cells.cell_col("lon_e7", "lat_e7", RES).alias("qcell"),
        F.explode(offsets).alias("off"),
    ).select("trace_id", "seq", "px", "py", (F.col("qcell") + F.col("off")).alias("cell_id"))
    j = pts.join(segs, "cell_id")
    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")
    len2 = dx * dx + dy * dy
    t_raw = ((F.col("px") - F.col("ax")) * dx + (F.col("py") - F.col("ay")) * dy) / len2
    t = F.when(len2 > 0, F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))).otherwise(F.lit(0.0))
    cxm = F.col("ax") + t * dx
    cym = F.col("ay") + t * dy
    d2 = (F.col("px") - cxm) * (F.col("px") - cxm) + (F.col("py") - cym) * (F.col("py") - cym)
    cand = (
        j.withColumn("d2", d2)
        .withColumn("mx", cxm)
        .withColumn("my", cym)
        .filter(F.col("d2") <= F.lit(MAX_CAND_DIST_M**2))
        # a segment can enter via several cover cells -> dedup
        .dropDuplicates(["trace_id", "seq", "way_id", "seg_seq"])
    )
    w = Window.partitionBy("trace_id", "seq").orderBy("d2", "way_id", "seg_seq")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("trace_id", "seq", "way_id", "seg_seq", "px", "py", "mx", "my", "d2")
    )


def viterbi_match(traces: DataFrame, way_nodes: DataFrame, nodes: DataFrame) -> DataFrame:
    """(trace_id, seq, way_id, seg_seq, dist_m): most-likely segment per
    GPS point under the HMM. Points with no candidate are omitted
    (reference unmatched-gap semantics)."""
    cand = candidates(traces, way_nodes, nodes)

    def solve(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(columns=[f.name for f in _OUT_SCHEMA.fields])
        pdf = pdf.sort_values(["seq", "d2", "way_id", "seg_seq"])
        seqs = sorted(pdf["seq"].unique())
        groups = {s: g.reset_index(drop=True) for s, g in pdf.groupby("seq")}
        # DP
        prev_cost = None
        prev_back: list[np.ndarray] = []
        order: list[pd.DataFrame] = []
        for s in seqs:
            g = groups[s]
            emis = g["d2"].to_numpy() / (2 * SIGMA_M**2)
            if prev_cost is None:
                cost = emis
                back = np.full(len(g), -1)
            else:
                pg = order[-1]
                gps_step = float(
                    np.hypot(g["px"].iloc[0] - pg["px"].iloc[0], g["py"].iloc[0] - pg["py"].iloc[0])
                )
                step = np.hypot(
                    g["mx"].to_numpy()[:, None] - pg["mx"].to_numpy()[None, :],
                    g["my"].to_numpy()[:, None] - pg["my"].to_numpy()[None, :],
                )
                trans = np.abs(step - gps_step) / BETA_M
                total = emis[:, None] + trans + prev_cost[None, :]
                back = np.argmin(total, axis=1)
                cost = total[np.arange(len(g)), back]
            prev_cost = cost
            prev_back.append(back)
            order.append(g)
        # backtrack
        pick = int(np.argmin(prev_cost))
        chosen = []
        for i in range(len(order) - 1, -1, -1):
            g = order[i]
            chosen.append(
                (
                    key[0],
                    int(g["seq"].iloc[0]),
                    int(g["way_id"].iloc[pick]),
                    int(g["seg_seq"].iloc[pick]),
                    round(float(np.sqrt(g["d2"].iloc[pick])), 3),
                )
            )
            pick = int(prev_back[i][pick]) if prev_back[i][pick] >= 0 else 0
        chosen.reverse()
        return pd.DataFrame(chosen, columns=[f.name for f in _OUT_SCHEMA.fields])

    from ..partitioning import repartition_for_python_groups

    cand = repartition_for_python_groups(cand, "trace_id")
    return cand.groupBy("trace_id").applyInPandas(solve, schema=_OUT_SCHEMA)
