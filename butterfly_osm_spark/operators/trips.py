"""TSP trip optimisation (G6): NN construction + 2-opt local search per
trip group in applyInPandas.

Reference: route/src/server/trip.rs:46-242 — multi-start greedy nearest
neighbour then 2-opt/or-opt over the N x N matrix, N <= 100. Here the
matrix is equirect metres over the group's stops (the reference's
matrix comes from G4; the local-search core is identical). Row
parallelism across trips; each group is tiny and bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from ..geo import E7, M_PER_DEG_LAT, M_PER_DEG_LON

MAX_STOPS = 100

_OUT_SCHEMA = StructType(
    [
        StructField("trip_id", IntegerType()),
        StructField("stop_seq", IntegerType()),
        StructField("query_id", StringType()),
    ]
)


def nn_tour(d: np.ndarray) -> np.ndarray:
    """Greedy nearest-neighbour tour from stop 0 (ties by index)."""
    n = len(d)
    visited = np.zeros(n, dtype=bool)
    tour = [0]
    visited[0] = True
    for _ in range(n - 1):
        row = d[tour[-1]].copy()
        row[visited] = np.inf
        nxt = int(np.argmin(row))
        tour.append(nxt)
        visited[nxt] = True
    return np.array(tour)


def two_opt(tour: np.ndarray, d: np.ndarray, max_rounds: int = 20) -> np.ndarray:
    """First-improvement 2-opt until no improving swap (closed tour)."""
    n = len(tour)
    for _ in range(max_rounds):
        improved = False
        for i in range(n - 1):
            for j in range(i + 2, n):
                a, b = tour[i], tour[(i + 1) % n]
                c, e = tour[j], tour[(j + 1) % n]
                if a == e:
                    continue
                delta = d[a, c] + d[b, e] - d[a, b] - d[c, e]
                if delta < -1e-9:
                    tour[i + 1 : j + 1] = tour[i + 1 : j + 1][::-1]
                    improved = True
        if not improved:
            break
    return tour


def tour_length(tour: np.ndarray, d: np.ndarray) -> float:
    return float(d[tour, np.roll(tour, -1)].sum())


def tsp_trips(stops: DataFrame, stops_per_trip: int = 12) -> DataFrame:
    """(trip_id, stop_seq, query_id): group query points into trips by id
    hash and solve each with NN + 2-opt. Deterministic grouping keeps the
    op oracle-free but reproducible."""
    n_trips = max(1, stops.count() // stops_per_trip)
    # md5-derived trip assignment (not xxhash64) so the grouping is
    # reproducible outside the JVM — the tsp_truth golden fixture and
    # any SQL engine can replicate it exactly
    grouped = stops.select(
        "query_id",
        "lon_e7",
        "lat_e7",
        (
            F.conv(F.substring(F.md5(F.col("query_id").cast("binary")), 1, 15), 16, 10).cast("long")
            % F.lit(n_trips)
        ).cast("int").alias("trip_id"),
    )

    def solve(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("query_id").head(min(len(pdf), MAX_STOPS)).reset_index(drop=True)
        if len(pdf) == 0:
            return pd.DataFrame(columns=[f.name for f in _OUT_SCHEMA.fields])
        x = pdf["lon_e7"].to_numpy(np.float64) * M_PER_DEG_LON / E7
        y = pdf["lat_e7"].to_numpy(np.float64) * M_PER_DEG_LAT / E7
        d = np.hypot(x[:, None] - x[None, :], y[:, None] - y[None, :])
        tour = two_opt(nn_tour(d), d)
        return pd.DataFrame(
            {
                "trip_id": key[0],
                "stop_seq": np.arange(len(tour), dtype=np.int32),
                "query_id": pdf["query_id"].to_numpy()[tour],
            }
        )

    from ..partitioning import repartition_for_python_groups

    grouped = repartition_for_python_groups(grouped, "trip_id")
    return grouped.groupBy("trip_id").applyInPandas(solve, schema=_OUT_SCHEMA)
