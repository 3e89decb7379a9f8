"""Hot-cell salting for skewed cell-equi joins (north-rule requirement).

The reference hit exactly this skew: dense urban snap cells made kNN
quadratic until #525 (route/src/server/snap_index.rs:661-746; worst-cell
occupancy warning >8192 samples :256-276). In Spark the first line of
defence is AQE skew-join split (enabled in session.py); this module adds
the *explicit* salting pattern for deterministic, planner-independent
skew control:

1. detect hot cells with a cheap aggregate over the BUILD side (the
   occupancy count the reference logs);
2. build rows in hot cells get a deterministic salt
   ``xxhash64(row id) % n_salts`` appended to the join key;
3. probe rows targeting a hot cell fan out over ALL salts (cold cells
   fan out to the single salt 0) — a bounded explode driven by a
   broadcast hot-cell list.

The salted join is an ordinary equi-join on (cell_id, salt); results are
IDENTICAL to the unsalted join (asserted in tests — the FIXTURES.md §9
invariant), only the shuffle key cardinality changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_N_SALTS = 8


def hot_cells(build: DataFrame, key: str = "cell_id", threshold: int = 5000) -> DataFrame:
    """Cells whose build-side occupancy exceeds ``threshold`` (A-side of
    the reference's worst-cell occupancy warning)."""
    return (
        build.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > threshold)
        .select(key)
    )


def salted_join(
    build: DataFrame,
    probe: DataFrame,
    key: str = "cell_id",
    build_id: str | Column = "point_id",
    threshold: int = 5000,
    n_salts: int = DEFAULT_N_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe ⋈ build ON key`` with hot keys split n_salts ways.

    ``build_id`` must be a deterministic per-row column on the build side
    (salts are hash-derived, never random — resume/retry safe). Returns
    the joined DataFrame with helper columns dropped.
    """
    hot = hot_cells(build, key, threshold).withColumn("_hot", F.lit(True))
    b = (
        build.join(F.broadcast(hot), key, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_hot").isNotNull(), F.pmod(F.xxhash64(build_id), F.lit(n_salts))
            ).otherwise(F.lit(0)),
        )
        .drop("_hot")
    )
    p = (
        probe.join(F.broadcast(hot), key, "left")
        .withColumn(
            "_salt",
            F.explode(
                F.when(
                    F.col("_hot").isNotNull(),
                    F.sequence(F.lit(0), F.lit(n_salts - 1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("_hot")
    )
    return p.join(b, [key, "_salt"], how).drop("_salt")
