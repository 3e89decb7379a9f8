"""Declarative access/speed model compiled to Column expressions.

The reference evaluates JSON rule models over way tags at build step 2
(route/src/model/schema.rs:8-147, evaluate.rs, compile.rs — 1273 LoC of
rule compilation). Here the same idea is a dict compiled into pure
``when().otherwise()`` Column chains — whole-stage-codegen'd, zero UDF,
exactly the Catalyst-native shape of "constant-fold the rule program
once per build" (SURVEY.md §4 constant-folding row).

The model below is a faithful subset of models/car.model.json +
models/foot.model.json tag vocabulary (highway classes, oneway,
maxspeed) — enough to reproduce the included-way semi-join (J1) and
per-mode attribute projection the fixtures exercise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# mode -> {highway value: default speed km/h}; absent value = no access.
# Mirrors the class lists in /root/reference/models/car.model.json and
# foot.model.json (tag vocabulary also used by density.rs:194-210).
DEFAULT_MODEL: dict[str, dict[str, int]] = {
    "car": {
        "motorway": 110,
        "primary": 70,
        "secondary": 50,
        "tertiary": 40,
        "residential": 30,
    },
    "foot": {
        "primary": 5,
        "secondary": 5,
        "tertiary": 5,
        "residential": 5,
        "footway": 5,
        "track": 4,
    },
    "bike": {
        "secondary": 18,
        "tertiary": 18,
        "residential": 15,
        "footway": 12,
        "track": 14,
    },
}

# highway class -> density bucket (route/src/density.rs:50-139 5-bucket scheme)
DENSITY_CLASS = {
    "motorway": 0,
    "primary": 1,
    "secondary": 2,
    "tertiary": 2,
    "residential": 3,
    "footway": 4,
    "track": 4,
}


def compile_way_attrs(
    ways: DataFrame, model: dict[str, dict[str, int]] | None = None, highway_col: Column | None = None
) -> DataFrame:
    """Project per-way attribute columns from the tag map (reference step 2).

    Input: ways with ``id`` and ``tags MAP<STRING,STRING>`` (or pass
    ``highway_col`` for pre-extracted tags). Output columns:
    way_id, highway, oneway, maxspeed_kmh, density_class,
    access_{mode}, speed_{mode}_kmh for each mode.
    """
    model = model or DEFAULT_MODEL
    hw = highway_col if highway_col is not None else F.col("tags").getItem("highway")
    oneway = F.coalesce(F.col("tags").getItem("oneway") == F.lit("yes"), F.lit(False))
    maxspeed = F.col("tags").getItem("maxspeed").cast("int")

    out = ways.select(
        F.col("id").alias("way_id"),
        hw.alias("highway"),
        oneway.alias("oneway"),
        maxspeed.alias("maxspeed_kmh"),
    )

    dens = F.lit(None).cast("int")
    for cls, bucket in DENSITY_CLASS.items():
        dens = F.when(F.col("highway") == cls, F.lit(bucket)).otherwise(dens)
    out = out.withColumn("density_class", dens)

    for mode, classes in model.items():
        speed = F.lit(None).cast("int")
        for cls, kmh in classes.items():
            speed = F.when(F.col("highway") == cls, F.lit(kmh)).otherwise(speed)
        # speed cap: tag maxspeed caps the model default (deny/allow + cap
        # precedence of evaluate.rs, reduced to the cap rule our fixtures use)
        capped = F.when(
            F.col("maxspeed_kmh").isNotNull() & (F.col("maxspeed_kmh") < speed), F.col("maxspeed_kmh")
        ).otherwise(speed)
        out = out.withColumn(f"access_{mode}", speed.isNotNull())
        out = out.withColumn(f"speed_{mode}_kmh", capped)
    return out


def way_attrs_oracle_sql(way_tags_path: str, ways_path: str, model: dict[str, dict[str, int]] | None = None) -> str:
    """DuckDB SQL computing the identical projection from the normalized
    way_tags fixture (pivot by key, then the same CASE chains)."""
    model = model or DEFAULT_MODEL
    dens = "CASE " + " ".join(f"WHEN highway = '{c}' THEN {b}" for c, b in DENSITY_CLASS.items()) + " ELSE NULL END"
    mode_cols = []
    for mode, classes in model.items():
        sp = "CASE " + " ".join(f"WHEN highway = '{c}' THEN {k}" for c, k in classes.items()) + " ELSE NULL END"
        mode_cols.append(f"({sp}) IS NOT NULL AS access_{mode}")
        mode_cols.append(
            f"CASE WHEN maxspeed_kmh IS NOT NULL AND maxspeed_kmh < ({sp}) THEN maxspeed_kmh ELSE ({sp}) END AS speed_{mode}_kmh"
        )
    return f"""
WITH t AS (
  SELECT way_id,
         max(CASE WHEN key = 'highway' THEN value END) AS highway,
         coalesce(max(CASE WHEN key = 'oneway' THEN value END) = 'yes', FALSE) AS oneway,
         CAST(max(CASE WHEN key = 'maxspeed' THEN value END) AS INT) AS maxspeed_kmh
  FROM read_parquet('{way_tags_path}') GROUP BY way_id)
SELECT way_id, highway, oneway, maxspeed_kmh, {dens} AS density_class, {', '.join(mode_cols)}
FROM t
"""
