"""Structured Streaming ingestion: cell-windowed counts + stateful dedup.

The reference's streaming surface is its GTFS-RT realtime module
(route/src/transit/realtime.rs — out of graft scope per SURVEY §1.1);
what a 100 TB image-ingest pipeline actually needs from streams is
(a) incremental tile/occupancy statistics with late-data handling and
(b) stateful dedup of re-delivered rows. Both land on stock Structured
Streaming primitives:

- ``streaming_cell_counts``: event-time windowed counts per grid cell
  (the incremental form of the region-tile occupancy aggregate A4/A14) —
  watermark bounds state, same ``cells.cell_col`` expression as batch,
  so a batch groupBy over the same files produces IDENTICAL rows (the
  endpoint-consistency discipline, asserted in tests with an
  availableNow trigger).
- ``streaming_dedup``: drop re-delivered image rows within the watermark
  (``dropDuplicatesWithinWatermark`` — bounded state, the streaming
  analog of exact_dedup).

At scale: file-source streaming over an object-store landing zone, one
micro-batch per discovered file set; sinks partitioned by coarse cell;
checkpointLocation carries the per-partition lineage the same way the
batch checkpoint table does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from .. import cells

STREAM_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("lon_e7", IntegerType()),
        StructField("lat_e7", IntegerType()),
        StructField("event_time", TimestampType()),
    ]
)


def read_image_stream(spark: SparkSession, input_dir: str, max_files: int = 16) -> DataFrame:
    """File-source stream of georeferenced image rows (landing-zone shape)."""
    return (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def streaming_cell_counts(
    stream: DataFrame,
    res: int = 9,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """(window_start, cell_id, n) — event-time windowed occupancy per grid
    cell; watermark bounds state and admits late rows up to its horizon."""
    return (
        stream.withColumn("cell_id", cells.cell_col("lon_e7", "lat_e7", res))
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), "cell_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "cell_id", "n")
    )


def batch_cell_counts(df: DataFrame, res: int = 9, window: str = "10 minutes") -> DataFrame:
    """The batch plan of the same aggregation — used by tests to assert
    stream == batch exactly (same query, two engines)."""
    return (
        df.withColumn("cell_id", cells.cell_col("lon_e7", "lat_e7", res))
        .groupBy(F.window("event_time", window).alias("w"), "cell_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "cell_id", "n")
    )


def streaming_dedup(stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Drop re-delivered image_ids within the watermark horizon (bounded
    state): the streaming analog of exact dedup."""
    return stream.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        ["image_id"]
    )
