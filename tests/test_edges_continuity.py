"""W5 path-ordering invariant: within a way, consecutive edges chain —
v_node of edge i equals u_node of edge i+1, and edge_seq is dense from 0
(reference response contract, docs/api.md:709-719)."""

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from butterfly_osm_spark.operators.extract import build_edges


def test_edge_chain_continuity(spark, fix001):
    edges = build_edges(
        spark.read.parquet(os.path.join(fix001, "osm_ways.parquet")),
        spark.read.parquet(os.path.join(fix001, "way_nodes.parquet")),
        spark.read.parquet(os.path.join(fix001, "osm_nodes.parquet")),
    )
    w = Window.partitionBy("way_id").orderBy("edge_seq")
    checked = edges.select(
        "way_id",
        "edge_seq",
        (F.lag("v_node").over(w) == F.col("u_node")).alias("chains"),
        (F.lag("edge_seq").over(w) == F.col("edge_seq") - 1).alias("dense"),
        F.lag("edge_seq").over(w).isNull().alias("is_first"),
    )
    bad = checked.where(
        (~F.col("is_first") & (~F.col("chains") | ~F.col("dense")))
        | (F.col("is_first") & (F.col("edge_seq") != 0))
    )
    assert bad.count() == 0
    # at least one multi-edge way actually exercised the lag check
    multi = edges.groupBy("way_id").count().where(F.col("count") > 1).count()
    assert multi > 0
