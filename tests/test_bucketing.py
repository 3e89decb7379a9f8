"""Bucketed-table co-location for the J2 coordinate join (reference
sorted nodes.sa access pattern, route/src/nbg/mod.rs:260-313): writing
``osm_nodes`` bucketed+sorted by id and ``way_nodes`` by node_id lets
Spark plan the explode-join with ZERO exchange (and zero sort) on the
bucketed sides — the Iceberg-bucketing claim of PLANS.md demonstrated on
the parquet-warehouse stand-in available in this container."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

N_BUCKETS = 8


@pytest.fixture(scope="module")
def warehouse(spark, fix001, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("bucketed_wh"))
    spark.sql("CREATE DATABASE IF NOT EXISTS bdemo")
    for tbl, src, key in [
        ("bdemo.osm_nodes_b", "osm_nodes", "id"),
        ("bdemo.way_nodes_b", "way_nodes", "node_id"),
    ]:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            spark.read.parquet(f"{fix001}/{src}.parquet")
            .write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", os.path.join(wh, tbl.split(".")[1]))
            .format("parquet")
            .mode("overwrite")
            .saveAsTable(tbl)
        )
    yield wh
    for tbl in ["bdemo.osm_nodes_b", "bdemo.way_nodes_b"]:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    shutil.rmtree(wh, ignore_errors=True)


class _no_broadcast:
    """Force the shuffle-join regime (at 100 TB neither side broadcasts —
    the tiny fixture would otherwise take a BroadcastHashJoin and the
    planner disables bucketing)."""

    KEYS = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.saved = {}
        for k in self.KEYS:
            try:
                self.saved[k] = self.spark.conf.get(k)
            except Exception:  # noqa: BLE001
                self.saved[k] = None
            self.spark.conf.set(k, "-1")

    def __exit__(self, *a):
        for k, v in self.saved.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)


def _j2_plan(spark, left, right) -> str:
    j = left.join(right, left.node_id == right.id).select(
        "way_id", "seq", "id", "lon_e7", "lat_e7"
    )
    return j._jdf.queryExecution().executedPlan().toString()


def test_bucketed_j2_join_has_no_exchange(spark, fix001, warehouse):
    wn = spark.table("bdemo.way_nodes_b")
    nd = spark.table("bdemo.osm_nodes_b")
    with _no_broadcast(spark):
        plan = _j2_plan(spark, wn, nd)
        assert "Exchange" not in plan, f"bucketed J2 join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan
        # and the result is identical to the plain-parquet join
        plain = (
            spark.read.parquet(f"{fix001}/way_nodes.parquet")
            .join(
                spark.read.parquet(f"{fix001}/osm_nodes.parquet"), F.col("node_id") == F.col("id")
            )
            .count()
        )
        assert wn.join(nd, wn.node_id == nd.id).count() == plain


def test_unbucketed_j2_join_shuffles(spark, fix001):
    """Control: the same join over plain parquet DOES exchange (unless the
    planner broadcasts at this tiny scale — accept either marker)."""
    wn = spark.read.parquet(f"{fix001}/way_nodes.parquet")
    nd = spark.read.parquet(f"{fix001}/osm_nodes.parquet")
    with _no_broadcast(spark):
        plan = _j2_plan(spark, wn, nd)
        assert "Exchange hashpartitioning" in plan
