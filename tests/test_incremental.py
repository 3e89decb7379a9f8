"""G8 cell-level incremental recompute (reference exclude.rs:514: work
proportional to the changed polygon, not the dataset)."""

import os

import pytest
from pyspark.sql import functions as F

from butterfly_osm_spark.incremental import incremental_pip, poly_coarse_cover


def _pairs(df):
    return sorted((r.point_id, r.polygon_id) for r in df.select("point_id", "polygon_id").collect())


@pytest.fixture(scope="module")
def inputs(spark, fix001):
    points = spark.read.parquet(os.path.join(fix001, "image_geo.parquet"))
    polygons = spark.read.parquet(os.path.join(fix001, "polygons.parquet"))
    return points, polygons


def _mutate_one(polygons, pid):
    """Shift one polygon's ring ~500 m east; leave every other row identical."""
    shifted = F.expr(
        "transform(ring, v -> named_struct('lon_e7', v.lon_e7 + 70000, 'lat_e7', v.lat_e7))"
    )
    return polygons.withColumn(
        "ring", F.when(F.col("polygon_id") == pid, shifted).otherwise(F.col("ring"))
    )


def test_incremental_touches_only_intersecting_cells(spark, inputs, tmp_path):
    points, polygons = inputs
    d = str(tmp_path / "inc")
    full_df, info0 = incremental_pip(spark, d, points, polygons)
    assert info0["full"] and info0["n_cells_total"] == len(info0["changed_cells"])
    base = _pairs(full_df)

    # no-op rerun: zero cells recomputed
    _, info_noop = incremental_pip(spark, d, points, polygons)
    assert info_noop["changed_cells"] == [] and not info_noop["full"]

    pid = polygons.select("polygon_id").orderBy("polygon_id").limit(1).collect()[0][0]
    mutated = _mutate_one(polygons, pid)
    inc_df, info = incremental_pip(spark, d, points, mutated)

    # recompute scope == the polygon's old+new coarse bbox cover, a tiny
    # fraction of all cells
    allowed = {
        str(r["cell_p"])
        for r in poly_coarse_cover(
            polygons.where(F.col("polygon_id") == pid).unionByName(
                mutated.where(F.col("polygon_id") == pid)
            )
        ).collect()
    }
    assert set(info["changed_cells"]) <= allowed
    assert 0 < len(info["changed_cells"]) < info["n_cells_total"] / 4

    # published table == a from-scratch full run on the mutated inputs
    d2 = str(tmp_path / "scratch")
    scratch_df, _ = incremental_pip(spark, d2, points, mutated)
    assert _pairs(inc_df) == _pairs(scratch_df)
    assert _pairs(inc_df) != base  # the mutation really changed the overlay


def test_incremental_polygon_removal_cleans_partitions(spark, inputs, tmp_path):
    points, polygons = inputs
    d = str(tmp_path / "inc")
    incremental_pip(spark, d, points, polygons)
    pid = polygons.select("polygon_id").orderBy("polygon_id").limit(1).collect()[0][0]
    reduced = polygons.where(F.col("polygon_id") != pid)
    inc_df, info = incremental_pip(spark, d, points, reduced)
    assert len(info["changed_cells"]) > 0
    d2 = str(tmp_path / "scratch")
    scratch_df, _ = incremental_pip(spark, d2, points, reduced)
    assert _pairs(inc_df) == _pairs(scratch_df)
    assert all(pid != p for _, p in _pairs(inc_df))

    # remove EVERY polygon: all partitions drop, result is a typed empty
    # frame (not an unreadable empty parquet dir)
    none_df, info_none = incremental_pip(
        spark, d, points, polygons.where(F.lit(False))
    )
    assert info_none["n_cells_total"] == 0 and len(info_none["changed_cells"]) > 0
    assert none_df.count() == 0
    assert set(none_df.columns) == {"point_id", "polygon_id", "cell_p"}


def test_cell_fingerprint_not_involutive_on_duplicates(spark, inputs):
    """Round-3 advice: the per-cell combine must NOT self-cancel — adding
    an exact duplicate (polygon_id, ring) row has to change the covered
    cells' fingerprints (bit_xor of two identical hashes was 0)."""
    from butterfly_osm_spark.incremental import cell_fingerprints

    _, polygons = inputs
    pid = polygons.select("polygon_id").orderBy("polygon_id").limit(1).collect()[0][0]
    dup_row = polygons.where(F.col("polygon_id") == pid)
    doubled = polygons.unionByName(dup_row)

    base = {r["cell_p"]: r["fp"] for r in cell_fingerprints(polygons).collect()}
    dup = {r["cell_p"]: r["fp"] for r in cell_fingerprints(doubled).collect()}
    touched = {r["cell_p"] for r in poly_coarse_cover(dup_row).collect()}
    assert set(base) == set(dup)  # same cover, different content
    assert all(base[c] != dup[c] for c in touched), "duplicate rows must change the fingerprint"
    assert all(base[c] == dup[c] for c in set(base) - touched)
