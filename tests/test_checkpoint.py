"""Resume semantics: rerun skips, corruption re-runs stage + downstream,
outputs identical (the reference's lock-file + lazy-CRC contract)."""

import json
import os
import shutil

from butterfly_osm_spark.checkpoint import Build, reference_pipeline


def _run(spark, fix, build_dir):
    b = Build(spark, build_dir)
    stats = b.run(reference_pipeline(fix))
    return b, stats


def test_resume_skips_everything(spark, fix001, tmp_path):
    bd = str(tmp_path / "build")
    _, s1 = _run(spark, fix001, bd)
    assert all(not m["resumed"] for m in s1)
    _, s2 = _run(spark, fix001, bd)
    assert all(m["resumed"] for m in s2)
    assert [m["row_count"] for m in s1] == [m["row_count"] for m in s2]


def test_corruption_recomputes_stage(spark, fix001, tmp_path):
    bd = str(tmp_path / "build")
    b1, s1 = _run(spark, fix001, bd)
    final1 = sorted(map(tuple, b1.output("pip_pairs").collect()))
    # corrupt: truncate the edges output (lazy-verify must catch it)
    shutil.rmtree(os.path.join(bd, "edges"))
    b2, s2 = _run(spark, fix001, bd)
    by = {m["stage"]: m for m in s2}
    assert not by["edges"]["resumed"]
    assert by["nodes_sorted"]["resumed"] and by["image_cells"]["resumed"]
    final2 = sorted(map(tuple, b2.output("pip_pairs").collect()))
    assert final1 == final2


def test_version_bump_invalidates_downstream(spark, fix001, tmp_path):
    bd = str(tmp_path / "build")
    _run(spark, fix001, bd)
    stages = reference_pipeline(fix001)
    for s in stages:
        if s.name == "nodes_sorted":
            s.version = s.version + ".bump"  # logic change -> fingerprint change
    b = Build(spark, bd)
    stats = b.run(stages)
    by = {m["stage"]: m for m in stats}
    assert not by["nodes_sorted"]["resumed"]
    assert not by["edges"]["resumed"], "downstream of changed stage must recompute"
    assert by["way_attrs"]["resumed"] and by["image_cells"]["resumed"]


def test_per_partition_lineage_recorded(spark, fix001, tmp_path):
    bd = str(tmp_path / "build")
    _, stats = _run(spark, fix001, bd)
    for m in stats:
        assert m["row_count"] == sum(m["partition_rows"])
        meta = json.load(open(os.path.join(bd, "_checkpoint", f"{m['stage']}.json")))
        assert meta["fingerprint"] == m["fingerprint"]


def test_result_cache_warm_hit_skips_compute(spark, fix001, tmp_path):
    """C1 (avoid.rs:27-135): second request with the same canonical
    polygon-set key must answer from the keyed result table without
    invoking the PIP/refine compute at all."""
    import time as _time

    from pyspark.sql import functions as F

    from butterfly_osm_spark.checkpoint import ResultCache, cached_pip_join, polyset_key

    points = spark.read.parquet(os.path.join(fix001, "image_geo.parquet"))
    polygons = spark.read.parquet(os.path.join(fix001, "polygons.parquet"))
    cache = ResultCache(spark, str(tmp_path / "rescache"))

    calls = {"n": 0}
    import butterfly_osm_spark.operators.pip as pip_mod

    real_pip = pip_mod.pip_join

    def counting_pip(*a, **kw):
        calls["n"] += 1
        return real_pip(*a, **kw)

    pip_mod.pip_join = counting_pip
    try:
        t0 = _time.time()
        first = sorted(map(tuple, cached_pip_join(spark, cache, points, polygons).collect()))
        miss_s = _time.time() - t0
        t0 = _time.time()
        second = sorted(
            map(
                tuple,
                cached_pip_join(
                    spark, cache, points, polygons.orderBy(F.desc("polygon_id"))
                ).collect(),
            )
        )
        hit_s = _time.time() - t0
    finally:
        pip_mod.pip_join = real_pip

    assert calls["n"] == 1, "warm hit must not re-run the PIP compute"
    assert first == second and len(first) > 0
    assert cache.lineage[0]["hit"] is False and cache.lineage[1]["hit"] is True
    assert hit_s < miss_s, f"hit {hit_s:.2f}s not faster than miss {miss_s:.2f}s"


def test_polyset_key_ring_rotation_invariant(spark, fix001):
    """The cache key survives ring-start rotation (Booth canonicalisation):
    the same polygons with every ring rotated by one vertex share the key."""
    from pyspark.sql import functions as F

    from butterfly_osm_spark.checkpoint import polyset_key

    polygons = spark.read.parquet(os.path.join(fix001, "polygons.parquet")).limit(20)
    rotated = polygons.select(
        "polygon_id",
        F.expr("concat(slice(ring, 2, size(ring) - 1), slice(ring, 1, 1))").alias("ring"),
    )
    assert polyset_key(polygons) == polyset_key(rotated)


def test_result_cache_different_points_miss(spark, fix001, tmp_path):
    """Same polygons + different points must MISS (the points input
    participates in the key via the plan semantic hash by default)."""
    from pyspark.sql import functions as F

    from butterfly_osm_spark.checkpoint import ResultCache, cached_pip_join

    points = spark.read.parquet(os.path.join(fix001, "image_geo.parquet"))
    polygons = spark.read.parquet(os.path.join(fix001, "polygons.parquet"))
    cache = ResultCache(spark, str(tmp_path / "rc"))
    a = cached_pip_join(spark, cache, points, polygons).count()
    half = points.where(F.xxhash64("image_id") % 2 == 0)
    b = cached_pip_join(spark, cache, half, polygons).count()
    assert [x["hit"] for x in cache.lineage] == [False, False]
    assert b < a
