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


def test_result_cache_lru_eviction_and_stats(spark, tmp_path):
    """Bounded LRU (avoid.rs:27-135): inserting cap+1 distinct keys evicts
    the least-recently-used entry; a hit refreshes recency so the next
    eviction picks the older untouched entry; hit/miss counters recorded."""
    import time as _time

    from butterfly_osm_spark.checkpoint import ResultCache

    cache = ResultCache(spark, str(tmp_path / "lru"), max_entries=2)

    def compute(n):
        return lambda: spark.range(n)

    cache.get_or_compute("k1", compute(1))
    _time.sleep(0.01)
    cache.get_or_compute("k2", compute(2))
    _time.sleep(0.01)
    cache.get_or_compute("k1", compute(1))  # hit — k1 now more recent than k2
    _time.sleep(0.01)
    cache.get_or_compute("k3", compute(3))  # insert past cap -> evict k2 (LRU)
    assert sorted(cache._entries()) == ["k1", "k3"]
    assert cache.evictions == 1
    # evicted key recomputes (miss), and the counters add up
    assert cache.get_or_compute("k2", compute(2)).count() == 2
    assert cache.hits == 1 and cache.misses == 4
    rec = [x for x in cache.lineage if "hit" in x]
    assert [x["hit"] for x in rec] == [False, False, True, False, False]
    assert rec[-1]["hits"] == 1 and rec[-1]["misses"] == 4


def test_result_cache_regenerated_points_miss(spark, tmp_path):
    """Durable-cache hazard (round-3 advice): regenerating the points
    parquet at the SAME path must miss — the default inputs_tag carries a
    content fingerprint (size+mtime) of the source files, not just the
    plan semantic hash (which keys on path+projection only)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from butterfly_osm_spark.checkpoint import ResultCache, cached_pip_join

    pts_path = str(tmp_path / "pts.parquet")

    def write_points(ids):
        pq.write_table(
            pa.table(
                {
                    "image_id": pa.array([f"p{i}" for i in ids]),
                    "lon_e7": pa.array([43500000 + 1000 * i for i in ids], type=pa.int32()),
                    "lat_e7": pa.array([508500000 + 1000 * i for i in ids], type=pa.int32()),
                }
            ),
            pts_path,
        )

    ring = [
        {"lon_e7": 43000000, "lat_e7": 508000000},
        {"lon_e7": 44000000, "lat_e7": 508000000},
        {"lon_e7": 44000000, "lat_e7": 509000000},
        {"lon_e7": 43000000, "lat_e7": 509000000},
    ]
    polygons = spark.createDataFrame(
        [("pg0", ring)],
        "polygon_id STRING, ring ARRAY<STRUCT<lon_e7: INT, lat_e7: INT>>",
    )
    cache = ResultCache(spark, str(tmp_path / "rc2"))

    write_points(range(8))
    a = cached_pip_join(spark, cache, spark.read.parquet(pts_path), polygons).count()
    # regenerate AT THE SAME PATH with different contents (same schema)
    write_points(range(3))
    b = cached_pip_join(spark, cache, spark.read.parquet(pts_path), polygons).count()
    assert cache.misses == 2 and cache.hits == 0, "regenerated source must not hit"
    assert a == 8 and b == 3
