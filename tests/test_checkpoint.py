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
