"""Fixture-generation contract: idempotent ensure, byte-deterministic
regeneration (the verify skill's probes, pinned as tests)."""

import os
import shutil

from butterfly_osm_spark.fixtures.generate import ensure_fixtures, fixture_dir


def test_ensure_fixtures_idempotent(fix001):
    before = {
        f: os.stat(os.path.join(fix001, f)).st_mtime_ns for f in os.listdir(fix001)
    }
    assert ensure_fixtures("0.001") == fix001
    after = {
        f: os.stat(os.path.join(fix001, f)).st_mtime_ns for f in os.listdir(fix001)
    }
    assert before == after, "second ensure_fixtures call rewrote files"


def test_regeneration_byte_deterministic(fix001, tmp_path, monkeypatch):
    monkeypatch.setenv("BUTTERFLY_FIXTURE_DIR", str(tmp_path))
    fresh = ensure_fixtures("0.001")
    assert fresh != fix001 and fresh == fixture_dir("0.001")
    names = sorted(f for f in os.listdir(fix001) if f.endswith(".parquet"))
    assert names == sorted(f for f in os.listdir(fresh) if f.endswith(".parquet"))
    for f in names:
        with open(os.path.join(fix001, f), "rb") as a, open(
            os.path.join(fresh, f), "rb"
        ) as b:
            assert a.read() == b.read(), f"{f} not byte-identical on regeneration"
    shutil.rmtree(fresh, ignore_errors=True)
