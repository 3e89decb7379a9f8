"""Audio/video multimodal operators (operators/media.py): decode
framing, feature edge cases, and sampled-frame structure. The full
value-level check is the DuckDB differential oracle in
test_oracle_parity (audio_features / frame_sample rows)."""

import math
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def audio_df(spark, fix001):
    return spark.read.parquet(os.path.join(fix001, "audio.parquet"))


@pytest.fixture(scope="module")
def videos_df(spark, fix001):
    return spark.read.parquet(os.path.join(fix001, "videos.parquet"))


def test_audio_framing_matches_metadata(spark, audio_df):
    """n_samples derived from the byte length must equal the fixture's
    metadata column for every clip — the s16le framing check."""
    from butterfly_osm_spark.operators.media import audio_features

    feats = audio_features(audio_df)
    meta = audio_df.select("clip_id", F.col("n_samples").alias("n_meta"))
    bad = feats.join(meta, "clip_id").filter(F.col("n_samples") != F.col("n_meta")).count()
    assert bad == 0


def test_audio_feature_edge_cases(spark, audio_df):
    from butterfly_osm_spark.operators.media import audio_features

    rows = audio_features(audio_df).collect()
    assert len(rows) == audio_df.count()
    # ~10% near-silent clips: tiny rms, but noise still crosses zero often
    silent = [r for r in rows if math.sqrt(r.energy / r.n_samples) < 100]
    assert silent, "fixture should contain near-silent clips"
    assert all(r.zcr > r.n_samples * 0.1 for r in silent)
    # ~5% driven into clipping; everything bounded by the s16 range
    assert any(r.n_clipped > 0 for r in rows)
    assert all(0 <= r.peak <= 32768 for r in rows)
    # tonal clips: zcr of a two-tone mix stays well below Nyquist rate
    assert all(r.zcr < r.n_samples for r in rows)


def test_frame_sample_structure(spark, videos_df):
    """Row count = ceil(n_frames/stride) per video; diff4 is null exactly
    on the first sampled frame; is_cut row-consistent with diff4."""
    from butterfly_osm_spark.operators.media import CUT_THRESHOLD, frame_sample

    out = frame_sample(videos_df).collect()
    meta = {r.video_id: r.n_frames for r in videos_df.select("video_id", "n_frames").collect()}
    per_vid: dict[str, list] = {}
    for r in out:
        per_vid.setdefault(r.video_id, []).append(r)
    assert set(per_vid) == set(meta)
    for vid, rows in per_vid.items():
        rows.sort(key=lambda r: r.frame_idx)
        assert len(rows) == -(-meta[vid] // 4)
        assert rows[0].diff4 is None and rows[0].is_cut is False
        for r in rows[1:]:
            assert r.diff4 is not None
            assert r.is_cut == (r.diff4 > CUT_THRESHOLD)


def test_frame_sample_detects_planted_cuts(spark, videos_df, fix001):
    """Videos whose golden diff4 trace has a spike (the planted scene
    cut) must yield an is_cut row at that sampled position."""
    from butterfly_osm_spark.operators.media import frame_sample

    truth = spark.read.parquet(os.path.join(fix001, "frame_truth.parquet"))
    spikes = {
        r.video_id
        for r in truth.filter((F.col("frame_idx") % 4 == 0) & (F.col("diff4") > 40)).collect()
    }
    assert spikes, "fixture should plant detectable scene cuts"
    flagged = {r.video_id for r in frame_sample(videos_df).filter("is_cut").collect()}
    assert spikes <= flagged


def test_frame_sample_oracle_recomputes_at_any_stride(spark, videos_df, fix001):
    """Round-5 oracle upgrade gate: the DuckDB side recomputes mean/std/
    diff from the relational pixel planes, so Spark and oracle must agree
    at a NON-default stride too (the old golden read was stride-4-only)."""
    from butterfly_osm_spark.operators.media import frame_sample, frame_sample_oracle_sql

    from .compare import assert_frames_equal

    df = frame_sample(videos_df, stride=3)
    assert_frames_equal(df, frame_sample_oracle_sql(fix001, stride=3))
