"""Image-payload operator gates: the BASELINE.json per-row invariant
(lossless bit-exact + recomputed phash == stored; lossy PSNR >= 40 dB),
resize correctness vs a numpy oracle, near-dup seeded recall."""

import numpy as np


def test_decode_stats_invariants(spark, fix001):
    from butterfly_osm_spark.operators.images import decode_stats

    images = spark.read.parquet(f"{fix001}/images.parquet")
    st = decode_stats(images).toPandas()
    assert len(st) == images.count()
    assert st.decode_ok.all(), "every fixture image must decode"
    assert st.phash_ok.all(), "recomputed phash must equal the stored column"
    assert (st.lossy_psnr_db >= 40.0).all(), "BASELINE.json lossy invariant"
    assert st["mean"].between(0, 255).all() and (st["std"] >= 0).all()
    # stats must reflect the true decoded dims
    meta = images.select("image_id", "w", "h").toPandas().set_index("image_id")
    merged = st.set_index("image_id").join(meta, rsuffix="_meta")
    assert (merged.w == merged.w_meta).all() and (merged.h == merged.h_meta).all()


def test_resize_matches_numpy_oracle(spark, fix001):
    from butterfly_osm_spark.codecs.png import decode_image, decode_png
    from butterfly_osm_spark.operators.images import _block_mean_resize, resize_images

    images = spark.read.parquet(f"{fix001}/images.parquet").limit(50)
    thumbs = {r.image_id: r for r in resize_images(images, side=32).collect()}
    for r in images.collect():
        t = thumbs[r.image_id]
        got = decode_png(bytes(t.thumb))
        assert got.shape == (32, 32)
        want = _block_mean_resize(decode_image(bytes(r.bytes), r.fmt), 32)
        assert np.array_equal(got, want)


def test_phash_neardup_finds_seeded_dups(spark, fix001):
    """The generator seeds ~5% faint-noise near-dups; the band join must
    surface a healthy set of low-hamming pairs, all within the bound."""
    from butterfly_osm_spark.operators.images import phash_neardup_pairs

    images = spark.read.parquet(f"{fix001}/images.parquet")
    pairs = phash_neardup_pairs(images).toPandas()
    assert (pairs.hamming <= 3).all()
    assert (pairs.img_a < pairs.img_b).all()
    assert len(pairs[pairs.hamming == 0]) > 100, "seeded exact-phash dups must appear"


def test_crossmodal_neardup_requires_both_modalities(spark, fix001):
    """crossmodal pairs are exactly the phash-near pairs whose captions
    also agree; the fixture's planted dups (donor caption, one word
    swapped) survive both gates, while phash-only collisions with
    unrelated captions are dropped."""
    import os

    from pyspark.sql import functions as F

    from butterfly_osm_spark.operators.images import (
        crossmodal_neardup,
        phash_neardup_pairs,
    )

    images = spark.read.parquet(os.path.join(fix001, "images.parquet"))
    cm = crossmodal_neardup(images)
    ph = phash_neardup_pairs(images)
    cm_keys = {(r.img_a, r.img_b) for r in cm.collect()}
    ph_keys = {(r.img_a, r.img_b) for r in ph.collect()}
    assert cm_keys, "planted cross-modal dups should be found"
    assert cm_keys <= ph_keys
    # caption gate really applied: recompute the word-3-gram jaccard for
    # every emitted pair driver-side and check it clears the threshold
    def shingles(c: str) -> set:
        ws = c.split()
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)} if len(ws) >= 3 else {c}

    caps = {r.image_id: r.caption for r in images.select("image_id", "caption").collect()}
    for a, b in cm_keys:
        sa, sb = shingles(caps[a]), shingles(caps[b])
        assert len(sa & sb) / len(sa | sb) >= 0.4
