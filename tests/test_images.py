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
