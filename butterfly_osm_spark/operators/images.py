"""Multimodal (image payload) operators — the graft's payload axis.

Images are opaque ``binary`` columns with typed metadata (input_hint
schema). Decode/resize/feature-extract run as Arrow-batched
``mapInPandas`` kernels directly over the scan — the bytes column never
passes through a shuffle (SURVEY.md §7.4 image-payload discipline);
hash-level ops (dedup, near-dup) project the tiny ``phash`` column
first and never touch bytes at all.

Codecs: real PNG + the deterministic lossy ``qnt`` stand-in (no JPEG
lib in this container — codecs/png.py documents the stub boundary).
Unknown formats surface as ``decode_ok = false`` rows rather than
failing the batch, mirroring a production pipeline's quarantine lane.

- ``decode_stats``: decode -> per-image pixel stats + PSNR-vs-lossy
  roundtrip + stored-phash verification (the BASELINE.json per-row
  invariant: lossless bit-exact, lossy PSNR >= 40 dB, recomputed phash
  == stored phash).
- ``resize_images``: block-mean downsample to a fixed thumbnail side,
  re-encoded as PNG (pure numpy — a real transform, not a stub).
- ``phash_dedup``: exact perceptual-hash grouping (A4-style distinct),
  SQL-oracled on the stored phash column.
- ``phash_neardup_pairs``: hamming <= 3 pairs via the 4x16-bit band
  join (pigeonhole-complete for <= 3, same machinery as simhash),
  SQL-oracled against a brute-force bit_count(xor()) cross join.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..codecs.png import decode_image, decode_qnt, encode_png, encode_qnt, phash64, psnr_db

_STATS_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("decode_ok", BooleanType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("mean", DoubleType()),
        StructField("std", DoubleType()),
        StructField("p_dark", DoubleType()),  # fraction of pixels < 64
        StructField("lossy_psnr_db", DoubleType()),
        StructField("phash_ok", BooleanType()),
    ]
)


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode every image and emit pixel statistics + the per-row
    invariants (phash match, lossy-roundtrip PSNR)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    img = decode_image(r.bytes, r.fmt)
                except (NotImplementedError, ValueError):
                    rows.append((r.image_id, False, None, None, None, None, None, None, None))
                    continue
                f = img.astype(np.float64)
                psnr = psnr_db(img, decode_qnt(encode_qnt(img, q=4)))
                rows.append(
                    (
                        r.image_id,
                        True,
                        int(img.shape[1]),
                        int(img.shape[0]),
                        round(float(f.mean()), 3),
                        round(float(f.std()), 3),
                        round(float((img < 64).mean()), 6),
                        round(min(psnr, 99.0), 3),  # inf (bit-exact) caps at 99
                        phash64(img) == r.phash,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _STATS_SCHEMA.fields])

    return images.select("image_id", "bytes", "fmt", "phash").mapInPandas(gen, schema=_STATS_SCHEMA)


_RESIZE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("thumb", BinaryType()),
    ]
)


def _block_mean_resize(img: np.ndarray, side: int) -> np.ndarray:
    """Exact block-mean downsample to (side, side) — boundary-weighted so
    any input size works (deterministic, no interpolation libs)."""
    h, w = img.shape
    ys = (np.arange(side + 1) * h) // side
    xs = (np.arange(side + 1) * w) // side
    # integral image for O(1) block sums
    ii = np.zeros((h + 1, w + 1), dtype=np.int64)
    ii[1:, 1:] = np.cumsum(np.cumsum(img.astype(np.int64), axis=0), axis=1)
    out = np.empty((side, side), dtype=np.uint8)
    for i in range(side):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        s = ii[y1, xs[1:]] - ii[y0, xs[1:]] - ii[y1, xs[:-1]] + ii[y0, xs[:-1]]
        area = (y1 - y0) * np.maximum(np.diff(xs), 1)
        out[i] = (s // area).astype(np.uint8)
    return out


def resize_images(images: DataFrame, side: int = 32) -> DataFrame:
    """Thumbnail every decodable image to (side, side), PNG-encoded."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    img = decode_image(r.bytes, r.fmt)
                except (NotImplementedError, ValueError):
                    continue
                rows.append((r.image_id, side, side, encode_png(_block_mean_resize(img, side))))
            yield pd.DataFrame(rows, columns=["image_id", "w", "h", "thumb"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(gen, schema=_RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# phash-level dedup (bytes never read)
# ---------------------------------------------------------------------------


def phash_dedup(images: DataFrame) -> DataFrame:
    """(phash, keep_image_id, n_copies): exact perceptual-hash groups."""
    return (
        images.select("image_id", "phash")
        .groupBy("phash")
        .agg(F.min("image_id").alias("keep_image_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def phash_dedup_oracle_sql(fix: str) -> str:
    return f"""
SELECT phash, min(image_id) AS keep_image_id, count(*) AS n_copies
FROM read_parquet('{fix}/images.parquet') GROUP BY phash
"""


MAX_HAMMING = 3  # 4 bands x 16 bits: pigeonhole-complete for hamming <= 3


def phash_neardup_pairs(images: DataFrame, max_hamming: int = MAX_HAMMING) -> DataFrame:
    """(img_a, img_b, hamming): near-duplicate images by phash hamming
    distance, via the 16-bit band equi-join (no cross product)."""
    ph = images.select("image_id", "phash")
    bands = ph.select(
        "image_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_id"),
                        F.shiftright("phash", 16 * k).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("bb"),
    ).select("image_id", "phash", F.col("bb.band_id").alias("band_id"), F.col("bb.chunk").alias("chunk"))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.image_id") < F.col("b.image_id")),
        )
        .select(
            F.col("a.image_id").alias("img_a"),
            F.col("b.image_id").alias("img_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).cast("int").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def phash_neardup_oracle_sql(fix: str, max_hamming: int = MAX_HAMMING) -> str:
    """Brute-force oracle: bit_count(xor()) over all ordered pairs."""
    return f"""
SELECT a.image_id AS img_a, b.image_id AS img_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
FROM read_parquet('{fix}/images.parquet') a
JOIN read_parquet('{fix}/images.parquet') b
  ON a.image_id < b.image_id AND bit_count(xor(a.phash, b.phash)) <= {max_hamming}
"""
