"""Similarity search over embedding columns (array<float>).

- ``cosine_topk_bruteforce``: exact top-k cosine neighbors — the
  correctness baseline. Dot products stay JVM-side via zip_with +
  aggregate (sequential left-fold => deterministic summation order).
  Scale: O(n^2); only for oracles and re-ranking.
- ``cosine_topk_lsh``: the scale path — random-hyperplane LSH (sign-bit
  sketch in a vectorized pandas UDF), bucket equi-join on band chunks,
  exact re-rank within candidates. Recall is tested against the brute
  force on fixtures; at 10^12 rows the bucket join replaces the cross
  product entirely.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def _norm_dot(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot


def _self_norm(c: str):
    return F.aggregate(
        F.transform(F.col(c), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


N_BLOCKS = 16


def _pack_blocks(embeddings: DataFrame, n_blocks: int) -> DataFrame:
    """(block_id, ids BINARY, flat BINARY): embeddings packed into block
    matrices — int64/float64 raw bytes (Arrow moves them as single binary
    cells; python-list packing of 60k floats was the dominant cost)."""
    import pandas as pd  # noqa: F401  (applyInPandas payload)

    from pyspark.sql.types import BinaryType, IntegerType, StructField, StructType

    schema = StructType(
        [
            StructField("block_id", IntegerType()),
            StructField("ids", BinaryType()),
            StructField("flat", BinaryType()),
        ]
    )

    def pack(key: tuple, pdf):
        pdf = pdf.sort_values("vec_id")
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                "block_id": [key[0]],
                "ids": [pdf["vec_id"].to_numpy(np.int64).tobytes()],
                "flat": [m.tobytes()],
            }
        )

    tagged = embeddings.select(
        "vec_id", "embedding", (F.abs(F.xxhash64("vec_id")) % n_blocks).cast("int").alias("block_id")
    )
    return tagged.groupBy("block_id").applyInPandas(pack, schema=schema)


def _topk_rows(cos: np.ndarray, ids_b: np.ndarray, k: int):
    """Per-row top-k of (cos desc, id asc) — argpartition fast path with an
    exact full-sort fallback for rows whose boundary tie could extend past
    the selection margin."""
    n, m = cos.shape
    kk = min(k, m)
    margin = min(m, kk + 32)
    part = np.argpartition(-cos, margin - 1, axis=1)[:, :margin]
    sub = np.take_along_axis(cos, part, axis=1)
    sub_ids = ids_b[part]
    o = np.lexsort((sub_ids, -sub), axis=1)
    sel = np.take_along_axis(part, o[:, :kk], axis=1)
    if margin < m:
        sorted_sub = np.take_along_axis(sub, o, axis=1)
        risky = sorted_sub[:, margin - 1] == sorted_sub[:, kk - 1]
        for i in np.nonzero(risky)[0]:  # rare: tie spans the margin edge
            full = np.lexsort((ids_b, -cos[i]))[:kk]
            sel[i] = full
    return sel


def cosine_topk_bruteforce(embeddings: DataFrame, k: int = 5, n_blocks: int = N_BLOCKS) -> DataFrame:
    """(vec_id, rank, neighbor_id, cos) — exact top-k by cosine, ties by
    neighbor id; cos rounded to 6 dp BEFORE ranking (matches the oracle).

    Block-matmul execution (the reference's K-lane SoA batching analog,
    batched_phast.rs:19-24): embeddings pack into ~n/B-row block
    matrices, the B^2 block pairs cross-join (tiny rows — one flat
    matrix each), each pair computes a BLAS matmul + per-query partial
    top-k in mapInPandas, and a global window merges partials exactly.
    O(n^2) stays, but fully parallel and vectorized — this is the
    re-rank kernel; LSH below is the sub-quadratic scale path.
    """
    from typing import Iterator

    import pandas as pd

    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    blocks = _pack_blocks(embeddings, n_blocks).persist()
    # partner blocks ship ONCE per worker as a SparkContext broadcast; each
    # task streams only its own block through Arrow. (Duplicating the
    # partner matrices into B^2 join rows made the Arrow exchange the
    # bottleneck and collapsed under 32 concurrent workers. At a scale
    # where the partner set exceeds executor memory, this degrades to the
    # shuffled block-pair join — that threshold is far above any re-rank
    # candidate set; the sub-quadratic path is LSH below anyway.)
    spark = embeddings.sparkSession
    bdata = [
        (
            np.frombuffer(r["ids"], dtype=np.int64),
            np.frombuffer(r["flat"], dtype=np.float64).reshape(len(r["ids"]) // 8, -1),
        )
        for r in blocks.collect()
    ]
    bc = spark.sparkContext.broadcast(bdata)
    a = blocks.repartition(n_blocks, "block_id")

    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def gemm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        partners = bc.value
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                ids_a = np.frombuffer(r.ids, dtype=np.int64)
                A = np.frombuffer(r.flat, dtype=np.float64).reshape(len(ids_a), -1)
                na = np.sqrt((A * A).sum(axis=1))
                for ids_b, B in partners:
                    nb = np.sqrt((B * B).sum(axis=1))
                    cos = np.round((A @ B.T) / np.outer(na, nb), 6)
                    cos[ids_a[:, None] == ids_b[None, :]] = -np.inf  # exclude self
                    kk = min(k, cos.shape[1])
                    order = _topk_rows(cos, ids_b, kk)
                    rows = np.repeat(ids_a, kk)
                    nbrs = ids_b[order.ravel()]
                    cvals = np.take_along_axis(cos, order, axis=1).ravel()
                    keep = np.isfinite(cvals)
                    yield pd.DataFrame(
                        {"vec_id": rows[keep], "neighbor_id": nbrs[keep], "cos": cvals[keep]}
                    )

    partials = a.mapInPandas(gemm, schema=out_schema)
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cos")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame, tau: float = 0.95, n_blocks: int = 16
) -> DataFrame:
    """(vec_id, neighbor_id, cos): ALL ordered pairs with cosine >= tau —
    exact embedding near-duplicate detection (the dedup mandate's
    embedding-cosine flavor). Same block-matmul execution as the top-k
    kernel, emitting threshold survivors instead of top-k; at 10^12 rows
    the LSH bucket join below pre-filters candidates first."""
    from typing import Iterator

    import pandas as pd

    from pyspark.sql.types import DoubleType, StructField, StructType

    blocks = _pack_blocks(embeddings, n_blocks).persist()
    spark = embeddings.sparkSession
    bdata = [
        (
            np.frombuffer(r["ids"], dtype=np.int64),
            np.frombuffer(r["flat"], dtype=np.float64).reshape(len(r["ids"]) // 8, -1),
        )
        for r in blocks.collect()
    ]
    bc = spark.sparkContext.broadcast(bdata)
    a = blocks.repartition(n_blocks, "block_id")

    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def gemm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        partners = bc.value
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                ids_a = np.frombuffer(r.ids, dtype=np.int64)
                A = np.frombuffer(r.flat, dtype=np.float64).reshape(len(ids_a), -1)
                na = np.sqrt((A * A).sum(axis=1))
                for ids_b, B in partners:
                    nb = np.sqrt((B * B).sum(axis=1))
                    cos = np.round((A @ B.T) / np.outer(na, nb), 6)
                    # ordered pairs only (a < b): each unordered pair emits once
                    mask = (cos >= tau) & (ids_a[:, None] < ids_b[None, :])
                    ai, bi = np.nonzero(mask)
                    yield pd.DataFrame(
                        {"vec_id": ids_a[ai], "neighbor_id": ids_b[bi], "cos": cos[ai, bi]}
                    )

    return a.mapInPandas(gemm, schema=out_schema)


def embedding_neardup_oracle_sql(tau: float = 0.95) -> str:
    return f"""
SELECT a.vec_id, b.vec_id AS neighbor_id,
       round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             / sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])
                    * list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])), 6) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
            / sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])
                   * list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])), 6) >= {tau}
"""


def cosine_topk_oracle_sql(k: int = 5) -> str:
    """DuckDB oracle: same metric via explicit zipped-list fold."""
    return f"""
WITH pairs AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
               / sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])
                      * list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])), 6) AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
), ranked AS (
  SELECT vec_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM pairs)
SELECT vec_id, CAST(rank AS INT) AS rank, neighbor_id, cos
FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# LSH-bucketed variant (scale path)
# ---------------------------------------------------------------------------

N_PLANES = 32
N_BANDS = 8  # 8 bands x 4 bits — tuned for recall on mid-cosine neighbors
BITS_PER_BAND = N_PLANES // N_BANDS


def _planes(dim: int) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=42))
    return rng.standard_normal((N_PLANES, dim))


def make_sketch_udf(dim: int):
    planes = _planes(dim)

    @F.pandas_udf(LongType())
    def sketch(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())  # (batch, dim)
        signs = (m @ planes.T) > 0  # (batch, n_planes)
        vals = np.zeros(len(emb), dtype=np.uint64)
        for i in range(N_PLANES):
            vals |= signs[:, i].astype(np.uint64) << np.uint64(i)
        return pd.Series(vals.astype(np.int64))

    return sketch


def cosine_topk_lsh(embeddings: DataFrame, k: int = 5, dim: int = 64) -> DataFrame:
    """Approximate top-k: hyperplane-sketch band join -> exact re-rank.
    Same output schema as the brute force; recall measured in tests."""
    sketch = make_sketch_udf(dim)
    e = embeddings.select(
        "vec_id", "embedding", _self_norm("embedding").alias("n2"), sketch("embedding").alias("sk")
    ).persist()
    bands = e.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftright("sk", i * BITS_PER_BAND)
                        .bitwiseAND(F.lit((1 << BITS_PER_BAND) - 1))
                        .alias("chunk"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "bb.band_id", "bb.chunk")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_id"), F.col("b.vec_id").alias("neighbor_id"))
        .distinct()
    )
    ea = e.select(F.col("vec_id"), F.col("embedding").alias("ea"), F.col("n2").alias("na"))
    eb = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("eb"), F.col("n2").alias("nb")
    )
    cos = F.round(_norm_dot("ea", "eb") / F.sqrt(F.col("na") * F.col("nb")), 6)
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.join(ea, "vec_id")
        .join(eb, "neighbor_id")
        .withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cos")
    )
