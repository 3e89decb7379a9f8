"""Deterministic sampling + dataset-split operators for the training-data
pipeline.

Two ops every large-scale data-mixing pipeline needs and the reference
does not ship (graft extension alongside text.py / dedup.py):

- ``stratified_sample``: keep each document with a per-stratum rate
  (e.g. language balancing for a training mix).
- ``dataset_split``: assign every document to train/val/test by hash
  range.

Both decide from a 60-bit uniform key ``u60 = md5(doc_id ':' salt ':'
seed)[:15 hex]`` — the md5-derived integer hash already value-exact
between Spark (``conv(substring(md5(..),1,15),16,10)``) and DuckDB
(``CAST('0x'||substr(md5(..),1,15) AS BIGINT)``), see dedup.py
``_HASH_WORDS``. That buys three properties ``rand()``-based sampling
cannot give at cluster scale:

- **Reproducible**: the keep/assign decision is a pure row function —
  re-runs, task retries, AQE re-plans, and different cluster sizes
  produce byte-identical samples (rand() re-draws per task attempt).
- **Nested**: ``key < thr`` is monotone in ``thr``, so raising a rate
  strictly grows the sample (supersets for free — a rate sweep reuses
  the smaller sample's rows; pytest-pinned).
- **Consistent across tables**: the same (doc_id, seed) always lands in
  the same split, so features computed in separate jobs can never leak
  a val row into train.

Scale posture (100 TB): both plans are **map-only** — md5 + integer
compare inside whole-stage codegen, zero exchange, zero UDF, zero
driver state (pytest asserts no Exchange in the executed plan). The
per-stratum thresholds are literal CASE arms (strata counts are small:
languages/sources); a thousand-stratum rate table would swap to a
broadcast join with the identical filter semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: protocol salt so sampling keys can never collide with other md5-derived
#: keys (fingerprints, trip assignment) computed from the same ids
SALT = "bos-sample"
U60 = 1 << 60


def _key60(seed: int) -> Column:
    """Uniform 60-bit sampling key from (doc_id, SALT, seed) — JVM md5 in
    whole-stage codegen, exactly replicable in DuckDB."""
    s = F.concat(F.col("doc_id").cast("string"), F.lit(f":{SALT}:{seed}"))
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10).cast("bigint")


def _key60_sql(seed: int) -> str:
    return (
        f"CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{SALT}:{seed}'), 1, 15) AS BIGINT)"
    )


def _thresholds(rates: dict[str, float], default_rate: float) -> tuple[dict[str, int], int]:
    """Integer keep-thresholds, computed ONCE in Python and embedded as
    literals in both the Spark plan and the oracle SQL — the two engines
    compare against bit-identical constants, so float rounding of the
    rate can never diverge between them."""
    return {s: int(r * U60) for s, r in rates.items()}, int(default_rate * U60)


def stratified_sample(
    documents: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 7,
) -> DataFrame:
    """(doc_id, stratum, sample_key) — deterministic per-stratum sampling.

    Keeps a row iff its 60-bit key falls under the stratum's threshold;
    ``sample_key`` is emitted for downstream auditability (and so nested
    rate sweeps can re-filter without re-hashing).
    """
    thr, dflt = _thresholds(rates, default_rate)
    arm = F.lit(dflt)
    for s, t in sorted(thr.items()):
        arm = F.when(F.col(strata_col) == s, F.lit(t)).otherwise(arm)
    k = _key60(seed)
    return (
        documents.select(
            "doc_id", F.col(strata_col).alias("stratum"), k.alias("sample_key")
        )
        .where(F.col("sample_key") < arm)
    )


def stratified_sample_oracle_sql(
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 7,
) -> str:
    thr, dflt = _thresholds(rates, default_rate)
    arms = " ".join(f"WHEN {strata_col} = '{s}' THEN {t}" for s, t in sorted(thr.items()))
    return f"""
SELECT doc_id, {strata_col} AS stratum, {_key60_sql(seed)} AS sample_key
FROM documents
WHERE {_key60_sql(seed)} < (CASE {arms} ELSE {dflt} END)
"""


def dataset_split(
    documents: DataFrame,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    seed: int = 13,
) -> DataFrame:
    """(doc_id, split) — every document assigned to train/val/test by
    hash range (cumulative-weight boundaries on the same 60-bit key).

    Total function: the three ranges partition [0, 2^60), so each row
    gets exactly one label (pytest pins disjoint completeness).
    """
    t1 = int(weights[0] * U60)
    t2 = int((weights[0] + weights[1]) * U60)
    k = _key60(seed)
    split = (
        F.when(k < F.lit(t1), F.lit("train"))
        .when(k < F.lit(t2), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return documents.select("doc_id", split.alias("split"))


def dataset_split_oracle_sql(
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    seed: int = 13,
) -> str:
    t1 = int(weights[0] * U60)
    t2 = int((weights[0] + weights[1]) * U60)
    k = _key60_sql(seed)
    return f"""
SELECT doc_id,
       CASE WHEN {k} < {t1} THEN 'train'
            WHEN {k} < {t2} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def pack_sequences(
    documents: DataFrame,
    budget: int = 512,
    shards: int = 16,
    seed: int = 5,
) -> DataFrame:
    """(doc_id, shard, seq_id, tok_start, tok_end) — concat-and-chunk
    sequence packing for pretraining batches.

    Documents are sharded by hash key, deterministically ordered within
    the shard (key, doc_id), laid end-to-end on a per-shard token tape
    (whitespace token counts, matching token_stats), and chunked into
    ``budget``-token sequences: ``seq_id = tok_start // budget`` — a doc
    straddling a boundary starts in the earlier chunk, the standard
    concatenate-then-chunk packing.

    Scale posture: ONE exchange (hashpartitioning on shard) + an
    in-partition sort feed the running-sum window; shard count scales
    with the cluster and bounds every window partition, so there is no
    global sort and no driver state. The shuffle carries only
    (doc_id, shard, key, n_tokens) — never text.
    """
    k = _key60(seed)
    sized = documents.select(
        "doc_id",
        F.pmod(k, F.lit(shards)).cast("int").alias("shard"),
        k.alias("k"),
        F.size(F.split(F.trim("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    return _pack_tape(sized, budget)


def _pack_tape(sized: DataFrame, budget: int) -> DataFrame:
    """Shared packing tape over (doc_id, shard, k, n_tokens) — used by
    pack_sequences (whitespace lengths) and text.tokenize_pack (trained
    BPE lengths)."""
    from pyspark.sql import Window

    # explicit ROWS frame (Spark's orderBy default is RANGE; identical
    # here only because keys are unique — pin it to match the oracle)
    w = (
        Window.partitionBy("shard")
        .orderBy("k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return sized.select(
        "doc_id",
        "shard",
        (cum - F.col("n_tokens")).alias("tok_start"),
        cum.alias("tok_end"),
        F.floor((cum - F.col("n_tokens")) / F.lit(budget)).alias("seq_id"),
    ).select("doc_id", "shard", "seq_id", "tok_start", "tok_end")


def pack_sequences_oracle_sql(budget: int = 512, shards: int = 16, seed: int = 5) -> str:
    k = _key60_sql(seed)
    return f"""
WITH sized AS (
  SELECT doc_id,
         CAST({k} % {shards} AS INTEGER) AS shard,
         {k} AS k,
         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
  FROM documents
), tape AS (
  SELECT doc_id, shard, n_tokens,
         -- DuckDB window sum(BIGINT) yields HUGEINT; pin to BIGINT to
         -- match the Spark schema
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY k, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tok_end
  FROM sized
)
SELECT doc_id, shard,
       CAST(floor((tok_end - n_tokens) / {budget}) AS BIGINT) AS seq_id,
       CAST(tok_end - n_tokens AS BIGINT) AS tok_start, tok_end
FROM tape
"""
