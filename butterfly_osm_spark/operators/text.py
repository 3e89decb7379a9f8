"""Text-analysis operators for the large-scale training-data pipeline.

These extend the engine beyond the reference's own operator set (per the
graft mandate): token counting, quality scoring, language-ID heuristic,
and document fingerprinting over the ``documents`` table. Everything is
pure DataFrame algebra (split/explode/agg/md5) so each op has an exact
DuckDB oracle; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deterministic stopword list (fixture vocabulary overlaps 'the', 'of', ...).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def token_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens) — whitespace tokenization.

    Single-space split matches the generator's format; a BPE-ish regex
    tokenizer would slot into the same plan.
    """
    toks = documents.select("doc_id", F.split(F.trim("text"), " ").alias("ws"))
    ex = toks.select("doc_id", F.explode("ws").alias("w"))
    return ex.groupBy("doc_id").agg(
        F.count("w").alias("n_tokens"),
        F.countDistinct("w").alias("n_distinct_tokens"),
    )


def token_stats_oracle_sql() -> str:
    return """
SELECT doc_id, count(w) AS n_tokens, count(DISTINCT w) AS n_distinct_tokens
FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM documents)
GROUP BY doc_id
"""


def quality_score(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, stop_ratio, quality) — length + stopword-ratio
    quality heuristic; quality in [0,1], higher = better training text."""
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = documents.select("doc_id", F.split(F.trim("text"), " ").alias("ws"))
    ex = toks.select("doc_id", F.explode("ws").alias("w"))
    agg = ex.groupBy("doc_id").agg(
        F.count("w").alias("n_tokens"),
        F.sum(F.array_contains(sw, F.col("w")).cast("long")).alias("n_stop"),
    )
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens").cast("double")
    quality = F.least(F.col("n_tokens"), F.lit(100)).cast("double") / F.lit(100.0) * (
        F.lit(1.0) - stop_ratio
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def quality_score_oracle_sql() -> str:
    sw = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH ex AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM documents
), agg AS (
  SELECT doc_id, count(w) AS n_tokens,
         sum(CASE WHEN w IN ({sw}) THEN 1 ELSE 0 END) AS n_stop
  FROM ex GROUP BY doc_id)
SELECT doc_id, n_tokens,
       round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS stop_ratio,
       round(CAST(least(n_tokens, 100) AS DOUBLE) / 100.0 * (1.0 - CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)), 6) AS quality
FROM agg
"""


def lang_id(documents: DataFrame) -> DataFrame:
    """(doc_id, lang_pred) — stopword-ratio heuristic baseline: texts with
    enough English stopwords -> 'en', else 'unk'. (A real n-gram profile
    model drops into the same groupBy plan.)"""
    q = quality_score(documents)
    return q.select(
        "doc_id", F.when(F.col("stop_ratio") >= 0.03, F.lit("en")).otherwise(F.lit("unk")).alias("lang_pred")
    )


def lang_id_oracle_sql() -> str:
    sw = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH ex AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM documents
), agg AS (
  SELECT doc_id, count(w) AS n_tokens,
         sum(CASE WHEN w IN ({sw}) THEN 1 ELSE 0 END) AS n_stop
  FROM ex GROUP BY doc_id)
SELECT doc_id,
       CASE WHEN round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) >= 0.03
            THEN 'en' ELSE 'unk' END AS lang_pred
FROM agg
"""


def fingerprint(documents: DataFrame) -> DataFrame:
    """(doc_id, fp, fp_norm) — exact and normalized MD5 fingerprints (both
    engines implement standard MD5, so this is cross-engine exact)."""
    return documents.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("fp"),
        F.md5(F.lower(F.trim("text")).cast("binary")).alias("fp_norm"),
    )


def fingerprint_oracle_sql() -> str:
    return "SELECT doc_id, md5(text) AS fp, md5(lower(trim(text))) AS fp_norm FROM documents"


# ---------------------------------------------------------------------------
# Repetition filters + BPE pair counting (round 4)
# ---------------------------------------------------------------------------

#: Gopher-style repetition gates (Rae et al. 2021 use 0.18 for the
#: top-2-gram character fraction and 0.30 for duplicate n-gram fractions;
#: we apply them on token counts since the fixture vocabulary is uniform).
TOP_BIGRAM_FRAC_T = 0.18
DUP_TRIGRAM_FRAC_T = 0.30


def doc_repetition(
    documents: DataFrame,
    top_bigram_frac_t: float = TOP_BIGRAM_FRAC_T,
    dup_trigram_frac_t: float = DUP_TRIGRAM_FRAC_T,
) -> DataFrame:
    """(doc_id, n_tokens, top_bigram_frac, dup_trigram_frac, is_repetitive)
    — intra-document repetition filter (the Gopher/MassiveText family):

    * ``top_bigram_frac``: fraction of tokens covered by the single most
      frequent word bigram (2 * count(top bigram) / n_tokens),
    * ``dup_trigram_frac``: fraction of trigram occurrences that are
      repeats (1 - distinct/total),
    * ``is_repetitive``: either fraction over its threshold.

    Plan shape: n-grams are built JVM-side with ``transform(sequence(...))``
    over the token array (no explode of the raw text, no Python), then one
    explode + two-level aggregate per n-gram order. Both aggregates are
    keyed on doc_id, so at 100 TB this is one shuffle of (doc_id, ngram)
    pairs with map-side partial counts; no global stage. Extends A13/P13
    beyond the reference's corpus-level dedup (docs/api.md:511) to
    intra-document hygiene.
    """
    # CASE guards: Spark's sequence(1, 0) yields a DESCENDING [1, 0] rather
    # than an empty array (DuckDB's range(1, 1) is empty), so 1-2-token docs
    # must be fenced explicitly to keep both engines' n-gram sets identical.
    ws = documents.select("doc_id", F.split(F.trim("text"), " ").alias("ws"))
    base = ws.select(
        "doc_id",
        F.size("ws").cast("long").alias("n_tokens"),
        F.expr(
            "CASE WHEN size(ws) >= 2 THEN "
            "transform(sequence(1, size(ws) - 1), i -> ws[i-1] || ' ' || ws[i]) "
            "ELSE CAST(array() AS array<string>) END"
        ).alias("bgs"),
        F.expr(
            "CASE WHEN size(ws) >= 3 THEN "
            "transform(sequence(1, size(ws) - 2), i -> ws[i-1] || ' ' || ws[i] || ' ' || ws[i+1]) "
            "ELSE CAST(array() AS array<string>) END"
        ).alias("tgs"),
    )
    bg = (
        base.select("doc_id", "n_tokens", F.explode("bgs").alias("bg"))
        .groupBy("doc_id", "n_tokens", "bg")
        .count()
        .groupBy("doc_id", "n_tokens")
        .agg(F.max("count").alias("top_bg_cnt"))
    )
    tg = (
        base.select("doc_id", F.explode("tgs").alias("tg"))
        .groupBy("doc_id")
        .agg(F.count("tg").alias("n_tg"), F.countDistinct("tg").alias("n_tg_distinct"))
    )
    top_bigram_frac = F.round(
        F.lit(2.0) * F.col("top_bg_cnt") / F.col("n_tokens").cast("double"), 6
    )
    dup_trigram_frac = F.round(
        F.lit(1.0) - F.col("n_tg_distinct").cast("double") / F.col("n_tg").cast("double"), 6
    )
    return (
        bg.join(tg, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            top_bigram_frac.alias("top_bigram_frac"),
            dup_trigram_frac.alias("dup_trigram_frac"),
        )
        .withColumn(
            "is_repetitive",
            (F.col("top_bigram_frac") > top_bigram_frac_t)
            | (F.col("dup_trigram_frac") > dup_trigram_frac_t),
        )
    )


def doc_repetition_oracle_sql(
    top_bigram_frac_t: float = TOP_BIGRAM_FRAC_T,
    dup_trigram_frac_t: float = DUP_TRIGRAM_FRAC_T,
) -> str:
    # DuckDB lists are 1-based (Spark SQL arrays 0-based); the range bounds
    # below mirror the Spark transform(sequence(...)) windows exactly.
    return f"""
WITH t AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
), b AS (
  SELECT doc_id, len(ws) AS n_tokens,
         unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bg
  FROM t
), bg_top AS (
  SELECT doc_id, n_tokens, max(cnt) AS top_bg_cnt
  FROM (SELECT doc_id, n_tokens, bg, count(*) AS cnt FROM b GROUP BY 1, 2, 3)
  GROUP BY 1, 2
), g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws) - 1),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS tg
  FROM t
), tg_agg AS (
  SELECT doc_id, count(tg) AS n_tg, count(DISTINCT tg) AS n_tg_distinct FROM g GROUP BY 1
)
SELECT bg_top.doc_id, n_tokens,
       round(2.0 * top_bg_cnt / CAST(n_tokens AS DOUBLE), 6) AS top_bigram_frac,
       round(1.0 - CAST(n_tg_distinct AS DOUBLE) / CAST(n_tg AS DOUBLE), 6) AS dup_trigram_frac,
       (round(2.0 * top_bg_cnt / CAST(n_tokens AS DOUBLE), 6) > {top_bigram_frac_t}
        OR round(1.0 - CAST(n_tg_distinct AS DOUBLE) / CAST(n_tg AS DOUBLE), 6) > {dup_trigram_frac_t})
         AS is_repetitive
FROM bg_top JOIN tg_agg ON bg_top.doc_id = tg_agg.doc_id
"""


def bpe_pair_counts(documents: DataFrame, top_n: int = 50) -> DataFrame:
    """(rank, pair, pair_count) — the first merge-selection step of BPE
    tokenizer training, distributed: corpus -> word vocabulary with counts
    (map-side-combined groupBy) -> adjacent character pairs per DISTINCT
    word (substring windows, JVM-side) -> pair counts weighted by word
    frequency -> global top-N with a deterministic (count desc, pair asc)
    tiebreak.

    Scale shape: the corpus text is touched once by the word-count
    aggregate; everything after operates on the word VOCABULARY (sub-linear
    in corpus size — Heaps' law) and the pair vocabulary (bounded ~|alphabet|^2),
    so the final rank window sorts a tiny frame. This is the iteration-0
    kernel a full BPE trainer would loop (re-pairing only words containing
    the merged pair each round).
    """
    words = (
        documents.select(F.explode(F.split(F.trim("text"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )
    # Same sequence(1, 0) fence as doc_repetition: 1-char words (the fixture
    # vocabulary contains 'a') must yield NO pairs, matching DuckDB's range.
    pairs = words.select(
        "wc",
        F.explode(
            F.expr(
                "CASE WHEN length(w) >= 2 THEN "
                "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2)) "
                "ELSE CAST(array() AS array<string>) END"
            )
        ).alias("pair"),
    )
    counts = pairs.groupBy("pair").agg(F.sum("wc").alias("pair_count"))
    from pyspark.sql import Window

    rank = F.row_number().over(
        Window.orderBy(F.col("pair_count").desc(), F.col("pair").asc())
    )
    return (
        counts.select(rank.alias("rank"), "pair", "pair_count")
        .filter(F.col("rank") <= top_n)
    )


def bpe_pair_counts_oracle_sql(top_n: int = 50) -> str:
    return f"""
WITH words AS (
  SELECT w, count(*) AS wc
  FROM (SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents)
  GROUP BY w
), pairs AS (
  SELECT wc, unnest(list_transform(range(1, length(w)), i -> substring(w, i, 2))) AS pair
  FROM words
), counts AS (
  SELECT pair, CAST(sum(wc) AS BIGINT) AS pair_count FROM pairs GROUP BY pair
)
SELECT CAST(row_number() OVER (ORDER BY pair_count DESC, pair ASC) AS INTEGER) AS rank,
       pair, pair_count
FROM counts
QUALIFY rank <= {top_n}
ORDER BY rank
"""
