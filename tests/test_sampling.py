"""Deterministic sampling / dataset-split invariants (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from butterfly_osm_spark.operators.sampling import (
    U60,
    dataset_split,
    pack_sequences,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


RATES = {"en": 0.35, "de": 0.8, "fr": 0.6}


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_sample_deterministic_and_partition_invariant(docs):
    a = _ids(stratified_sample(docs, "lang", RATES, 0.5, seed=7))
    b = _ids(stratified_sample(docs.repartition(13), "lang", RATES, 0.5, seed=7))
    assert a == b and len(a) > 0


def test_sample_nested_in_rate(docs):
    """key < thr is monotone in thr: raising every rate grows a superset."""
    lo = _ids(stratified_sample(docs, "lang", {"en": 0.2}, 0.1, seed=7))
    hi = _ids(stratified_sample(docs, "lang", {"en": 0.6}, 0.4, seed=7))
    assert lo < hi


def test_sample_respects_strata(docs):
    """rate 0 excludes a stratum entirely; rate 1 keeps it entirely."""
    out = stratified_sample(docs, "lang", {"en": 1.0, "de": 0.0}, 0.0, seed=7)
    got = {r["stratum"] for r in out.select("stratum").distinct().collect()}
    assert got == {"en"}
    n_en = docs.where(F.col("lang") == "en").count()
    assert out.count() == n_en


def test_split_total_and_disjoint(docs):
    out = dataset_split(docs).persist()
    n = docs.count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    by = {r["split"]: r["c"] for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert set(by) <= {"train", "val", "test"}
    # 80/10/10 within binomial slack on the small fixture
    assert by["train"] / n > 0.6
    out.unpersist()


def test_split_consistent_across_tables(docs):
    """Same (doc_id, seed) -> same split regardless of which frame carries
    the id — the leak-proofing property."""
    a = dataset_split(docs)
    b = dataset_split(docs.select("doc_id", "lang").repartition(5))
    assert a.join(b.withColumnRenamed("split", "s2"), "doc_id").where(
        F.col("split") != F.col("s2")
    ).count() == 0


def test_sample_keys_uniform_range(docs):
    keys = stratified_sample(docs, "lang", {}, 1.0, seed=3).select("sample_key")
    mn, mx = keys.agg(F.min("sample_key"), F.max("sample_key")).first()
    assert 0 <= mn and mx < U60


def test_pack_tape_contiguous(docs):
    """Per shard: the token tape is gapless (each doc starts where the
    previous ended) and seq_id chunks it at budget boundaries."""
    out = pack_sequences(docs, budget=128, shards=4).persist()
    assert out.count() == docs.count()
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("tok_start")
    gaps = out.withColumn("prev_end", F.lag("tok_end").over(w)).where(
        F.col("prev_end").isNotNull() & (F.col("prev_end") != F.col("tok_start"))
    )
    assert gaps.count() == 0
    bad = out.where(F.col("seq_id") != F.floor(F.col("tok_start") / 128))
    assert bad.count() == 0
    out.unpersist()


def test_pack_single_exchange(docs):
    plan = pack_sequences(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "text" not in plan.split("Exchange")[0]  # shuffle carries no text


@pytest.mark.parametrize("op", ["sample", "split"])
def test_map_only_plan(docs, op):
    """Scale posture: both plans must be pure map-only — no exchange, no
    UDF, codegen'd md5+compare."""
    df = (
        stratified_sample(docs, "lang", RATES, 0.5)
        if op == "sample"
        else dataset_split(docs)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
