"""Snapshot diff: OSM replication-change detection between two way tables.

The reference consumes OSM planet snapshots and their minutely
replication diffs (butterfly-dl download pipeline; docs/architecture.md
update flow — the .osc changeset model: create/modify/delete per
element). The distributed analog is a full-outer id join between two
snapshot tables that classifies every way as added / deleted / modified
by comparing a deterministic geometry signature — the operation an
ingestion pipeline runs to decide which downstream cells/tiles to
recompute (feeding exactly the changed-cell incremental path,
incremental.py G8).

Scale shape (planet x history): ONE id-keyed full-outer join — the key
both snapshot warehouses are naturally bucketed by, so on bucketed
tables this is a zero-exchange sort-merge; the signature is computed
map-side and only (id, signature) scalars ever shuffle (node arrays
never move). Output is change-sized, not snapshot-sized.

Determinism: signature = comma-joined node-id string (way geometry is
an ordered node list — bit-identical in Spark ``array_join`` and DuckDB
``array_to_string``); no floats, no hashing collisions to reason about.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: deterministic synthetic-changeset moduli (way_id % 13):
DIFF_DEL = 5  # dropped in snapshot B
DIFF_MOD = 7  # one phantom node appended in B
DIFF_ADD = 9  # cloned under a fresh negative id in B


def _sig(ways: DataFrame) -> DataFrame:
    return ways.select(
        F.col("id").alias("way_id"),
        F.array_join(F.transform("nodes", lambda x: x.cast("string")), ",").alias("sig"),
    )


def synth_snapshot_b(ways: DataFrame) -> DataFrame:
    """Derive the deterministic 'later' snapshot from A (no external
    data, TESTDATA mandate): drop the DEL stratum, append a phantom node
    to the MOD stratum, clone the ADD stratum under fresh negative ids."""
    base = _sig(ways).filter(F.col("way_id") % 13 != DIFF_DEL)
    modded = base.withColumn(
        "sig",
        F.when(F.col("way_id") % 13 == DIFF_MOD, F.concat(F.col("sig"), F.lit(",0"))).otherwise(
            F.col("sig")
        ),
    )
    added = _sig(ways).filter(F.col("way_id") % 13 == DIFF_ADD).select(
        (-F.col("way_id")).alias("way_id"), "sig"
    )
    return modded.unionByName(added)


def osm_diff(ways_a: DataFrame, ways_b_sig: DataFrame) -> DataFrame:
    """(way_id, status): every way that changed between snapshot A and
    snapshot B (``ways_b_sig`` = (way_id, sig) as produced by
    :func:`synth_snapshot_b` or a real later snapshot's ``_sig``) —
    status in ('added', 'deleted', 'modified'); unchanged ways are
    absent (output is change-sized)."""
    a = _sig(ways_a).withColumnRenamed("sig", "sig_a")
    b = ways_b_sig.withColumnRenamed("sig", "sig_b")
    return (
        a.join(b, "way_id", "full_outer")
        .select(
            "way_id",
            F.when(F.col("sig_a").isNull(), F.lit("added"))
            .when(F.col("sig_b").isNull(), F.lit("deleted"))
            .when(F.col("sig_a") != F.col("sig_b"), F.lit("modified"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
        .filter(F.col("status") != "unchanged")
    )


def osm_diff_oracle_sql(fix: str) -> str:
    """Independent replay: identical snapshot-B derivation + full-outer
    classification in DuckDB."""
    return f"""
WITH a AS (
  SELECT id AS way_id, array_to_string(nodes, ',') AS sig
  FROM read_parquet('{fix}/osm_ways.parquet')
),
b AS (
  SELECT way_id,
         CASE WHEN way_id % 13 = {DIFF_MOD} THEN sig || ',0' ELSE sig END AS sig
  FROM a WHERE way_id % 13 <> {DIFF_DEL}
  UNION ALL
  SELECT -way_id, sig FROM a WHERE way_id % 13 = {DIFF_ADD}
)
SELECT coalesce(a.way_id, b.way_id) AS way_id,
       CASE WHEN a.way_id IS NULL THEN 'added'
            WHEN b.way_id IS NULL THEN 'deleted'
            WHEN a.sig <> b.sig THEN 'modified'
            ELSE 'unchanged' END AS status
FROM a FULL OUTER JOIN b ON a.way_id = b.way_id
WHERE CASE WHEN a.way_id IS NULL THEN 'added'
           WHEN b.way_id IS NULL THEN 'deleted'
           WHEN a.sig <> b.sig THEN 'modified'
           ELSE 'unchanged' END <> 'unchanged'
"""
