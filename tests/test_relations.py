"""S3 relation scan + turn-restriction extraction semantics.

Reference contract: ingest filter keeps type=restriction / restriction* /
except (route/src/ingest/mod.rs:276-283); triple extraction is last-wins
per role with kind validation and skips incomplete triples
(route/src/model/profiling.rs:570-588); no_* -> ban, only_* -> only,
anything else dropped (route/src/model/types.rs:81-86).
"""

import pytest
from pyspark.sql import Row

from butterfly_osm_spark.operators.relations import restriction_arcs, restriction_scan


def _rel(rid, members, tags):
    return Row(
        id=rid,
        members=[Row(role=r, kind=k, ref=x) for r, k, x in members],
        tags=tags,
    )


@pytest.fixture(scope="module")
def tiny(spark):
    rels = spark.createDataFrame(
        [
            # valid ban, shuffled member order + relation-kind decoy (ignored)
            _rel(1, [("to", "way", 20), ("via", "node", 100), ("from", "way", 10),
                     ("via", "relation", 9)],
                 {"type": "restriction", "restriction": "no_left_turn"}),
            # duplicate roles: bogus first, real last (last-wins)
            _rel(2, [("via", "node", 999), ("from", "way", 99),
                     ("from", "way", 10), ("via", "node", 100), ("to", "way", 20)],
                 {"type": "restriction", "restriction": "only_straight_on",
                  "except": "bicycle"}),
            # incomplete: no to-member -> dropped
            _rel(3, [("from", "way", 10), ("via", "node", 100)],
                 {"type": "restriction", "restriction": "no_u_turn"}),
            # wrong kind: via is a way -> dropped
            _rel(4, [("from", "way", 10), ("via", "way", 10), ("to", "way", 20)],
                 {"type": "restriction", "restriction": "no_u_turn"}),
            # key-prefix-only match, conditional value, broken topology (via
            # not on to_way 21)
            _rel(5, [("from", "way", 10), ("via", "node", 100), ("to", "way", 21)],
                 {"restriction:hgv": "no_right_turn @ (Mo-Fr 07:00-19:00)"}),
            # unknown restriction value -> TurnRuleKind::None -> dropped
            _rel(6, [("from", "way", 10), ("via", "node", 100), ("to", "way", 20)],
                 {"type": "restriction", "restriction": "give_way"}),
            # non-restriction relation -> filtered at scan
            _rel(7, [("outer", "way", 10)], {"type": "route", "name": "R7"}),
        ],
        "id BIGINT, members ARRAY<STRUCT<role:STRING,kind:STRING,ref:BIGINT>>, "
        "tags MAP<STRING,STRING>",
    )
    way_nodes = spark.createDataFrame(
        [(10, 0, 1), (10, 1, 100), (20, 0, 100), (20, 1, 2), (21, 0, 3), (21, 1, 4)],
        "way_id BIGINT, seq INT, node_id BIGINT",
    )
    return rels, way_nodes


def test_scan_filter(spark, tiny):
    rels, _ = tiny
    assert sorted(r.id for r in restriction_scan(rels).select("id").collect()) == [1, 2, 3, 4, 5, 6]


def test_arcs_semantics(spark, tiny):
    rels, way_nodes = tiny
    rows = {r.relation_id: r for r in restriction_arcs(rels, way_nodes).collect()}
    assert set(rows) == {1, 2, 5}  # 3,4 incomplete; 6 kind none; 7 filtered
    r1 = rows[1]
    assert (r1.from_way, r1.via_node, r1.to_way, r1.kind) == (10, 100, 20, "ban")
    assert (r1.via_on_from, r1.via_on_to, r1.except_modes) == (1, 1, "")
    r2 = rows[2]  # last-wins picked the real triple, not the bogus prefix
    assert (r2.from_way, r2.via_node, r2.to_way) == (10, 100, 20)
    assert (r2.kind, r2.except_modes) == ("only", "bicycle")
    r5 = rows[5]  # conditional value still classifies; via not on way 21
    assert (r5.kind, r5.via_on_from, r5.via_on_to) == ("ban", 1, 0)


def test_fixture_arcs_sorted_and_valid(spark, fix001):
    import os

    rels = spark.read.parquet(os.path.join(fix001, "relations.parquet"))
    wn = spark.read.parquet(os.path.join(fix001, "way_nodes.parquet"))
    out = restriction_arcs(rels, wn).collect()
    assert len(out) > 0
    assert all(r.kind in ("ban", "only") for r in out)
    # every emitted arc has a complete triple
    assert all(r.from_way and r.via_node and r.to_way for r in out)


def test_turn_table_expansion(spark, tiny):
    """only_* disallows every sibling turn from (via, from); ban beats the
    only-target; ways without rules stay fully allowed."""
    from butterfly_osm_spark.operators.relations import turn_table

    rels, way_nodes = tiny
    rows = {
        (r.via_node, r.from_way, r.to_way): r.allowed
        for r in turn_table(rels, way_nodes).collect()
    }
    # node 100 carries rules; ways through it: 10, 20 -> 4 candidate turns
    assert set(rows) == {(100, a, b) for a in (10, 20) for b in (10, 20)}
    assert rows[(100, 10, 20)] == 0  # banned (rel 1) even though only-target (rel 2)
    assert rows[(100, 10, 10)] == 0  # u-turn disallowed by the only-expansion
    assert rows[(100, 20, 10)] == 1 and rows[(100, 20, 20)] == 1  # no rules from 20


def test_turn_table_mode_exceptions(spark, tiny):
    """except=bicycle voids rel 2's only-rule for the bicycle mode
    (evaluate.rs:275-287): the only-expansion disappears, the un-excepted
    ban (rel 1) still applies."""
    from butterfly_osm_spark.operators.relations import turn_table

    rels, way_nodes = tiny
    rows = {
        (r.via_node, r.from_way, r.to_way): r.allowed
        for r in turn_table(rels, way_nodes, mode_exceptions=["bicycle"]).collect()
    }
    assert rows[(100, 10, 20)] == 0  # ban (rel 1) carries no except
    assert rows[(100, 10, 10)] == 1  # only-rule voided -> u-turn allowed again
