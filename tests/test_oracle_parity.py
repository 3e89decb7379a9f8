"""Driver-style parity: every registered query vs its DuckDB oracle at sf0.001."""

import duckdb
import pytest

from butterfly_osm_spark.queries import ORACLES, QUERIES

from .compare import assert_frames_equal

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session", autouse=True)
def duckdb_views():
    """Mimic the driver: pre-register testdata views on the default conn."""
    for t in ["documents", "embeddings", "events", "lineitem", "orders", "customer"]:
        duckdb.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")


@pytest.mark.parametrize("name", sorted(set(QUERIES) & set(ORACLES)))
def test_query_matches_oracle(spark, fix001, name):
    df = QUERIES[name](spark, SF_DIR)
    sql = ORACLES[name]("0.001")
    assert_frames_equal(df, sql)


def test_all_oracle_queries_have_spark_impl():
    assert set(ORACLES) <= set(QUERIES)
