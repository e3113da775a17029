"""Zero-row SQL results must keep their shape (found by differential
fuzzing vs DuckDB): Ray's groupby().aggregate() on an EMPTY dataset
loses the schema entirely, which crashed every fully-filtered WHERE
through GROUP BY, count(DISTINCT), mixed aggregates, and DISTINCT with
ORDER BY/LIMIT. SQL semantics: empty result, same columns."""
import duckdb
import pandas as pd
import pytest

from lucene_solr_ray.pipelines.sql import execute_sql

SF = "/root/testdata/sf0.001"

QUERIES = [
    "SELECT c_mktsegment, count(*) AS v FROM customer "
    "WHERE c_acctbal = -99999 GROUP BY c_mktsegment",
    "SELECT c_mktsegment, avg(c_acctbal) AS v FROM customer "
    "WHERE NOT (c_acctbal <> -1) GROUP BY c_mktsegment "
    "ORDER BY c_mktsegment LIMIT 50",
    "SELECT count(*) AS v FROM customer WHERE c_acctbal = -99999",
    "SELECT c_mktsegment, count(DISTINCT c_custkey) AS v FROM customer "
    "WHERE c_acctbal = -99999 GROUP BY c_mktsegment",
    "SELECT c_mktsegment, sum(c_acctbal) AS s, "
    "count(DISTINCT c_custkey) AS v FROM customer "
    "WHERE c_acctbal = -99999 GROUP BY c_mktsegment",
    "SELECT DISTINCT c_mktsegment, c_acctbal FROM customer "
    "WHERE c_acctbal = -99999 ORDER BY c_acctbal DESC, c_mktsegment "
    "LIMIT 20",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{SF}/customer.parquet')"
    )
    return con


@pytest.mark.parametrize("q", QUERIES)
def test_empty_result_keeps_schema(ray_session, duck, q):
    mine = execute_sql(q, SF)
    mine = mine.to_pandas() if not isinstance(mine, pd.DataFrame) else mine
    want = duck.execute(q).df()
    assert list(mine.columns) == list(want.columns), q
    assert len(mine) == len(want), q
    if len(want):  # the ungrouped count(*) returns one row: 0
        pd.testing.assert_frame_equal(
            mine.reset_index(drop=True), want.reset_index(drop=True),
            check_dtype=False)
