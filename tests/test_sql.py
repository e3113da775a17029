"""ParallelSQL planner (pipelines/sql.py) — parser goldens + execution."""

import pyarrow as pa
import pytest

from lucene_solr_ray.pipelines.sql import execute_sql, parse_sql

SF = "/root/testdata/sf0.001"


def test_parse_full_query():
    p = parse_sql(
        "SELECT lang, count(*) AS cnt, avg(n_chars) AS a FROM documents "
        "WHERE n_chars >= 200 AND lang = 'en' "
        "GROUP BY lang ORDER BY cnt DESC, lang LIMIT 3;")
    assert p.table == "documents"
    assert [(i.agg, i.col, i.alias) for i in p.items] == [
        (None, "lang", "lang"), ("count", "*", "cnt"), ("avg", "n_chars", "a")]
    assert p.where == ("and", [("cmp", "n_chars", ">=", 200),
                               ("cmp", "lang", "=", "en")])
    assert p.group_by == ["lang"]
    assert p.order_by == [("cnt", True), ("lang", False)]
    assert p.limit == 3


def test_parse_default_aliases_and_strings():
    p = parse_sql("SELECT sum(x), count(*) FROM t WHERE s = 'it''s'")
    assert p.items[0].alias == "sum_x"
    assert p.items[1].alias == "count"
    assert p.where == ("cmp", "s", "=", "it's")


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_sql("SELECT a FROM t WHERE a = b")  # non-literal rhs
    with pytest.raises(ValueError):
        parse_sql("SELECT a FROM t GROUP a")
    with pytest.raises(ValueError):
        parse_sql("SELECT a FROM t LIMIT 5 extra")


def test_execute_projection_and_agg(ray_session):
    t = execute_sql(
        "SELECT doc_id, n_chars FROM documents "
        "WHERE n_chars > 0 ORDER BY n_chars DESC, doc_id LIMIT 5", SF)
    assert t.num_rows == 5
    nc = t["n_chars"].to_pylist()
    assert nc == sorted(nc, reverse=True)

    t2 = execute_sql(
        "SELECT count(*) AS n, min(n_chars) AS lo FROM documents", SF)
    assert t2.num_rows == 1 and t2["n"][0].as_py() > 0
    assert t2.schema.names == ["n", "lo"]

    t3 = execute_sql(
        "SELECT lang, max(n_chars) AS hi FROM documents GROUP BY lang "
        "ORDER BY lang", SF)
    assert t3["lang"].to_pylist() == sorted(t3["lang"].to_pylist())


def test_parse_join_and_having():
    p = parse_sql(
        "SELECT a, count(*) AS c FROM t JOIN u ON x = y "
        "JOIN v ON p = q WHERE a > 1 GROUP BY a HAVING c >= 2 "
        "ORDER BY c LIMIT 1")
    assert p.joins == [("u", "x", "y", "inner"), ("v", "p", "q", "inner")]
    assert p.having == ("cmp", "c", ">=", 2)


def test_execute_join(ray_session):
    t = execute_sql(
        "SELECT c_mktsegment, count(*) AS cnt FROM orders "
        "JOIN customer ON o_custkey = c_custkey "
        "GROUP BY c_mktsegment ORDER BY c_mktsegment", SF)
    assert t.num_rows >= 2
    assert t.schema.names == ["c_mktsegment", "cnt"]
    # spot-check against a driver-side pandas join
    import duckdb

    con = duckdb.connect()
    for tb in ("orders", "customer"):
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM "
                    f"read_parquet('{SF}/{tb}.parquet')")
    want = con.execute(
        "SELECT c_mktsegment, count(*)::BIGINT AS cnt FROM orders "
        "JOIN customer ON o_custkey = c_custkey "
        "GROUP BY c_mktsegment ORDER BY c_mktsegment").df()
    assert t.to_pandas().reset_index(drop=True).equals(want)


def test_execute_left_join(ray_session):
    import duckdb

    con = duckdb.connect()
    for tb in ("customer", "orders"):
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM "
                    f"read_parquet('{SF}/{tb}.parquet')")
    # customers with no orders keep a NULL order side
    q = ("SELECT c_mktsegment, count(*) AS n, count(o_orderkey) AS no "
         "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
         "GROUP BY c_mktsegment ORDER BY c_mktsegment")
    t = execute_sql(q, SF)
    want = con.execute(
        q.replace("count(*)", "count(*)::BIGINT")
         .replace("count(o_orderkey)", "count(o_orderkey)::BIGINT")).df()
    assert t.to_pandas().equals(want)


def test_parse_distinct():
    p = parse_sql("SELECT DISTINCT a, b FROM t ORDER BY a LIMIT 3")
    assert p.distinct and [i.col for i in p.items] == ["a", "b"]
    assert not parse_sql("SELECT a FROM t").distinct


def test_execute_distinct(ray_session):
    t = execute_sql(
        "SELECT DISTINCT lang, source FROM documents "
        "WHERE n_chars > 200 ORDER BY lang ASC, source ASC LIMIT 40", SF)
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(
        "SELECT DISTINCT lang, source FROM documents WHERE n_chars > 200 "
        "ORDER BY lang, source LIMIT 40").df()
    assert t.to_pandas().reset_index(drop=True).equals(want)


def test_parse_where_expr():
    p = parse_sql(
        "SELECT a FROM t WHERE (x = 1 OR y IN (2, 3)) AND NOT z LIKE 'ab%' "
        "AND w BETWEEN 1 AND 5 AND v IS NOT NULL")
    assert p.where == ("and", [
        ("or", [("cmp", "x", "=", 1), ("in", "y", [2, 3])]),
        ("not", ("like", "z", "ab%")),
        ("between", "w", 1, 5),
        ("not", ("isnull", "v")),
    ])
    with pytest.raises(ValueError):
        parse_sql("SELECT a FROM t WHERE x LIKE 5")
    with pytest.raises(ValueError):
        parse_sql("SELECT a FROM t WHERE x NOT = 1")


def test_execute_where_expr(ray_session):
    import duckdb

    con = duckdb.connect()
    for tb in ("documents", "orders"):
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM "
                    f"read_parquet('{SF}/{tb}.parquet')")
    q = ("SELECT lang, count(*) AS n FROM documents "
         "WHERE (lang IN ('en', 'de') OR n_chars BETWEEN 100 AND 150) "
         "AND NOT source LIKE 'cc%' "
         "GROUP BY lang ORDER BY n DESC, lang")
    t = execute_sql(q, SF)
    want = con.execute(q.replace("count(*)", "count(*)::BIGINT")).df()
    assert t.to_pandas().equals(want)

    # OR + HAVING expression
    q2 = ("SELECT o_orderpriority, count(*) AS n FROM orders "
          "WHERE o_totalprice < 50000 OR o_totalprice > 200000 "
          "GROUP BY o_orderpriority HAVING n > 5 OR o_orderpriority = 'zz' "
          "ORDER BY o_orderpriority")
    t2 = execute_sql(q2, SF)
    want2 = con.execute(q2.replace("count(*)", "count(*)::BIGINT")).df()
    assert t2.to_pandas().equals(want2)


def test_parse_count_distinct():
    p = parse_sql("SELECT count(DISTINCT a) FROM t")
    assert p.items[0].agg == "count_distinct" and p.items[0].col == "a"
    assert p.items[0].alias == "count_distinct_a"
    with pytest.raises(ValueError):
        parse_sql("SELECT count(DISTINCT *) FROM t")


def test_execute_count_distinct(ray_session):
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    t = execute_sql(
        "SELECT lang, count(DISTINCT source) AS nsrc, count(*) AS n "
        "FROM documents WHERE n_chars > 100 GROUP BY lang "
        "ORDER BY n DESC, lang ASC", SF)
    want = con.execute(
        "SELECT lang, count(DISTINCT source)::BIGINT AS nsrc, "
        "count(*)::BIGINT AS n FROM documents WHERE n_chars > 100 "
        "GROUP BY lang ORDER BY n DESC, lang").df()
    assert t.to_pandas().reset_index(drop=True).equals(want)

    # ungrouped, alone and mixed with plain aggs over a filtered scan
    t2 = execute_sql(
        "SELECT count(DISTINCT lang) AS nl, count(*) AS n "
        "FROM documents WHERE n_chars > 100", SF)
    want2 = con.execute(
        "SELECT count(DISTINCT lang)::BIGINT nl, count(*)::BIGINT n "
        "FROM documents WHERE n_chars > 100").df()
    assert t2.to_pandas().equals(want2)
    t3 = execute_sql("SELECT count(DISTINCT lang) AS nl FROM documents", SF)
    assert t3["nl"][0].as_py() == 5


def test_parse_arith_expr():
    p = parse_sql(
        "SELECT sum(l_extendedprice * (1 - l_discount)) AS rev, "
        "avg(a + 2) AS x FROM t")
    assert p.items[0].agg == "sum"
    assert p.items[0].col == (
        "bin", "*", ("col", "l_extendedprice"),
        ("bin", "-", ("lit", 1), ("col", "l_discount")))
    assert p.items[1].col == ("bin", "+", ("col", "a"), ("lit", 2))
    # negative literal in WHERE still parses
    p2 = parse_sql("SELECT a FROM t WHERE a > -5")
    assert p2.where == ("cmp", "a", ">", -5)


def test_execute_arith_agg(ray_session):
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF}/lineitem.parquet')")
    q = ("SELECT l_returnflag, l_linestatus, "
         "sum(l_quantity) AS sum_qty, "
         "sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price, "
         "avg(l_discount) AS avg_disc, count(*) AS n "
         "FROM lineitem WHERE l_quantity < 30 "
         "GROUP BY l_returnflag, l_linestatus "
         "ORDER BY l_returnflag, l_linestatus")
    t = execute_sql(q, SF).to_pandas()
    want = con.execute(
        "SELECT l_returnflag, l_linestatus, "
        "round(sum(l_quantity), 4) AS sum_qty, "
        "floor(sum(l_extendedprice * (1 - l_discount)) * 10000 + 0.5) "
        "  / 10000 AS sum_disc_price, "
        "floor(avg(l_discount) * 10000 + 0.5) / 10000 AS avg_disc, "
        "count(*)::BIGINT AS n "
        "FROM lineitem WHERE l_quantity < 30 "
        "GROUP BY l_returnflag, l_linestatus "
        "ORDER BY l_returnflag, l_linestatus").df()
    import numpy as np
    assert t[["l_returnflag", "l_linestatus", "n"]].equals(
        want[["l_returnflag", "l_linestatus", "n"]])
    np.testing.assert_allclose(t["sum_disc_price"], want["sum_disc_price"],
                               rtol=1e-9)
    np.testing.assert_allclose(t["avg_disc"], want["avg_disc"], atol=1e-4)


def test_select_star_and_date_literals(ray_session):
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    # SELECT * expands to the table's columns
    t = execute_sql(
        "SELECT * FROM events ORDER BY event_id LIMIT 3", SF)
    want = con.execute(
        "SELECT * FROM events ORDER BY event_id LIMIT 3").df()
    assert t.column_names == list(want.columns)
    assert t.num_rows == 3
    # ISO timestamp strings coerce against the ts column
    lo, hi = con.execute(
        "SELECT min(ts), max(ts) FROM events").fetchone()
    mid = (lo + (hi - lo) / 2).isoformat(sep=" ")
    q = (f"SELECT count(*) AS n FROM events WHERE ts >= '{mid}'")
    t2 = execute_sql(q, SF)
    want2 = con.execute(q).fetchone()[0]
    assert t2["n"][0].as_py() == want2 > 0
    # BETWEEN with date strings
    q3 = (f"SELECT count(*) AS n FROM events "
          f"WHERE ts BETWEEN '{lo.isoformat(sep=' ')}' AND '{mid}'")
    t3 = execute_sql(q3, SF)
    want3 = con.execute(q3).fetchone()[0]
    assert t3["n"][0].as_py() == want3 > 0


def test_scalar_functions(ray_session):
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    # fn in SELECT and expression LHS in WHERE
    q = ("SELECT upper(lang) AS ul, count(*) AS n FROM documents "
         "WHERE length(text) > 200 AND n_chars + 1 > 100 "
         "GROUP BY ul ORDER BY n DESC, ul LIMIT 4")
    t = execute_sql(q, SF)
    want = con.execute(
        "SELECT upper(lang) AS ul, count(*)::BIGINT AS n FROM documents "
        "WHERE length(text) > 200 AND n_chars + 1 > 100 "
        "GROUP BY ul ORDER BY n DESC, ul LIMIT 4").df()
    assert t.to_pandas().equals(want)
    # round / abs in an aggregate expression
    q2 = ("SELECT sum(round(o_totalprice / 1000)) AS k FROM orders "
          "WHERE abs(o_totalprice) < 100000")
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{SF}/orders.parquet')")
    t2 = execute_sql(q2, SF)
    want2 = con.execute(q2).fetchone()[0]
    assert abs(t2["k"][0].as_py() - want2) < 1e-6


def test_case_when(ray_session):
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    q1 = ("SELECT lang, sum(CASE WHEN n_chars > 200 THEN 1 ELSE 0 END) "
          "AS big, count(*) AS n FROM documents GROUP BY lang "
          "ORDER BY lang")
    got = execute_sql(q1, SF).to_pandas()
    want = con.execute(q1).df()
    assert got["lang"].tolist() == want["lang"].tolist()
    assert got["big"].tolist() == [int(x) for x in want["big"]]
    assert got["n"].tolist() == [int(x) for x in want["n"]]

    # CASE as a plain select expression with string branches + no ELSE
    q2 = ("SELECT doc_id, CASE WHEN lang = 'en' THEN 'english' "
          "WHEN lang = 'de' THEN 'german' END AS label "
          "FROM documents ORDER BY doc_id LIMIT 20")
    got = execute_sql(q2, SF).to_pandas()
    want = con.execute(q2).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert [x if isinstance(x, str) else None
            for x in got["label"]] == \
        [x if isinstance(x, str) else None for x in want["label"]]


def test_union_all_and_from_subquery(ray_session):
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")

    # UNION ALL of two grouped arms
    q = ("SELECT lang AS k, count(*) AS n FROM documents "
         "WHERE n_chars > 300 GROUP BY lang "
         "UNION ALL "
         "SELECT source AS k, count(*) AS n FROM documents "
         "WHERE lang = 'en' GROUP BY source")
    got = execute_sql(q, SF).to_pandas().sort_values(
        ["k", "n"]).reset_index(drop=True)
    want = con.execute(q).df().sort_values(
        ["k", "n"]).reset_index(drop=True)
    assert got["k"].tolist() == want["k"].tolist()
    assert got["n"].tolist() == [int(x) for x in want["n"]]

    # FROM (SELECT ...) derived table with outer WHERE/ORDER
    q2 = ("SELECT lang, n FROM "
          "(SELECT lang, count(*) AS n FROM documents GROUP BY lang) "
          "AS t WHERE n >= 60 ORDER BY n DESC, lang")
    got2 = execute_sql(q2, SF).to_pandas()
    want2 = con.execute(q2).df()
    assert got2["lang"].tolist() == want2["lang"].tolist()
    assert got2["n"].tolist() == [int(x) for x in want2["n"]]

    # aggregate over a derived table (avg of group counts)
    q3 = ("SELECT avg(n) AS avg_n FROM "
          "(SELECT count(*) AS n FROM documents GROUP BY source)")
    got3 = execute_sql(q3, SF)
    want3 = con.execute(q3).fetchone()[0]
    assert abs(got3["avg_n"][0].as_py() - want3) < 1e-9


def test_having_expression_lhs(ray_session):
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    q = ("SELECT lang, count(*) AS n, sum(n_chars) AS total "
         "FROM documents GROUP BY lang "
         "HAVING total / n > 250 ORDER BY lang")
    got = execute_sql(q, SF).to_pandas()
    want = con.execute(q).df()
    assert got["lang"].tolist() == want["lang"].tolist()
    assert got["n"].tolist() == [int(x) for x in want["n"]]


def test_positional_group_order(ray_session):
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    q = ("SELECT lang, count(*) AS n FROM documents "
         "GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 3")
    got = execute_sql(q, SF).to_pandas()
    want = con.execute(q).df()
    assert got["lang"].tolist() == want["lang"].tolist()
    assert got["n"].tolist() == [int(x) for x in want["n"]]


def test_union_all_trailing_order_limit(ray_session):
    """A trailing ORDER BY / LIMIT binds to the WHOLE union (SQL
    semantics), not the last arm."""
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    q = ("SELECT lang AS k, count(*) AS n FROM documents GROUP BY lang "
         "UNION ALL "
         "SELECT source AS k, count(*) AS n FROM documents "
         "GROUP BY source ORDER BY n DESC, k LIMIT 4")
    got = execute_sql(q, SF).to_pandas()
    want = con.execute(q).df()
    assert got["k"].tolist() == want["k"].tolist()
    assert got["n"].tolist() == [int(x) for x in want["n"]]
