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


def test_null_three_valued_logic(ray_session, tmp_path):
    """SQL three-valued logic: a NULL operand under NOT LIKE / NOT IN /
    NOT BETWEEN / NOT(=) must EXCLUDE the row (NOT NULL is NULL, and a
    NULL WHERE mask drops the row), matching DuckDB. Regression for the
    pre-Kleene implementation that filled nulls to False at the leaves
    and so kept NULL rows under NOT."""
    import duckdb
    import pyarrow.parquet as pq

    t = pa.table({
        "id": list(range(8)),
        "s": ["alpha", None, "beta", "gamma", None, "alphabet", "x", None],
        "v": [1, 2, None, 4, None, 6, 7, 8],
    })
    pq.write_table(t, str(tmp_path / "nulls.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW nulls AS SELECT * FROM "
                f"read_parquet('{tmp_path}/nulls.parquet')")
    queries = [
        "SELECT id FROM nulls WHERE NOT s LIKE 'alpha%' ORDER BY id",
        "SELECT id FROM nulls WHERE NOT s IN ('x', 'beta') ORDER BY id",
        "SELECT id FROM nulls WHERE NOT v BETWEEN 2 AND 6 ORDER BY id",
        "SELECT id FROM nulls WHERE NOT s = 'x' ORDER BY id",
        "SELECT id FROM nulls WHERE NOT (s = 'x' OR v = 2) ORDER BY id",
        "SELECT id FROM nulls WHERE s IS NULL OR NOT v = 8 ORDER BY id",
        # Kleene OR: (NULL OR TRUE) is TRUE so the row survives
        "SELECT id FROM nulls WHERE s LIKE 'z%' OR v >= 1 ORDER BY id",
    ]
    for q in queries:
        got = execute_sql(q, str(tmp_path))["id"].to_pylist()
        want = [r[0] for r in con.execute(q).fetchall()]
        assert got == want, f"{q}: {got} != {want}"


def test_null_three_valued_having(ray_session, tmp_path):
    """Same three-valued logic on the pandas HAVING path."""
    import duckdb
    import pyarrow.parquet as pq

    t = pa.table({
        "g": ["a", "a", "b", "b", "c", None, None],
        "v": [1, 2, 3, 4, 5, 6, 7],
    })
    pq.write_table(t, str(tmp_path / "hv.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW hv AS SELECT * FROM "
                f"read_parquet('{tmp_path}/hv.parquet')")
    q = ("SELECT g, sum(v) AS s FROM hv GROUP BY g "
         "HAVING NOT g LIKE 'a%' ORDER BY s")
    got = execute_sql(q, str(tmp_path)).to_pandas()
    want = con.execute(q).df()
    assert got["g"].tolist() == want["g"].tolist()
    assert [int(x) for x in got["s"]] == [int(x) for x in want["s"]]


def test_distinct_high_cardinality_streams(ray_session, tmp_path):
    """SELECT DISTINCT over 10^6 rows / ~250k distinct keys runs as a
    per-block combiner + one keyed shuffle with the LIMIT pushed into
    the Dataset — the driver only ever sees the limited result, never
    the full distinct set."""
    import numpy as np
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    n = 1_000_000
    keys = rng.integers(0, 250_000, n)
    t = pa.table({"k": keys, "b": keys % 17})
    pq.write_table(t, str(tmp_path / "big.parquet"))

    got = execute_sql(
        "SELECT DISTINCT k FROM big ORDER BY k LIMIT 100",
        str(tmp_path))
    assert got.num_rows == 100
    assert got["k"].to_pylist() == sorted(set(keys))[:100]

    # unordered/unlimited path still streams (iter_batches, no
    # to_pandas) and returns the exact distinct count
    got2 = execute_sql("SELECT DISTINCT b FROM big", str(tmp_path))
    assert sorted(got2["b"].to_pylist()) == list(range(17))


def test_null_group_distinct_order(ray_session, tmp_path):
    """NULL is an ordinary group for GROUP BY / DISTINCT and sorts
    NULLS LAST (DuckDB default) under ORDER BY — via the null-marker
    shuffle keys (Ray's groupby/sort cannot compare None directly)."""
    import duckdb
    import pyarrow.parquet as pq

    t = pa.table({
        "g": ["a", None, "b", None, "a", "b", None],
        "v": [1, 2, 3, 4, 5, 6, None],
    })
    pq.write_table(t, str(tmp_path / "ng.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW ng AS SELECT * FROM "
                f"read_parquet('{tmp_path}/ng.parquet')")

    q = "SELECT g, sum(v) AS s, count(*) AS n FROM ng GROUP BY g"
    got = execute_sql(q, str(tmp_path)).to_pandas()
    want = con.execute(q).df()
    got = got.assign(k=got["g"].fillna("<N>")).sort_values(
        "k").reset_index(drop=True)
    want = want.assign(k=want["g"].fillna("<N>")).sort_values(
        "k").reset_index(drop=True)
    assert got["k"].tolist() == want["k"].tolist()
    assert [int(x) for x in got["s"]] == [int(x) for x in want["s"]]
    assert [int(x) for x in got["n"]] == [int(x) for x in want["n"]]

    q2 = "SELECT DISTINCT g FROM ng ORDER BY g"
    got2 = execute_sql(q2, str(tmp_path))["g"].to_pylist()
    want2 = [r[0] for r in con.execute(q2).fetchall()]
    assert got2 == want2  # ['a', 'b', None] — NULLS LAST

    q3 = "SELECT v FROM ng ORDER BY v DESC LIMIT 7"
    got3 = execute_sql(q3, str(tmp_path))["v"].to_pylist()
    want3 = [r[0] for r in con.execute(q3).fetchall()]
    assert got3 == want3  # NULL sorts last even for DESC (DuckDB)

    q4 = ("SELECT g, count(DISTINCT v) AS dv FROM ng GROUP BY g")
    got4 = execute_sql(q4, str(tmp_path)).to_pandas()
    want4 = con.execute(q4).df()
    gm = dict(zip(got4["g"].fillna("<N>"), got4["dv"]))
    wm = dict(zip(want4["g"].fillna("<N>"), want4["dv"]))
    assert {k: int(v) for k, v in gm.items()} == \
        {k: int(v) for k, v in wm.items()}
