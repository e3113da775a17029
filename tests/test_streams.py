"""Streaming-expression algebra (pipelines/streams.py — the
solrj.io.stream decorators) vs pandas references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from lucene_solr_ray.pipelines.streams import (
    complement,
    inner_join,
    intersect,
    left_outer_join,
    merge_stream,
    rollup,
    select,
)


@pytest.fixture(scope="module")
def join_data(ray_session):
    rng = np.random.default_rng(4)
    left = pd.DataFrame({
        "k": rng.integers(0, 20, 200),
        "v": rng.integers(0, 100, 200),
    })
    right = pd.DataFrame({
        "k": np.arange(0, 15, dtype=np.int64),
        "name": [f"n{i}" for i in range(15)],
    })
    return (rd.from_pandas(left).repartition(4),
            rd.from_pandas(right), left, right)


def test_inner_and_left_outer_join(join_data):
    lds, rds, left, right = join_data
    got = inner_join(lds, rds, on="k").to_pandas()
    want = left.merge(right, on="k", how="inner")
    assert len(got) == len(want)
    assert got.sort_values(["k", "v"]).reset_index(drop=True).equals(
        want.sort_values(["k", "v"]).reset_index(drop=True))
    got = left_outer_join(lds, rds, on="k").to_pandas()
    assert len(got) == len(left)
    miss = got[got["k"] >= 15]
    assert miss["name"].isna().all()


def test_join_duplicate_right_keys(ray_session):
    # 1:N fan-out: each left row joins EVERY matching right row
    left = pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]})
    right = pd.DataFrame({"k": [1, 1, 2], "name": ["a", "b", "c"]})
    lds, rds = rd.from_pandas(left).repartition(2), rd.from_pandas(right)
    got = inner_join(lds, rds, on="k").to_pandas()
    want = left.merge(right, on="k", how="inner")
    assert got.sort_values(["k", "name"]).reset_index(drop=True).equals(
        want.sort_values(["k", "name"]).reset_index(drop=True))
    got = left_outer_join(lds, rds, on="k").to_pandas()
    want = left.merge(right, on="k", how="left")
    assert got.sort_values(["k", "name"]).reset_index(drop=True).equals(
        want.sort_values(["k", "name"]).reset_index(drop=True))


def test_intersect_complement(join_data):
    lds, rds, left, right = join_data
    inter = intersect(lds, rds, on="k").to_pandas()
    comp = complement(lds, rds, on="k").to_pandas()
    assert len(inter) + len(comp) == len(left)
    assert set(inter["k"]) <= set(right["k"])
    assert not (set(comp["k"]) & set(right["k"]))


def test_rollup_select_merge(join_data):
    lds, rds, left, right = join_data
    r = rollup(lds, ["k"], {"total": ("sum", "v"),
                            "n": ("count", "")}).to_pandas()
    want = left.groupby("k").agg(total=("v", "sum"), n=("v", "count"))
    for _, row in r.iterrows():
        assert row["total"] == want.loc[row["k"], "total"]
        assert row["n"] == want.loc[row["k"], "n"]
    sel = select(rds, {"key": "k"}).to_pandas()
    assert list(sel.columns) == ["key"]
    m = merge_stream(select(lds, {"k": "k"}), select(rds, {"k": "k"}),
                     by=["k"]).to_pandas()
    ks = m["k"].to_numpy()
    assert (ks[1:] >= ks[:-1]).all()
    assert len(m) == len(left) + len(right)


def test_sort_merge_join_matches_pandas(ray_session):
    """Fact x fact distributed sort-merge join == pandas inner merge,
    including many-to-many keys and keys split across sort blocks."""
    rng = np.random.default_rng(8)
    left = pd.DataFrame({
        "k": rng.integers(0, 50, 3000),
        "lv": rng.integers(0, 1000, 3000),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 60, 2000),
        "rv": rng.integers(0, 1000, 2000),
    })
    from lucene_solr_ray.pipelines.streams import sort_merge_join

    lds = rd.from_pandas(left).repartition(7)
    rds = rd.from_pandas(right).repartition(5)
    got = sort_merge_join(lds, rds, on="k").to_pandas()
    want = left.merge(right, on="k", how="inner")
    assert len(got) == len(want)
    gs = got.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    ws = want.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    assert gs[["k", "lv", "rv"]].equals(ws[["k", "lv", "rv"]])


def test_sort_merge_join_one_sided_keys_dropped(ray_session):
    from lucene_solr_ray.pipelines.streams import sort_merge_join

    left = pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]})
    right = pd.DataFrame({"k": [2, 4], "rv": [200, 400]})
    got = sort_merge_join(rd.from_pandas(left), rd.from_pandas(right),
                          on="k").to_pandas()
    assert got[["k", "lv", "rv"]].values.tolist() == [[2, 20, 200]]


def test_sort_merge_join_out_path_streams_to_parquet(ray_session,
                                                     tmp_path_factory):
    """Scale mode: interior join rows stream to parquet inside tasks
    (nothing corpus-scale pinned); result identical to in-memory mode."""
    from lucene_solr_ray.pipelines.streams import sort_merge_join

    rng = np.random.default_rng(12)
    left = pd.DataFrame({"k": rng.integers(0, 40, 2000),
                         "lv": rng.integers(0, 100, 2000)})
    right = pd.DataFrame({"k": rng.integers(0, 40, 1500),
                          "rv": rng.integers(0, 100, 1500)})
    lds = rd.from_pandas(left).repartition(5)
    rds = rd.from_pandas(right).repartition(3)
    out = str(tmp_path_factory.mktemp("smj") / "join_out")
    got = sort_merge_join(lds, rds, on="k", out_path=out).to_pandas()
    want = left.merge(right, on="k", how="inner")
    assert len(got) == len(want)
    gs = got.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    ws = want.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    assert gs[["k", "lv", "rv"]].equals(ws[["k", "lv", "rv"]])
    import os

    assert any(f.startswith("join-") for f in os.listdir(out))


def test_having_filters_aggregated_stream(join_data):
    from lucene_solr_ray.pipelines.streams import having

    lds, _, left, _ = join_data
    agg = rollup(lds, ["k"], {"tot": ("sum", "v"), "cnt": ("count", "")})
    out = having(agg, "tot / cnt > 50").to_pandas()
    ref = left.groupby("k").agg(tot=("v", "sum"), cnt=("v", "count"))
    ref = ref[ref.tot / ref.cnt > 50].reset_index()
    assert sorted(out["k"].tolist()) == sorted(ref["k"].tolist())
    assert len(out) < left["k"].nunique()  # actually filtered something


def test_having_rejects_unsafe_expression(join_data):
    from lucene_solr_ray.pipelines.streams import having

    lds = join_data[0]
    with pytest.raises(ValueError):
        having(lds, "__import__('os').system('x')")


def test_fetch_enriches_by_key(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from lucene_solr_ray.pipelines.streams import fetch

    store = pd.DataFrame({
        "id": np.arange(100, dtype=np.int64),
        "name": [f"doc{i}" for i in range(100)],
        "size": np.arange(100, dtype=np.int64) * 10,
    })
    pq.write_table(pa.Table.from_pandas(store), tmp_path / "store.parquet")
    stream = rd.from_pandas(pd.DataFrame({
        "id": np.array([5, 93, 41, 5], np.int64),
        "score": [1.0, 2.0, 3.0, 4.0],
    }))
    out = fetch(stream, str(tmp_path / "store.parquet"), on="id",
                fields=["name", "size"]).to_pandas().sort_values("score")
    assert out["name"].tolist() == ["doc5", "doc93", "doc41", "doc5"]
    assert out["size"].tolist() == [50, 930, 410, 50]


def test_fetch_misses_are_null(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from lucene_solr_ray.pipelines.streams import fetch

    store = pd.DataFrame({"id": np.array([1, 2], np.int64),
                          "name": ["a", "b"]})
    pq.write_table(pa.Table.from_pandas(store), tmp_path / "s.parquet")
    stream = rd.from_pandas(pd.DataFrame({"id": np.array([2, 99], np.int64)}))
    out = fetch(stream, str(tmp_path / "s.parquet"), on="id",
                fields=["name"]).to_pandas().sort_values("id")
    assert out["name"].tolist()[0] == "b"
    assert pd.isna(out["name"].tolist()[1])


def test_significant_terms_vs_reference(ray_session):
    from lucene_solr_ray.analysis import get_analyzer
    from lucene_solr_ray.pipelines.streams import significant_terms

    docs = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": [
            "apple banana", "apple cherry", "apple banana cherry",
            "banana date", "cherry date", "date egg", "egg fig",
            "fig apple",
        ],
    })
    ds = rd.from_pandas(docs).repartition(3)
    # foreground = docs containing apple: 0,1,2,7
    t = significant_terms(ds, [0, 1, 2, 7],
                          analyzer=get_analyzer("simple"),
                          min_fg_df=1, limit=20).to_pandas()
    row = t[t.term == "apple"].iloc[0]
    assert row.fg_df == 4 and row.bg_df == 4
    assert row.lift == pytest.approx((4 / 4) / (4 / 8))  # = 2.0
    row = t[t.term == "banana"].iloc[0]
    assert row.fg_df == 2 and row.bg_df == 3
    assert row.lift == pytest.approx((2 / 4) / (3 / 8))
    # ranked by lift desc
    assert (t.lift.values[:-1] >= t.lift.values[1:]).all()


def test_asof_join_semantics(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from lucene_solr_ray.pipelines.streams import asof_join

    left = rd.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "k": pa.array([7, 7, 7, 9], pa.int64()),
        "t": pa.array([5, 10, 2, 5], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([7, 7, 7, 8], pa.int64()),
        "rt": pa.array([3, 10, 10, 1], pa.int64()),
        "rk": pa.array([100, 200, 300, 400], pa.int64()),
        "v": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
    }))
    out = asof_join(left, right, on="k", left_ts="t", right_ts="rt",
                    right_cols=["rk", "v"], right_tiebreak="rk"
                    ).to_pandas().sort_values("id").reset_index(drop=True)
    # id=3 (t=2): no right row at/before 2 -> dropped (inner as-of)
    # id=4 (k=9): key has no right rows -> dropped
    assert out.id.tolist() == [1, 2]
    # id=1 t=5 -> rt=3 (rk=100); id=2 t=10 -> tie at rt=10 -> max rk=300
    assert out.rk.tolist() == [100, 300]
    assert out.v.tolist() == [1.0, 3.0]


def test_asof_join_randomized_vs_duckdb(ray_session):
    """Boundary-discipline stress: many small blocks force the edge-run
    export/resolve paths; ties on (key, ts) exercise the tiebreak."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from lucene_solr_ray.pipelines.streams import asof_join

    rng = np.random.default_rng(11)
    nl, nr = 400, 300
    left = pd.DataFrame({
        "id": np.arange(nl, dtype=np.int64),
        "k": rng.integers(0, 12, nl).astype(np.int64),
        "t": rng.integers(0, 40, nl).astype(np.int64),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 14, nr).astype(np.int64),
        "rt": rng.integers(0, 40, nr).astype(np.int64),
        "rk": np.arange(nr, dtype=np.int64),
        "v": rng.normal(size=nr),
    })
    # many blocks -> every batch has edge runs
    lds = rd.from_pandas(left).repartition(16)
    rds = rd.from_pandas(right).repartition(16)
    got = (asof_join(lds, rds, on="k", left_ts="t", right_ts="rt",
                     right_cols=["rk", "v"], right_tiebreak="rk")
           .to_pandas().sort_values("id").reset_index(drop=True))

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute("""
        WITH rr AS (SELECT k, rt, arg_max(rk, rk) AS rk,
                           arg_max(v, rk) AS v
                    FROM r GROUP BY k, rt)
        SELECT l.id, l.k, l.t, rr.rk, rr.v
        FROM l ASOF JOIN rr ON l.k = rr.k AND l.t >= rr.rt
        ORDER BY l.id
    """).df()
    assert got.id.tolist() == want.id.tolist()
    assert got.rk.astype(int).tolist() == want.rk.astype(int).tolist()
    assert np.allclose(got.v.to_numpy(), want.v.to_numpy())
