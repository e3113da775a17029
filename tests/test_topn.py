"""Grouped top-N via per-block partials (stages/topn.py): correctness vs
pandas reference + skew safety (one key = 50% of rows must not blow up
any single task — each block emits at most N x groups rows)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from lucene_solr_ray.stages.topn import grouped_topn


def _ref(df, group, sort, asc, n):
    out = (df.sort_values(sort, ascending=asc)
           .groupby(group, sort=False).head(n)
           .sort_values(group + sort, ascending=[True] * len(group) + asc)
           .reset_index(drop=True))
    out["rn"] = out.groupby(group, sort=False).cumcount() + 1
    return out


def test_grouped_topn_matches_pandas(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "d"], 5000),
        "v": rng.integers(0, 1000, 5000),
        "id": np.arange(5000, dtype=np.int64),
    })
    ds = rd.from_pandas(df).repartition(16)
    got = grouped_topn(ds, ["k"], ["v", "id"], [False, True], 3)
    want = _ref(df, ["k"], ["v", "id"], [False, True], 3)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True)[["k", "v", "id", "rn"]],
        want[["k", "v", "id", "rn"]])


def test_grouped_topn_skewed_key_bounded_partials(ray_session):
    """One key holds 50% of rows: every per-block partial stays <= N x
    groups rows (no task ever materializes the hot group), and the
    result still matches the reference."""
    rng = np.random.default_rng(9)
    n = 20_000
    keys = np.where(rng.random(n) < 0.5, "hot",
                    rng.choice([f"k{i}" for i in range(10)], n))
    df = pd.DataFrame({
        "k": keys,
        "v": rng.integers(0, 10**6, n),
        "id": np.arange(n, dtype=np.int64),
    })
    ds = rd.from_pandas(df).repartition(20)

    seen_max = []

    def counting_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = (b.sort_values(["v", "id"], ascending=[False, True])
               .groupby(["k"], sort=False).head(2))
        seen_max.append((len(b), len(out)))
        return out

    # structural bound: a partial over ANY block emits <= N x distinct
    # keys in that block, independent of skew
    parts = ds.map_batches(counting_partial,
                           batch_format="pandas").to_pandas()
    assert len(parts) <= 2 * 11 * 20
    got = grouped_topn(ds, ["k"], ["v", "id"], [False, True], 2)
    want = _ref(df, ["k"], ["v", "id"], [False, True], 2)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True)[["k", "v", "id", "rn"]],
        want[["k", "v", "id", "rn"]])
