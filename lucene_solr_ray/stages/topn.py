"""Grouped top-N without a group shuffle.

``groupby(key).map_groups(head)`` materializes each group in one task —
with a low-cardinality key (5 languages) parallelism collapses to 5 and a
hot key pulls half the corpus into one pandas DataFrame. The scale-safe
shape (the repo's own per-shard top-k + TopDocs.merge pattern,
``search/topk.py``) is:

1. **partial**: every block keeps only its own top-N rows per group
   (vectorized pandas sort + groupby-head inside ``map_batches`` — no
   shuffle, no skew sensitivity: a block emits at most
   ``N x groups_in_block`` rows regardless of key distribution);
2. **merge**: the partials (``<= N x groups x blocks`` rows — driver-safe
   by construction) get the same sort + head once more.

Equivalent to the full sort + group head whenever the sort columns are a
total order per group (callers append a unique id as the final
tiebreaker, exactly like TopDocs tie-breaks on doc id).
"""

from __future__ import annotations

import pandas as pd


def grouped_topn(
    ds,
    group_cols: list[str],
    sort_cols: list[str],
    ascending: list[bool],
    n: int,
) -> pd.DataFrame:
    """Top-``n`` rows per group of ``group_cols``, ordered by
    ``sort_cols``/``ascending`` — per-block partials + tiny driver merge.
    Returns a pandas DataFrame (rows ordered group-major then rank).

    Driver-memory bound: the merge holds at most
    ``min(groups_per_block, rows_per_block) x n`` rows PER BLOCK, i.e.
    O(blocks x distinct_groups x n) worst case. Right-sized for the
    facet/grouping workloads this serves (bounded group cardinality:
    langs, sources, shards). For high-cardinality groups (say >10^5 x
    blocks), use ``ds.groupby(...).map_groups`` instead — that path
    shuffles once and never materializes partials on the driver."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.sort_values(sort_cols, ascending=ascending)
            .groupby(group_cols, sort=False).head(n)
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = (
        parts.sort_values(sort_cols, ascending=ascending)
        .groupby(group_cols, sort=False).head(n)
        .sort_values(group_cols + sort_cols,
                     ascending=[True] * len(group_cols) + list(ascending))
        .reset_index(drop=True)
    )
    out["rn"] = out.groupby(group_cols, sort=False).cumcount() + 1
    return out
