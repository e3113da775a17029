"""Analytics component: expression-based aggregations in one pass.

Re-expresses ``solr/contrib/analytics`` (AnalyticsComponent /
``request/AnalyticsRequest``): the user declares named EXPRESSIONS over
aggregate functions — ``sum(x)/count()``, ``max(x)-min(x)`` — grouped
by a field (the analytics "field facet") or computed corpus-wide, and
the engine satisfies ALL expressions from ONE distributed aggregation
pass over exactly the base aggregates the expressions mention.

Distributed shape: the expression text is scanned for ``agg(col)``
leaves; each distinct leaf becomes one Ray Data aggregate in a single
``groupby().aggregate(...)`` (partial-per-block + one shuffle — the
same economics as the reference's per-segment collectors + merge);
the arithmetic then evaluates vectorized on the tiny aggregated table
via the engine's compiled-expression facility
(``search/functions.py``, the JavascriptCompiler analogue).

Supported leaves: ``sum(col)``, ``min(col)``, ``max(col)``,
``avg(col)`` / ``mean(col)``, ``count()``. Arithmetic/comparison/
ternary syntax is whatever ``compile_expression`` admits.
``unique(col)`` (count-distinct) is out of scope — the reference
computes it exactly per shard + merges a set; this engine exposes HLL
sketches for that (``stages/sketches.py``).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_LEAF = re.compile(
    r"\b(sum|min|max|avg|mean|count)\s*\(\s*([A-Za-z_][A-Za-z_0-9]*)?\s*\)")


def _scan(expressions: dict[str, str]):
    """Rewrite agg leaves to synthetic names; collect needed aggregates.

    Returns (rewritten {name: infix_expr}, leaves {(fn, col): synth}).
    """
    leaves: dict[tuple[str, str | None], str] = {}
    rewritten: dict[str, str] = {}

    def sub(m: re.Match) -> str:
        fn, col = m.group(1), m.group(2)
        fn = "mean" if fn == "avg" else fn
        if fn == "count":
            col = None
        elif col is None:
            raise ValueError(f"{fn}() needs a column")
        key = (fn, col)
        if key not in leaves:
            leaves[key] = f"__{fn}_{col or 'rows'}"
        return leaves[key]

    for name, expr in expressions.items():
        rewritten[name] = _LEAF.sub(sub, expr)
    if not leaves:
        raise ValueError("expressions reference no aggregate functions")
    return rewritten, leaves


def analytics(ds, expressions: dict[str, str], *,
              group_by: str | None = None) -> pa.Table:
    """Evaluate named aggregate expressions, optionally per group.

    >>> analytics(docs, {"avg_len": "sum(n_chars)/count()"},
    ...           group_by="lang")
    """
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    from ..search.functions import compile_expression

    rewritten, leaves = _scan(expressions)
    mk = {"sum": Sum, "min": Min, "max": Max, "mean": Mean}
    aggs = []
    out_col_of: dict[str, str] = {}
    for (fn, col), synth in leaves.items():
        if fn == "count":
            aggs.append(Count())
            out_col_of[synth] = "count()"
        else:
            aggs.append(mk[fn](col, alias_name=f"{fn}({col})"))
            out_col_of[synth] = f"{fn}({col})"

    if group_by is not None:
        agg_tbl = ds.groupby(group_by).aggregate(*aggs).to_pandas()
        agg_tbl = agg_tbl.sort_values(group_by).reset_index(drop=True)
    else:
        import pandas as pd

        row = ds.aggregate(*aggs)
        agg_tbl = pd.DataFrame({k: [v] for k, v in row.items()})

    bindings = {synth: agg_tbl[out].to_numpy().astype(np.float64)
                for synth, out in out_col_of.items()}
    cols: dict[str, pa.Array] = {}
    if group_by is not None:
        cols[group_by] = pa.array(agg_tbl[group_by])
    for name, expr in rewritten.items():
        vals = compile_expression(expr)(bindings)
        cols[name] = pa.array(
            np.asarray(vals, np.float64), pa.float64())
    return pa.table(cols)
