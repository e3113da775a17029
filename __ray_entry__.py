"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in lucene_solr_ray) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship pipeline (Lucene-faithful index build + BM25 query
  set) over /root/testdata/sf0.001.
- ``queries()``: one callable per implemented operator/pipeline from
  SURVEY.md §2 + the training-data stages; each takes ``sf_dir``.
- ``oracle_sql()``: DuckDB-equivalent SQL per query (omitted for
  non-SQL-expressible ops -> rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from lucene_solr_ray.pipelines import run_flagship

    return run_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from lucene_solr_ray.pipelines import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from lucene_solr_ray.pipelines import ORACLE_SQL

    return dict(ORACLE_SQL)
