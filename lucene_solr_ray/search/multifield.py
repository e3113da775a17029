"""MultiFieldSearcher: cross-field query execution on a multi-field index.

Inherits the whole scoring machinery from :class:`IndexSearcher` bound to
the default field, and overrides leaf dispatch: a :class:`FieldedQuery`
routes its sub-tree to the named field's searcher. Because all sub-indexes
share the doc-id space (same partition plan), boolean combinations across
fields work on doc-id arrays directly — the per-field postings + shared
docID model of a Lucene segment.
"""

from __future__ import annotations

import json
import os

from .query import FieldedQuery, Query
from .searcher import IndexSearcher


class MultiFieldSearcher(IndexSearcher):
    def __init__(self, out_dir: str, precise: bool = False):
        with open(os.path.join(out_dir, "multi_manifest.json")) as f:
            self.multi = json.load(f)
        self.field_searchers: dict[str, IndexSearcher] = {}
        for fname, info in self.multi["fields"].items():
            self.field_searchers[fname] = IndexSearcher(
                os.path.join(out_dir, info["dir"]), precise=precise,
                k1=info.get("k1"), b=info.get("b"),
            )
        default = self.field_searchers[self.multi["default_field"]]
        # bind the inherited machinery to the default field's index
        self.__dict__.update(
            {k: v for k, v in default.__dict__.items()}
        )
        self._defaults = default

    def searcher_for(self, field: str) -> IndexSearcher:
        return self.field_searchers[field]

    def _score(self, q: Query):
        if isinstance(q, FieldedQuery):
            return self.field_searchers[q.field]._score(q.query)
        return super()._score(q)
