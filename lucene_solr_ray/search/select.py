"""The /select facade — one Solr-shaped request in, one response out.

``solr/core/src/java/org/apache/solr/handler/component/SearchHandler.java``
runs a component chain (QueryComponent -> FacetComponent ->
HighlightComponent) over one request. This module composes the engine's
pieces the same way so a reference user's request maps 1:1:

    solr_select(searcher, {
        "q": "+fast query", "fq": ["lang:en"], "sort": "score desc",
        "start": 0, "rows": 10, "fl": ["doc_key", "content"],
        "facet.field": ["lang"], "hl": True, "hl.fragsize": 120,
    }, corpus_source=...)

Response mirrors Solr's JSON: ``{"responseHeader", "response":
{"numFound", "start", "docs"}, "facet_counts", "highlighting"}``.

Supported params (the everyday subset): q (classic parser), fq (list,
each a classic-parser query ANDed as a filter), sort ("score desc" |
"<field> asc|desc"), start/rows, fl (stored fields via fetch_docs),
facet.field (counts over the MATCHING docs from the docvalues columns),
hl + hl.fragsize (best-window snippets over the q terms).
"""

from __future__ import annotations

import numpy as np


def _query_terms(q) -> list[str]:
    from .query import (
        BooleanQuery,
        BoostQuery,
        FieldedQuery,
        PhraseQuery,
        TermQuery,
    )

    out: list[str] = []
    if isinstance(q, TermQuery):
        out.append(q.term)
    elif isinstance(q, PhraseQuery):
        out.extend(q.terms)
    elif isinstance(q, BooleanQuery):
        for occ, c in q.clauses:
            if occ != "MUST_NOT":
                out.extend(_query_terms(c))
    elif isinstance(q, (BoostQuery, FieldedQuery)):
        out.extend(_query_terms(q.query))
    return out


def solr_select(searcher, params: dict, *,
                corpus_source: str | None = None) -> dict:
    """Run one /select request against an IndexSearcher."""
    import time as _t

    from ..index.check import fetch_docs
    from .query import BooleanQuery
    from .queryparser import ClassicQueryParser

    t0 = _t.perf_counter()
    ana = searcher.manifest.resolve_analyzer()
    parser = ClassicQueryParser(ana)
    # only a q that is EXACTLY '*:*' short-circuits; composite queries
    # embedding the match-all clause ('*:* AND lang:en') parse whole —
    # the parser maps the '*:*' clause to MatchAllDocsQuery itself
    raw_q = params.get("q", "*:*")
    q = parser.parse(raw_q) if raw_q.strip() != "*:*" else None
    from .query import MatchAllDocsQuery

    main_q = q if q is not None else MatchAllDocsQuery()

    fqs = params.get("fq") or []
    if isinstance(fqs, str):
        fqs = [fqs]
    dv_filters: list[tuple[str, str]] = []
    q_filters = []
    for f in fqs:
        field, sep, val = f.partition(":")
        # non-indexed stored column -> docvalues equality filter (the
        # fq on a string/docValues field); indexed-text filters go
        # through the parser + FILTER clause
        if sep and " " not in val and field != searcher.manifest.field:
            dv_filters.append((field.strip(), val.strip()))
        else:
            q_filters.append(parser.parse(f))
    if q_filters:
        clauses = [("MUST", main_q)]
        clauses += [("FILTER", fq_) for fq_ in q_filters]
        main_q = BooleanQuery(tuple(clauses), 0)

    start = int(params.get("start", 0))
    rows = int(params.get("rows", 10))
    sort = params.get("sort", "score desc")

    # full match set once: numFound + facets need it; top-k comes
    # from the same arrays (QueryComponent's single collection pass)
    docs, scores = searcher._score(main_q)
    for field, val in dv_filters:
        col = np.asarray(searcher.docvalues(field))[docs]
        keep = col.astype(str) == val
        docs, scores = docs[keep], scores[keep]
    num_found = int(docs.size)

    fname, _, dir_ = sort.partition(" ")
    asc = dir_.strip() == "asc"
    if fname == "score":
        key = scores if asc else -scores
    else:
        vals = np.asarray(searcher.docvalues(fname))[docs]
        if not asc and not np.issubdtype(vals.dtype, np.number):
            # string/desc: negate the sorted-unique rank, not the value
            uniq, inv = np.unique(vals, return_inverse=True)
            key = -inv
        else:
            key = vals if asc else -vals
    order = np.lexsort((docs, key))
    window = order[start:start + rows]
    top_docs = docs[window]
    top_scores = scores[window]

    out_docs: list[dict] = []
    fl = params.get("fl")
    fetch_cols = list(fl) if fl else None
    if fetch_cols is not None:
        # hl/mlt read the text field from the fetched row — include it
        # even when fl omits it (Solr fetches hl.fl independently);
        # stripped from the response below
        for flag, fld_param in (("hl", "hl.fl"), ("mlt", "mlt.fl")):
            if params.get(flag):
                fld = params.get(fld_param, searcher.manifest.field)
                if fld not in fetch_cols:
                    fetch_cols.append(fld)
    if top_docs.size and (corpus_source or searcher.manifest.partitions):
        fetched = fetch_docs(searcher.manifest.index_dir,
                             corpus_source,
                             doc_ids=[int(x) for x in top_docs],
                             columns=fetch_cols)
        by_id = {int(row["doc_id"]): row
                 for row in fetched.to_pylist()}
        for d_, s_ in zip(top_docs, top_scores):
            row = dict(by_id.get(int(d_), {}))
            row["score"] = float(s_)
            row["[docid]"] = int(d_)
            out_docs.append(row)

    resp = {
        "responseHeader": {
            "status": 0,
            "QTime": int((_t.perf_counter() - t0) * 1000),
            "params": params,
        },
        "response": {"numFound": num_found, "start": start,
                     "docs": out_docs},
    }

    facet_fields = params.get("facet.field") or []
    if isinstance(facet_fields, str):
        facet_fields = [facet_fields]
    if facet_fields:
        ff: dict = {}
        for field in facet_fields:
            col = np.asarray(searcher.docvalues(field))[docs]
            uniq, cnt = np.unique(col.astype(str), return_counts=True)
            o = np.lexsort((uniq, -cnt))
            ff[field] = [x for i in o
                         for x in (str(uniq[i]), int(cnt[i]))]
        resp["facet_counts"] = {"facet_fields": ff}

    if params.get("group") and params.get("group.field"):
        # GroupingComponent (grouping's two-pass collector shape over
        # the already-collected match set): top groups by their best
        # doc's score, each with group.limit docs
        gfield = params["group.field"]
        glimit = int(params.get("group.limit", 1))
        gvals = np.asarray(searcher.docvalues(gfield)).astype(str)[docs]
        order_all = np.lexsort((docs, -scores))
        groups: dict = {}
        for i in order_all:
            g = gvals[i]
            bucket = groups.setdefault(g, [])
            if len(bucket) < glimit:
                bucket.append((int(docs[i]), float(scores[i])))
        # group order = best doc's rank (insertion order of first hit)
        glist = []
        for g, members in list(groups.items())[:rows]:
            glist.append({
                "groupValue": g,
                "doclist": {
                    "numFound": int((gvals == g).sum()),
                    "docs": [{"[docid]": d_, "score": s_}
                             for d_, s_ in members],
                },
            })
        resp["grouped"] = {gfield: {"matches": num_found,
                                    "groups": glist}}

    stats_fields = params.get("stats.field") or []
    if isinstance(stats_fields, str):
        stats_fields = [stats_fields]
    if params.get("stats") and stats_fields:
        # StatsComponent: min/max/sum/count/mean/stddev over the MATCH
        # set's docvalues (StatsValuesFactory numeric stats)
        sf: dict = {}
        for field in stats_fields:
            col = np.asarray(searcher.docvalues(field),
                             np.float64)[docs]
            sf[field] = {
                "min": float(col.min()) if col.size else None,
                "max": float(col.max()) if col.size else None,
                "count": int(col.size),
                "sum": float(col.sum()),
                "mean": float(col.mean()) if col.size else None,
                "stddev": float(col.std(ddof=1)) if col.size > 1
                else 0.0,
            }
        resp["stats"] = {"stats_fields": sf}

    if params.get("debug") and out_docs:
        # DebugComponent: per-doc Explanation trees (debug=true /
        # debug.explain.structured)
        resp["debug"] = {"explain": {
            str(row["[docid]"]):
                searcher.explain(main_q, row["[docid]"])
            for row in out_docs
        }}

    if params.get("mlt") and out_docs:
        # MoreLikeThisComponent: for each returned doc, similar docs by
        # the MLT query over its stored text (MoreLikeThis.java
        # defaults; self excluded)
        from .extras import more_like_this

        mlt_count = int(params.get("mlt.count", 3))
        text_field = params.get("mlt.fl", searcher.manifest.field)
        ml: dict = {}
        for row in out_docs:
            text = str(row.get(text_field, ""))
            if not text:
                continue
            mq = more_like_this(searcher, text, min_term_freq=1,
                                min_doc_freq=1)
            t = searcher.search(mq, k=mlt_count + 1)
            ml[str(row["[docid]"])] = [
                int(x) for x in t["doc_id"].to_pylist()
                if int(x) != row["[docid]"]][:mlt_count]
        resp["moreLikeThis"] = ml

    if params.get("spellcheck"):
        # SpellCheckComponent in the chain: suggest for query terms the
        # dictionary barely knows, plus a collation (the "did you mean")
        from .extras import spellcheck as _sc
        from .extras import spellcheck_collate

        sc: dict = {"suggestions": {}}
        for t in _query_terms(main_q):
            if searcher.doc_freq(t) == 0:
                cand = _sc(searcher, t, n=3)
                sc["suggestions"][t] = cand["term"].to_pylist()
        if sc["suggestions"]:
            coll = spellcheck_collate(searcher, params.get("q", ""), ana)
            sc["collation"] = coll.get("collation")
        resp["spellcheck"] = sc

    if params.get("hl"):
        from .extras import highlight

        terms = _query_terms(main_q)
        frag = int(params.get("hl.fragsize", 120))
        hl_field = params.get("hl.fl", searcher.manifest.field)
        hi: dict = {}
        for row in out_docs:
            text = str(row.get(hl_field, ""))
            hi[str(row["[docid]"])] = {
                hl_field: [highlight(text, terms, window_chars=frag)]}
        resp["highlighting"] = hi

    if fl:
        # drop fetch-only companions (hl.fl/mlt.fl text) from the page
        keep = set(fl) | {"score", "[docid]", "doc_id"}
        for row in out_docs:
            for k_ in [k for k in row if k not in keep]:
                row.pop(k_)
    return resp


class SelectCollectorManager:
    """CollectorManager for the DISTRIBUTED /select (SearchHandler with
    ``shards=``): each shard's collector produces (numFound, top-k,
    per-field facet partials) from its (docs, scores) arrays; reduce
    merges counts, TopDocs (score desc, doc asc — HitQueue tie rules)
    and facet dictionaries. Facet columns broadcast once inside the
    manager (ray.put by collect_sharded)."""

    def __init__(self, k: int, facet_values: dict):
        self.k = k
        self.facet_values = facet_values  # field -> dense str column

    def new_collector(self):
        k = self.k
        fv = self.facet_values

        def collect(docs, scores):
            order = np.lexsort((docs, -scores))[:k]
            facets = {}
            for field, col in fv.items():
                vals = col[docs]
                uniq, cnt = np.unique(vals, return_counts=True)
                facets[field] = dict(zip(uniq.tolist(), cnt.tolist()))
            return {
                "num_found": int(docs.size),
                "top": [(float(scores[i]), int(docs[i])) for i in order],
                "facets": facets,
            }
        return collect

    def reduce(self, parts: list) -> dict:
        num_found = sum(p["num_found"] for p in parts)
        merged = sorted(
            (t for p in parts for t in p["top"]),
            key=lambda t: (-t[0], t[1]))[: self.k]
        facets: dict = {}
        for p in parts:
            for field, d in p["facets"].items():
                tgt = facets.setdefault(field, {})
                for v, c in d.items():
                    tgt[v] = tgt.get(v, 0) + c
        return {"num_found": num_found, "top": merged, "facets": facets}


def solr_select_distributed(index_dir: str, params: dict, *,
                            num_shards: int = 4) -> dict:
    """Distributed /select: the query+facet pass fans out over doc-range
    shards via collect_sharded (global-stats injected, rank-identical
    to one searcher); stored-field fetch runs once for the merged
    page."""
    from ..index.check import fetch_docs
    from .distributed import collect_sharded
    from .queryparser import ClassicQueryParser
    from .query import MatchAllDocsQuery
    from .searcher import IndexSearcher

    local = IndexSearcher(index_dir)  # term dict for parsing + facets
    ana = local.manifest.resolve_analyzer()
    qtext = params.get("q", "*:*")
    q = MatchAllDocsQuery() if qtext == "*:*" else \
        ClassicQueryParser(ana).parse(qtext)

    rows = int(params.get("rows", 10))
    facet_fields = params.get("facet.field") or []
    if isinstance(facet_fields, str):
        facet_fields = [facet_fields]
    fv = {f: np.asarray(local.docvalues(f)).astype(str)
          for f in facet_fields}
    mgr = SelectCollectorManager(rows, fv)
    agg = collect_sharded(index_dir, q, mgr, num_shards=num_shards)

    top_docs = [d for _s, d in agg["top"]]
    by_id: dict = {}
    if top_docs:
        fetched = fetch_docs(index_dir, None, doc_ids=top_docs,
                             columns=params.get("fl"))
        by_id = {int(r["doc_id"]): r for r in fetched.to_pylist()}
    docs_out = []
    for s_, d_ in agg["top"]:
        row = dict(by_id.get(d_, {}))
        row["score"] = s_
        row["[docid]"] = d_
        docs_out.append(row)
    resp = {
        "responseHeader": {"status": 0, "params": params,
                           "shards": num_shards},
        "response": {"numFound": agg["num_found"], "start": 0,
                     "docs": docs_out},
    }
    if facet_fields:
        ff = {}
        for field, d in agg["facets"].items():
            items = sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))
            ff[field] = [x for kv in items for x in (kv[0], int(kv[1]))]
        resp["facet_counts"] = {"facet_fields": ff}
    return resp
