"""Streaming expressions: the solrj.io.stream algebra over Datasets.

Solr's /stream handler composes TupleStreams
(``solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/`` —
InnerJoinStream, LeftOuterJoinStream, IntersectStream, ComplementStream,
RollupStream, SelectStream, SortStream, UniqueStream, MergeStream,
RankStream). Here each decorator is a function over ``ray.data.Dataset``
so expressions compose exactly like the reference's nested functional
syntax:

    rollup(inner_join(orders, customers, on="custkey"),
           over=["nation"], aggs={"revenue": ("sum", "total")})

Join strategy: the build side is broadcast via ``ray.put`` (one object
store copy, read zero-copy by every task) — the right call when one side
is dimension-like, which is what the reference's merge-joins over sorted
streams handle too. For fact-fact joins repartition both sides by key
hash first (documented assumption, same as the reference's
partitionKeys requirement).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _broadcast_table(ds) -> "object":
    import ray

    t = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow")]
        or [pa.table({})])
    return ray.put(t)


def _key_arr(t: pa.Table, on: str) -> np.ndarray:
    return t[on].to_numpy(zero_copy_only=False)


def _join_batch(b: pa.Table, rt: pa.Table, on: str, outer: bool,
                right_prefix: str) -> pa.Table:
    """Vectorized 1:N equi-join of one left batch against the broadcast
    right table: every right match produces an output row (SQL join
    semantics, not a first-match lookup). ``outer`` keeps unmatched left
    rows with nulls on the right side."""
    import pyarrow.compute as pc

    if not b.num_rows or (not rt.num_rows and not outer):
        out = b.slice(0, 0) if not outer else b
        for name in rt.column_names:
            if name != on:
                out = out.append_column(
                    right_prefix + name,
                    pa.nulls(out.num_rows, rt.schema.field(name).type))
        return out
    rk = _key_arr(rt, on)
    order = np.argsort(rk, kind="stable")
    rk_s = rk[order]
    lk = _key_arr(b, on)
    lo = np.searchsorted(rk_s, lk, side="left")
    hi = np.searchsorted(rk_s, lk, side="right")
    counts = hi - lo
    out_counts = np.maximum(counts, 1) if outer else counts
    total = int(out_counts.sum())
    left_idx = np.repeat(np.arange(lk.size, dtype=np.int64), out_counts)
    starts = np.repeat(np.cumsum(out_counts) - out_counts, out_counts)
    ridx = np.repeat(lo, out_counts) + (np.arange(total) - starts)
    matched = np.repeat(counts > 0, out_counts)
    src = order[np.minimum(ridx, max(rk_s.size - 1, 0))]
    out = b.take(pa.array(left_idx))
    if outer:
        idx_arr = pa.array(np.where(matched, src, 0), mask=~matched)
    else:
        idx_arr = pa.array(src)
    for name in rt.column_names:
        if name == on:
            continue
        col = pc.take(rt[name], idx_arr)  # null index -> null value
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        out = out.append_column(right_prefix + name, col)
    return out


def inner_join(left, right, on: str, *, right_prefix: str = ""):
    """InnerJoinStream: SQL inner equi-join; duplicate right keys fan
    out (1:N). Right side broadcast once via ``ray.put``."""
    import ray

    r_ref = _broadcast_table(right)

    def join(b: pa.Table) -> pa.Table:
        return _join_batch(b, ray.get(r_ref), on, False, right_prefix)

    return left.map_batches(join, batch_format="pyarrow")


def left_outer_join(left, right, on: str, *, right_prefix: str = ""):
    """LeftOuterJoinStream: every left row appears (nulls when
    unmatched); duplicate right keys fan out (1:N)."""
    import ray

    r_ref = _broadcast_table(right)

    def join(b: pa.Table) -> pa.Table:
        return _join_batch(b, ray.get(r_ref), on, True, right_prefix)

    return left.map_batches(join, batch_format="pyarrow")


def _membership(left, right, on: str, keep_hits: bool):
    import ray

    r_ref = _broadcast_table(right)

    def f(b: pa.Table) -> pa.Table:
        rt = ray.get(r_ref)
        lk = _key_arr(b, on)
        if rt.num_rows:
            rk = np.unique(_key_arr(rt, on))
            pos = np.searchsorted(rk, lk)
            hit = (pos < rk.size) & (rk[np.minimum(pos, rk.size - 1)]
                                     == lk)
        else:
            hit = np.zeros(lk.size, bool)
        return b.filter(pa.array(hit if keep_hits else ~hit))

    return left.map_batches(f, batch_format="pyarrow")


def intersect(left, right, on: str):
    """IntersectStream: left rows whose key exists in right."""
    return _membership(left, right, on, True)


def complement(left, right, on: str):
    """ComplementStream: left rows whose key does NOT exist in right."""
    return _membership(left, right, on, False)


def rollup(ds, over: list[str], aggs: dict[str, tuple[str, str]]):
    """RollupStream: grouped aggregates; ``aggs`` maps output name ->
    (fn, column) with fn in sum/min/max/avg/count."""
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    mk = {"sum": Sum, "min": Min, "max": Max, "avg": Mean}
    objs = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            objs.append(Count(alias_name=name))
        else:
            objs.append(mk[fn](col, alias_name=name))
    return ds.groupby(over).aggregate(*objs)


def select(ds, mapping: dict[str, str]):
    """SelectStream: project + rename (output_name <- source)."""
    def f(b: pa.Table) -> pa.Table:
        return pa.table({out: b[src] for out, src in mapping.items()})

    return ds.map_batches(f, batch_format="pyarrow")


def merge_stream(a, b, by: list[str], descending: bool = False):
    """MergeStream: union of two sorted streams re-sorted on the merge
    key (Dataset.sort IS the distributed merge)."""
    return a.union(b).sort(by, descending=descending)


def sort_merge_join(left, right, on: str, *,
                    lsuffix: str = "", rsuffix: str = "_r",
                    num_parts: int | None = None,
                    out_path: str | None = None):
    """Distributed sort-merge equi-join for FACT x FACT inputs — the
    join shape the broadcast decorators above can't do (both sides too
    big to ``ray.put``). This is the reference's sorted-stream merge
    join (``solrj/io/stream/InnerJoinStream.java`` over two
    partitionKeys-sorted /export streams) on Ray Data primitives:

    1. both sides are tagged and UNIONed under one superset schema
       (absent columns null — cheap Arrow bitmaps);
    2. ONE ``Dataset.sort`` on (key, side) co-locates every key's rows
       (the all-to-all exchange — the only shuffle);
    3. ``map_batches`` joins interior key-groups vectorized
       (repeat x tile index gathers, no Python per row);
    4. the <= 2 boundary key-groups per sorted block finish driver-side
       (same bounded-boundary invariant as the segment merge).

    ``out_path=None`` materializes the join output in the object store
    (fine when the OUTPUT is bounded — pre-aggregated or selective
    joins). For corpus-scale outputs pass ``out_path``: each task then
    WRITES its interior join rows to parquet and returns only its
    boundary rows (the segment merge's write-inside-task economics —
    nothing corpus-scale is ever pinned), and the function returns a
    Dataset reading the written files.

    Skew caveat (documented, same as any shuffle join): one key's rows
    land in one place; a pathological hot key should be pre-aggregated
    or salted by the caller.
    """
    import pyarrow.compute as pc_
    import ray.data as rd

    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = [c for c in l_schema.names if c != on]
    r_cols = [c for c in r_schema.names if c != on]
    out_l = [c + lsuffix for c in l_cols]
    # suffix right columns only on a name collision (pandas-merge style)
    out_r = [c + (rsuffix if (c + lsuffix) in set(out_l) else "")
             for c in r_cols]
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))

    def widen_l(b: pa.Table) -> pa.Table:
        cols = {on: b[on], "_side": pa.array(
            np.zeros(b.num_rows, np.int8))}
        for c, o in zip(l_cols, out_l):
            cols[o] = b[c]
        for c, o in zip(r_cols, out_r):
            cols[o] = pa.nulls(b.num_rows, r_types[c])
        return pa.table(cols)

    def widen_r(b: pa.Table) -> pa.Table:
        cols = {on: b[on], "_side": pa.array(
            np.ones(b.num_rows, np.int8))}
        for c, o in zip(l_cols, out_l):
            cols[o] = pa.nulls(b.num_rows, l_types[c])
        for c, o in zip(r_cols, out_r):
            cols[o] = b[c]
        return pa.table(cols)

    both = left.map_batches(widen_l, batch_format="pyarrow").union(
        right.map_batches(widen_r, batch_format="pyarrow"))
    if num_parts:
        both = both.repartition(num_parts)

    out_names = [on] + out_l + out_r

    def join_block(b: pa.Table) -> pa.Table:
        n = b.num_rows
        empty = {c: pa.array([], b.schema.field(c).type
                             if c in b.schema.names else pa.null())
                 for c in out_names}
        if n == 0:
            return pa.table({**empty,
                             "_boundary": pa.array([], pa.int8()),
                             "_bside": pa.array([], pa.int8())})
        keys = b[on].to_numpy(zero_copy_only=False)
        side = b["_side"].to_numpy()
        change = np.empty(n, bool)
        change[0] = True
        change[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        li_l, ri_l = [], []
        b_rows = []
        for s, e in zip(starts.tolist(), ends.tolist()):
            if s == 0 or e == n:  # boundary group -> driver
                b_rows.append((s, e))
                continue
            sd = side[s:e]
            nl = int((sd == 0).sum())
            if nl == 0 or nl == e - s:
                continue  # one-sided key: inner join drops it
            l_idx = np.arange(s, s + nl)
            r_idx = np.arange(s + nl, e)
            li_l.append(np.repeat(l_idx, r_idx.size))
            ri_l.append(np.tile(r_idx, l_idx.size))
        li = np.concatenate(li_l) if li_l else np.empty(0, np.int64)
        ri = np.concatenate(ri_l) if ri_l else np.empty(0, np.int64)
        cols = {on: b[on].take(pa.array(li))}
        for o in out_l:
            cols[o] = b[o].take(pa.array(li))
        for o in out_r:
            cols[o] = b[o].take(pa.array(ri))
        t = pa.table(cols).append_column(
            "_boundary", pa.array(np.zeros(li.size, np.int8)))
        if b_rows:
            idx = np.concatenate(
                [np.arange(s, e) for s, e in b_rows])
            bt = b.select(out_names).take(pa.array(idx))
            bt = bt.append_column(
                "_boundary",
                pa.array(np.full(idx.size, 1, np.int8)))
            # boundary rows keep their side via null pattern
            bt = bt.append_column("_bside", pa.array(side[idx]))
            t = t.append_column(
                "_bside", pa.array(np.zeros(li.size, np.int8)))
            return pa.concat_tables([t, bt], promote_options="default")
        return t.append_column(
            "_bside", pa.array(np.zeros(li.size, np.int8)))

    if out_path is not None:
        # scale path: interior rows stream to parquet INSIDE the task;
        # only the bounded boundary rows come back
        import hashlib as _hashlib
        import os as _os

        _os.makedirs(out_path, exist_ok=True)

        def join_block_write(b: pa.Table) -> pa.Table:
            t = join_block(b)
            interior_t = t.filter(
                pc_.equal(t["_boundary"], 0)).drop_columns(
                    ["_boundary", "_bside"])
            if interior_t.num_rows:
                import pyarrow.parquet as pq_

                key0 = str(interior_t[on][0].as_py())
                name = _hashlib.md5(
                    f"{key0}:{interior_t.num_rows}".encode()
                ).hexdigest()[:16]
                p = _os.path.join(out_path, f"join-{name}.parquet")
                pq_.write_table(interior_t, p + ".tmp")
                _os.replace(p + ".tmp", p)
            return t.filter(pc_.equal(t["_boundary"], 1))

        boundary = (
            both.sort([on, "_side"])
            .map_batches(join_block_write, batch_format="pyarrow",
                         batch_size=None)
            .take_all()  # <= 2 key-groups per sorted block
        )
        interior = None
    else:
        joined = (
            both.sort([on, "_side"])
            .map_batches(join_block, batch_format="pyarrow",
                         batch_size=None)
            .materialize()  # bounded-output mode; see docstring
        )
        interior = joined.map_batches(
            lambda t: t.filter(pc_.equal(t["_boundary"], 0)).drop_columns(
                ["_boundary", "_bside"]),
            batch_format="pyarrow",
        )
        boundary = joined.map_batches(
            lambda t: t.filter(pc_.equal(t["_boundary"], 1)),
            batch_format="pyarrow",
        ).take_all()  # <= 2 key-groups per sorted block
    import collections

    by_key: dict = collections.defaultdict(lambda: ([], []))
    for r in boundary:
        by_key[r[on]][int(r["_bside"])].append(r)
    rows = []
    for k, (ls, rs) in by_key.items():
        for lrow in ls:
            for rrow in rs:
                row = {on: k}
                for o in out_l:
                    row[o] = lrow[o]
                for o in out_r:
                    row[o] = rrow[o]
                rows.append(row)
    if out_path is not None:
        if rows:
            import pyarrow.parquet as pq_

            bt = pa.table({c: pa.array([r[c] for r in rows])
                           for c in [on] + out_l + out_r})
            pq_.write_table(
                bt, os.path.join(out_path, "join-boundary.parquet"))
        return rd.read_parquet(out_path)
    if rows:
        extra = rd.from_items(rows)
        return interior.union(extra)
    return interior


def having(ds, predicate: str):
    """HavingStream (``solrj/io/stream/HavingStream.java``): keep tuples
    for which a boolean expression over the tuple's fields evaluates
    true. The expression is compiled ONCE through the sandboxed infix
    compiler (functions.compile_expression — the stream-evaluator
    analogue of Solr's BooleanEvaluator tree) and applied vectorized
    per batch; typically wrapped around :func:`rollup`, which is exactly
    the having(rollup(...)) composition the reference evaluates."""
    from ..search.functions import compile_expression

    fn = compile_expression(predicate)

    def f(b: pa.Table) -> pa.Table:
        if not b.num_rows:
            return b
        bindings = {c: b[c].to_numpy(zero_copy_only=False)
                    for c in b.column_names if c in fn.variables}
        mask = np.asarray(fn(bindings), bool)
        return b.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")


def fetch(ds, store_path: str, on: str, fields: list[str]):
    """FetchStream (``solrj/io/stream/FetchStream.java``): enrich each
    tuple with stored fields looked up by key from a document store —
    Solr fetches in batches of ``batchSize`` docs against the collection;
    here each Arrow batch issues ONE predicate-pushdown parquet read for
    just its keys (row-group pruned, columns pruned), so the store is
    never scanned fully and nothing materializes on the driver. For
    stream×stream enrichment at fact scale use :func:`sort_merge_join`
    instead (documented partitioning assumption)."""
    import pyarrow.dataset as pads

    want = [on] + [f for f in fields if f != on]

    def f(b: pa.Table) -> pa.Table:
        if not b.num_rows:
            return b
        keys = b[on].to_numpy(zero_copy_only=False)
        dset = pads.dataset(store_path, format="parquet")
        looked = dset.to_table(
            columns=want, filter=pads.field(on).isin(pa.array(keys)))
        lk = looked[on].to_numpy(zero_copy_only=False)
        order = np.argsort(lk, kind="stable")
        pos = np.searchsorted(lk[order], keys)
        pos = np.minimum(pos, max(lk.size - 1, 0))
        out = {c: b[c] for c in b.column_names}
        if lk.size == 0:
            for fld in want[1:]:
                out[fld] = pa.nulls(b.num_rows,
                                    looked.schema.field(fld).type)
            return pa.table(out)
        found = lk[order][pos] == keys
        idx = order[pos]
        for fld in want[1:]:
            col = looked[fld].take(pa.array(idx))
            if not bool(found.all()):
                col = pa.array([
                    v if ok else None
                    for v, ok in zip(col.to_pylist(), found.tolist())
                ], type=looked.schema.field(fld).type)
            out[fld] = col
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow")


def significant_terms(corpus_ds, fg_doc_ids, *, analyzer,
                      text_col: str = "text", id_col: str = "doc_id",
                      min_fg_df: int = 1, limit: int = 10):
    """SignificantTermsStream (``solrj/io/stream/SignificantTermsStream.
    java`` / Solr's significantTerms streaming expression): terms that
    occur in a foreground document set disproportionately often vs the
    whole collection. One tokenize pass over the corpus computes, per
    batch, each term's (background_df, foreground_df) partials — the
    foreground id set is broadcast once via ``ray.put`` and read
    zero-copy in every task — then a tiny term-keyed groupby sums the
    partials and the driver scores the (bounded, vocabulary-sized)
    result: lift = (fg_df/fg_N) / (bg_df/N).

    Returns pa.Table (term, fg_df, bg_df, lift) — top ``limit`` by
    (lift desc, term)."""
    import ray

    fg = np.asarray(fg_doc_ids, np.int64)
    fg.sort()
    fg_ref = ray.put(fg)
    n_docs = corpus_ds.count()
    fg_n = int(fg.size)

    split_re = getattr(analyzer, "_split", None)
    stop = getattr(analyzer, "stop_words", frozenset())
    max_len = getattr(analyzer, "max_token_length", 255)

    def partials(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        fg_local = np.asarray(ray.get(fg_ref))
        ids = b[id_col].to_numpy()
        in_fg = np.zeros(ids.size, bool)
        if fg_local.size:
            pos = np.searchsorted(fg_local, ids)
            ok = pos < fg_local.size
            in_fg[ok] = fg_local[pos[ok]] == ids[ok]
        if split_re is not None:
            # vectorized path (regex-split analyzers): Arrow kernels
            # split/lower, numpy dedups (doc, term) pairs — no row loop
            lists = pc.split_pattern_regex(
                pc.utf8_lower(b[text_col].combine_chunks()),
                split_re.pattern)
            flat = lists.flatten()
            doc_idx = np.repeat(
                np.arange(len(lists), dtype=np.int64),
                pc.list_value_length(lists).to_numpy(zero_copy_only=False))
            toks = np.asarray(flat.to_pylist(), object)
            lens = flat.value_lengths() if hasattr(flat, "value_lengths") \
                else pc.utf8_length(flat)
            ln = np.asarray(lens.to_numpy(zero_copy_only=False))
            keep = (ln > 0) & (ln <= max_len)
            toks, doc_idx = toks[keep], doc_idx[keep]
            if stop:
                keep = ~np.isin(toks, np.asarray(sorted(stop), object))
                toks, doc_idx = toks[keep], doc_idx[keep]
            uterm, tcode = np.unique(toks, return_inverse=True)
            pair = np.unique(doc_idx * np.int64(uterm.size) + tcode)
            p_doc = pair // uterm.size
            p_term = pair % uterm.size
            bg = np.bincount(p_term, minlength=uterm.size)
            fgc = np.bincount(p_term, weights=in_fg[p_doc].astype(
                np.float64), minlength=uterm.size).astype(np.int64)
            return pa.table({
                "term": pa.array(uterm.tolist(), pa.string()),
                "bg": pa.array(bg.astype(np.int64), pa.int64()),
                "fg": pa.array(fgc, pa.int64()),
            })
        texts = b[text_col].to_pylist()
        agg: dict[str, list[int]] = {}
        for i, t in enumerate(texts):
            for term in set(analyzer.tokens(t)):
                cell = agg.get(term)
                if cell is None:
                    agg[term] = [1, int(in_fg[i])]
                else:
                    cell[0] += 1
                    cell[1] += int(in_fg[i])
        items = sorted(agg.items())
        return pa.table({
            "term": pa.array([k for k, _ in items], pa.string()),
            "bg": pa.array([v[0] for _, v in items], pa.int64()),
            "fg": pa.array([v[1] for _, v in items], pa.int64()),
        })

    from ray.data.aggregate import Sum

    agg = (corpus_ds.map_batches(partials, batch_format="pyarrow")
           .groupby("term")
           .aggregate(Sum("bg", alias_name="bg_df"),
                      Sum("fg", alias_name="fg_df")))
    t = pa.concat_tables(
        [b for b in agg.iter_batches(batch_format="pyarrow")]
        or [pa.table({"term": pa.array([], pa.string()),
                      "bg_df": pa.array([], pa.int64()),
                      "fg_df": pa.array([], pa.int64())})])
    fg_df = t["fg_df"].to_numpy(zero_copy_only=False).astype(np.int64)
    bg_df = t["bg_df"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = fg_df >= min_fg_df
    terms = np.asarray(t["term"].to_pylist(), object)[keep]
    fg_df, bg_df = fg_df[keep], bg_df[keep]
    lift = (fg_df / max(fg_n, 1)) / (bg_df / max(n_docs, 1))
    order = np.lexsort((terms, -lift))[:limit]
    return pa.table({
        "term": pa.array(terms[order].tolist(), pa.string()),
        "fg_df": pa.array(fg_df[order], pa.int64()),
        "bg_df": pa.array(bg_df[order], pa.int64()),
        "lift": pa.array(lift[order], pa.float64()),
    })


def _asof_fill(keys: np.ndarray, tag: np.ndarray
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Core as-of kernel over a (key, ts, tag)-sorted slice: for every
    row, the index of the latest right row (tag==0) at or before it
    within the same key run. Returns (run_start, last_right_idx, valid)."""
    n = keys.size
    idx = np.arange(n, dtype=np.int64)
    change = np.empty(n, bool)
    if n:
        change[0] = True
        change[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(change)
    run_start = starts[np.searchsorted(starts, idx, "right") - 1] if n \
        else idx
    rmark = np.where(tag == 0, idx, -1)
    last_right = np.maximum.accumulate(rmark) if n else rmark
    valid = last_right >= run_start
    return run_start, last_right, valid


def asof_join(left, right, *, on: str, left_ts: str, right_ts: str,
              right_cols: list[str], right_tiebreak: str | None = None):
    """As-of join: each left row picks the LATEST right row with the same
    key and ``right_ts <= left_ts`` (DuckDB ``ASOF JOIN`` semantics; the
    Solr-streams relative is a sorted ``reducerStream`` over a merged
    stream). Unmatched left rows are dropped (inner as-of).

    ``right_tiebreak``: when several right rows share (key, ts), the one
    with the max tiebreak column wins (sorted into last place among the
    ties, so the accumulate kernel picks it naturally).

    Distributed shape — the repo's interior/boundary discipline (same as
    ``sort_merge_join``): tag + widen both inputs to one superset schema,
    ONE ``Dataset.sort`` on (key, ts, tag) co-locates and orders every
    key's timeline; each batch resolves its rows VECTORIZED with a
    cummax kernel (no per-key dispatch); only the <=2 edge key-runs per
    batch — where a key may span batches — return raw rows, and the
    driver re-runs the same kernel over that bounded boundary set."""
    lt = left.schema()
    rt = right.schema()
    ltypes = dict(zip(lt.names, lt.types))
    rtypes = dict(zip(rt.names, rt.types))
    lcols = list(lt.names)
    fill_cols = [c for c in right_cols if c not in lcols]
    tb = right_tiebreak

    def widen_left(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in lcols}
        cols["__ts"] = b[left_ts]
        cols["__tag"] = pa.array(np.ones(b.num_rows, np.int8))
        # lefts sort AFTER every tied right: +inf beats any tiebreak
        cols["__ord"] = pa.array(np.full(b.num_rows, np.inf, np.float64))
        for c in fill_cols:
            cols[c] = pa.nulls(b.num_rows, rtypes[c])
        return pa.table(cols)

    def widen_right(b: pa.Table) -> pa.Table:
        cols = {}
        for c in lcols:
            cols[c] = b[on] if c == on else pa.nulls(b.num_rows,
                                                     ltypes[c])
        cols["__ts"] = b[right_ts]
        cols["__tag"] = pa.array(np.zeros(b.num_rows, np.int8))
        # among tied rights the max tiebreak sorts LAST (kernel picks it)
        ordv = (b[tb].to_numpy(zero_copy_only=False).astype(np.float64)
                if tb else np.zeros(b.num_rows, np.float64))
        cols["__ord"] = pa.array(ordv)
        for c in fill_cols:
            cols[c] = b[c]
        return pa.table(cols)

    u = left.map_batches(widen_left, batch_format="pyarrow").union(
        right.map_batches(widen_right, batch_format="pyarrow"))
    # ties on (key, ts): rights before lefts, winning right last among
    # tied rights — all encoded in the single numeric __ord column
    u = u.sort([on, "__ts", "__ord"])

    out_names = lcols + fill_cols

    def fill_block(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return b.append_column("_boundary",
                                   pa.array([], pa.int8()))
        keys = b[on].to_numpy(zero_copy_only=False)
        tag = b["__tag"].to_numpy()
        run_start, last_right, valid = _asof_fill(keys, tag)
        is_left = tag == 1
        first_run = run_start == 0
        last_run = run_start == run_start[-1]
        edge = first_run | last_run
        matched = is_left & valid
        emit = matched & ~(first_run & ~valid)  # matched lefts are final
        # boundary export: edge-run RIGHT rows (next/prev batch may need
        # them) + edge-run UNMATCHED lefts (their predecessor may be in a
        # neighboring batch)
        bmask = edge & ((~is_left) | (is_left & ~valid))
        emit_idx = np.flatnonzero(emit)
        src = last_right[emit_idx]
        cols = {}
        for c in lcols:
            cols[c] = b[c].take(pa.array(emit_idx))
        for c in fill_cols:
            cols[c] = b[c].take(pa.array(src))
        t = pa.table(cols).append_column(
            "_boundary", pa.array(np.zeros(emit_idx.size, np.int8)))
        bidx = np.flatnonzero(bmask)
        if bidx.size:
            raw = b.select(out_names).take(pa.array(bidx))
            for extra in ("__ts", "__tag", "__ord"):
                raw = raw.append_column(
                    extra, b[extra].take(pa.array(bidx)))
            raw = raw.append_column(
                "_boundary", pa.array(np.ones(bidx.size, np.int8)))
            t = t.append_column("__ts", pa.nulls(
                emit_idx.size, b.schema.field("__ts").type))
            t = t.append_column("__tag",
                                pa.nulls(emit_idx.size, pa.int8()))
            t = t.append_column("__ord",
                                pa.nulls(emit_idx.size, pa.float64()))
            t = t.select(raw.column_names)
            return pa.concat_tables([t, raw], promote_options="default")
        t = t.append_column("__ts", pa.nulls(
            emit_idx.size, b.schema.field("__ts").type))
        t = t.append_column("__tag", pa.nulls(emit_idx.size, pa.int8()))
        t = t.append_column("__ord", pa.nulls(emit_idx.size,
                                              pa.float64()))
        return t

    import pyarrow.compute as pc_
    import ray.data as rd

    res = (u.map_batches(fill_block, batch_format="pyarrow",
                         batch_size=None)  # whole blocks: fewer edges
           .materialize())
    interior = res.map_batches(
        lambda t: t.filter(pc_.equal(t["_boundary"], 0))
        .select(out_names),
        batch_format="pyarrow")
    bnd_parts = [
        t for t in res.map_batches(
            lambda t: t.filter(pc_.equal(t["_boundary"], 1)),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow")
    ]  # bounded: <= 2 edge key-runs per sorted block
    bnd = (pa.concat_tables(bnd_parts, promote_options="default")
           .combine_chunks() if bnd_parts else None)
    if bnd is not None and bnd.num_rows:
        import pandas as pd

        df = bnd.to_pandas().sort_values([on, "__ts", "__ord"],
                                         kind="mergesort")
        keys = df[on].to_numpy()
        tag = df["__tag"].to_numpy().astype(np.int8)
        _, last_right, valid = _asof_fill(keys, tag)
        emit = (tag == 1) & valid
        out = df.loc[emit, lcols].copy()
        src = df.index.to_numpy()[last_right[np.flatnonzero(emit)]]
        for c in fill_cols:
            out[c] = df.loc[src, c].to_numpy()
        resolved = pa.Table.from_pandas(
            out[out_names].reset_index(drop=True), preserve_index=False)
        # match interior's column types (boundary lefts carry null fill
        # cols in pandas -> float64; cast back)
        resolved = resolved.cast(
            pa.schema([bnd.schema.field(c) for c in out_names]))
        if resolved.num_rows:
            interior = interior.union(rd.from_arrow(resolved))
    return interior
