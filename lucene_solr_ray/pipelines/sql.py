"""Parallel SQL over Ray Data — the Solr ParallelSQLHandler analogue
(``solr/core/src/java/org/apache/solr/handler/sql/`` — Solr 6's
Calcite-planned SQL that compiles to streaming expressions; here the
plan compiles to a Ray Data pipeline).

Supported subset (what the Solr handler's MVP supported):

    SELECT [DISTINCT] col | agg(col) [AS alias] [, ...]
    FROM <table>
    [JOIN <table> ON a = b [JOIN ...]]      broadcast hash join
    [WHERE <bool expr>]                     AND/OR/NOT, parentheses;
                                            predicates: = <> < <= > >=,
                                            [NOT] IN (...), [NOT] BETWEEN,
                                            [NOT] LIKE, IS [NOT] NULL
    [GROUP BY col [, ...]]
    [HAVING <bool expr over aliases>]
    [ORDER BY name [ASC|DESC] [, ...]]
    [LIMIT n]

aggs: count(*), count(col), sum, min, max, avg. Joined tables are
broadcast (``ray.put`` once, probed per batch) — the dimension-table
pattern; fact x fact joins go through ``streams.sort_merge_join``.

Scale notes: the read prunes to referenced columns; WHERE runs as Arrow
compute inside ``map_batches``; GROUP BY is Ray's shuffle aggregate;
ORDER BY on an ungrouped query uses the distributed ``Dataset.sort`` +
streaming limit (no driver materialization); ORDER BY after GROUP BY
sorts the (small) aggregate result driver-side. Float aggregate outputs
are rounded to 4 decimals (the repo-wide oracle convention).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_AGG_FNS = {"count", "sum", "min", "max", "avg"}

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<str>'(?:[^']|'')*')|(?P<num>\d+(?:\.\d+)?)"
    r"|(?P<op><=|>=|<>|=|<|>)|(?P<punc>[(),*+\-/])"
    r"|(?P<word>[A-Za-z_][A-Za-z0-9_]*))"
)


def _tokenize(q: str) -> list[tuple[str, str]]:
    out, i = [], 0
    q = q.strip().rstrip(";")
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if not m:
            raise ValueError(f"SQL parse error at: {q[i:i+20]!r}")
        i = m.end()
        for kind in ("str", "num", "op", "punc", "word"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


@dataclass
class SelectItem:
    agg: str | None  # None = plain column
    col: str         # "*" only for count(*)
    alias: str


@dataclass
class Plan:
    table: str
    items: list[SelectItem]
    distinct: bool = False
    joins: list[tuple[str, str, str]] = field(default_factory=list)
    # boolean expression trees (nested tuples, see _parse_expr) or None
    where: object = None
    group_by: list[str] = field(default_factory=list)
    having: object = None
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # desc?
    limit: int | None = None


class _P:
    def __init__(self, toks: list[tuple[str, str]]):
        self.t = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.t[self.i][1] if self.i < len(self.t) else None

    def kw(self, *words: str) -> bool:
        p = self.peek()
        return p is not None and p.upper() in words

    def take(self) -> str:
        v = self.t[self.i][1]
        self.i += 1
        return v

    def expect(self, w: str) -> None:
        v = self.take()
        if v.upper() != w and v != w:
            raise ValueError(f"expected {w}, got {v}")

    def literal(self) -> object:
        neg = False
        if self.peek() == "-":
            self.i += 1
            neg = True
        kind, raw = self.t[self.i]
        self.i += 1
        if kind == "num":
            v = float(raw) if "." in raw else int(raw)
            return -v if neg else v
        if kind == "str" and not neg:
            return raw[1:-1].replace("''", "'")
        raise ValueError(f"bad literal {raw}")


# boolean expression tree nodes (plain tuples so the tree pickles into
# map_batches closures cheaply):
#   ("or", [n...]) ("and", [n...]) ("not", n)
#   ("cmp", col, op, val) ("in", col, [v...]) ("between", col, lo, hi)
#   ("like", col, pattern) ("isnull", col)


def _parse_pred(p: _P):
    if p.peek() == "(":
        p.take()
        node = _parse_expr(p)
        p.expect(")")
        return node
    if p.kw("NOT"):
        p.take()
        return ("not", _parse_pred(p))
    lhs = _parse_arith(p)
    if lhs[0] == "col":
        col = lhs[1]
    else:
        # expression LHS: only plain comparisons apply
        op = p.take()
        if op not in _OPS:
            raise ValueError(
                f"expression LHS supports comparison operators, got {op}")
        return ("cmp", lhs, op, p.literal())
    if p.kw("IS"):
        p.take()
        neg = False
        if p.kw("NOT"):
            p.take()
            neg = True
        p.expect("NULL")
        node = ("isnull", col)
        return ("not", node) if neg else node
    neg = False
    if p.kw("NOT"):
        p.take()
        neg = True
        if not p.kw("IN", "BETWEEN", "LIKE"):
            raise ValueError("NOT must precede IN/BETWEEN/LIKE here")
    if p.kw("IN"):
        p.take()
        p.expect("(")
        vals = [p.literal()]
        while p.peek() == ",":
            p.take()
            vals.append(p.literal())
        p.expect(")")
        node = ("in", col, vals)
    elif p.kw("BETWEEN"):
        p.take()
        lo = p.literal()
        p.expect("AND")  # binds to BETWEEN, not the boolean AND
        node = ("between", col, lo, p.literal())
    elif p.kw("LIKE"):
        p.take()
        pat = p.literal()
        if not isinstance(pat, str):
            raise ValueError("LIKE pattern must be a string")
        node = ("like", col, pat)
    else:
        op = p.take()
        if op not in _OPS:
            raise ValueError(f"unknown operator {op}")
        node = ("cmp", col, op, p.literal())
    return ("not", node) if neg else node


def _parse_expr(p: _P):
    """OR-of-ANDs with standard precedence (OR < AND < NOT)."""
    def and_expr():
        parts = [_parse_pred(p)]
        while p.kw("AND"):
            p.take()
            parts.append(_parse_pred(p))
        return parts[0] if len(parts) == 1 else ("and", parts)

    parts = [and_expr()]
    while p.kw("OR"):
        p.take()
        parts.append(and_expr())
    return parts[0] if len(parts) == 1 else ("or", parts)


def _expr_cols(node) -> set[str]:
    tag = node[0]
    if tag in ("or", "and"):
        return set().union(*(_expr_cols(n) for n in node[1]))
    if tag == "not":
        return _expr_cols(node[1])
    if isinstance(node[1], tuple):  # expression LHS (cmp only)
        return _arith_cols(node[1])
    return {node[1]}


# arithmetic value expressions (SELECT sum(a * (1 - b)), SELECT a+1):
#   ("col", name) ("lit", v) ("bin", op, left, right)


_SCALAR_FNS = {"lower", "upper", "length", "abs", "round"}


def _parse_arith(p: _P):
    def factor():
        if p.peek() == "(":
            p.take()
            n = expr()
            p.expect(")")
            return n
        if p.peek() == "-":
            p.take()
            return ("bin", "-", ("lit", 0), factor())
        kind, raw = p.t[p.i]
        if kind == "num":
            p.i += 1
            return ("lit", float(raw) if "." in raw else int(raw))
        if kind == "str":
            p.i += 1
            return ("lit", raw[1:-1].replace("''", "'"))
        if kind == "word":
            p.i += 1
            if raw.upper() == "CASE":
                whens: list[tuple] = []
                els = None
                while p.kw("WHEN"):
                    p.take()
                    cond = _parse_expr(p)
                    p.expect("THEN")
                    whens.append((cond, expr()))
                if p.kw("ELSE"):
                    p.take()
                    els = expr()
                p.expect("END")
                return ("case", whens, els)
            if raw.lower() in _SCALAR_FNS and p.peek() == "(":
                p.take()
                args = [expr()]
                while p.peek() == ",":
                    p.take()
                    args.append(expr())
                p.expect(")")
                return ("fn", raw.lower(), args)
            return ("col", raw)
        raise ValueError(f"bad arithmetic factor {raw!r}")

    def term():
        n = factor()
        while p.peek() in ("*", "/"):
            n = ("bin", p.take(), n, factor())
        return n

    def expr():
        n = term()
        while p.peek() in ("+", "-"):
            n = ("bin", p.take(), n, term())
        return n

    return expr()


def _arith_cols(node) -> set[str]:
    if isinstance(node, str):
        return {node} if node != "*" else set()
    if node[0] == "col":
        return {node[1]}
    if node[0] == "bin":
        return _arith_cols(node[2]) | _arith_cols(node[3])
    if node[0] == "fn":
        return set().union(*(_arith_cols(a) for a in node[2]))
    if node[0] == "case":
        out: set[str] = set()
        for cond, val in node[1]:
            out |= _expr_cols(cond) | _arith_cols(val)
        if node[2] is not None:
            out |= _arith_cols(node[2])
        return out
    return set()


def _eval_arith(b: pa.Table, node):
    """Arrow-kernel evaluation of an arithmetic tree over one batch."""
    if node[0] == "col":
        c = b[node[1]]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    if node[0] == "lit":
        return pa.scalar(node[1])
    if node[0] == "fn":
        args = [_eval_arith(b, a) for a in node[2]]
        name = node[1]
        if name == "lower":
            return pc.utf8_lower(args[0])
        if name == "upper":
            return pc.utf8_upper(args[0])
        if name == "length":
            return pc.cast(pc.utf8_length(args[0]), pa.int64())
        if name == "abs":
            return pc.abs(args[0])
        if name == "round":
            nd = args[1].as_py() if len(args) > 1 else 0
            # SQL round: half away from zero (DuckDB semantics)
            return pc.round(args[0], ndigits=int(nd),
                            round_mode="half_towards_infinity")
        raise ValueError(f"unknown function {name}")
    if node[0] == "case":
        # fold right-to-left: if_else(cond_i, val_i, rest)
        out = _eval_arith(b, node[2]) if node[2] is not None \
            else pa.scalar(None)
        for cond, val in reversed(node[1]):
            # CASE treats a NULL condition as not-matched (SQL): fill
            # the three-valued mask to False before branching
            mask = pc.fill_null(_eval_expr(b, cond), False)
            out = pc.if_else(mask, _eval_arith(b, val), out)
        return out
    l, r = _eval_arith(b, node[2]), _eval_arith(b, node[3])
    if node[1] == "/":
        # SQL division yields double (DuckDB semantics)
        return pc.divide(pc.cast(l, pa.float64()), pc.cast(r, pa.float64()))
    fns = {"+": pc.add, "-": pc.subtract, "*": pc.multiply}
    return fns[node[1]](l, r)


def parse_sql(q: str) -> Plan:
    p = _P(_tokenize(q))
    p.expect("SELECT")
    distinct = False
    if p.kw("DISTINCT"):
        p.take()
        distinct = True
    items: list[SelectItem] = []
    while True:
        w = p.take()
        if w.lower() in _AGG_FNS and p.peek() == "(":
            p.expect("(")
            agg = w.lower()
            if agg == "count" and p.kw("DISTINCT"):
                p.take()
                agg = "count_distinct"
            if agg in ("count", "count_distinct"):
                col = p.take()
                p.expect(")")
                if agg == "count_distinct" and col == "*":
                    raise ValueError("count(DISTINCT *) is not supported")
                alias = f"{agg}_{col}" if col != "*" else agg
            else:
                node = _parse_arith(p)
                p.expect(")")
                if node[0] == "col":  # plain column keeps its name
                    col = node[1]
                    alias = f"{agg}_{col}"
                else:                 # arithmetic expression
                    col = node
                    alias = agg
        elif (p.peek() in ("+", "-", "*", "/") or w == "("
              or w.upper() == "CASE"
              or (w.lower() in _SCALAR_FNS and p.peek() == "(")):
            p.i -= 1
            col = _parse_arith(p)
            agg, alias = None, "expr"
            if col[0] == "col":
                alias = col[1]
        else:
            agg, col, alias = None, w, w
        if p.kw("AS"):
            p.take()
            alias = p.take()
        items.append(SelectItem(agg, col, alias))
        if p.peek() == ",":
            p.take()
            continue
        break
    p.expect("FROM")
    if p.peek() == "(":
        # FROM (SELECT ...) [AS alias] — derived table; the inner SQL
        # is re-assembled from its token slice and planned recursively
        # at execution time
        p.take()
        depth, inner = 1, []
        while True:
            t = p.take()
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
                if depth == 0:
                    break
            inner.append(t)
        table: object = ("__subquery__", " ".join(inner))
        if p.kw("AS"):
            p.take()
            p.take()
        elif (p.peek() is not None
              and not p.kw("WHERE", "GROUP", "HAVING", "ORDER",
                           "LIMIT", "JOIN", "LEFT", "INNER")
              and p.peek() not in (",", "(", ")")):
            p.take()  # bare alias
    else:
        table = p.take()
    plan = Plan(table=table, items=items, distinct=distinct)
    while p.kw("JOIN", "LEFT", "INNER"):
        kind = "inner"
        if p.kw("LEFT"):
            p.take()
            kind = "left"
            if p.kw("OUTER"):
                p.take()
        elif p.kw("INNER"):
            p.take()
        p.expect("JOIN")
        jt = p.take()
        p.expect("ON")
        a = p.take()
        p.expect("=")
        b = p.take()
        plan.joins.append((jt, a, b, kind))
    if p.kw("WHERE"):
        p.take()
        plan.where = _parse_expr(p)
    if p.kw("GROUP"):
        p.take()
        p.expect("BY")
        while True:
            g = p.take()
            if g.isdigit():  # positional: GROUP BY 1 = first select item
                g = items[int(g) - 1].alias
            plan.group_by.append(g)
            if p.peek() == ",":
                p.take()
                continue
            break
    if p.kw("HAVING"):
        p.take()
        plan.having = _parse_expr(p)
    if p.kw("ORDER"):
        p.take()
        p.expect("BY")
        while True:
            name = p.take()
            if name.isdigit():  # positional ORDER BY
                name = items[int(name) - 1].alias
            desc = False
            if p.kw("ASC", "DESC"):
                desc = p.take().upper() == "DESC"
            plan.order_by.append((name, desc))
            if p.peek() == ",":
                p.take()
                continue
            break
    if p.kw("LIMIT"):
        p.take()
        plan.limit = int(p.take())
    if p.i != len(p.t):
        raise ValueError(f"trailing tokens: {p.t[p.i:]}")
    return plan


_OPS = {
    "=": pc.equal, "<>": pc.not_equal, "<": pc.less,
    "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal,
}


def _coerce(col, val):
    """SQL literal -> column-type scalar: ISO date/timestamp strings
    compare against temporal columns (DuckDB-style implicit cast)."""
    if isinstance(val, str) and (pa.types.is_timestamp(col.type)
                                 or pa.types.is_date(col.type)):
        return pa.scalar(val).cast(col.type)
    return val


def _eval_expr(b: pa.Table, node):
    """Evaluate a WHERE tree to a THREE-VALUED boolean mask with Arrow
    kernels: NULL operands stay NULL at the leaves, AND/OR compose with
    Kleene kernels, and NOT(NULL) is NULL — so ``NOT x LIKE``/``NOT IN``
    over a NULL operand excludes the row exactly like the SQL standard
    (and the DuckDB oracle). The single ``fill_null(False)`` happens at
    the top of ``_filter_batch``."""
    tag = node[0]
    if tag == "and":
        m = _eval_expr(b, node[1][0])
        for n in node[1][1:]:
            m = pc.and_kleene(m, _eval_expr(b, n))
        return m
    if tag == "or":
        m = _eval_expr(b, node[1][0])
        for n in node[1][1:]:
            m = pc.or_kleene(m, _eval_expr(b, n))
        return m
    if tag == "not":
        return pc.invert(_eval_expr(b, node[1]))  # invert keeps nulls
    if tag == "isnull":
        return pc.is_null(b[node[1]])  # never null itself
    if tag == "cmp":
        col = _eval_arith(b, node[1]) if isinstance(node[1], tuple) \
            else b[node[1]]
        return _OPS[node[2]](col, _coerce(col, node[3]))
    if tag == "in":
        col = b[node[1]]
        # .cast covers ISO-string -> temporal coercion for the list form
        vals = pa.array(node[2]).cast(col.type)
        m = pc.is_in(col, value_set=vals)
        # is_in yields False for NULL probes; SQL says NULL IN (...) is
        # NULL (so NOT IN keeps excluding the row)
        return pc.if_else(pc.is_null(col),
                          pa.scalar(None, pa.bool_()), m)
    if tag == "between":
        col = b[node[1]]
        return pc.and_kleene(
            pc.greater_equal(col, _coerce(col, node[2])),
            pc.less_equal(col, _coerce(col, node[3])))
    if tag == "like":
        return pc.match_like(b[node[1]], node[2])  # null-propagating
    raise ValueError(f"unknown node {tag}")


def _filter_batch(b: pa.Table, where) -> pa.Table:
    if where is None:
        return b
    return b.filter(pc.fill_null(_eval_expr(b, where), False))


# --- NULL-safe group/sort keys -------------------------------------------
# Ray Data's groupby and sort shuffles compare key values with Python
# ``<`` (sort_task_spec / aggregate_task_spec), which raises on None —
# but SQL GROUP BY / DISTINCT / ORDER BY treat NULL as an ordinary
# (single) group that sorts NULLS LAST (the DuckDB default). We make
# the shuffle null-safe without leaving the distributed plan: one cheap
# map_batches fills each key's nulls with a type placeholder and records
# them in a boolean ``__isnull__<k>`` marker column; grouping on
# (key, marker) keeps the NULL group distinct from the placeholder's
# real value, sorting on (marker ASC, key) yields NULLS LAST, and the
# markers are used to put the NULLs back after the shuffle.

_NULLMARK = "__isnull__"


def _null_fill_scalar(t: pa.DataType):
    """Type-appropriate placeholder for NULL keys (restored later)."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.scalar("", t)
    if pa.types.is_floating(t):
        return pa.scalar(0.0, t)
    if pa.types.is_integer(t):
        return pa.scalar(0, t)
    if pa.types.is_boolean(t):
        return pa.scalar(False, t)
    if pa.types.is_temporal(t):
        return pa.array([0], pa.int64()).cast(t)[0]
    return None


def _mark_null_keys(ds, keys: list[str]):
    """Fill + mark NULL key values; returns (ds, {key: marker})."""
    markers = {k: _NULLMARK + k for k in keys}

    def _mark(b: pa.Table, _keys=tuple(keys), _m=dict(markers)) -> pa.Table:
        for k in _keys:
            col = b[k]
            b = b.append_column(_m[k], pc.is_null(col))
            fv = _null_fill_scalar(col.type)
            if fv is not None and col.null_count:
                b = b.set_column(b.column_names.index(k), k,
                                 pc.fill_null(col, fv))
        return b

    return ds.map_batches(_mark, batch_format="pyarrow"), markers


def _restore_null_keys(t: pa.Table, markers: dict[str, str]) -> pa.Table:
    """Arrow-side restore: NULL where the marker is set, drop markers."""
    for k, m in markers.items():
        if m not in t.column_names:
            continue
        mask = t[m].combine_chunks() if t.num_rows else t[m]
        if t.num_rows and pc.any(mask).as_py():
            col = t[k]
            t = t.set_column(
                t.column_names.index(k), k,
                pc.if_else(mask, pa.scalar(None, col.type), col))
        t = t.drop_columns([m])
    return t


def _restore_null_keys_pd(df, markers: dict[str, str]):
    """Pandas-side restore (post-``to_pandas`` aggregate results)."""
    for k, m in markers.items():
        if m in df.columns:
            df[k] = df[k].mask(df[m].astype(bool))
            df = df.drop(columns=[m])
    return df


def _ensure_cols(df, cols: list[str]):
    """Zero-group aggregates: Ray's ``groupby().aggregate().to_pandas()``
    on an EMPTY dataset loses the schema entirely, so a fully-filtered
    WHERE crashed every downstream column access (SQL says: empty
    result, same shape). Reinstate the expected columns on empty
    frames."""
    if df.empty:
        import pandas as pd

        for c in cols:
            if c not in df.columns:
                df[c] = pd.Series(dtype="float64")
    return df


def _eval_expr_pd(df, node):
    """Same tree over a pandas DataFrame (HAVING runs post-aggregate).
    Mirrors the Arrow path's three-valued logic: leaf masks are pandas
    nullable ``boolean`` arrays (whose &, |, ~ are Kleene); the caller
    does one ``.fillna(False)`` before indexing."""
    import operator as _op

    import pandas as pd

    def _leaf(mask, null_src):
        """mask: bool per row; null_src: the operand column (rows where
        it is NA get a NULL mask) or an explicit bool is-null array."""
        m = pd.array(np.asarray(mask, dtype=bool), dtype="boolean")
        na = null_src if (isinstance(null_src, np.ndarray)
                          and null_src.dtype == bool) \
            else np.asarray(pd.isna(null_src), dtype=bool)
        m[na] = pd.NA
        return pd.Series(m, index=df.index)

    ops = {"=": _op.eq, "<>": _op.ne, "<": _op.lt,
           "<=": _op.le, ">": _op.gt, ">=": _op.ge}
    tag = node[0]
    if tag == "and":
        m = _eval_expr_pd(df, node[1][0])
        for n in node[1][1:]:
            m = m & _eval_expr_pd(df, n)
        return m
    if tag == "or":
        m = _eval_expr_pd(df, node[1][0])
        for n in node[1][1:]:
            m = m | _eval_expr_pd(df, n)
        return m
    if tag == "not":
        return ~_eval_expr_pd(df, node[1])
    if tag == "isnull":
        return df[node[1]].isna()
    if tag == "cmp":
        if isinstance(node[1], tuple):
            # expression LHS over the (small) aggregate frame: evaluate
            # with the same Arrow kernels the WHERE path uses
            t = pa.Table.from_pandas(df, preserve_index=False)
            lhs = _eval_arith(t, node[1])
            import pandas as pd

            m = _OPS[node[2]](lhs, _coerce(lhs, node[3]))
            return _leaf(
                pc.fill_null(m, False).to_numpy(zero_copy_only=False),
                pc.is_null(m).to_numpy(zero_copy_only=False))
        col = df[node[1]]
        return _leaf(ops[node[2]](col, node[3]).fillna(False), col)
    if tag == "in":
        col = df[node[1]]
        return _leaf(col.isin(node[2]), col)
    if tag == "between":
        col = df[node[1]]
        return _leaf(col.between(node[2], node[3]).fillna(False), col)
    if tag == "like":
        pat = re.escape(node[2]).replace("%", ".*").replace("_", ".")
        col = df[node[1]]
        return _leaf(col.str.fullmatch(pat).fillna(False), col)
    raise ValueError(f"unknown node {tag}")


def _round4_floats(t: pa.Table) -> pa.Table:
    cols = {}
    for name in t.column_names:
        c = t[name]
        if pa.types.is_floating(c.type):
            v = np.asarray(c.to_pandas(), np.float64)
            cols[name] = pa.array(np.floor(v * 10000 + 0.5) / 10000,
                                  pa.float64())
        else:
            cols[name] = c
    return pa.table(cols)


def _split_union_all(q: str) -> list[str]:
    """Top-level ``UNION ALL`` arms (depth-0 only), re-assembled from
    the token stream; [q] when there is no union."""
    toks = _tokenize(q)
    arms: list[list[str]] = [[]]
    depth = 0
    i = 0
    while i < len(toks):
        kind, v = toks[i]
        if v == "(":
            depth += 1
        elif v == ")":
            depth -= 1
        if (depth == 0 and kind == "word" and v.upper() == "UNION"
                and i + 1 < len(toks)
                and toks[i + 1][1].upper() == "ALL"):
            arms.append([])
            i += 2
            continue
        arms[-1].append(v)
        i += 1
    return [" ".join(a) for a in arms]


def execute_sql(q: str, sf_dir: str) -> pa.Table:
    """Parse + plan + run ``q`` against the parquet tables in ``sf_dir``.
    Returns a pyarrow Table with the SELECT's column aliases."""
    import ray.data as rd
    import ray.data.aggregate as agg

    arms = _split_union_all(q)
    if len(arms) > 1:
        # SQL semantics: a trailing ORDER BY / LIMIT binds to the WHOLE
        # union, not the last arm — strip it off the final arm's token
        # tail and apply driver-side to the concatenated result
        toks = _tokenize(arms[-1])
        depth = 0
        cut = None
        for i, (kind, v) in enumerate(toks):
            if v == "(":
                depth += 1
            elif v == ")":
                depth -= 1
            elif depth == 0 and kind == "word" \
                    and v.upper() in ("ORDER", "LIMIT"):
                cut = i
                break
        order_by: list[tuple[str, bool]] = []
        limit = None
        if cut is not None:
            tail = _P(toks[cut:])
            if tail.kw("ORDER"):
                tail.take()
                tail.expect("BY")
                while True:
                    name = tail.take()
                    desc = False
                    if tail.kw("ASC", "DESC"):
                        desc = tail.take().upper() == "DESC"
                    order_by.append((name, desc))
                    if tail.peek() == ",":
                        tail.take()
                        continue
                    break
            if tail.kw("LIMIT"):
                tail.take()
                limit = int(tail.take())
            arms[-1] = " ".join(v for _k, v in toks[:cut])
        parts = [execute_sql(a, sf_dir) for a in arms]
        names = parts[0].column_names
        for t in parts[1:]:
            if t.column_names != names:
                raise ValueError(
                    f"UNION ALL column mismatch: {t.column_names} "
                    f"vs {names}")
        out = pa.concat_tables(
            [parts[0]] + [t.cast(parts[0].schema) for t in parts[1:]])
        if order_by:
            df = out.to_pandas().sort_values(
                [n for n, _ in order_by],
                ascending=[not d for _, d in order_by],
                kind="mergesort")
            out = pa.Table.from_pandas(df.reset_index(drop=True),
                                       preserve_index=False)
        if limit is not None:
            out = out.slice(0, limit)
        return out

    plan = parse_sql(q)
    import pyarrow.parquet as pq_  # noqa: F811 (pruned-read planning)

    inner_tbl: pa.Table | None = None
    if isinstance(plan.table, tuple):  # FROM (SELECT ...): the derived
        # table is the INNER plan's bounded result (aggregate/limited —
        # outer queries over unbounded raw subqueries should just read
        # the table directly)
        inner_tbl = execute_sql(plan.table[1], sf_dir)

    # SELECT * expands to the base table's columns (join columns are
    # named explicitly when needed)
    if any(i.agg is None and i.col == "*" for i in plan.items):
        names = (inner_tbl.column_names if inner_tbl is not None
                 else pq_.read_schema(
                     os.path.join(sf_dir, f"{plan.table}.parquet")).names)
        expanded: list[SelectItem] = []
        for it in plan.items:
            if it.agg is None and it.col == "*":
                expanded.extend(SelectItem(None, c, c) for c in names)
            else:
                expanded.append(it)
        plan.items = expanded
    # rewrite arithmetic select expressions to derived column names
    # up front, so GROUP BY may reference select aliases of expressions
    # (SQL allows it) and read pruning sees the underlying columns
    expr_specs: list[tuple[str, tuple]] = []
    for i, it in enumerate(plan.items):
        if isinstance(it.col, tuple):
            name = f"__expr_{i}"
            expr_specs.append((name, it.col))
            it.col = name
    alias_col = {it.alias: it.col for it in plan.items if it.agg is None}
    plan.group_by = [alias_col.get(g, g) for g in plan.group_by]
    referenced = sorted(
        (set().union(*(_arith_cols(i.col) for i in plan.items))
         | (_expr_cols(plan.where) if plan.where is not None else set())
         | set(plan.group_by)
         | {k for j in plan.joins for k in (j[1], j[2])}
         | set().union(set(),
                       *(_arith_cols(t) for _, t in expr_specs)))
        - {n for n, _ in expr_specs})
    import pyarrow.parquet as pq_

    if inner_tbl is not None:
        base_names = set(inner_tbl.column_names)
        needed = [c for c in referenced if c in base_names]
        ds = rd.from_arrow(
            inner_tbl.select(needed) if needed else inner_tbl)
        have = set(needed or inner_tbl.column_names)
    else:
        path = os.path.join(sf_dir, f"{plan.table}.parquet")
        if plan.joins:
            base_names = set(pq_.read_schema(path).names)
            needed = [c for c in referenced if c in base_names]
        else:
            needed = referenced
        ds = rd.read_parquet(path, columns=needed or None)
        have = set(needed or pq_.read_schema(path).names)
    for jt, a, b, kind in plan.joins:
        from .streams import inner_join, left_outer_join

        jpath = os.path.join(sf_dir, f"{jt}.parquet")
        rnames = set(pq_.read_schema(jpath).names)
        # which side of ON lives in the joined table
        rkey, lkey = (b, a) if b in rnames and a in have else (a, b)
        rcols = sorted({c for c in referenced
                        if c in rnames and c not in have} | {rkey})
        right = rd.read_parquet(jpath, columns=rcols)
        if rkey != lkey:
            right = right.map_batches(
                lambda t, _rk=rkey, _lk=lkey: t.rename_columns(
                    [_lk if n == _rk else n for n in t.column_names]),
                batch_format="pyarrow")
        # dimension side broadcast once; probed vectorized per batch
        join_fn = left_outer_join if kind == "left" else inner_join
        ds = join_fn(ds, right, on=lkey)
        have |= {c for c in rcols if c != rkey}
    if plan.where is not None:
        where = plan.where
        ds = ds.map_batches(lambda b: _filter_batch(b, where),
                            batch_format="pyarrow")

    # materialize the derived expression columns (planned above)
    if expr_specs:
        def add_exprs(b: pa.Table, _specs=tuple(expr_specs)) -> pa.Table:
            for name, node in _specs:
                b = b.append_column(name, _eval_arith(b, node))
            return b

        ds = ds.map_batches(add_exprs, batch_format="pyarrow")
        have |= {n for n, _ in expr_specs}

    if plan.distinct:
        # DISTINCT = per-block Arrow pre-dedupe (combiner) + ONE keyed
        # shuffle; ORDER BY runs as a distributed sort and LIMIT is
        # pushed down BEFORE anything reaches the driver, so a
        # high-cardinality DISTINCT never materializes driver-side
        cols = [i.col for i in plan.items]
        mds, markers = _mark_null_keys(ds, cols)
        gcols = cols + list(markers.values())
        dd = mds.map_batches(
            lambda b: b.select(gcols).group_by(gcols).aggregate([]),
            batch_format="pyarrow",
        ).groupby(gcols).count().select_columns(gcols)
        if plan.order_by:
            a2c = {i.alias: i.col for i in plan.items}
            skeys, sdesc = [], []
            for n, d in plan.order_by:
                c = a2c.get(n, n)
                skeys.append(markers[c])  # marker ASC = NULLS LAST
                sdesc.append(False)
                skeys.append(c)
                sdesc.append(d)
            dd = dd.sort(skeys, descending=sdesc)
        if plan.limit is not None:
            dd = dd.limit(plan.limit)
        parts = [_restore_null_keys(b, markers).select(cols)
                 for b in dd.iter_batches(batch_format="pyarrow")]
        if parts:
            out = pa.concat_tables(parts, promote_options="default")
        else:
            sch = dd.schema()
            if sch is None or not getattr(sch, "names", None):
                # fully-empty upstream (e.g. a WHERE matching nothing)
                # loses the dataset schema; rebuild from the source
                # parquet (derived expr columns default to float64)
                src = pq_.read_schema(path)
                out = pa.table({
                    c: pa.array([], src.field(c).type
                                if c in src.names else pa.float64())
                    for c in cols})
            else:
                out = pa.schema(
                    [(n, t) for n, t in zip(sch.names, sch.types)]
                ).empty_table().select(cols)
        return _round4_floats(
            out.rename_columns([i.alias for i in plan.items]))

    aggs = [i for i in plan.items if i.agg]
    if plan.group_by or aggs:
        cd_items = [i for i in aggs if i.agg == "count_distinct"]
        plain_aggs = [i for i in aggs if i.agg != "count_distinct"]
        specs = []
        for it in plain_aggs:
            if it.agg == "count":
                # Count(on=None) only counts via the parquet-metadata
                # fast path; after any map_batches it returns 0 — always
                # target a concrete column. count(*) keeps nulls,
                # count(col) skips them (SQL semantics).
                on = sorted(have)[0] if it.col == "*" else it.col
                specs.append(agg.Count(on=on, ignore_nulls=it.col != "*",
                                       alias_name=it.alias))
            elif it.agg == "sum":
                specs.append(agg.Sum(it.col, alias_name=it.alias))
            elif it.agg == "min":
                specs.append(agg.Min(it.col, alias_name=it.alias))
            elif it.agg == "max":
                specs.append(agg.Max(it.col, alias_name=it.alias))
            elif it.agg == "avg":
                specs.append(agg.Mean(it.col, alias_name=it.alias))
        def _count_distinct(it: SelectItem):
            # distinct = per-block Arrow pre-dedupe, then ONE keyed
            # shuffle on (group keys, col); the per-group count of the
            # resulting distinct rows stays distributed — only
            # group-cardinality rows reach the driver. count(DISTINCT x)
            # skips NULL x (SQL), which also keeps the shuffle key
            # null-free; NULL group keys go through the marker columns.
            nn = ds.map_batches(
                lambda b, _c=it.col: b.filter(pc.is_valid(b[_c])),
                batch_format="pyarrow")
            if plan.group_by:
                nn, mk = _mark_null_keys(nn, plan.group_by)
                gkeys = plan.group_by + list(mk.values())
            else:
                mk, gkeys = {}, []
            keys = gkeys + [it.col]
            d = nn.map_batches(
                lambda b, _k=keys: b.select(_k).group_by(_k).aggregate([]),
                batch_format="pyarrow",
            ).groupby(keys).count()
            if plan.group_by:
                out = _restore_null_keys_pd(
                    _ensure_cols(d.groupby(gkeys).count().to_pandas(),
                                 gkeys + ["count()"]), mk)
                return out.rename(columns={"count()": it.alias})
            import pandas as pd

            return pd.DataFrame({it.alias: [d.count()]})

        if plan.group_by:
            frames = []
            if specs:
                gds, gmk = _mark_null_keys(ds, plan.group_by)
                gpd = _ensure_cols(
                    gds.groupby(plan.group_by + list(gmk.values()))
                    .aggregate(*specs).to_pandas(),
                    plan.group_by + list(gmk.values())
                    + [i.alias for i in plain_aggs])
                frames.append(_restore_null_keys_pd(gpd, gmk))
            frames.extend(_count_distinct(it) for it in cd_items)
            res = frames[0]
            for f in frames[1:]:
                res = res.merge(f, on=plan.group_by)
        elif specs:
            row = ds.aggregate(*specs)
            res = pa.table(
                {i.alias: [row[i.alias]] for i in plain_aggs}).to_pandas()
            for f in (_count_distinct(it) for it in cd_items):
                res[f.columns[0]] = f.iloc[0, 0]
        else:
            import pandas as pd

            res = pd.concat([_count_distinct(it) for it in cd_items],
                            axis=1)
        # group keys carry derived/source names; surface select aliases
        res = res.rename(columns={
            it.col: it.alias for it in plan.items
            if it.agg is None and it.col != it.alias})
        if plan.having is not None:
            res = res[_eval_expr_pd(res, plan.having)
                      .fillna(False).astype(bool)]
        # post-aggregate: bounded by group cardinality -> driver sort ok
        if plan.order_by:
            res = res.sort_values(
                [n for n, _ in plan.order_by],
                ascending=[not d for _, d in plan.order_by],
                kind="mergesort")
        if plan.limit is not None:
            res = res.head(plan.limit)
        out_cols = [i.alias for i in plan.items]
        t = pa.Table.from_pandas(res[out_cols], preserve_index=False)
        return _round4_floats(t)

    # plain projection: distributed sort + streaming limit
    alias_to_col = {i.alias: i.col for i in plan.items}
    smk: dict[str, str] = {}
    if plan.order_by:
        keys = [alias_to_col.get(n, n) for n, _ in plan.order_by]
        ds, smk = _mark_null_keys(ds, keys)
        skeys, sdesc = [], []
        for k, (_n, d) in zip(keys, plan.order_by):
            skeys.append(smk[k])  # marker ASC = NULLS LAST
            sdesc.append(False)
            skeys.append(k)
            sdesc.append(d)
        ds = ds.sort(skeys, descending=sdesc)
    if plan.limit is not None:
        ds = ds.limit(plan.limit)
        t = pa.Table.from_pandas(ds.to_pandas(),  # bounded by LIMIT
                                 preserve_index=False)
    else:
        t = pa.concat_tables(
            [b for b in ds.iter_batches(batch_format="pyarrow")],
            promote_options="default")
    t = _restore_null_keys(t, smk)
    t = t.select([i.col for i in plan.items])
    t = t.rename_columns([i.alias for i in plan.items])
    return _round4_floats(t)
