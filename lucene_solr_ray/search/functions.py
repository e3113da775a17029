"""Function queries: the ValueSource expression language over docvalues.

Restates Solr's function-query surface (``solr/core/src/java/org/apache/
solr/search/ValueSourceParser.java`` — the registry of ~65 named value
sources — and ``lucene/queries/.../function/FunctionQuery.java``): a small
recursive-descent parser for

    expr  := name '(' expr (',' expr)* ')' | field | number

over per-doc columns (the docvalues provider), evaluated fully
vectorized. Implemented functions (the arithmetic/math core every Solr
deployment uses; geodist lives in stages/geo.py):

    sum, sub, product, div, min, max, abs, sqrt, pow,
    log (base 10, Solr semantics), ln, recip(x,m,a,b) = a/(m*x+b),
    linear(x,m,c) = m*x+c, map(x,lo,hi,target) (range remap),
    constant literals, field references

plus :func:`function_topk` (FunctionQuery ranking: every doc scored by
the expression) and :func:`boost_by_function` (the ``{!boost}`` /
``boost=`` multiplication of a relevance query by a function value).
"""

from __future__ import annotations

import re

import numpy as np

_TOK = re.compile(r"\s*(?:(\d+\.?\d*|\.\d+)|([A-Za-z_][\w.]*)|([(),]))")


def parse_func(s: str):
    """Expression string -> AST tuple."""
    pos = 0
    n = len(s)

    def next_tok():
        nonlocal pos
        if pos >= n:
            return None
        m = _TOK.match(s, pos)
        if not m:
            raise ValueError(f"bad function syntax at {pos}: {s!r}")
        pos = m.end()
        if m.group(1):
            return ("num", float(m.group(1)))
        if m.group(2):
            return ("name", m.group(2))
        return ("punct", m.group(3))

    def parse_expr(tok):
        if tok is None:
            raise ValueError(f"unexpected end of expression: {s!r}")
        if tok[0] == "num":
            return ("const", tok[1]), next_tok()
        if tok[0] != "name":
            raise ValueError(f"unexpected {tok} in {s!r}")
        name = tok[1]
        tok = next_tok()
        if tok == ("punct", "("):
            args = []
            tok = next_tok()
            while tok != ("punct", ")"):
                arg, tok = parse_expr(tok)
                args.append(arg)
                if tok == ("punct", ","):
                    tok = next_tok()
            return ("call", name, tuple(args)), next_tok()
        return ("field", name), tok

    ast, tok = parse_expr(next_tok())
    if tok is not None:
        raise ValueError(f"trailing input in {s!r}")
    return ast


_FUNCS = {
    "sum": lambda *a: np.sum(a, axis=0),
    "sub": lambda x, y: x - y,
    "product": lambda *a: np.prod(a, axis=0),
    "div": lambda x, y: x / y,
    "min": lambda *a: np.min(a, axis=0),
    "max": lambda *a: np.max(a, axis=0),
    "abs": np.abs,
    "sqrt": np.sqrt,
    "pow": np.power,
    "log": np.log10,  # Solr's log() is base 10 (ValueSourceParser)
    "ln": np.log,
    "recip": lambda x, m, a, b: a / (m * x + b),
    "linear": lambda x, m, c: m * x + c,
}


def evaluate(ast, values, docs: np.ndarray) -> np.ndarray:
    """Evaluate over ``docs``; ``values(field)`` returns the dense per-doc
    column (e.g. ``searcher.docvalues``)."""
    kind = ast[0]
    if kind == "const":
        return np.full(docs.size, ast[1], np.float64)
    if kind == "field":
        return values(ast[1])[docs].astype(np.float64)
    name, args = ast[1], ast[2]
    if name == "scale":
        # scale(field, target_min, target_max): min-max over ALL docs of
        # the field (ScaleFloatFunction — needs the global extrema, which
        # the dense docvalues column provides in one pass)
        if args[0][0] != "field":
            raise ValueError("scale() needs a plain field as arg 1")
        col = values(args[0][1]).astype(np.float64)
        lo = float(evaluate(args[1], values, docs[:1])[0])
        hi = float(evaluate(args[2], values, docs[:1])[0])
        cmin, cmax = float(col.min()), float(col.max())
        span = (cmax - cmin) or 1.0
        return lo + (col[docs] - cmin) * (hi - lo) / span
    if name == "map":  # map(x, lo, hi, target): remap values in [lo,hi]
        x = evaluate(args[0], values, docs)
        lo = evaluate(args[1], values, docs)
        hi = evaluate(args[2], values, docs)
        tgt = evaluate(args[3], values, docs)
        return np.where((x >= lo) & (x <= hi), tgt, x)
    fn = _FUNCS.get(name)
    if fn is None:
        raise ValueError(f"unknown function: {name!r}")
    return fn(*(evaluate(a, values, docs) for a in args))


def function_topk(searcher, expr: str, k: int, *, filter_query=None,
                  descending: bool = True):
    """FunctionQuery: rank (all or filtered) docs by the expression value
    (FunctionQuery.java — score IS the function value)."""
    import pyarrow as pa

    from .query import MatchAllDocsQuery

    ast = parse_func(expr)
    docs = searcher._docs_only(filter_query or MatchAllDocsQuery())
    vals = evaluate(ast, searcher.docvalues, docs)
    key = -vals if descending else vals
    order = np.lexsort((docs, key))[:k]
    return pa.table({
        "rank": pa.array(np.arange(1, order.size + 1, dtype=np.int32)),
        "doc_id": pa.array(docs[order]),
        "value": pa.array(vals[order], pa.float64()),
    })


def boost_by_function(searcher, q, expr: str, k: int):
    """{!boost b=expr}q: relevance score multiplied by the function value
    (BoostedQuery / Solr's boost= param)."""
    import pyarrow as pa

    ast = parse_func(expr)
    docs, scores = searcher._score(q)
    boost = evaluate(ast, searcher.docvalues, docs)
    combined = scores.astype(np.float64) * boost
    from .topk import top_k

    d, s = top_k(docs, combined, k)
    return pa.table({
        "rank": pa.array(np.arange(1, d.size + 1, dtype=np.int32)),
        "doc_id": pa.array(d),
        "score": pa.array(s, pa.float64()),
    })


# ---------------------------------------------------------------------------
# Compiled infix expressions (the lucene/expressions module:
# expressions/js/JavascriptCompiler.java — infix arithmetic over value
# sources compiled once, evaluated per doc). Here: Python-grammar infix
# (same surface for arithmetic) compiled via the ast module into ONE
# vectorized numpy closure over column bindings — no per-doc eval.
# ---------------------------------------------------------------------------

_EXPR_FUNCS = {
    "sqrt": np.sqrt, "ln": np.log, "log": np.log, "log10": np.log10,
    "abs": np.abs, "exp": np.exp, "floor": np.floor, "ceil": np.ceil,
    "min": np.minimum, "max": np.maximum, "pow": np.power,
}

_ALLOWED_NODES = (
    "Expression", "BinOp", "UnaryOp", "Call", "Name", "Constant",
    "Add", "Sub", "Mult", "Div", "Mod", "Pow", "USub", "UAdd",
    "Load", "Compare", "Gt", "GtE", "Lt", "LtE", "Eq", "NotEq",
    "IfExp",
)


def compile_expression(src: str):
    """Compile an infix expression ("sqrt(nchars) + 2*ln(1+views)") into
    ``fn(bindings) -> np.ndarray`` — the JavascriptCompiler analogue.
    Only arithmetic/comparison/ternary nodes and the whitelisted math
    functions are admitted; names resolve in ``bindings`` (numpy arrays
    or scalars)."""
    import ast as _ast

    tree = _ast.parse(src, mode="eval")
    names: set[str] = set()
    func_names: set[str] = set()
    for node in _ast.walk(tree):
        kind = type(node).__name__
        if kind not in _ALLOWED_NODES:
            raise ValueError(
                f"expression node {kind} not allowed in {src!r}")
        if isinstance(node, _ast.Name):
            names.add(node.id)
        if isinstance(node, _ast.Call):
            if not isinstance(node.func, _ast.Name) \
                    or node.func.id not in _EXPR_FUNCS:
                raise ValueError(
                    f"unknown function in expression: {src!r}")
            func_names.add(node.func.id)
    code = compile(tree, "<expression>", "eval")
    var_names = frozenset(names - func_names)

    def fn(bindings: dict) -> np.ndarray:
        missing = var_names - set(bindings)
        if missing:
            raise KeyError(f"expression variables unbound: {missing}")
        env = dict(_EXPR_FUNCS)
        env.update({k: bindings[k] for k in var_names})
        return np.asarray(eval(code, {"__builtins__": {}}, env))

    fn.variables = var_names
    return fn
