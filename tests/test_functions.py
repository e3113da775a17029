"""ValueSource expression parser + FunctionQuery golden behavior."""

import numpy as np
import pytest

from lucene_solr_ray.search.functions import evaluate, parse_func


def _vals(field):
    return {"x": np.array([1.0, 4.0, 9.0, 99.0]),
            "y": np.array([2.0, 2.0, 2.0, 2.0])}[field]


DOCS = np.arange(4)


@pytest.mark.parametrize("expr,want", [
    ("x", [1, 4, 9, 99]),
    ("3.5", [3.5] * 4),
    ("sum(x,y,1)", [4, 7, 12, 102]),
    ("sub(x,y)", [-1, 2, 7, 97]),
    ("product(x,y)", [2, 8, 18, 198]),
    ("div(x,y)", [0.5, 2, 4.5, 49.5]),
    ("sqrt(x)", [1, 2, 3, np.sqrt(99)]),
    ("log(sum(x,1))", list(np.log10([2, 5, 10, 100]))),
    ("recip(x,1,1000,1000)", [1000 / 1001, 1000 / 1004, 1000 / 1009,
                              1000 / 1099]),
    ("linear(x,2,1)", [3, 9, 19, 199]),
    ("min(x,y)", [1, 2, 2, 2]),
    ("max(x,y)", [2, 4, 9, 99]),
    ("map(x,0,5,0)", [0, 0, 9, 99]),
    ("abs(sub(y,x))", [1, 2, 7, 97]),
])
def test_eval(expr, want):
    got = evaluate(parse_func(expr), _vals, DOCS)
    assert np.allclose(got, want), expr


def test_parse_errors():
    for bad in ["sum(x", "1 2", "nosuchfn(x)", ""]:
        with pytest.raises(ValueError):
            evaluate(parse_func(bad), _vals, DOCS)


def test_scale_uses_global_extrema():
    got = evaluate(parse_func("scale(x,0,1)"), _vals, np.array([0, 3]))
    # global min=1, max=99 over the whole column
    assert np.allclose(got, [0.0, 1.0])
    got2 = evaluate(parse_func("scale(x,0,1)"), _vals, np.array([1]))
    assert np.allclose(got2, [(4 - 1) / 98])
    with pytest.raises(ValueError):
        evaluate(parse_func("scale(sum(x,1),0,1)"), _vals, DOCS)


def test_compile_expression():
    """lucene/expressions analogue: compiled infix expressions are
    vectorized, variable-checked, and sandboxed."""
    import numpy as np
    import pytest

    from lucene_solr_ray.search.functions import compile_expression

    f = compile_expression("sqrt(x) + 2*ln(1+y)")
    x = np.array([4.0, 9.0])
    y = np.array([0.0, np.e - 1])
    assert np.allclose(f({"x": x, "y": y}), np.sqrt(x) + 2 * np.log(1 + y))
    assert f.variables == {"x", "y"}
    # comparisons and scalar mixing
    g = compile_expression("(x > 5) * x + (x <= 5) * 10")
    assert np.allclose(g({"x": np.array([3.0, 8.0])}), [10.0, 8.0])
    with pytest.raises(KeyError):
        f({"x": x})  # y unbound
    for bad in ("__import__('os')", "open('x')", "x.__class__",
                "[i for i in x]", "lambda: 1"):
        with pytest.raises(ValueError):
            compile_expression(bad)


def test_external_file_field(tmp_path_factory, ray_session):
    """ExternalFileField: key=value files feed function queries as a
    dense per-doc value source; later files override; missing keys
    default to 0; a new searcher sees updated files (reload-on-commit
    semantics)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.functions import function_topk

    d = tmp_path_factory.mktemp("eff_src")
    pq.write_table(pa.table({
        "doc_key": pa.array([100, 200, 300], pa.int64()),
        "content": pa.array(["a b", "c d", "e f"]),
    }), str(d / "docs.parquet"))
    out = str(tmp_path_factory.mktemp("eff_idx") / "idx")
    build_index(str(d), out, text_field="content", rows_per_partition=10)

    with open(os.path.join(out, "external_rank"), "w") as f:
        f.write("100=5.0\n200=1.0\n")
    with open(os.path.join(out, "external_rank.update1"), "w") as f:
        f.write("200=9.0\n")  # override wins (lexically later file)

    s = IndexSearcher(out)
    vals = s.docvalues("external_rank")
    assert vals.tolist() == [5.0, 9.0, 0.0]
    t = function_topk(s, "sum(external_rank,1)", k=3)
    assert t["doc_id"].to_pylist() == [1, 0, 2]
    assert t["value"].to_pylist() == [10.0, 6.0, 1.0]

    # commit-style update: new file, NEW searcher reloads
    with open(os.path.join(out, "external_rank.update2"), "w") as f:
        f.write("300=99.0\n")
    s2 = IndexSearcher(out)
    assert s2.docvalues("external_rank").tolist() == [5.0, 9.0, 99.0]
