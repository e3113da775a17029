"""SynonymFilter golden tests (mirroring TestSynonymMapFilter shapes) +
end-to-end index recall through a synonym analyzer."""

import pyarrow as pa
import pyarrow.parquet as pq

from lucene_solr_ray.analysis.synonyms import (
    SynonymAnalyzer,
    parse_synonym_rules,
    register_synonyms,
)


def _ana(lines):
    return SynonymAnalyzer(parse_synonym_rules(lines), base="standard")


def test_equivalence_class_expands_both_ways():
    ana = _ana(["couch, sofa"])
    assert ana.tokens("the couch") == ["couch", "sofa"]
    assert ana.tokens("a sofa") == ["sofa", "couch"]


def test_replacement_rule_drops_original():
    ana = _ana(["automobile => car"])
    assert ana.tokens("my automobile") == ["my", "car"]
    toks, pos = ana.tokens_with_positions("my automobile rocks")
    assert toks == ["my", "car", "rocks"]


def test_multiword_input_greedy_longest_match():
    ana = _ana(["wi fi => wifi", "wi => wireless"])
    # longest match wins: "wi fi" -> wifi, lone "wi" -> wireless
    assert ana.tokens("wi fi router") == ["wifi", "router"]
    assert ana.tokens("wi router") == ["wireless", "router"]


def test_positions_share_first_token():
    ana = _ana(["couch, sofa"])
    toks, pos = ana.tokens_with_positions("red couch here")
    assert toks == ["red", "couch", "sofa", "here"]
    assert pos == [0, 1, 1, 2]  # synonym at the matched token's position


def test_multiword_output_pieces():
    ana = _ana(["tv => television set"])
    assert ana.tokens("tv stand") == ["television", "set", "stand"]


def test_comments_and_merge():
    rules = parse_synonym_rules([
        "# comment line",
        "fast, quick",
        "fast => rapid",
    ])
    assert rules[("fast",)][0] == ["quick", "rapid"]


def test_index_time_synonyms_recall(tmp_path_factory, ray_session):
    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import IndexSearcher, TermQuery

    ana = register_synonyms("syn_test", ["couch, sofa"])
    d = tmp_path_factory.mktemp("syn_corpus")
    pq.write_table(pa.table({"content": pa.array(
        ["a red couch", "a blue sofa", "a green chair"])}),
        str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("syn_index"))
    # custom analyzers ship to workers BY VALUE (driver-side registration
    # doesn't exist in worker processes)
    build_index(str(d), out, analyzer=ana, rows_per_partition=10)
    s = IndexSearcher(out)
    # either surface form finds both docs
    assert s._docs_only(TermQuery("couch")).tolist() == [0, 1]
    assert s._docs_only(TermQuery("sofa")).tolist() == [0, 1]
    assert s._docs_only(TermQuery("chair")).tolist() == [2]
