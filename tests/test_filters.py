"""WordDelimiterFilter + PorterStemFilter golden tests (mirroring
``TestWordDelimiterFilter.java`` shapes and the published Porter (1980)
vocabulary pairs that ``PorterStemmer.java`` implements)."""

import pytest

from lucene_solr_ray.analysis import get_analyzer
from lucene_solr_ray.analysis.filters import porter_stem, word_delimiter_parts

# ---- WordDelimiterFilter ----


@pytest.mark.parametrize("token,parts", [
    ("PowerShot", ["Power", "Shot"]),
    ("powerShot", ["power", "Shot"]),
    ("Power-Shot", ["Power", "Shot"]),
    ("snake_case_name", ["snake", "case", "name"]),
    ("XMLHttpRequest", ["XML", "Http", "Request"]),
    ("j2se", ["j", "2", "se"]),
    ("O'Neil", ["O", "Neil"]),
    ("Brand#17", ["Brand", "17"]),
    ("500-42", ["500", "42"]),
    ("plain", ["plain"]),
    ("---", []),
])
def test_word_delimiter_parts(token, parts):
    assert word_delimiter_parts(token) == parts


def test_preserve_original():
    assert word_delimiter_parts("PowerShot", preserve_original=True) == [
        "PowerShot", "Power", "Shot"]
    assert word_delimiter_parts("plain", preserve_original=True) == ["plain"]


def test_code_analyzer_positions():
    ana = get_analyzer("code")
    toks, pos = ana.tokens_with_positions("getFoo setBar_baz")
    assert toks == ["get", "foo", "set", "bar", "baz"]
    # sub-parts share the source token's position (posIncr-0 contract)
    assert pos == [0, 0, 1, 1, 1]


# ---- Porter stemmer: pairs from the published algorithm/vocabulary ----

PORTER_PAIRS = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("valenci", "valenc"), ("hesitanci", "hesit"),
    ("digitizer", "digit"), ("conformabli", "conform"),
    ("radicalli", "radic"), ("differentli", "differ"), ("vileli", "vile"),
    ("analogousli", "analog"), ("vietnamization", "vietnam"),
    ("predication", "predic"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"),
    ("formaliti", "formal"), ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"), ("formative", "form"),
    ("formalize", "formal"),
    # full-pipeline outputs (step 4 strips -ic after step 3): the official
    # voc.txt/output.txt gives electr, not the step-3 illustration electric
    ("electriciti", "electr"), ("electrical", "electr"),
    ("hopeful", "hope"), ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("homologou", "homolog"),
    ("communism", "commun"), ("activate", "activ"),
    ("angulariti", "angular"), ("homologous", "homolog"),
    ("effective", "effect"), ("bowdlerize", "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
]


@pytest.mark.parametrize("word,stem", PORTER_PAIRS)
def test_porter_pairs(word, stem):
    assert porter_stem(word) == stem


def test_english_analyzer():
    ana = get_analyzer("english")
    assert ana.tokens("The cats were motoring happily") == [
        "cat", "were", "motor", "happili"]
    # possessive strip before stemming
    assert ana.tokens("the dog's bones") == ["dog", "bone"]


def test_ascii_folding():
    from lucene_solr_ray.analysis.filters import ascii_fold

    assert ascii_fold("café") == "cafe"
    assert ascii_fold("über") == "uber"
    assert ascii_fold("naïve") == "naive"
    assert ascii_fold("łódź") == "łodz"  # ł has no NFKD decomposition
    assert ascii_fold("plain") == "plain"
    ana = get_analyzer("folding")
    assert ana.tokens("Café Über the naïve") == ["cafe", "uber", "naive"]


def test_english_tokens_batch_matches_per_doc():
    from lucene_solr_ray.analysis.filters import EnglishAnalyzer

    ana = EnglishAnalyzer()
    texts = ["the cats were motoring", "dogs motoring happily",
             "", "cats cats cats"]
    bt, bd, bp = ana.tokens_batch(texts)
    want_t, want_d = [], []
    for i, t in enumerate(texts):
        toks = ana.tokens(t)
        want_t.extend(toks)
        want_d.extend([i] * len(toks))
    assert bt == want_t
    assert bd.tolist() == want_d


def test_keyword_marker_protects_terms():
    from lucene_solr_ray.analysis.filters import EnglishAnalyzer

    ana = EnglishAnalyzer(stem_exclusions={"motoring"})
    assert ana.tokens("cats motoring") == ["cat", "motoring"]


def test_english_index_stemmed_recall(tmp_path_factory, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import IndexSearcher, TermQuery

    d = tmp_path_factory.mktemp("en_corpus")
    pq.write_table(pa.table({"content": pa.array([
        "the cats were running", "a cat runs", "dogs bark"])}),
        str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("en_index"))
    build_index(str(d), out, analyzer="english", rows_per_partition=10)
    s = IndexSearcher(out)
    # query-side analysis with the same chain unifies surface forms
    from lucene_solr_ray.analysis import get_analyzer
    from lucene_solr_ray.search.query import parse_query

    q = parse_query("cats", get_analyzer("english"))
    assert s._docs_only(q).tolist() == [0, 1]
    q2 = parse_query("running", get_analyzer("english"))
    assert s._docs_only(q2).tolist() == [0, 1]  # run/runs/running -> run


def test_overlap_tokens_count_once_in_norms(tmp_path_factory, ray_session):
    """posIncr-0 sub-tokens (WDF parts / synonyms) share a position and
    must count once toward field length (numOverlap semantics)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import IndexSearcher

    d = tmp_path_factory.mktemp("ov_corpus")
    # 'getFooBar baz' under the code analyzer: 4 tokens (get,foo,bar,baz)
    # but only 2 positions
    pq.write_table(pa.table({"content": pa.array(["getFooBar baz"])}),
                   str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("ov_idx"))
    build_index(str(d), out, analyzer="code", rows_per_partition=10)
    s = IndexSearcher(out)
    assert int(s.norms.length[0]) == 2
    # sub-tokens still searchable
    from lucene_solr_ray.search import TermQuery

    assert s.count(TermQuery("foo")) == 1
