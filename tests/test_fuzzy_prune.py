"""Fuzzy expansion pruning: identical output to the full O(V) scan with
>=10x fewer DP evaluations (the LevenshteinAutomata candidate-restriction
contract)."""

import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import FuzzyQuery, IndexSearcher
from lucene_solr_ray.search.searcher import (
    _levenshtein_within,
    fuzzy_candidates,
)
from lucene_solr_ray.sources import generate_table


@pytest.fixture(scope="module")
def fidx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("fz_corpus")
    pq.write_table(generate_table(600, seed=5), str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("fz_index"))
    build_index(str(d), out, rows_per_partition=200)
    return out


@pytest.mark.parametrize("word,k", [
    ("tabel", 2), ("return", 1), ("vlaue", 2), ("index", 1), ("hash", 2),
])
def test_pruned_matches_full_scan(fidx, word, k):
    s = IndexSearcher(fidx)
    u = s.reader.unique_terms()
    full = [t for t in u if _levenshtein_within(word, t, k)]
    pruned, n_eval = fuzzy_candidates(s.reader, word, k)
    assert pruned == full
    assert n_eval * 10 <= u.size, (n_eval, u.size)


def test_fuzzy_query_uses_pruning(fidx):
    s = IndexSearcher(fidx)
    t = s.search(FuzzyQuery("retrun", 2), k=5)
    assert t.num_rows > 0  # 'return' within 2 edits


def test_regexp_prefix_narrowing(fidx):
    from lucene_solr_ray.search.query import RegexpQuery

    s = IndexSearcher(fidx)
    # literal prefix 'ret' narrows the scan; results identical to full scan
    full = [t for t in s.reader.unique_terms()
            if __import__("re").match(r"ret.*n\Z", t)]
    got = s._rewrite_terms(RegexpQuery("ret.*n"))
    assert got == full and "return" in got
    # alternation at the head falls back to the full scan, same results
    got2 = s._rewrite_terms(RegexpQuery("(return|def)"))
    assert "return" in got2 and "def" in got2
