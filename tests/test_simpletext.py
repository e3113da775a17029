"""SimpleText debug codec (lucene/codecs/simpletext): the text dump is
a bit-faithful, round-trippable image of the binary index."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.codec.simpletext import read_simpletext, write_simpletext
from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.sources import generate_table


@pytest.fixture(scope="module")
def st_index(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("st_src")
    pq.write_table(generate_table(200, seed=5), str(d / "a.parquet"))
    out = str(tmp_path_factory.mktemp("st_idx") / "idx")
    build_index(str(d), out, rows_per_partition=80, store_positions=True)
    return out


def test_roundtrip_bit_identical(st_index, tmp_path):
    s = IndexSearcher(st_index)
    path = str(tmp_path / "postings.txt")
    n = write_simpletext(s.reader, path)
    parsed = read_simpletext(path)["text"]
    assert n == len(parsed) == s.reader.num_terms()
    for t in s.reader.unique_terms().tolist():
        docs, tfs, flat = s.reader.postings_with_positions(t)
        pdocs, ptfs, ppos = parsed[t]
        assert np.array_equal(pdocs, docs)
        assert np.array_equal(ptfs, tfs)
        offs = np.concatenate(([0], np.cumsum(tfs)))
        for i in range(docs.size):
            want = np.cumsum(flat[offs[i]:offs[i + 1]].astype(np.int64))
            assert np.array_equal(ppos[i], want)


def test_nonpositional_dump(st_index, tmp_path):
    s = IndexSearcher(st_index)
    path = str(tmp_path / "nopos.txt")
    write_simpletext(s.reader, path, positions=False)
    parsed = read_simpletext(path)["text"]
    t = s.reader.unique_terms()[0]
    docs, tfs = s.reader.postings(str(t))
    pdocs, ptfs, ppos = parsed[str(t)]
    assert ppos is None
    assert np.array_equal(pdocs, docs) and np.array_equal(ptfs, tfs)


def test_human_readable_grammar(st_index, tmp_path):
    s = IndexSearcher(st_index)
    path = str(tmp_path / "g.txt")
    write_simpletext(s.reader, path)
    lines = open(path).read().splitlines()
    assert lines[0].startswith("field ")
    assert lines[-1] == "END"
    assert any(l.startswith("  term ") for l in lines)
    assert any(l.startswith("    doc ") for l in lines)
    assert any(l.startswith("      freq ") for l in lines)
    assert any(l.startswith("      pos ") for l in lines)
