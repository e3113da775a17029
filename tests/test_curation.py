"""End-to-end curation funnel on a synthetic corpus with known
duplicates."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd


def test_curation_funnel(tmp_path_factory, ray_session):
    from lucene_solr_ray.pipelines.curation import run_curation

    import numpy as np

    rng = np.random.default_rng(7)
    words = [f"w{j}" for j in range(400)]
    docs = []
    # 10 quality docs with DISTINCT bodies (low pairwise Jaccard)
    for i in range(10):
        body = " ".join(rng.choice(words, 40, replace=False))
        docs.append(f"doc number token{i} begins {body} ends here now")
    # 2 exact duplicates of doc 0
    docs.append(docs[0])
    docs.append(docs[0])
    # 1 near-duplicate of doc 1 (small edit)
    docs.append(docs[1].replace("token1 begins", "token1x begins"))
    # 2 junk docs (too short)
    docs.append("short")
    docs.append("tiny doc")
    d = tmp_path_factory.mktemp("cur_sf")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs),
    }), str(d / "documents.parquet"))

    out = str(tmp_path_factory.mktemp("cur_out") / "corpus")
    r = run_curation(str(d), out, min_tokens=20, jaccard_threshold=0.5)
    assert r["docs_in"] == 15
    assert r["after_quality"] == 13          # 2 junk dropped
    assert r["after_exact_dedup"] == 11      # 2 exact dups dropped
    assert r["after_near_dedup"] == 10       # near-dup of doc 1 dropped
    assert r["bpe_tokens"] > 0
    # resumable partitioned output exists
    import os

    assert any(x.startswith("bucket=") for x in os.listdir(out))
    kept = rd.read_parquet(out).to_pandas()
    assert sorted(kept["doc_id"]) == list(range(10))
