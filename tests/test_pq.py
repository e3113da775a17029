"""Product quantization (stages/ann.py PQ/ADC): codebook shapes, encode
layout, ADC recall vs exact cosine, and residual (IVF-PQ style) encoding."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.stages.ann import (brute_force_topk, pq_encode,
                                        pq_topk, pq_train)

SF = "/root/testdata/sf0.01/embeddings.parquet"


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(SF, columns=["vec_id", "embedding"])


@pytest.fixture(scope="module")
def books(emb_ds):
    return pq_train(emb_ds, m=16, ksub=256, iters=8, sample_cap=4096)


def test_codebook_shape(books):
    m, ksub, dsub = books.shape
    assert (m, dsub) == (16, 4)
    assert ksub <= 256


def test_encode_drops_vector_and_packs_codes(emb_ds, books):
    enc = pq_encode(emb_ds, books)
    b = next(iter(enc.iter_batches(batch_format="pyarrow")))
    assert "embedding" not in b.column_names
    assert "pq_code" in b.column_names
    codes = b["pq_code"].combine_chunks()
    assert codes.values.type == pa.uint8()
    assert len(codes[0]) == 16  # m bytes per vector (16x vs f32)


def test_adc_recall_vs_exact(emb_ds, books):
    import pyarrow.parquet as pq_

    head = pq_.read_table(SF, filters=[("vec_id", "in", [0, 1, 2])])
    qv = np.array(head["embedding"].to_pylist(), np.float64)
    exact = brute_force_topk(emb_ds, qv, k=10)
    approx = pq_topk(pq_encode(emb_ds, books), books, qv, k=10)
    ex, ap = exact.to_pydict(), approx.to_pydict()
    recalls = []
    for qi in range(3):
        e = {v for q, v in zip(ex["query_id"], ex["vec_id"]) if q == qi}
        a = {v for q, v in zip(ap["query_id"], ap["vec_id"]) if q == qi}
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, recalls
    # the self-vector must always survive quantization at rank ~1
    for qi in range(3):
        top = [v for q, v in zip(ap["query_id"], ap["vec_id"])
               if q == qi][:3]
        assert qi in top


def test_residual_encoding_roundtrip(ray_session, books):
    """IVF-PQ residual path: encoding (x - center) and querying with the
    same center subtracted gives the same ranking as centered data."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    x = rng.standard_normal((200, 64))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    center = x.mean(0)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(200), pa.int64()),
        "embedding": pa.array([r.tolist() for r in x]),
    }))
    b = pq_train(ds, m=8, ksub=32, iters=6, sample_cap=200)
    enc = pq_encode(ds, b, center=center)
    t = pq_topk(enc, b, x[:2] - center, k=5)
    got = t.to_pydict()
    for qi in range(2):
        ids = [v for q, v in zip(got["query_id"], got["vec_id"])
               if q == qi]
        assert qi in ids[:2]


def test_compression_ratio_documented(books):
    # 64 float32 dims = 256 bytes -> 16 uint8 codes = 16 bytes (16x)
    m, _, dsub = books.shape
    assert m * dsub * 4 / m == 16.0
