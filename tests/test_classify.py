"""Classification: Naive Bayes (golden math) + kNN-MLT majority vote."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from lucene_solr_ray.stages.classify import knn_classify, nb_classify, nb_fit

TRAIN = [
    ("chinese beijing chinese", "zh"),
    ("chinese chinese shanghai", "zh"),
    ("chinese macao", "zh"),
    ("tokyo japan chinese", "ja"),
]


@pytest.fixture(scope="module")
def model(ray_session):
    ds = rd.from_items([{"text": t, "label": y} for t, y in TRAIN])
    return nb_fit(ds, "text", "label")


def test_nb_model_golden(model):
    # the classic IR-book example (Manning et al. ch.13): priors 3/4, 1/4;
    # P(chinese|zh) = (5+1)/(8+V+1) with V = 6 distinct terms
    zh = model["classes"]["zh"]
    ja = model["classes"]["ja"]
    assert model["vocab"] == 6
    assert zh["prior_log"] == pytest.approx(math.log(3 / 4))
    assert ja["prior_log"] == pytest.approx(math.log(1 / 4))
    assert zh["term_log"]["chinese"] == pytest.approx(
        math.log(6 / (8 + 7)))
    assert ja["term_log"]["tokyo"] == pytest.approx(
        math.log(2 / (3 + 7)))


def test_nb_classify_distributed(model, ray_session):
    docs = rd.from_items([
        {"text": "chinese chinese chinese tokyo japan"},  # -> zh (classic)
        {"text": "tokyo japan"},                          # -> ja
    ])
    out = nb_classify(docs, model).to_pandas()
    # block order is not guaranteed under the streaming executor: key on text
    got = dict(zip(out["text"], out["predicted"]))
    assert got["chinese chinese chinese tokyo japan"] == "zh"
    assert got["tokyo japan"] == "ja"


def test_knn_classify(tmp_path_factory, ray_session):
    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import IndexSearcher

    texts = [t for t, _ in TRAIN]
    labels = np.array([y for _, y in TRAIN], dtype=object)
    d = tmp_path_factory.mktemp("knn_corpus")
    pq.write_table(pa.table({"content": pa.array(texts)}),
                   str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("knn_idx"))
    build_index(str(d), out, rows_per_partition=10)
    s = IndexSearcher(out)
    assert knn_classify(s, labels, "macao shanghai beijing", k=3) == "zh"
    assert knn_classify(s, labels, "tokyo japan", k=1) == "ja"
    assert knn_classify(s, labels, "zzz qqq", k=3) is None


# --------------------------------------------------------------------------
# Boolean perceptron (BooleanPerceptronClassifier parity by behavior)

PERC_TRAIN = [
    ("spark shuffle executor", True),
    ("spark stage task spark", True),
    ("driver spark partition", True),
    ("hive metastore warehouse", False),
    ("hive table warehouse hive", False),
    ("metastore hive query", False),
]


@pytest.fixture(scope="module")
def perc_model(ray_session):
    from lucene_solr_ray.stages.classify import perceptron_fit

    ds = rd.from_items([
        {"text": t, "label": "pos" if y else "neg"}
        for t, y in PERC_TRAIN
    ])
    return perceptron_fit(ds, "text", "label", positive_label="pos",
                          dim=1 << 12, epochs=20)


def test_perceptron_separates_training_set(perc_model, ray_session):
    from lucene_solr_ray.stages.classify import perceptron_classify

    ds = rd.from_items([{"text": t} for t, _ in PERC_TRAIN])
    got = perceptron_classify(ds, perc_model).to_pandas()
    want = [y for _, y in PERC_TRAIN]
    # from_items preserves order within this small single-block set
    assert got["predicted_positive"].tolist() == want
    # converged before the epoch cap (separable data)
    assert perc_model["epochs_run"] < 20


def test_perceptron_state_is_corpus_size_independent(perc_model):
    # driver-held model is exactly dim floats regardless of corpus rows
    assert perc_model["w"].shape == (1 << 12,)
    assert perc_model["w"].dtype == np.float64


def test_perceptron_generalizes_to_unseen_mix(perc_model, ray_session):
    from lucene_solr_ray.stages.classify import perceptron_classify

    ds = rd.from_items([
        {"text": "spark executor shuffle stage"},
        {"text": "warehouse hive metastore"},
    ])
    got = perceptron_classify(ds, perc_model).to_pandas()
    assert got["predicted_positive"].tolist() == [True, False]
