"""Quality metrics golden tests (hand-computed, mirroring QualityStats
semantics)."""

import pytest

from lucene_solr_ray.search.quality import (
    average_precision,
    evaluate_runs,
    ndcg_at_k,
    precision_at_k,
    recall_at_k,
    reciprocal_rank,
)


def test_precision_recall():
    ranked = [1, 2, 3, 4, 5]
    rel = {2, 4, 9}
    assert precision_at_k(ranked, rel, 5) == 2 / 5
    assert precision_at_k(ranked, rel, 2) == 1 / 2
    assert recall_at_k(ranked, rel, 5) == 2 / 3


def test_average_precision():
    # hits at ranks 2 and 4: (1/2 + 2/4) / 3 relevant
    assert average_precision([1, 2, 3, 4], {2, 4, 9}) == \
        pytest.approx((0.5 + 0.5) / 3)
    assert average_precision([9, 1], {9}) == 1.0
    assert average_precision([1, 2], set()) == 0.0


def test_mrr():
    assert reciprocal_rank([5, 6, 7], {7}) == pytest.approx(1 / 3)
    assert reciprocal_rank([5, 6, 7], {1}) == 0.0


def test_ndcg():
    # perfect ordering of gains 3,2 -> ndcg 1
    assert ndcg_at_k([1, 2], {1: 3.0, 2: 2.0}, 2) == pytest.approx(1.0)
    # swapped order < 1
    assert ndcg_at_k([2, 1], {1: 3.0, 2: 2.0}, 2) < 1.0


def test_evaluate_runs():
    runs = {0: [1, 2, 3], 1: [4, 5], 2: [9]}
    judg = {0: {2}, 1: {4, 5}}
    out = evaluate_runs(runs, judg, k=2)
    assert out["queries"] == 2
    assert out["p_at_2"] == pytest.approx((0.5 + 1.0) / 2)
    assert out["mrr"] == pytest.approx((0.5 + 1.0) / 2)
