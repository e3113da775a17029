"""Morphological Chinese segmentation (``lucene/analysis/smartcn/``
SmartChineseAnalyzer role): dictionary-DAG cheapest path + stopword
drop — golden vectors, classic ambiguities, and DP exactness."""

import random

from lucene_solr_ray.analysis.analyzers import get_analyzer
from lucene_solr_ray.analysis.chinese import (_LEXICON, _STOP_WORDS,
                                              ChineseAnalyzer,
                                              ChineseTokenizer)

GOLD = [
    ("我们在北京学习中文", ["我们", "在", "北京", "学习", "中文"]),
    ("今天天气非常好", ["今天", "天气", "非常", "好"]),
    ("他喜欢看电影", ["他", "喜欢", "看", "电影"]),
    ("中国的历史很长", ["中国", "的", "历史", "很", "长"]),
    ("学生在图书馆看书", ["学生", "在", "图书馆", "看书"]),
    ("电脑和电话都是新的", ["电脑", "和", "电话", "都", "是", "新", "的"]),
    ("研究生命很重要", ["研究", "生命", "很", "重要"]),
]


def test_golden_segmentations():
    tok = ChineseTokenizer()
    for text, want in GOLD:
        assert tok.segment(text) == want, text


def test_classic_ambiguities():
    """研究生命 must split 研究/生命 (not 研究生/命) — the standard
    dictionary-DAG test case; compounds beat their parts (北京大学
    stays whole though 北京 and 大学 are both dictionary words)."""
    tok = ChineseTokenizer()
    assert tok.segment("研究生命") == ["研究", "生命"]
    assert tok.segment("北京大学") == ["北京大学"]
    assert tok.segment("研究生") == ["研究生"]


def test_analyzer_chain_stop_fold_lowercase():
    an = get_analyzer("zh_smart")
    assert an.tokens("电脑和电话都是新的") == ["电脑", "电话", "新"]
    # full-width latin folds then lowercases; digit run groups whole
    assert an.tokens("ＣＯＭＰＵＴＥＲ科学技术2024") == \
        ["computer", "科学", "技术", "2024"]
    # stopword drop leaves a position gap (StopFilter semantics)
    toks, pos = an.tokens_with_positions("中国的历史很长")
    assert toks == ["中国", "历史", "长"]
    assert pos == [0, 2, 4]
    # zh_smart_all keeps everything
    assert get_analyzer("zh_smart_all").tokens("中国的历史") == \
        ["中国", "的", "历史"]


def test_unknown_han_single_char_fallback():
    tok = ChineseTokenizer()
    # 起源 not in the seed lexicon: falls back to single-char tokens
    # (smartcn's OOV CJK behavior), neighbors segment normally
    got = tok.segment("研究起源")
    assert got == ["研究", "起", "源"]


def test_dp_matches_bruteforce_cheapest():
    """Unigram word costs make the position-only DP the exact Viterbi;
    pin it against exhaustive enumeration on random word strings."""
    tok = ChineseTokenizer()

    def brute(text):
        best: list = [None]

        def rec(i, cost, path):
            if best[0] is not None and cost >= best[0][0]:
                return
            if i == len(text):
                best[0] = (cost, list(path))
                return
            for surface, c, is_word in tok._candidates(text, i):
                if is_word:
                    path.append(surface)
                rec(i + len(surface), cost + c, path)
                if is_word:
                    path.pop()

        rec(0, 0.0, [])
        return best[0][1]

    rng = random.Random(11)
    words = list(_LEXICON)
    for _ in range(20):
        s = "".join(rng.choices(words, k=rng.randint(2, 5)))
        assert tok.segment(s) == brute(s), s


def test_stopwords_are_dictionary_words():
    assert _STOP_WORDS <= set(_LEXICON)
