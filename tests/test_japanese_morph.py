"""Morphological Japanese tokenization (kuromoji role:
``JapaneseTokenizer.java`` lattice/Viterbi + ``JapaneseBaseFormFilter``
+ ``JapanesePartOfSpeechStopFilter``): golden segmentation vectors,
unknown-word grouping, width folding, and the analyzer registry hook."""

import pytest

from lucene_solr_ray.analysis.analyzers import get_analyzer
from lucene_solr_ray.analysis.japanese import (
    JapaneseAnalyzer,
    JapaneseTokenizer,
)

# golden vectors: (text, unfiltered surface/base stream, POS-filtered)
GOLDEN = [
    ("私は日本語を勉強します",
     ["私", "は", "日本語", "を", "勉強", "する"],
     ["私", "日本語", "勉強", "する"]),
    ("東京で映画を見ました",
     ["東京", "で", "映画", "を", "見る"],
     ["東京", "映画", "見る"]),
    ("猫が水を飲みます",
     ["猫", "が", "水", "を", "飲む"],
     ["猫", "水", "飲む"]),
    ("コンピューター関連ニュース",
     ["コンピューター", "関連", "ニュース"],
     ["コンピューター", "関連", "ニュース"]),
    ("新しい本を買いました",
     ["新しい", "本", "を", "買う"],
     ["新しい", "本", "買う"]),
    ("明日電車で学校に行きます",
     ["明日", "電車", "で", "学校", "に", "行く"],
     ["明日", "電車", "学校", "行く"]),
    ("天気がとても良いです",
     ["天気", "が", "とても", "良い", "です"],
     ["天気", "とても", "良い"]),
    ("ラーメンを食べたい",
     ["ラーメン", "を", "食べる"],
     ["ラーメン", "食べる"]),
]


@pytest.mark.parametrize("text,full,filtered", GOLDEN)
def test_golden_segmentation(text, full, filtered):
    assert JapaneseAnalyzer(stop_pos=frozenset()).tokens(text) == full
    assert JapaneseAnalyzer().tokens(text) == filtered


def test_compound_beats_parts():
    # 日本語 must win over 日本+語 (dictionary compound preference)
    toks = [s for s, _, _ in JapaneseTokenizer().segment("日本語の本")]
    assert toks == ["日本語", "の", "本"]


def test_unknown_grouping():
    tok = JapaneseTokenizer()
    # katakana runs group whole (char.def group=1)
    assert [s for s, _, _ in tok.segment("インターネット")] == \
        ["インターネット"]
    # latin + digits group whole; punctuation discarded
    assert [s for s, _, _ in tok.segment("GPT4は良い!")] == \
        ["GPT", "4", "は", "良い"]
    # unknown kanji becomes a short noun token
    segs = tok.segment("森で犬と话す")  # 森 and 话 not in lexicon
    assert segs[0][0] == "森" and segs[0][1] == "noun"


def test_width_fold_and_lowercase():
    an = JapaneseAnalyzer()
    assert an.tokens("Ｈｅｌｌｏ 世界、ＡＩが来る。") == \
        ["hello", "世界", "ai", "来る"]


def test_position_gaps_for_stopped_pos():
    # particles consume a position, like StopFilter's posIncr accumulation
    toks, pos = JapaneseAnalyzer().tokens_with_positions("私は猫が好き")
    assert toks[:2] == ["私", "猫"]
    assert pos[0] == 0 and pos[1] == 2  # gap where は was dropped


def test_registry_hook():
    an = get_analyzer("ja_morph")
    assert an.tokens("猫が水を飲みます") == ["猫", "水", "飲む"]
    an_all = get_analyzer("ja_morph_all")
    assert an_all.tokens("猫が") == ["猫", "が"]


def test_empty_and_ascii_only():
    an = get_analyzer("ja_morph")
    assert an.tokens("") == []
    assert an.tokens("hello world 42") == ["hello", "world", "42"]


def test_viterbi_matches_bruteforce_cheapest():
    """The lattice DP is keyed on (position, left POS) — kuromoji's
    per-node lattice — because edge cost depends on the left POS. A
    position-only DP can return a non-cheapest segmentation when a
    costlier prefix enables a cheaper connection; this pins the true
    Viterbi against exhaustive enumeration."""
    import random

    from lucene_solr_ray.analysis.japanese import (_CONN_DEFAULT, _LEXICON,
                                                   JapaneseTokenizer)

    tok = JapaneseTokenizer()

    def brute(text):
        best: list = [None]

        def rec(i, left, cost, path):
            if best[0] is not None and cost >= best[0][0]:
                return
            if i == len(text):
                best[0] = (cost, list(path))
                return
            for surface, c, pos, base in tok._candidates(text, i):
                if pos in ("sym", "space"):
                    edge, nxt = 0.0, left
                else:
                    edge = tok.conn.get((left, pos), _CONN_DEFAULT)
                    nxt = pos
                if pos not in ("sym", "space"):
                    path.append((surface, pos, base or surface))
                rec(i + len(surface), nxt, cost + c + edge, path)
                if pos not in ("sym", "space"):
                    path.pop()

        rec(0, "BOS", 0.0, [])
        return best[0][1]

    rng = random.Random(5)
    sents = ["私は日本語を勉強します", "東京で映画を見ました",
             "彼はとてもおいしい料理を食べたい", "犬と猫がいます"]
    words = list(_LEXICON)
    sents += ["".join(rng.choices(words, k=rng.randint(2, 5)))
              for _ in range(15)]
    for s in sents:
        assert tok.segment(s) == brute(s), s
