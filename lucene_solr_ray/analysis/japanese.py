"""Morphological Japanese analysis — lattice/Viterbi segmentation.

The reference ships kuromoji (``lucene/analysis/kuromoji/``):
``JapaneseTokenizer.java`` builds a lattice of dictionary words over the
input, scores word costs + POS connection costs from the bundled IPADIC
and runs Viterbi to pick the cheapest segmentation;
``UnknownDictionary``/char.def group out-of-vocabulary runs by character
class; ``JapaneseBaseFormFilter`` restores inflected verbs to base form;
``JapanesePartOfSpeechStopFilter`` drops particles/auxiliaries;
``JapaneseAnalyzer.java`` wires the chain.

This module implements the SAME published architecture (the classic
MeCab lattice algorithm: Kudo et al., "Applying Conditional Random
Fields to Japanese Morphological Analysis", EMNLP 2004 — costs here are
hand-set Viterbi weights, not CRF-trained) with an embedded SEED
lexicon instead of IPADIC (which cannot be bundled here): ~150 common
words with surface→(cost, POS, base form), a simplified POS-pair
connection matrix, and char-class unknown-word candidates (katakana /
latin / digit runs group whole, like char.def ``group=1``; kanji and
hiragana generate short candidates). The lexicon is a pluggable dict —
point ``JapaneseTokenizer(lexicon=...)`` at a full dictionary and the
lattice scales unchanged. The bigram CJK chain (``analysis/cjk.py``)
remains the recall-oriented default; this is the precision path.
"""

from __future__ import annotations

import numpy as np

from .analyzers import Analyzer, register_analyzer
from .cjk import cjk_width_fold

# -- character classes -------------------------------------------------

KANJI, HIRA, KATA, LATIN, DIGIT, SYM, SPACE = range(7)


def _char_class(c: str) -> int:
    o = ord(c)
    if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF or c == "々":
        return KANJI
    if 0x3041 <= o <= 0x309F:
        return HIRA
    if 0x30A0 <= o <= 0x30FF and c != "・":
        return KATA
    if c.isalpha():
        return LATIN
    if c.isdigit():
        return DIGIT
    if c.isspace():
        return SPACE
    return SYM


# -- seed lexicon ------------------------------------------------------
# surface: (POS, base form or None). Word cost = max(3000 - 700*len, 150)
# — longer dictionary entries cheaper per the standard compound
# preference (日本語 beats 日本+語).

_P, _AUX, _N, _PRON, _V, _ADJ, _ADV = (
    "particle", "aux", "noun", "pronoun", "verb", "adj", "adv")

_LEXICON: dict[str, tuple[str, str | None]] = {}
for w in "は が を に で と も の へ や から まで より ね よ か".split():
    _LEXICON[w] = (_P, None)
for w in "です でした ます ました ない だ".split():
    _LEXICON[w] = (_AUX, None)
for surface, base in [
    ("する", None), ("します", "する"), ("しました", "する"),
    ("した", "する"),
    ("見る", None), ("見ます", "見る"), ("見ました", "見る"),
    ("食べる", None), ("食べます", "食べる"), ("食べました", "食べる"),
    ("食べたい", "食べる"), ("食べた", "食べる"),
    ("飲む", None), ("飲みます", "飲む"), ("飲みました", "飲む"),
    ("買う", None), ("買います", "買う"), ("買いました", "買う"),
    ("行く", None), ("行きます", "行く"), ("行きました", "行く"),
    ("来る", None), ("来ます", "来る"), ("来ました", "来る"),
    ("読む", None), ("読みます", "読む"), ("読みました", "読む"),
    ("書く", None), ("書きます", "書く"), ("書きました", "書く"),
    ("話す", None), ("話します", "話す"),
    ("聞く", None), ("聞きます", "聞く"),
    ("ある", None), ("あります", "ある"),
    ("いる", None), ("います", "いる"),
]:
    _LEXICON[surface] = (_V, base)
for w in "新しい 古い 高い 安い 大きい 小さい 良い おいしい".split():
    _LEXICON[w] = (_ADJ, None)
for w in "とても もっと".split():
    _LEXICON[w] = (_ADV, None)
for w in ("私 僕 彼 彼女 あなた".split()):
    _LEXICON[w] = (_PRON, None)
for w in ("日本 語 日本語 英語 東京 大阪 学校 会社 先生 学生 本 水 犬 猫 "
          "映画 音楽 天気 今日 明日 昨日 電車 駅 時間 年 月 日 人 国 車 "
          "新聞 勉強 仕事 旅行 料理 写真 漢字 言葉 関連 世界 朝 夜 花 山 "
          "川 海 空 雨 雪 店 駅前 名前 電話 番号").split():
    _LEXICON[w] = (_N, None)


def _word_cost(w: str) -> int:
    return max(3000 - 700 * len(w), 150)


# unknown-word generation per char class: (grouping, max_len, base, per_char)
_UNK = {
    KANJI: (False, 2, 2000, 1700),
    HIRA: (False, 3, 3200, 1800),
    KATA: (True, 24, 700, 200),
    LATIN: (True, 48, 500, 50),
    DIGIT: (True, 24, 500, 50),
}
_UNK_POS = {KANJI: "noun", HIRA: "unk", KATA: "noun",
            LATIN: "latin", DIGIT: "num"}

# simplified connection matrix (IPADIC matrix.def role): (left, right)
# POS-pair costs, default 300
_CONN_DEFAULT = 300
_CONN: dict[tuple[str, str], int] = {}
for left in (_N, _PRON, "num", "latin"):
    _CONN[(left, _P)] = 0
    _CONN[(left, _AUX)] = 150
for right in (_N, _PRON, _V, _ADJ, _ADV, "latin", "num"):
    _CONN[(_P, right)] = 0
_CONN[(_V, _AUX)] = 0
_CONN[(_ADJ, _AUX)] = 0
_CONN[(_ADV, _ADJ)] = 0
_CONN[(_ADV, _V)] = 100
_CONN[(_N, _V)] = 200
_CONN[(_N, _N)] = 400
for right in (_P, _AUX):
    _CONN[("BOS", right)] = 2000
_CONN[("unk", "unk")] = 800  # discourage hiragana fragment chains


class JapaneseTokenizer:
    """Lattice + Viterbi segmenter (``JapaneseTokenizer.java`` role).

    ``segment(text)`` → list of (surface, POS, base-form) triples for
    every non-space, non-symbol token, cheapest path first-to-last.
    """

    def __init__(self, lexicon: dict[str, tuple[str, str | None]]
                 | None = None,
                 conn: dict[tuple[str, str], int] | None = None):
        self.lexicon = _LEXICON if lexicon is None else lexicon
        self.conn = _CONN if conn is None else conn
        # first-char index (the common-prefix lookup the FST performs)
        self._by_first: dict[str, list[str]] = {}
        for w in self.lexicon:
            self._by_first.setdefault(w[0], []).append(w)
        for lst in self._by_first.values():
            lst.sort(key=len, reverse=True)

    def _candidates(self, text: str, i: int):
        c = text[i]
        out = []
        for w in self._by_first.get(c, ()):
            if text.startswith(w, i):
                pos, base = self.lexicon[w]
                out.append((w, _word_cost(w), pos, base))
        cls = _char_class(c)
        spec = _UNK.get(cls)
        if spec is not None:
            group, max_len, base_c, per = spec
            run = 1
            n = len(text)
            while (i + run < n and run < max_len
                   and _char_class(text[i + run]) == cls):
                run += 1
            lens = (run,) if group else range(1, run + 1)
            pos = _UNK_POS[cls]
            for ln in lens:
                out.append((text[i:i + ln], base_c + per * ln, pos, None))
        if not out:  # symbol / space / uncovered: single-char token
            pos = "space" if cls == SPACE else "sym"
            out.append((c, 0, pos, None))
        return out

    def segment(self, text: str) -> list[tuple[str, str, str]]:
        # True lattice Viterbi: the DP node is (position, left POS) —
        # kuromoji keys its lattice nodes the same way — because the
        # connection cost of the NEXT edge depends on the left POS, so
        # collapsing to position-only can return a non-cheapest path
        # when a costlier prefix enables a cheaper connection. The POS
        # alphabet is ~10 symbols, so this stays O(n * |POS| * cands).
        n = len(text)
        if not n:
            return []
        best: list[dict[str, float]] = [{} for _ in range(n + 1)]
        back: list[dict[str, tuple]] = [{} for _ in range(n + 1)]
        best[0]["BOS"] = 0.0
        for i in range(n):
            if not best[i]:
                continue
            cands = self._candidates(text, i)
            for left, bcost in best[i].items():
                for surface, cost, pos, base in cands:
                    # punctuation/space carries no connection cost and
                    # does not change the left context
                    # (discardPunctuation=true)
                    if pos in ("sym", "space"):
                        edge = 0.0
                        nxt_left = left
                    else:
                        edge = self.conn.get((left, pos), _CONN_DEFAULT)
                        nxt_left = pos
                    j = i + len(surface)
                    tot = bcost + cost + edge
                    cur = best[j].get(nxt_left)
                    if cur is None or tot < cur:
                        best[j][nxt_left] = tot
                        back[j][nxt_left] = (i, left, surface, pos, base)
        end = min(best[n], key=best[n].get)
        out = []
        j, st = n, end
        while j > 0:
            i, left, surface, pos, base = back[j][st]
            if pos not in ("sym", "space"):
                out.append((surface, pos, base or surface))
            j, st = i, left
        out.reverse()
        return out


# -- analyzer chain ----------------------------------------------------

# JapaneseAnalyzer stoptags: particles, auxiliary verbs, symbols
_STOP_POS = frozenset(["particle", "aux"])


class JapaneseAnalyzer(Analyzer):
    """``JapaneseAnalyzer.java`` chain: CJKWidth fold → lattice
    segmentation → base form → POS stop (particles/aux dropped with a
    position gap, StopFilter-style) → lowercase (latin runs)."""

    name = "ja_morph"

    def __init__(self, stop_pos: frozenset[str] = _STOP_POS,
                 tokenizer: JapaneseTokenizer | None = None):
        self.stop_pos = stop_pos
        self.tok = tokenizer or JapaneseTokenizer()

    def tokens_with_positions(self, text: str):
        toks, positions = [], []
        p = -1
        for surface, pos, base in self.tok.segment(cjk_width_fold(text)):
            p += 1
            if pos in self.stop_pos:
                continue
            toks.append(base.lower() if pos == "latin" else base)
            positions.append(p)
        return toks, positions

    def tokens(self, text: str) -> list[str]:
        return self.tokens_with_positions(text)[0]


register_analyzer("ja_morph", JapaneseAnalyzer())
register_analyzer("ja_morph_all", JapaneseAnalyzer(stop_pos=frozenset()))
