"""Morphological Chinese analysis — dictionary DAG + cheapest-path
word segmentation.

The reference ships smartcn (``lucene/analysis/smartcn/``):
``HHMMSegmenter.java`` builds a lattice of dictionary words over each
sentence, scores word + bigram frequencies from the bundled core
dictionary and picks the best path (hidden-Markov-style Viterbi);
``SmartChineseAnalyzer.java`` wires segmentation + stopword removal.

This module implements the SAME published architecture (the classic
dictionary-DAG max-probability path — the algorithm smartcn, jieba and
the segmentation literature all share: candidate words from a prefix
dictionary form a DAG over the sentence, dynamic programming picks the
cheapest path) with an embedded SEED lexicon instead of the smartcn
core dictionary (which cannot be bundled here): ~160 common words with
length-derived costs standing in for -log(frequency), plus char-class
unknown handling (latin/digit runs group whole; unmatched Han chars
fall back to single-char tokens, exactly smartcn's behavior for OOV
CJK). The lexicon is pluggable — point ``ChineseTokenizer(lexicon=...)``
at a full frequency dictionary and the DAG scales unchanged. The bigram
CJK chain (``analysis/cjk.py``) remains the recall-oriented default;
this is the precision path.

Word costs prefer compounds (研究生命 → 研究/生命 not 研究生/命;
北京大学 stays one token), mirroring the frequency economics of the
real dictionaries.
"""

from __future__ import annotations

from .analyzers import Analyzer, register_analyzer
from .cjk import cjk_width_fold

# -- seed lexicon ------------------------------------------------------
# word -> None (costs derive from length; a pluggable dict may instead
# map word -> explicit cost)

_WORDS = """
我们 你们 他们 她们 中国 北京 上海 中文 汉语 英语 日语 学习 学生 学校
大学 老师 朋友 时间 今天 明天 昨天 现在 电脑 电话 电影 音乐 工作 新闻
天气 火车 汽车 飞机 商店 公司 医院 医生 孩子 家庭 问题 世界 国家 历史
文化 科学 技术 发展 研究 生命 研究生 图书馆 北京大学 喜欢 知道 觉得
希望 需要 应该 可以 已经 非常 但是 因为 所以 如果 虽然 去年 明年 吃饭
睡觉 说话 看书 跑步 游泳 唱歌 跳舞 认识 介绍 帮助 开始 结束 准备 练习
旅游 旅行 照片 照相 房子 房间 桌子 椅子 咖啡 牛奶 米饭 面条 苹果 水果
语言 文字 词典 字典 报纸 杂志 网络 网站 手机 东西 地方 城市 农村 经济
政府 人民 社会 生活 环境 空气 健康 身体 运动 比赛 足球 篮球 游戏 儿子
女儿 爸爸 妈妈 哥哥 姐姐 弟弟 妹妹 先生 小姐 夫人 小时 分钟 星期 月亮
太阳 地球 天空 大海 高兴 快乐 漂亮 好看 容易 困难 重要 有名 安静 热闹
"""

_SINGLE = """
我 你 他 她 它 人 大 小 多 少 好 坏 新 旧 高 低 长 短 快 慢 看 听 说
读 写 走 跑 来 去 买 卖 吃 喝 想 爱 学 教 做 用 给 让 叫 请 问 回 开
关 坐 站 住 找 换 送 带 拿 放 书 水 茶 饭 菜 鱼 肉 车 门 窗 山 河 树
花 鸟 猫 狗 年 月 日 天 家 国 城 路 街 店 钱 票 字 词 句 纸 笔 很 都
也 再 又 最 更 真 太 就 才 还 只 不 没 别 和 与 或 在 从 到 向 对 为
的 了 着 过 是 有 吗 呢 吧 啊
"""

_STOP_WORDS = frozenset(
    "的 了 着 过 是 在 和 与 或 都 很 就 也 又 太 吗 呢 吧 啊 不 没".split())


def _word_cost(w: str) -> int:
    # length-derived stand-in for -log(frequency): compounds beat their
    # parts (2-char 1800 < 2 known singles 5200; 4-char 200 < 2+2 3600)
    return max(3400 - 800 * len(w), 100)


_LEXICON: dict[str, int] = {}
for _w in (_WORDS + _SINGLE).split():
    _LEXICON[_w] = _word_cost(_w)

_UNK_HAN = 3600      # unknown single Han char: worse than any dict word
_UNK_RUN_BASE = 500  # latin/digit runs group whole (smartcn does too)
_UNK_RUN_PER = 50


def _is_han(c: str) -> bool:
    o = ord(c)
    return 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF or c == "々"


class ChineseTokenizer:
    """Dictionary-DAG cheapest-path segmenter (``HHMMSegmenter.java``
    role). ``segment(text)`` → list of word tokens, cheapest path
    first-to-last; spaces and symbols are dropped, latin/digit runs
    group whole.
    """

    def __init__(self, lexicon: dict[str, int] | None = None):
        self.lexicon = _LEXICON if lexicon is None else lexicon
        self._by_first: dict[str, list[str]] = {}
        self._max_len = 1
        for w in self.lexicon:
            self._by_first.setdefault(w[0], []).append(w)
            if len(w) > self._max_len:
                self._max_len = len(w)

    def _candidates(self, text: str, i: int):
        """(surface, cost, is_word) candidates starting at ``i``."""
        c = text[i]
        out = []
        for w in self._by_first.get(c, ()):
            if text.startswith(w, i):
                out.append((w, self.lexicon[w], True))
        if c.isalnum() and not _is_han(c):
            # latin/digit run groups whole
            n = len(text)
            j = i + 1
            while j < n and text[j].isalnum() and not _is_han(text[j]):
                j += 1
            out.append((text[i:j],
                        _UNK_RUN_BASE + _UNK_RUN_PER * (j - i), True))
        if not out:
            if _is_han(c):
                out.append((c, _UNK_HAN, True))
            else:  # space / punctuation: zero-cost, non-token
                out.append((c, 0, False))
        return out

    def segment(self, text: str) -> list[str]:
        n = len(text)
        if not n:
            return []
        INF = float("inf")
        # forward DP over positions — unlike the Japanese lattice no
        # POS connection costs apply (smartcn's bigram costs are
        # word-word; the seed model is unigram), so position-only IS
        # the exact Viterbi here
        best = [INF] * (n + 1)
        best[0] = 0.0
        back: list[tuple[int, str, bool] | None] = [None] * (n + 1)
        for i in range(n):
            if best[i] is INF:
                continue
            for surface, cost, is_word in self._candidates(text, i):
                j = i + len(surface)
                tot = best[i] + cost
                if tot < best[j]:
                    best[j] = tot
                    back[j] = (i, surface, is_word)
        out = []
        j = n
        while j > 0:
            i, surface, is_word = back[j]
            if is_word:
                out.append(surface)
            j = i
        out.reverse()
        return out


# -- analyzer chain ----------------------------------------------------


class ChineseAnalyzer(Analyzer):
    """``SmartChineseAnalyzer.java`` chain: CJKWidth fold → DAG
    segmentation → stopword drop (with a position gap, StopFilter
    style) → lowercase (latin runs)."""

    name = "zh_smart"

    def __init__(self, stop_words: frozenset[str] = _STOP_WORDS,
                 tokenizer: ChineseTokenizer | None = None):
        self.stop_words = stop_words
        self.tok = tokenizer or ChineseTokenizer()

    def tokens_with_positions(self, text: str):
        toks, positions = [], []
        p = -1
        for surface in self.tok.segment(cjk_width_fold(text)):
            p += 1
            if surface in self.stop_words:
                continue
            toks.append(surface.lower())
            positions.append(p)
        return toks, positions

    def tokens(self, text: str) -> list[str]:
        return self.tokens_with_positions(text)[0]


register_analyzer("zh_smart", ChineseAnalyzer())
register_analyzer("zh_smart_all", ChineseAnalyzer(stop_words=frozenset()))
