"""ICU module (lucene/analysis/icu parity): script runs, tokenizer
routing, nfkc_cf, transforms, composed chains."""

from lucene_solr_ray.analysis.icu import (
    ICUAnalyzer, ICUTokenizer, nfkc_cf, normalize_charfilter, script_of,
    script_runs, transliterate)


def test_script_of():
    assert script_of("a") == "Latin"
    assert script_of("Ж") == "Cyrillic"
    assert script_of("ψ") == "Greek"
    assert script_of("北") == "Han"
    assert script_of("カ") == "Katakana"
    assert script_of("ひ") == "Hiragana"
    assert script_of("한") == "Hangul"
    assert script_of("ท") == "Thai"
    assert script_of("Ａ") == "Latin"   # fullwidth Latin letter
    assert script_of("1") == "Common"
    assert script_of(" ") == "Common"


def test_script_runs_common_attaches():
    # digits/space attach to the run in progress (ScriptIterator)
    runs = script_runs("abcДЕЖ123 xyz")
    assert [(s, e, sc) for s, e, sc in runs] == [
        (0, 3, "Latin"), (3, 10, "Cyrillic"), (10, 13, "Latin")]
    # leading common prefix claimed by the first real script
    assert script_runs("123abc")[0] == (0, 6, "Latin")


def test_nfkc_cf():
    assert nfkc_cf("ＡＢＣ") == "abc"
    assert nfkc_cf("ＳTRASSE") == "strasse"  # ß-free casefold path
    assert nfkc_cf("straße") == "strasse"    # casefold expands ß
    assert normalize_charfilter("Ｔｅst") == "test"


def test_transforms():
    assert transliterate("Москва", "Cyrillic-Latin") == "Moskva"
    assert transliterate("щука", "Cyrillic-Latin") == "ŝuka"  # ISO 9
    assert transliterate("ψυχή", "Greek-Latin") == "psychē"
    assert transliterate("φίλος", "Greek-Latin") == "philos"
    assert transliterate("カナ", "Katakana-Hiragana") == "かな"
    assert transliterate("ＡＢ１", "Fullwidth-Halfwidth") == "AB1"
    assert transliterate("Мир ψυχή ok", "Any-Latin") == "Mir psychē ok"
    try:
        transliterate("x", "Han-Latin")
        assert False
    except KeyError:
        pass


def test_icu_tokenizer_script_routing():
    tok = ICUTokenizer()
    # Han run -> dictionary-DAG words; Latin run -> UAX#29
    assert tok.tokenize("北京大学Computer") == ["北京大学", "Computer"]
    # Kana run -> lattice segmentation
    assert tok.tokenize("カタカナです") == ["カタカナ", "です"]
    # Thai has no bundled dictionary: run emitted whole (documented)
    assert tok.tokenize("สวัสดี hello") == ["สวัสดี", "hello"]


def test_icu_analyzer_modes():
    lat = ICUAnalyzer("latin")
    assert lat.tokens("Привет мир") == ["privet", "mir"]
    assert lat.tokens("Ελληνικά κείμενο") == ["ellenika", "keimeno"]
    fold = ICUAnalyzer("folded")
    assert fold.tokens("Crème BRÛLÉE") == ["creme", "brulee"]
    # folding keeps the original script (no transliteration)
    assert fold.tokens("Привет") == ["привет"]
    norm = ICUAnalyzer("normalized")
    assert norm.tokens("Ｔｅｓｔ Straße") == ["test", "strasse"]


def test_icu_analyzer_positions_and_registry():
    from lucene_solr_ray.analysis.analyzers import get_analyzer
    a = get_analyzer("icu")
    toks, pos = a.tokens_with_positions("Москва и Київ")
    assert toks == ["moskva", "i", "kiiv"]
    assert pos == [0, 1, 2]
    assert get_analyzer("icu_tokenizer").tokens("ＡＢＣ") == ["abc"]


def test_all_common_and_empty_text():
    assert script_runs("") == [(0, 0, "Common")]
    tok = ICUTokenizer()
    assert tok.tokenize("123 456") == ["123", "456"]
    assert tok.tokenize("") == []
    assert ICUAnalyzer("latin").tokens("") == []


def test_composed_cyrillic_letters_iso9():
    # й/ё/ї/ў are distinct ISO 9 letters, not base+mark (regression:
    # a blanket NFD strip made these rows dead code)
    assert transliterate("йод", "Cyrillic-Latin") == "jod"
    assert transliterate("ёж", "Cyrillic-Latin") == "ëž"
    assert transliterate("Київ", "Cyrillic-Latin") == "Kiïv"
    assert transliterate("ўзбек", "Cyrillic-Latin") == "ǔzbek"
    # Any-Latin second pass must not erase marks the first produced
    assert transliterate("юг", "Any-Latin") == "ûg"


def test_thai_runs_split_on_interior_common():
    tok = ICUTokenizer()
    # regression: whole-run emission glued words across spaces/digits
    assert tok.tokenize("สวัสดี ครับ") == ["สวัสดี", "ครับ"]
    assert tok.tokenize("กข 123 คง") == ["กข", "123", "คง"]


def test_tokens_batch_matches_per_doc():
    a = ICUAnalyzer("latin")
    texts = ["Привет мир", "", "北京大学Computer", "ψυχή και σῶμα",
             "Hello Мир", "a ั b",  # bare Thai vowel sign folds to
             # empty: positions must compact over survivors, no gap
             "ิ x ี"]
    toks, d, p = a.tokens_batch(texts)
    want_t, want_d, want_p = [], [], []
    for i, t in enumerate(texts):
        tt, pp = a.tokens_with_positions(t)
        want_t.extend(tt)
        want_d.extend([i] * len(tt))
        want_p.extend(pp)
    assert toks == want_t
    assert d.tolist() == want_d
    assert p.tolist() == want_p
    empty = a.tokens_batch([])
    assert empty[0] == [] and len(empty[1]) == 0
