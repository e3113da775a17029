"""Phonetic encoder family (lucene/analysis/phonetic parity).

Vectors are the published ones: commons-codec test suites
(Metaphone/DoubleMetaphone/RefinedSoundex), the Caverphone 2.0 paper
(Hood 2004), the Kölner Phonetik examples (Postel 1969), the NYSIIS
spec (Taft 1970), and the Daitch-Mokotoff standard's own examples.
"""

import string

import pytest

from lucene_solr_ray.analysis.phonetic2 import (
    MultiPhoneticAnalyzer, caverphone2, cologne_phonetic, daitch_mokotoff,
    double_metaphone, double_metaphone_codes, metaphone, nysiis,
    refined_soundex)


SENTENCE = "The quick brown fox jumped over the lazy dogs".split()


def test_metaphone_commons_codec_sentence():
    gold = ["0", "KK", "BRN", "FKS", "JMPT", "OFR", "0", "LS", "TKS"]
    assert [metaphone(w) for w in SENTENCE] == gold


@pytest.mark.parametrize("word,code", [
    ("testing", "TSTN"), ("howl", "HL"), ("Knight", "NT"),
    ("Xavier", "SFR"), ("Wright", "RT"), ("school", "SKL"),
    ("judge", "JJ"), ("dumb", "TM"), ("thumb", "0M"),
])
def test_metaphone_vectors(word, code):
    assert metaphone(word) == code


def test_double_metaphone_vectors():
    assert double_metaphone("Smith") == ("SM0", "XMT")
    assert double_metaphone("schmidt") == ("XMT", "SMT")
    assert double_metaphone("snider") == ("SNTR", "XNTR")
    assert double_metaphone("Williams") == ("ALMS", "FLMS")
    assert double_metaphone("jose")[0] == "HS"
    # the commons-codec sentence (primary codes)
    gold = ["0", "KK", "PRN", "FKS", "JMPT", "AFR", "0", "LS", "TKS"]
    assert [double_metaphone(w)[0] for w in SENTENCE] == gold
    # alternates where they differ
    assert double_metaphone("The")[1] == "T"
    assert double_metaphone("jumped")[1] == "AMPT"


def test_double_metaphone_codes_dedup():
    assert double_metaphone_codes("dogs") == ("TKS",)
    assert set(double_metaphone_codes("Smith")) == {"SM0", "XMT"}
    assert double_metaphone_codes("") == ()


def test_refined_soundex():
    assert refined_soundex("testing") == "T6036084"
    assert refined_soundex("TESTING") == "T6036084"
    assert refined_soundex("") == ""


def test_caverphone2_paper_vectors():
    assert caverphone2("Peter") == "PTA1111111"
    assert caverphone2("Stevenson") == "STFNSN1111"
    # rough/tough family keeps the f sound
    assert caverphone2("rough") == caverphone2("ruf")
    assert len(caverphone2("a")) == 10


def test_cologne_phonetic_published_vectors():
    assert cologne_phonetic("Wikipedia") == "3412"
    assert cologne_phonetic("Breschnew") == "17863"
    assert cologne_phonetic("Mueller-Luedenscheidt") == "65752682"
    # phonetically equal German spellings collide
    assert cologne_phonetic("Meyer") == cologne_phonetic("Maier")


def test_nysiis_spec_vectors():
    assert nysiis("KNIGHT") == "NAGT"
    assert nysiis("MACINTOSH") == "MCANT"
    assert nysiis("PHILLIPSON") == "FALAPS"
    assert nysiis("PHILLIPSON", strict=False) == "FALAPSAN"
    assert nysiis("KNUTH") == "NAT"


def test_daitch_mokotoff_standard_examples():
    assert daitch_mokotoff("GOLDEN") == ("583600",)
    assert set(daitch_mokotoff("PETERS")) == {"739400", "734000"}
    assert daitch_mokotoff("MOSKOWITZ") == ("645740",)
    assert set(daitch_mokotoff("AUERBACH")) == {"097400", "097500"}
    assert daitch_mokotoff("MINTZ") == ("664000",)
    assert daitch_mokotoff("TOPF") == ("370000",)
    # spelling variants meet in at least one branch
    assert set(daitch_mokotoff("MOSKOWITZ")) & set(daitch_mokotoff("MOSKOVITZ"))


def test_daitch_mokotoff_shape_properties():
    for word in ("a", "Schwarzenegger", "xyzzy", "JJJ", "OOO", "CHCHCH"):
        for code in daitch_mokotoff(word):
            assert len(code) == 6
            assert set(code) <= set(string.digits)


def test_encoders_empty_and_nonletters():
    for fn in (metaphone, refined_soundex, caverphone2, cologne_phonetic,
               nysiis):
        assert fn("123$%") == ""
    assert daitch_mokotoff("123") == ()
    assert double_metaphone("123") == ("", "")


def test_multi_phonetic_analyzer_injects_posincr0():
    a = MultiPhoneticAnalyzer("double_metaphone")
    toks, pos = a.tokens_with_positions("Smith went")
    assert toks == ["smith", "SM0", "XMT", "went", "ANT", "FNT"]
    assert pos == [0, 0, 0, 1, 1, 1]
    # inject=False replaces the token with its code(s)
    b = MultiPhoneticAnalyzer("metaphone", inject=False)
    toks2, pos2 = b.tokens_with_positions("Smith went")
    assert toks2 == ["SM0", "WNT"]
    assert pos2 == [0, 1]


def test_registry_names():
    from lucene_solr_ray.analysis.analyzers import get_analyzer
    for enc in ("metaphone", "double_metaphone", "refined_soundex",
                "caverphone", "cologne", "nysiis", "dm_soundex"):
        an = get_analyzer("phonetic_" + enc)
        assert an.tokens("smith")  # runs and yields something
