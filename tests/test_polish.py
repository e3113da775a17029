"""Polish analysis (stempel + morfologik module parity)."""

from lucene_solr_ray.analysis.polish import (
    PolishAnalyzer, lemmatize, polish_light_stem)


def test_light_stem_inflection_families_collapse():
    assert polish_light_stem("domami") == polish_light_stem("domach") == "dom"
    assert polish_light_stem("kotów") == "kot"
    assert polish_light_stem("polskiego") == polish_light_stem("polskich")
    assert polish_light_stem("pracować") == polish_light_stem("pracujemy")
    assert polish_light_stem("uczymy") == polish_light_stem("uczycie")
    # minimum-stem guard: short words survive
    assert polish_light_stem("dom") == "dom"
    assert polish_light_stem("ta") == "ta"


def test_lemmatize_known_unknown_ambiguous():
    assert lemmatize("koty") == ("kot",)
    assert lemmatize("jest") == ("być",)
    assert lemmatize("xyz") == ("xyz",)          # miss keeps original
    assert set(lemmatize("mam")) == {"mieć", "mama"}


def test_morfologik_chain_posincr0_twins():
    a = PolishAnalyzer("morfologik")
    toks, pos = a.tokens_with_positions("Mam koty")
    assert toks == ["mieć", "mama", "kot"]
    assert pos == [0, 0, 1]                      # twins share a position
    assert a.tokens("Jest w domu i czyta") == ["być", "dom", "czytać"]


def test_stempel_chain():
    b = PolishAnalyzer("stempel")
    assert b.tokens("Studenci czytali polskie książki") == [
        "studenc", "czyt", "polski", "książk"]


def test_registry():
    from lucene_solr_ray.analysis.analyzers import get_analyzer
    assert get_analyzer("polish").tokens("nową książkę") == [
        "nowy", "książka"]
    assert get_analyzer("polish_light").tokens("domami") == ["dom"]
