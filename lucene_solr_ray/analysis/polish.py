"""Polish analysis (``lucene/analysis/stempel/`` + ``morfologik/``).

Two chains, mirroring the reference's two Polish modules:

- ``stempel`` (``stempel/src/java/org/apache/lucene/analysis/pl/
  PolishAnalyzer.java``) ships an algorithmic stemmer whose patricia
  trie is TRAINED table data (``stemmer_20000.tbl``); that binary
  resource can't be restated, so :func:`polish_light_stem` fills the
  role with a conservative longest-suffix-strip light stemmer in the
  Dolamic-Savoy style (case endings + common verb/adjective endings,
  minimum-stem guard). Documented approximation: inflection families
  collapse, but it is NOT the trained stempel transducer.
- ``morfologik`` (``MorfologikFilter.java:60``) is dictionary
  lemmatization: surface form -> lemma(s) from the Morfologik FSA
  dictionary. Same semantics here over a bundled seed lexicon: known
  forms are replaced by their lemma(s) (every additional lemma of an
  ambiguous form is a posIncr-0 twin, as the filter emits one token
  per interpretation), unknown tokens pass through unchanged
  (``MorfologikFilter`` keeps the original when lookup misses).
"""

from __future__ import annotations

from .analyzers import Analyzer, StandardAnalyzer, register_analyzer

# Lucene's Polish stop list ships inside the stempel jar; this is the
# usual function-word core (kept free of 'być' forms so lemmatization
# of the copula stays observable).
POLISH_STOP_WORDS = frozenset("""
w i na z ze do się nie że to o a jak po co tak za od u przy przez dla
lub oraz ale też także już tylko ten ta te tego tej tym gdy bo aby
""".split())

# ---------------------------------------------------------------------------
# stempel-role light stemmer
# ---------------------------------------------------------------------------

# longest-match endings; one strip per word, stem must keep >= 3 chars
_PL_SUFFIXES = tuple(sorted([
    # verb endings (infinitive, past, present)
    "owaliśmy", "owałem", "owałeś", "owali", "owała", "owało", "ować",
    "ujemy", "ujecie", "ujesz", "uje", "ują", "uję",
    "aliśmy", "ałyśmy", "ałem", "ałeś", "ali", "ała", "ało", "ały",
    "ał", "iłem", "iła", "iło", "ili", "iły", "ił",
    "imy", "icie", "isz", "ymy", "ycie", "ysz", "ić", "yć", "ąc",
    # adjective / participle endings
    "owego", "owemu", "owych", "owymi", "owym", "owej", "ową", "owe",
    "owa", "owy",
    "iego", "iemu", "ego", "emu", "ymi", "imi", "ych", "ich", "ej",
    "ym", "im",
    # noun case endings
    "ami", "ach", "owie", "owi", "iem", "em", "om", "ów",
    "ą", "ę", "y", "i", "u", "o", "a", "e",
], key=len, reverse=True))


def polish_light_stem(word: str) -> str:
    """Light Polish stemmer: strip the longest known case/verb ending
    once, keeping a stem of >= 3 characters."""
    for suf in _PL_SUFFIXES:
        if word.endswith(suf) and len(word) - len(suf) >= 3:
            return word[:-len(suf)]
    return word


# ---------------------------------------------------------------------------
# morfologik-role dictionary lemmatizer (seed lexicon)
# ---------------------------------------------------------------------------

def _expand(lemma: str, forms: str) -> dict[str, tuple[str, ...]]:
    return {f: (lemma,) for f in forms.split()}


_LEMMAS: dict[str, tuple[str, ...]] = {}
for lemma, forms in (
    ("być", "jest jestem jesteś są był była było byli były będzie"),
    ("mieć", "ma masz mają miał miała mieli miały"),
    ("dom", "domu domowi domem domy domów domach domami"),
    ("kot", "kota kotu kotem koty kotów kotach kotami"),
    ("książka", "książki książkę książce książek książkami książkach"),
    ("polski", "polska polskie polskiego polskiej polskich polskim polską"),
    ("miasto", "miasta mieście miastem miastach miastom"),
    ("woda", "wody wodę wodzie wodą wodach"),
    ("nowy", "nowa nowe nowego nowej nowych nowym nową"),
    ("widzieć", "widzi widzę widział widziała widzieli"),
    ("uczyć", "uczy uczę uczył uczyła uczymy uczycie"),
    ("iść", "idzie idę idziesz szedł szła szli"),
    ("czytać", "czyta czytam czytasz czytał czytała czytali czytają"),
    ("duży", "duża duże dużego dużej dużych dużym"),
):
    _LEMMAS.update(_expand(lemma, forms))
# ambiguous surface: 'mam' = mieć (have, 1sg pres) or mama (gen pl) —
# MorfologikFilter emits one token per interpretation
_LEMMAS["mam"] = ("mieć", "mama")


def lemmatize(word: str) -> tuple[str, ...]:
    """Lemma(s) for a lowercase surface form; ``(word,)`` when the
    dictionary misses (MorfologikFilter keeps the original)."""
    return _LEMMAS.get(word, (word,))


class PolishAnalyzer(Analyzer):
    """StandardTokenizer + lowercase + PL stop list + morfologik-style
    lemmas (mode='morfologik') or the stempel-role light stemmer
    (mode='stempel'). Ambiguous lemmas come out as posIncr-0 twins."""

    def __init__(self, mode: str = "morfologik"):
        assert mode in ("morfologik", "stempel")
        self.name = "polish" if mode == "morfologik" else "polish_light"
        self.mode = mode
        self.base = StandardAnalyzer(stop_words=frozenset())

    def tokens_with_positions(self, text: str):
        toks, pos = self.base.tokens_with_positions(text)
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(toks, pos):
            if t in POLISH_STOP_WORDS:
                continue
            if self.mode == "stempel":
                out_t.append(polish_light_stem(t))
                out_p.append(int(p))
            else:
                for lemma in lemmatize(t):
                    out_t.append(lemma)
                    out_p.append(int(p))
        return out_t, out_p

    def tokens(self, text: str) -> list[str]:
        return self.tokens_with_positions(text)[0]


register_analyzer("polish", PolishAnalyzer("morfologik"))
register_analyzer("polish_light", PolishAnalyzer("stempel"))
