"""Light stemmers + normalizers for non-Latin scripts (public published
algorithms; reference chains under ``lucene/analysis/common/src/java/org/
apache/lucene/analysis/``):

- Arabic: ``ar/ArabicNormalizer.java`` + ``ar/ArabicStemmer.java`` —
  Larkey/Ballesteros/Connell "light-10" stemming: orthographic
  normalization, one definite-article/conjunction prefix strip, then
  plural/feminine suffix strips.
- Persian: ``fa/PersianNormalizer.java`` — orthographic unification
  (Arabic kaf/yeh forms -> Farsi forms, heh variants); the reference
  chain deliberately has NO stemmer, only normalization + stop words.
- Czech: ``cz/CzechStemmer.java`` — light stemmer (Dolamic & Savoy):
  case-ending removal, possessive removal, final palatalization fold.
- Hindi: ``hi/HindiNormalizer.java`` + ``hi/HindiStemmer.java`` — light
  stemmer (Ramanathan & Rao): nukta/matraa normalization + one
  longest-suffix strip.

These are restatements of the published algorithm descriptions, not
ports of the Java sources; tests pin the documented behaviors.
"""

from __future__ import annotations

from .analyzers import Analyzer, StandardAnalyzer, register_analyzer

# ---------------------------------------------------------------------------
# Arabic
# ---------------------------------------------------------------------------

# tatweel + harakat (fathatan..sukun) + superscript alef are removed
_AR_DELETE = {0x0640, *range(0x064B, 0x0653), 0x0670}
_AR_MAP = {
    0x0622: "ا", 0x0623: "ا", 0x0625: "ا",  # hamza->alef
    0x0649: "ي",                                      # dotless->yeh
    0x0629: "ه",                                      # teh marbuta->heh
}
_AR_PREFIXES = ("ال", "وال",
                "بال", "كال",
                "فال", "لل", "و")
_AR_SUFFIXES = ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي")


def arabic_normalize(word: str) -> str:
    out = []
    for ch in word:
        o = ord(ch)
        if o in _AR_DELETE:
            continue
        out.append(_AR_MAP.get(o, ch))
    return "".join(out)


def arabic_stem(word: str) -> str:
    """Light-10: strip ONE article/conjunction prefix (keeping >= 2
    chars; the bare waw needs >= 3 remaining), then strip each suffix
    in list order while >= 2 chars remain."""
    w = arabic_normalize(word)
    for p in sorted(_AR_PREFIXES, key=len, reverse=True):
        keep = 3 if p == "و" else 2
        if w.startswith(p) and len(w) - len(p) >= keep:
            w = w[len(p):]
            break
    for s in _AR_SUFFIXES:
        if w.endswith(s) and len(w) - len(s) >= 2:
            w = w[: -len(s)]
    return w


ARABIC_STOP_WORDS = frozenset("""
من في على و ان الى هذا هذه ذلك تلك التي الذي كان كانت لم لن ما لا هو هي
هم عن مع او أو اذا إذا ثم بعد قبل عند كل بين حتى قد لقد كما فيه منها منه
ليس ولا وما وهو وهي نحن انت أنت انا أنا
""".split())

# ---------------------------------------------------------------------------
# Persian
# ---------------------------------------------------------------------------

_FA_MAP = {
    0x0643: "ک",   # arabic kaf -> farsi keheh
    0x064A: "ی",   # arabic yeh -> farsi yeh
    0x0649: "ی",   # dotless yeh -> farsi yeh
    0x06AA: "ک",   # swash kaf -> keheh
    0x0629: "ه",   # teh marbuta -> heh
    0x06C0: "ه",   # heh+hamza -> heh
    0x06CD: "ی",   # yeh with tail -> yeh
}
_FA_DELETE = {0x0640, *range(0x064B, 0x0653), 0x200C}  # +ZWNJ


def persian_normalize(word: str) -> str:
    out = []
    for ch in word:
        o = ord(ch)
        if o in _FA_DELETE:
            continue
        out.append(_FA_MAP.get(o, ch))
    return "".join(out)


PERSIAN_STOP_WORDS = frozenset("""
و در به از که این را با است برای آن یک خود تا بر ها من ما او هم نیز یا
اما اگر هر چه بود شد شده باشد های كه
""".split())

# ---------------------------------------------------------------------------
# Czech
# ---------------------------------------------------------------------------

_CS_CASE = tuple(sorted(
    """atech ětem etem atům ech ich ích ého ěmi emi ému ěte ete ěti eti
    iho ího ími imu ách ata aty ých ama ami ové ovi ými em es ém ím ům
    at ám os us ým mi ou a e i o u y á é í ý ě""".split(),
    key=len, reverse=True))
_CS_POSS = ("ov", "in", "ův")
_CS_PALATAL = [
    ("čt", "ck"), ("št", "sk"),
    ("c", "k"), ("č", "k"), ("z", "h"), ("ž", "h"),
]


def czech_stem(word: str) -> str:
    """Dolamic-Savoy light stemmer: drop the longest case ending while
    keeping >= 3 chars, drop a possessive suffix, fold the palatalized
    final consonant back."""
    w = word
    for suf in _CS_CASE:
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            w = w[: -len(suf)]
            break
    for suf in _CS_POSS:
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            w = w[: -len(suf)]
            break
    for pal, base in _CS_PALATAL:
        if w.endswith(pal):
            w = w[: -len(pal)] + base
            break
    return w


CZECH_STOP_WORDS = frozenset("""
a aby ale ani az až bez bude budem budes by byl byla byli bylo být co což
či další dnes do ho i jak jake jaké je jeho jej jejich jen jenž ještě ji
jako jsem jsme jsou jsi k kam kde kdo když ke která které který kteří ku
ma má mezi mi mít mně mnou muze může my na nad nam nám nas nás ne nebo
nejsou není nez než ni nic nove nové novy nový o od ode on ona oni ono
pak po pod podle pokud pouze prave právě pred před pres přes pri při pro
proc proč proto protoze protože prvni první s se si sve své svych svých
svym svým svymi svými ta tak take také takze takže tato te té tedy ten
tento teto této tim tím timto tímto to tohle toho tomto tomu tu tuto ty
tyto u uz už v vam vám vas vás ve vice více vsak však z za zde ze že
""".split())

# ---------------------------------------------------------------------------
# Hindi
# ---------------------------------------------------------------------------

# nukta decompositions fold to the base consonant; candrabindu->anusvara
_HI_MAP = {
    0x0929: "न", 0x0931: "र", 0x0934: "ळ",
    0x0958: "क", 0x0959: "ख", 0x095A: "ग",
    0x095B: "ज", 0x095C: "ड", 0x095D: "ढ",
    0x095E: "फ", 0x095F: "य",
    0x0901: "ं",                       # candrabindu -> anusvara
    0x0945: "े", 0x0949: "ो",     # candra e/o -> e/o
}
_HI_DELETE = {0x093C, 0x094D}               # nukta, virama

_HI_SUFFIXES = tuple(sorted(
    """ो े ू ु ी ि ा कर ाओ िए ाई ाए ने नी ना ते ीं ती ता ाँ ां ों ें
    ाकर ाइए ाईं ाया ेगी ेगा ोगी ोगे ाने ाना ाते ाती ाता तीं ाओं ाएं
    ुओं ुएं ुआं""".split(),
    key=len, reverse=True))


def hindi_normalize(word: str) -> str:
    out = []
    for ch in word:
        o = ord(ch)
        if o in _HI_DELETE:
            continue
        out.append(_HI_MAP.get(o, ch))
    return "".join(out)


def hindi_stem(word: str) -> str:
    """Ramanathan-Rao light stemmer: one longest matraa/suffix strip,
    keeping at least one more char than the suffix length."""
    w = hindi_normalize(word)
    for suf in _HI_SUFFIXES:
        if w.endswith(suf) and len(w) > len(suf) + 1:
            return w[: -len(suf)]
    return w


HINDI_STOP_WORDS = frozenset("""
के का एक में की है यह और से हैं को पर इस होता कि जो कर मे गया करने किया
लिये अपने ने बनी नहीं तो ही या एवं दिया हो इसका था द्वारा हुआ तक साथ
करना वाले बाद लिए आप कुछ सकते किसी ये इसके सबसे इसमें थे दो होने वह वे
करते बहुत कहा वर्ग कई करें होती अपनी उनके थी यदि हुई जा ना इसे कहते जब
होते कोई हुए व जैसे सभी करता उनकी तरह उस आदि इसकी
""".split())


# ---------------------------------------------------------------------------
# Analyzer registration (StemmingAnalyzer shape from snowball.py)
# ---------------------------------------------------------------------------

def _make(name, stop, stem_fn):
    from .snowball import StemmingAnalyzer

    return StemmingAnalyzer(name, stop, stem_fn)


def arabic_analyzer(**kw) -> Analyzer:
    from .snowball import StemmingAnalyzer

    return StemmingAnalyzer("arabic", ARABIC_STOP_WORDS, arabic_stem, **kw)


def persian_analyzer(**kw) -> Analyzer:
    from .snowball import StemmingAnalyzer

    return StemmingAnalyzer("persian", PERSIAN_STOP_WORDS,
                            persian_normalize, **kw)


def czech_analyzer(**kw) -> Analyzer:
    from .snowball import StemmingAnalyzer

    return StemmingAnalyzer("czech", CZECH_STOP_WORDS, czech_stem, **kw)


def hindi_analyzer(**kw) -> Analyzer:
    from .snowball import StemmingAnalyzer

    return StemmingAnalyzer("hindi", HINDI_STOP_WORDS, hindi_stem, **kw)


register_analyzer("arabic", arabic_analyzer())
register_analyzer("persian", persian_analyzer())
register_analyzer("czech", czech_analyzer())
register_analyzer("hindi", hindi_analyzer())
