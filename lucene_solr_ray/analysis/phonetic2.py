"""The full phonetic-encoder family behind Solr's PhoneticFilterFactory.

Restates ``lucene/analysis/phonetic/`` beyond the Soundex already in
:mod:`.phonetic`:

- ``PhoneticFilterFactory`` (``solr/core`` SPI) registers the
  commons-codec encoders by name: Metaphone, DoubleMetaphone, Soundex,
  RefinedSoundex, Caverphone2, ColognePhonetic, Nysiis.  Each is a pure
  per-token string function here, so phonetic indexing stays an
  ordinary ``map_batches`` analyzer chain.
- ``DoubleMetaphoneFilter.java:40`` is the dedicated filter that emits
  BOTH the primary and alternate code (posIncr-0 twins); encoders here
  may therefore return a tuple of codes and the analyzer injects each.
- ``DaitchMokotoffSoundexFilter.java:43`` branches: one input token can
  yield several 6-digit codes (the D-M table has alternate codings for
  ambiguous clusters like CH/RS/J); same tuple protocol.
- BeiderMorse (``BeiderMorseFilter.java``) is scoped out: its language
  rule resources are several thousand lines of data files; the D-M
  encoder covers the same Eastern-European-surname matching niche.

All algorithms below are the published public ones (Philips 1990 /
Philips 2000, Hood 2004 Caverphone 2.0, Postel 1969 Kölner Phonetik,
Taft 1970 NYSIIS, the Daitch-Mokotoff 1985 coding table).
"""

from __future__ import annotations

from .analyzers import Analyzer, StandardAnalyzer, register_analyzer

_VOWELS = frozenset("AEIOU")


def _letters(word: str) -> str:
    return "".join(c for c in word.upper() if "A" <= c <= "Z")


# ---------------------------------------------------------------------------
# Metaphone (Lawrence Philips, Computer Language 7(12), 1990) — the
# commons-codec ``Metaphone`` encoder with its default maxCodeLen=4.
# ---------------------------------------------------------------------------

_MET_VOWELS = "AEIOU"


def metaphone(word: str, max_code_len: int = 4) -> str:
    """Classic Metaphone. Vectors (commons-codec MetaphoneTest):
    testing->TSTN, The->0, quick->KK, brown->BRN, fox->FKS,
    jumped->JMPT, over->OFR, lazy->LS, dogs->TKS."""
    w = _letters(word)
    if not w:
        return ""
    if len(w) == 1:
        return w

    # initial-cluster exceptions
    first2 = w[:2]
    if first2 in ("AE", "GN", "KN", "PN", "WR"):
        w = w[1:]
    elif w[0] == "X":
        w = "S" + w[1:]
    elif first2 == "WH":
        w = "W" + w[2:]

    n = len(w)
    out: list[str] = []
    i = 0

    def ch(k: int) -> str:
        # "\0" sentinel: `"" in "AEIOU"` is True (empty substring), so
        # out-of-range lookups must return a never-matching char.
        return w[k] if 0 <= k < n else "\0"

    while i < n and len(out) < max_code_len:
        c = w[i]
        # drop duplicate adjacent letters except C
        if c != "C" and i > 0 and ch(i - 1) == c:
            i += 1
            continue
        if c in _MET_VOWELS:
            if i == 0:
                out.append(c)
        elif c == "B":
            if not (i == n - 1 and ch(i - 1) == "M"):
                out.append("B")
        elif c == "C":
            if ch(i + 1) == "I" and ch(i + 2) == "A":        # CIA -> X
                out.append("X")
            elif ch(i + 1) == "H":
                if i > 0 and ch(i - 1) == "S":                # SCH -> K
                    out.append("K")
                else:
                    out.append("X")
            elif ch(i + 1) in "IEY":                          # CI/CE/CY -> S
                out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if ch(i + 1) == "G" and ch(i + 2) in "EIY":       # DGE -> J
                out.append("J")
                i += 2
            else:
                out.append("T")
        elif c == "G":
            silent = False
            if ch(i + 1) == "H":
                # GH silent unless at end or before a vowel
                if not (i + 2 >= n or ch(i + 2) in _MET_VOWELS):
                    silent = True
            if ch(i + 1) == "N":                              # GN, GNED
                silent = True
            if not silent:
                if ch(i + 1) in "EIY":
                    out.append("J")
                else:
                    out.append("K")
            if ch(i + 1) == "H":
                i += 1
        elif c == "H":
            # silent after vowel when no vowel follows
            if i > 0 and ch(i - 1) in _MET_VOWELS and ch(i + 1) not in _MET_VOWELS:
                pass
            elif i > 0 and ch(i - 1) in "CSPTG":
                pass  # consumed by the digraph rules above
            else:
                out.append("H")
        elif c == "K":
            if not (i > 0 and ch(i - 1) == "C"):              # CK -> K once
                out.append("K")
        elif c in "FJLMNR":
            out.append(c)
        elif c == "P":
            if ch(i + 1) == "H":
                out.append("F")
                i += 1
            else:
                out.append("P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if ch(i + 1) == "H":
                out.append("X")
                i += 1
            elif ch(i + 1) == "I" and ch(i + 2) in "OA":      # SIO/SIA -> X
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if ch(i + 1) == "H":
                out.append("0")
                i += 1
            elif ch(i + 1) == "I" and ch(i + 2) in "OA":      # TIO/TIA -> X
                out.append("X")
            elif ch(i + 1) == "C" and ch(i + 2) == "H":       # TCH: T silent
                pass
            else:
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c == "W":
            if ch(i + 1) in _MET_VOWELS:
                out.append("W")
        elif c == "X":
            if len(out) < max_code_len:
                out.append("K")
            if len(out) < max_code_len:
                out.append("S")
        elif c == "Y":
            if ch(i + 1) in _MET_VOWELS:
                out.append("Y")
        elif c == "Z":
            out.append("S")
        i += 1

    return "".join(out[:max_code_len])


# ---------------------------------------------------------------------------
# Refined Soundex (commons-codec ``RefinedSoundex.US_ENGLISH``):
# per-letter digit table, first letter kept, adjacent duplicate codes
# collapse, no length cap, vowels keep their 0 code.
# ---------------------------------------------------------------------------

_REFINED = dict(zip("ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01360240043788015936020505"))


def refined_soundex(word: str) -> str:
    """Vector: testing -> T6036084."""
    w = _letters(word)
    if not w:
        return ""
    out = [w[0]]
    last = None
    for c in w:
        code = _REFINED[c]
        if code != last:
            out.append(code)
            last = code
    return "".join(out)


# ---------------------------------------------------------------------------
# Caverphone 2.0 (David Hood, University of Otago, 2004) — the ordered
# replacement cascade from the published revision, 10-char codes padded
# with '1'.
# ---------------------------------------------------------------------------

def caverphone2(word: str) -> str:
    """Vectors from the Caverphone 2.0 paper: Peter -> PTA1111111,
    Stevenson -> STFNSN1111."""
    w = "".join(c for c in word.lower() if "a" <= c <= "z")
    if not w:
        return ""
    if w.endswith("e"):
        w = w[:-1]
    if not w:  # the word was just "e": all-padding code
        return "1" * 10
    for pre, rep in (("cough", "cou2f"), ("rough", "rou2f"),
                     ("tough", "tou2f"), ("enough", "enou2f"),
                     ("trough", "trou2f"), ("gn", "2n")):
        if w.startswith(pre):
            w = rep + w[len(pre):]
    if w.endswith("mb"):
        w = w[:-2] + "m2"
    for a, b in (("cq", "2q"), ("ci", "si"), ("ce", "se"), ("cy", "sy"),
                 ("tch", "2ch"), ("c", "k"), ("q", "k"), ("x", "k"),
                 ("v", "f"), ("dg", "2g"), ("tio", "sio"), ("tia", "sia"),
                 ("d", "t"), ("ph", "fh"), ("b", "p"), ("sh", "s2"),
                 ("z", "s")):
        w = w.replace(a, b)
    if w[0] in "aeiou":
        w = "A" + w[1:]
    w = "".join("3" if c in "aeiou" else c for c in w)
    w = w.replace("j", "y")
    if w.startswith("y3"):
        w = "Y3" + w[2:]
    elif w.startswith("y"):
        w = "A" + w[1:]
    w = w.replace("y", "3")
    w = w.replace("3gh3", "3kh3")
    w = w.replace("gh", "22")
    w = w.replace("g", "k")
    for c in "stpkfmn":
        while c + c in w:
            w = w.replace(c + c, c)
        w = w.replace(c, c.upper())
    w = w.replace("w3", "W3")
    w = w.replace("wh3", "Wh3")
    if w.endswith("w"):
        w = w[:-1] + "3"
    w = w.replace("w", "2")
    if w.startswith("h"):
        w = "A" + w[1:]
    w = w.replace("h", "2")
    w = w.replace("r3", "R3")
    if w.endswith("r"):
        w = w[:-1] + "3"
    w = w.replace("r", "2")
    w = w.replace("l3", "L3")
    if w.endswith("l"):
        w = w[:-1] + "3"
    w = w.replace("l", "2")
    w = w.replace("2", "")
    if w.endswith("3"):
        w = w[:-1] + "A"
    w = w.replace("3", "")
    return (w + "1" * 10)[:10]


# ---------------------------------------------------------------------------
# Kölner Phonetik (Hans Joachim Postel, 1969) — the German-tuned code
# behind commons-codec ``ColognePhonetic``. Context-sensitive digit
# table, adjacent duplicates collapse, inner zeros drop.
# ---------------------------------------------------------------------------

def cologne_phonetic(word: str) -> str:
    """Vectors (published Kölner Phonetik examples):
    Breschnew -> 17863, Wikipedia -> 3412,
    Mueller-Luedenscheidt -> 65752682."""
    # fold the German letters commons-codec preprocesses
    s = word.upper()
    for a, b in (("Ä", "A"), ("Ö", "O"), ("Ü", "U"),
                 ("ß", "SS")):
        s = s.replace(a, b)
    w = "".join(c for c in s if "A" <= c <= "Z")
    if not w:
        return ""
    n = len(w)
    digits: list[str] = []
    for i, c in enumerate(w):
        prev = w[i - 1] if i > 0 else "\0"
        nxt = w[i + 1] if i + 1 < n else "\0"
        if c in "AEIOUJY":
            d = "0"
        elif c == "H":
            d = ""          # H is ignored
        elif c == "B":
            d = "1"
        elif c == "P":
            d = "3" if nxt == "H" else "1"
        elif c in "DT":
            d = "8" if nxt in "CSZ" else "2"
        elif c in "FVW":
            d = "3"
        elif c in "GKQ":
            d = "4"
        elif c == "C":
            if i == 0:
                d = "4" if nxt in "AHKLOQRUX" else "8"
            elif prev in "SZ":
                d = "8"
            else:
                d = "4" if nxt in "AHKOQUX" else "8"
        elif c == "X":
            d = "8" if prev in "CKQ" else "48"
        elif c == "L":
            d = "5"
        elif c in "MN":
            d = "6"
        elif c == "R":
            d = "7"
        elif c in "SZ":
            d = "8"
        else:
            d = ""
        digits.append(d)
    raw = "".join(digits)
    # collapse adjacent duplicates, then drop non-leading zeros
    out: list[str] = []
    last = ""
    for d in raw:
        if d != last:
            out.append(d)
        last = d
    code = "".join(out)
    if not code:
        return ""
    return code[0] + code[1:].replace("0", "")


# ---------------------------------------------------------------------------
# NYSIIS (Robert L. Taft, New York State Identification and
# Intelligence System, 1970). commons-codec strict mode: 6-char cap.
# ---------------------------------------------------------------------------

def nysiis(word: str, strict: bool = True) -> str:
    """Vectors (NYSIIS spec trace): KNIGHT -> NAGT, MACINTOSH -> MCANT,
    PHILLIPSON -> FALAPS (strict)."""
    w = _letters(word)
    if not w:
        return ""
    # 1. initial translations
    if w.startswith("MAC"):
        w = "MCC" + w[3:]
    elif w.startswith("KN"):
        w = "NN" + w[2:]
    elif w.startswith("K"):
        w = "C" + w[1:]
    elif w.startswith(("PH", "PF")):
        w = "FF" + w[2:]
    elif w.startswith("SCH"):
        w = "SSS" + w[3:]
    # 2. final translations
    if w.endswith(("EE", "IE")):
        w = w[:-2] + "Y"
    elif w.endswith(("DT", "RT", "RD", "NT", "ND")):
        w = w[:-2] + "D"
    key = [w[0]]
    i = 1
    n = len(w)
    while i < n:
        c = w[i]
        rep: str
        if w[i:i + 2] == "EV":
            rep = "AF"
            i += 2
        elif c in "AEIOU":
            rep = "A"
            i += 1
        elif c == "Q":
            rep = "G"
            i += 1
        elif c == "Z":
            rep = "S"
            i += 1
        elif c == "M":
            rep = "N"
            i += 1
        elif w[i:i + 2] == "KN":
            rep = "N"
            i += 2
        elif c == "K":
            rep = "C"
            i += 1
        elif w[i:i + 3] == "SCH":
            rep = "SSS"
            i += 3
        elif w[i:i + 2] == "PH":
            rep = "FF"
            i += 2
        elif c == "H" and (w[i - 1] not in "AEIOU"
                           or (i + 1 < n and w[i + 1] not in "AEIOU")):
            rep = w[i - 1]
            i += 1
        elif c == "W" and w[i - 1] in "AEIOU":
            rep = w[i - 1]
            i += 1
        else:
            rep = c
            i += 1
        for r in rep:
            if r != key[-1]:
                key.append(r)
    # 3. trailing cleanup
    if key[-1] == "S" and len(key) > 1:
        key.pop()
    if len(key) >= 2 and key[-2:] == ["A", "Y"]:
        key[-2:] = ["Y"]
    if key[-1] == "A" and len(key) > 1:
        key.pop()
    out = "".join(key)
    return out[:6] if strict else out


# ---------------------------------------------------------------------------
# Double Metaphone (Lawrence Philips, C/C++ Users Journal 18(6), 2000)
# -- the encoder behind ``DoubleMetaphoneFilter.java``: a primary and
# an alternate 4-char code per token. Clean-room restatement of the
# published rule set.
# ---------------------------------------------------------------------------

_DM_VOWELS = "AEIOUY"


def double_metaphone(value: str, max_len: int = 4) -> tuple[str, str]:
    """Returns (primary, alternate). Vectors (commons-codec
    DoubleMetaphoneTest): Smith -> SM0/XMT, schmidt -> XMT/SMT,
    snider -> SNTR/XNTR, Williams -> ALMS/FLMS."""
    w = "".join(c for c in value.upper() if ("A" <= c <= "Z") or c == " ")
    length = len(w)
    if length == 0:
        return "", ""
    last = length - 1
    pri: list[str] = []
    sec: list[str] = []

    def add(p: str, s: str | None = None) -> None:
        pri.append(p)
        sec.append(p if s is None else s)

    def at(k: int) -> str:
        # "\0" sentinel — see metaphone(): "" is a substring of every
        # class string, so it must never be the out-of-range value.
        return w[k] if 0 <= k < length else "\0"

    def sm(start: int, ln: int, *opts: str) -> bool:
        if start < 0:
            return False
        return w[start:start + ln] in opts

    def vowel(k: int) -> bool:
        return at(k) in _DM_VOWELS

    def done() -> bool:
        return len("".join(pri)) >= max_len and len("".join(sec)) >= max_len

    sg = ("W" in w) or ("K" in w) or ("CZ" in w) or ("WITZ" in w)
    i = 0
    if w[:2] in ("GN", "KN", "PN", "WR", "PS"):
        i = 1
    if at(0) == "X":
        add("S")
        i = 1

    while i < length and not done():
        c = at(i)
        if c in _DM_VOWELS:
            if i == 0:
                add("A")
            i += 1
        elif c == "B":
            add("P")
            i += 2 if at(i + 1) == "B" else 1
        elif c == "C":
            if (i > 1 and not vowel(i - 2) and sm(i - 1, 3, "ACH")
                    and at(i + 2) != "I"
                    and (at(i + 2) != "E" or sm(i - 2, 6, "BACHER", "MACHER"))):
                add("K")
                i += 2
            elif i == 0 and sm(i, 6, "CAESAR"):
                add("S")
                i += 2
            elif sm(i, 4, "CHIA"):
                add("K")
                i += 2
            elif sm(i, 2, "CH"):
                if i > 0 and sm(i, 4, "CHAE"):
                    add("K", "X")
                elif (i == 0
                      and (sm(i + 1, 5, "HARAC", "HARIS")
                           or sm(i + 1, 3, "HOR", "HYM", "HIA", "HEM"))
                      and not sm(0, 5, "CHORE")):
                    add("K")
                elif (sm(0, 4, "VAN ", "VON ") or sm(0, 3, "SCH")
                      or sm(i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                      or at(i + 2) in ("T", "S")
                      or ((at(i - 1) in "AOUE" or i == 0)
                          and (at(i + 2) in "LRNMBHFVW " or i + 2 >= length))):
                    add("K")
                else:
                    if i > 0:
                        if sm(0, 2, "MC"):
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                i += 2
            elif sm(i, 2, "CZ") and not sm(i - 2, 4, "WICZ"):
                add("S", "X")
                i += 2
            elif sm(i + 1, 3, "CIA"):
                add("X")
                i += 3
            elif sm(i, 2, "CC") and not (i == 1 and at(0) == "M"):
                if at(i + 2) in "IEH" and not sm(i + 2, 2, "HU"):
                    if ((i == 1 and at(i - 1) == "A")
                            or sm(i - 1, 5, "UCCEE", "UCCES")):
                        add("KS")
                    else:
                        add("X")
                    i += 3
                else:
                    add("K")
                    i += 2
            elif sm(i, 2, "CK", "CG", "CQ"):
                add("K")
                i += 2
            elif sm(i, 2, "CI", "CE", "CY"):
                if sm(i, 3, "CIO", "CIE", "CIA"):
                    add("S", "X")
                else:
                    add("S")
                i += 2
            else:
                add("K")
                if sm(i + 1, 2, " C", " Q", " G"):
                    i += 3
                elif at(i + 1) in "CKQ" and not sm(i + 1, 2, "CE", "CI"):
                    i += 2
                else:
                    i += 1
        elif c == "D":
            if sm(i, 2, "DG"):
                if at(i + 2) in "IEY":
                    add("J")
                    i += 3
                else:
                    add("TK")
                    i += 2
            elif sm(i, 2, "DT", "DD"):
                add("T")
                i += 2
            else:
                add("T")
                i += 1
        elif c == "F":
            add("F")
            i += 2 if at(i + 1) == "F" else 1
        elif c == "G":
            if at(i + 1) == "H":
                if i > 0 and not vowel(i - 1):
                    add("K")
                elif i == 0:
                    add("J" if at(i + 2) == "I" else "K")
                elif ((i > 1 and at(i - 2) in "BHD")
                      or (i > 2 and at(i - 3) in "BHD")
                      or (i > 3 and at(i - 4) in "BH")):
                    pass  # silent: -hugh-, -bough-, etc.
                else:
                    if i > 2 and at(i - 1) == "U" and at(i - 3) in "CGLRT":
                        add("F")  # laugh, cough
                    elif i > 0 and at(i - 1) != "I":
                        add("K")
                i += 2
            elif at(i + 1) == "N":
                if i == 1 and vowel(0) and not sg:
                    add("KN", "N")
                elif not sm(i + 2, 2, "EY") and at(i + 1) != "Y" and not sg:
                    add("N", "KN")
                else:
                    add("KN")
                i += 2
            elif sm(i + 1, 2, "LI") and not sg:
                add("KL", "L")
                i += 2
            elif i == 0 and (at(i + 1) == "Y"
                             or sm(i + 1, 2, "ES", "EP", "EB", "EL", "EY",
                                   "IB", "IL", "IN", "IE", "EI", "ER")):
                add("K", "J")
                i += 2
            elif ((sm(i + 1, 2, "ER") or at(i + 1) == "Y")
                  and not sm(0, 6, "DANGER", "RANGER", "MANGER")
                  and at(i - 1) not in "EI"
                  and not sm(i - 1, 3, "RGY", "OGY")):
                add("K", "J")
                i += 2
            elif at(i + 1) in "EIY" or sm(i - 1, 4, "AGGI", "OGGI"):
                if (sm(0, 4, "VAN ", "VON ") or sm(0, 3, "SCH")
                        or sm(i + 1, 2, "ET")):
                    add("K")
                elif sm(i + 1, 3, "IER") and i + 4 >= length:
                    add("J")
                else:
                    add("J", "K")
                i += 2
            else:
                add("K")
                i += 2 if at(i + 1) == "G" else 1
        elif c == "H":
            if (i == 0 or vowel(i - 1)) and vowel(i + 1):
                add("H")
                i += 2
            else:
                i += 1
        elif c == "J":
            if sm(i, 4, "JOSE") or sm(0, 4, "SAN "):
                if ((i == 0 and at(i + 4) == " ")
                        or (i == 0 and length == 4 and sm(0, 4, "JOSE"))
                        or sm(0, 4, "SAN ")):
                    add("H")
                else:
                    add("J", "H")
            elif i == 0:
                add("J", "A")
            elif (vowel(i - 1) and not sg and at(i + 1) in "AO"):
                add("J", "H")
            elif i == last:
                add("J", "")
            elif (at(i + 1) not in "LTKSNMBZ" and at(i - 1) not in "SKL"):
                add("J")
            i += 2 if at(i + 1) == "J" else 1
        elif c == "K":
            add("K")
            i += 2 if at(i + 1) == "K" else 1
        elif c == "L":
            if at(i + 1) == "L":
                if ((i == length - 3 and sm(i - 1, 4, "ILLO", "ILLA", "ALLE"))
                        or ((sm(last - 1, 2, "AS", "OS") or at(last) in "AO")
                            and sm(i - 1, 4, "ALLE"))):
                    add("L", "")
                else:
                    add("L")
                i += 2
            else:
                add("L")
                i += 1
        elif c == "M":
            add("M")
            if ((sm(i - 1, 3, "UMB")
                 and (i + 1 == last or sm(i + 2, 2, "ER")))
                    or at(i + 1) == "M"):
                i += 2
            else:
                i += 1
        elif c == "N":
            add("N")
            i += 2 if at(i + 1) == "N" else 1
        elif c == "P":
            if at(i + 1) == "H":
                add("F")
                i += 2
            else:
                add("P")
                i += 2 if at(i + 1) in "PB" else 1
        elif c == "Q":
            add("K")
            i += 2 if at(i + 1) == "Q" else 1
        elif c == "R":
            if (i == last and not sg and sm(i - 2, 2, "IE")
                    and not sm(i - 4, 2, "ME", "MA")):
                add("", "R")
            else:
                add("R")
            i += 2 if at(i + 1) == "R" else 1
        elif c == "S":
            if sm(i - 1, 3, "ISL", "YSL"):
                i += 1
            elif i == 0 and sm(i, 5, "SUGAR"):
                add("X", "S")
                i += 1
            elif sm(i, 2, "SH"):
                if sm(i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")
                else:
                    add("X")
                i += 2
            elif sm(i, 3, "SIO", "SIA") or sm(i, 4, "SIAN"):
                if not sg:
                    add("S", "X")
                else:
                    add("S")
                i += 3
            elif (i == 0 and at(i + 1) in "MNLW") or at(i + 1) == "Z":
                add("S", "X")
                i += 2 if at(i + 1) == "Z" else 1
            elif sm(i, 2, "SC"):
                if at(i + 2) == "H":
                    if sm(i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
                        if sm(i + 3, 2, "ER", "EN"):
                            add("X", "SK")
                        else:
                            add("SK")
                    else:
                        if i == 0 and not vowel(3) and at(3) != "W":
                            add("X", "S")
                        else:
                            add("X")
                    i += 3
                elif at(i + 2) in "IEY":
                    add("S")
                    i += 3
                else:
                    add("SK")
                    i += 3
            else:
                if i == last and sm(i - 2, 2, "AI", "OI"):
                    add("", "S")
                else:
                    add("S")
                i += 2 if at(i + 1) in "SZ" else 1
        elif c == "T":
            if sm(i, 4, "TION"):
                add("X")
                i += 3
            elif sm(i, 3, "TIA", "TCH"):
                add("X")
                i += 3
            elif sm(i, 2, "TH") or sm(i, 3, "TTH"):
                if (sm(i + 2, 2, "OM", "AM") or sm(0, 4, "VAN ", "VON ")
                        or sm(0, 3, "SCH")):
                    add("T")
                else:
                    add("0", "T")
                i += 2
            else:
                add("T")
                i += 2 if at(i + 1) in "TD" else 1
        elif c == "V":
            add("F")
            i += 2 if at(i + 1) == "V" else 1
        elif c == "W":
            if sm(i, 2, "WR"):
                add("R")
                i += 2
            elif i == 0 and (vowel(i + 1) or sm(i, 2, "WH")):
                if vowel(i + 1):
                    add("A", "F")
                else:
                    add("A")
                i += 1
            elif ((i == last and vowel(i - 1))
                  or sm(i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
                  or sm(0, 3, "SCH")):
                add("", "F")
                i += 1
            elif sm(i, 4, "WICZ", "WITZ"):
                add("TS", "FX")
                i += 4
            else:
                i += 1
        elif c == "X":
            if not (i == last
                    and (sm(i - 3, 3, "IAU", "EAU")
                         or sm(i - 2, 2, "AU", "OU"))):
                add("KS")
            i += 2 if at(i + 1) in "CX" else 1
        elif c == "Z":
            if at(i + 1) == "H":
                add("J")
                i += 2
            else:
                if (sm(i + 1, 2, "ZO", "ZI", "ZA")
                        or (sg and i > 0 and at(i - 1) != "T")):
                    add("S", "TS")
                else:
                    add("S")
                i += 2 if at(i + 1) == "Z" else 1
        else:
            i += 1

    return "".join(pri)[:max_len], "".join(sec)[:max_len]


def double_metaphone_codes(word: str) -> tuple[str, ...]:
    """Both codes, deduplicated — what DoubleMetaphoneFilter emits."""
    p, s = double_metaphone(word)
    if not p:
        return ()
    return (p,) if s in ("", p) else (p, s)


# ---------------------------------------------------------------------------
# Daitch-Mokotoff Soundex (Daitch & Mokotoff, 1985; the Avotaynu
# standard) — the encoder behind ``DaitchMokotoffSoundexFilter.java``.
# Greedy longest-match over the published letter-group table; three
# context codes per group (word start / before a vowel / otherwise,
# None = not coded); ambiguous clusters branch into alternate codes.
# Uncoded vowels still break the adjacent-duplicate collapse (the
# standard: same codes separated by a vowel are coded separately).
# ---------------------------------------------------------------------------

# (start, before_vowel, other); a tuple-of-tuples value means branch.
_DM_TABLE: dict[str, tuple] = {
    "SCHTSCH": ("2", "4", "4"), "SCHTSH": ("2", "4", "4"),
    "SCHTCH": ("2", "4", "4"),
    "SHTCH": ("2", "4", "4"), "SHTSH": ("2", "4", "4"),
    "SHCH": ("2", "4", "4"), "STSCH": ("2", "4", "4"),
    "STRZ": ("2", "4", "4"), "STRS": ("2", "4", "4"),
    "STSH": ("2", "4", "4"), "SZCZ": ("2", "4", "4"),
    "SZCS": ("2", "4", "4"),
    "SCHT": ("2", "43", "43"), "SCHD": ("2", "43", "43"),
    "SHT": ("2", "43", "43"), "SZT": ("2", "43", "43"),
    "SHD": ("2", "43", "43"), "SZD": ("2", "43", "43"),
    "STCH": ("2", "4", "4"), "SC": ("2", "4", "4"),
    "SCH": ("4", "4", "4"), "SH": ("4", "4", "4"),
    "ST": ("2", "43", "43"), "SD": ("2", "43", "43"),
    "SZ": ("4", "4", "4"), "S": ("4", "4", "4"),
    "ZDZH": ("2", "4", "4"), "ZHDZH": ("2", "4", "4"),
    "ZDZ": ("2", "4", "4"),
    "ZHD": ("2", "43", "43"), "ZD": ("2", "43", "43"),
    "ZSCH": ("4", "4", "4"), "ZSH": ("4", "4", "4"),
    "ZH": ("4", "4", "4"), "ZS": ("4", "4", "4"), "Z": ("4", "4", "4"),
    "CHS": ("5", "54", "54"),
    "CH": (("5", "5", "5"), ("4", "4", "4")),
    "CK": (("5", "5", "5"), ("45", "45", "45")),
    "CZS": ("4", "4", "4"), "CSZ": ("4", "4", "4"),
    "CZ": ("4", "4", "4"), "CS": ("4", "4", "4"),
    "C": (("5", "5", "5"), ("4", "4", "4")),
    "DRZ": ("4", "4", "4"), "DRS": ("4", "4", "4"),
    "DSH": ("4", "4", "4"), "DSZ": ("4", "4", "4"),
    "DZH": ("4", "4", "4"), "DZS": ("4", "4", "4"),
    "DS": ("4", "4", "4"), "DZ": ("4", "4", "4"),
    "DT": ("3", "3", "3"), "D": ("3", "3", "3"),
    "AI": ("0", "1", None), "AJ": ("0", "1", None),
    "AY": ("0", "1", None), "AU": ("0", "7", None),
    "A": ("0", None, None),
    "EI": ("0", "1", None), "EJ": ("0", "1", None),
    "EY": ("0", "1", None), "EU": ("1", "1", None),
    "E": ("0", None, None),
    "OI": ("0", "1", None), "OJ": ("0", "1", None),
    "OY": ("0", "1", None), "O": ("0", None, None),
    "UI": ("0", "1", None), "UJ": ("0", "1", None),
    "UY": ("0", "1", None), "UE": ("0", None, None),
    "U": ("0", None, None),
    "IA": ("1", None, None), "IE": ("1", None, None),
    "IO": ("1", None, None), "IU": ("1", None, None),
    "I": ("0", None, None),
    "Y": ("1", None, None),
    "J": (("1", None, None), ("4", "4", "4")),
    "FB": ("7", "7", "7"), "F": ("7", "7", "7"),
    "B": ("7", "7", "7"), "PH": ("7", "7", "7"), "PF": ("7", "7", "7"),
    "P": ("7", "7", "7"), "V": ("7", "7", "7"), "W": ("7", "7", "7"),
    "G": ("5", "5", "5"), "KS": ("5", "54", "54"), "K": ("5", "5", "5"),
    "Q": ("5", "5", "5"), "X": ("5", "54", "54"),
    "H": ("5", "5", None),
    "L": ("8", "8", "8"),
    "MN": (None, "66", "66"), "NM": (None, "66", "66"),
    "M": ("6", "6", "6"), "N": ("6", "6", "6"),
    "RZ": (("94", "94", "94"), ("4", "4", "4")),
    "RS": (("94", "94", "94"), ("4", "4", "4")),
    "R": ("9", "9", "9"),
    "TCH": ("4", "4", "4"), "TTCH": ("4", "4", "4"),
    "TTSCH": ("4", "4", "4"), "TH": ("3", "3", "3"),
    "TRZ": ("4", "4", "4"), "TRS": ("4", "4", "4"),
    "TSCH": ("4", "4", "4"), "TSH": ("4", "4", "4"),
    "TTS": ("4", "4", "4"), "TTSZ": ("4", "4", "4"),
    "TC": ("4", "4", "4"), "TZ": ("4", "4", "4"),
    "TTZ": ("4", "4", "4"), "TZS": ("4", "4", "4"),
    "TSZ": ("4", "4", "4"), "TS": ("4", "4", "4"),
    "T": ("3", "3", "3"),
}

_DM_MAXPAT = max(len(k) for k in _DM_TABLE)
_DM_VOWSET = frozenset("AEIOUJY")
_DM_SEP = object()  # vowel separator: breaks duplicate collapse


def daitch_mokotoff(word: str, max_codes: int = 16) -> tuple[str, ...]:
    """All 6-digit D-M codes (sorted, deduped). Standard's own
    examples: GOLDEN -> 583600, PETERS -> {739400, 734000},
    MOSKOWITZ -> 645740, AUERBACH -> {097400, 097500}."""
    w = _letters(word)
    if not w:
        return ()
    n = len(w)
    # greedy longest-match segmentation (deterministic, shared by all
    # branches; only the code per group branches)
    groups: list[tuple] = []  # (rule_value, context_index) or _DM_SEP
    i = 0
    while i < n:
        for ln in range(min(_DM_MAXPAT, n - i), 0, -1):
            pat = w[i:i + ln]
            if pat in _DM_TABLE:
                nxt = w[i + ln] if i + ln < n else ""
                ctx = 0 if i == 0 else (1 if nxt in _DM_VOWSET else 2)
                val = _DM_TABLE[pat]
                branches = val if isinstance(val[0], tuple) else (val,)
                codes = tuple(b[ctx] for b in branches)
                if all(c is None for c in codes):
                    if pat[0] in _DM_VOWSET:
                        groups.append(_DM_SEP)
                else:
                    groups.append(codes)
                i += ln
                break
        else:  # non-letter can't happen post-_letters; safety
            i += 1
    # DFS over branch choices, collapsing adjacent duplicates
    results: set[str] = set()

    def rec(gi: int, acc: list[str], last: str | None) -> None:
        if len(results) >= max_codes:
            return
        if gi == len(groups) or len("".join(acc)) >= 6:
            code = "".join(acc)[:6]
            results.add((code + "000000")[:6])
            return
        g = groups[gi]
        if g is _DM_SEP:
            rec(gi + 1, acc, None)  # vowel: duplicate run broken
            return
        for choice in g:
            if choice is None:
                rec(gi + 1, acc, last)
            elif choice == last:
                rec(gi + 1, acc, choice)
            else:
                rec(gi + 1, acc + [choice], choice)

    rec(0, [], None)
    return tuple(sorted(results))


# ---------------------------------------------------------------------------
# Analyzer plumbing: multi-code injection (DoubleMetaphoneFilter /
# DaitchMokotoffSoundexFilter semantics — every code is a posIncr-0
# twin of the original token).
# ---------------------------------------------------------------------------

_ENCODERS = {
    "metaphone": lambda t: (metaphone(t),),
    "double_metaphone": double_metaphone_codes,
    "refined_soundex": lambda t: (refined_soundex(t),),
    "caverphone": lambda t: (caverphone2(t),),
    "cologne": lambda t: (cologne_phonetic(t),),
    "nysiis": lambda t: (nysiis(t),),
    "dm_soundex": daitch_mokotoff,
}


class MultiPhoneticAnalyzer(Analyzer):
    """Base chain + one or more phonetic codes at each token's
    position (inject=True keeps the original; every emitted code is a
    posIncr-0 twin, ``DoubleMetaphoneFilter.java:63``)."""

    def __init__(self, encoder: str, base: Analyzer | None = None,
                 *, inject: bool = True):
        self.name = "phonetic_" + encoder
        self.base = base or StandardAnalyzer()
        self.encoder = _ENCODERS[encoder]
        self.inject = inject

    def tokens_with_positions(self, text: str):
        toks, pos = self.base.tokens_with_positions(text)
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(toks, pos):
            if self.inject:
                out_t.append(t)
                out_p.append(int(p))
            for code in self.encoder(t):
                if code and code != t:
                    out_t.append(code)
                    out_p.append(int(p))
        return out_t, out_p

    def tokens(self, text: str) -> list[str]:
        return self.tokens_with_positions(text)[0]


for _enc in _ENCODERS:
    register_analyzer("phonetic_" + _enc, MultiPhoneticAnalyzer(_enc))
