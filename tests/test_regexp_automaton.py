"""Regexp automaton (``RegExp.java`` → ``CompiledAutomaton`` →
``IntersectTermsEnum`` role): Thompson NFA + on-the-fly subset DFA,
leapfrogged against the sorted dict — output identical to the anchored
``re`` scan, probes sublinear in vocabulary size."""

import random
import re
import time

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.query import RegexpQuery
from lucene_solr_ray.search.regexdfa import (
    RegexDFA,
    UnsupportedRegex,
    regexp_candidates,
)
from lucene_solr_ray.sources import generate_table

ATOMS = ["a", "b", "c", "d", "[ab]", "[^ab]", "[a-c]", ".", r"\d", r"\w"]


def _rand_pat(rng, depth=0):
    parts = []
    for _ in range(rng.randint(1, 4)):
        a = rng.choice(ATOMS)
        if depth < 2 and rng.random() < 0.2:
            a = "(" + _rand_pat(rng, depth + 1) + ")"
        if rng.random() < 0.3:
            a += rng.choice("*+?")
        parts.append(a)
    s = "".join(parts)
    if depth == 0 and rng.random() < 0.3:
        s = s + "|" + _rand_pat(rng, 1)
    return s


def test_acceptance_equals_re_on_random_patterns():
    rng = random.Random(7)
    n = 0
    while n < 150:
        pat = _rand_pat(rng)
        try:
            dfa = RegexDFA(pat, max_len=12)
        except UnsupportedRegex:
            continue
        cre = re.compile("(?:" + pat + r")\Z")
        for _ in range(20):
            s = "".join(rng.choice("abcde019 _")
                        for _ in range(rng.randint(0, 8)))
            assert dfa.accepts(s) == bool(cre.match(s)), (pat, s)
        n += 1


def test_unsupported_constructs_raise():
    for pat in ["a{2,3}", "(?i)x", "a(?=b)", "\\1", "a\\p"]:
        with pytest.raises(UnsupportedRegex):
            RegexDFA(pat)


def test_intersection_equals_scan():
    rng = random.Random(11)
    vocab = sorted({"".join(rng.choice("abcd01")
                            for _ in range(rng.randint(1, 8)))
                    for _ in range(30000)})
    arr = np.array(vocab)
    for pat in ["a[bc]+d", "ab*c", "a.c", r"\d+", "a(b|c)d*",
                "[a-c]+0?", "abc", "a*b", "x+", "(a|b)(c|d)"]:
        got, probes = regexp_candidates(arr, pat)
        want = [t for t in vocab if re.match("(?:" + pat + r")\Z", t)]
        assert got == want, pat
        assert probes <= len(vocab)


def test_million_term_sublinear():
    rng = random.Random(5)
    big = np.array(sorted(
        {f"{rng.choice('abcdefgh')}{rng.randint(0, 10**9):09d}"
         for _ in range(1_000_000)}))
    t0 = time.time()
    got, probes = regexp_candidates(big, r"a1\d*9")
    dt = time.time() - t0
    assert all(re.match(r"(?:a1\d*9)\Z", t) for t in got) and got
    assert probes < big.size // 20, probes
    assert dt < 5.0, dt


def test_searcher_wildcard_uses_automaton(tmp_path_factory, ray_session):
    from lucene_solr_ray.search.query import WildcardQuery
    from lucene_solr_ray.search.searcher import _wildcard_to_regex

    d = tmp_path_factory.mktemp("wc_corpus")
    pq.write_table(generate_table(500, seed=6), str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("wc_index"))
    build_index(str(d), out, rows_per_partition=250)
    s = IndexSearcher(out)
    u = s.reader.unique_terms()
    for wc in ["re*", "r?turn", "c*n", "ha*h", "q*", "*urn", "z?z*"]:
        got = s._rewrite_terms(WildcardQuery(wc))
        cre = re.compile(_wildcard_to_regex(wc) + r"\Z")
        want = [t for t in u if cre.match(t)]
        assert got == want, wc


def test_searcher_regexp_uses_automaton(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("rx_corpus")
    pq.write_table(generate_table(500, seed=4), str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("rx_index"))
    build_index(str(d), out, rows_per_partition=250)
    s = IndexSearcher(out)
    u = s.reader.unique_terms()
    for pat in ["ret.*n", "(return|def)", "[a-f]+", r"\w*x\w*",
                ".*urn", "colum?n"]:
        got = s._rewrite_terms(RegexpQuery(pat))
        want = [t for t in u if re.match("(?:" + pat + r")\Z", t)]
        assert got == want, pat


def test_truncated_subtree_liveness_no_hang():
    """Budget-aware liveness (per-NFA-state min-distance-to-accept):
    a pattern whose wide-interval subtrees die only by ``max_path_len``
    truncation must NOT rescan the alphabet one codepoint at a time.
    Pre-fix, each of these hung >8 s on a 2000-term dict; the fixed
    leapfrog finishes in milliseconds with bounded probes."""
    rng = random.Random(7)
    vocab = sorted({"".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                            for _ in range(rng.randint(1, 12)))
                    for _ in range(2000)})
    arr = np.array(vocab)
    for pat in ["a.*.+lb*(a|.)",     # the reported hang
                "z.+q.+x.+j",        # live-deep, nothing matches
                "a.*b.*c.*d"]:
        t0 = time.time()
        got, probes = regexp_candidates(arr, pat)
        dt = time.time() - t0
        want = [t for t in vocab if re.match("(?:" + pat + r")\Z", t)]
        assert got == want, pat
        assert dt < 2.0, (pat, dt)
        assert probes < 10 * len(vocab), (pat, probes)


def test_min_length_exceeds_dict_max_is_instant():
    """Patterns whose minimum match length exceeds the longest dict
    term (wildcard '?' runs past max term length, long literal) return
    empty with ZERO probes — the start state is budget-dead."""
    rng = random.Random(3)
    vocab = sorted({"".join(rng.choice("abc") for _ in range(rng.randint(1, 8)))
                    for _ in range(500)})
    arr = np.array(vocab)
    for pat in ["." * 9, "a" * 30, ".........b*"]:
        t0 = time.time()
        got, probes = regexp_candidates(arr, pat)
        assert got == [] and probes == 0, pat
        assert time.time() - t0 < 0.5


def test_transition_memo_stays_bounded():
    """The pre-fix DFS inserted ~1.1M per-char memo entries per rescan
    level; post-fix the memo stays proportional to probes, not to the
    alphabet."""
    rng = random.Random(9)
    vocab = sorted({"".join(rng.choice("abcdef") for _ in range(6))
                    for _ in range(3000)})
    dfa = RegexDFA("a.*.+f*(a|.)", max_len=6)
    from lucene_solr_ray.search.levenshtein import intersect_sorted
    got, probes = intersect_sorted(dfa, np.array(vocab))
    memo_entries = sum(len(d) for d in dfa._trans.values())
    assert memo_entries < 200_000, memo_entries


def test_deep_random_patterns_never_hang():
    """Fuzz the failure class ADVICE found (~6% hang rate pre-fix):
    deeply nested quantified groups over wide intervals. No oracle here
    (Python ``re`` itself backtracks exponentially on these); the
    assertion is termination-fast, which budget-aware liveness
    guarantees. Acceptance parity is covered by the shallow fuzz above."""
    rng = random.Random(42)
    vocab = sorted({"".join(rng.choice("abcdefgl")
                            for _ in range(rng.randint(1, 10)))
                    for _ in range(3000)})
    arr = np.array(vocab)

    def deep_pat(depth=0):
        r = rng.random()
        if depth > 3 or r < 0.35:
            atom = rng.choice(list("abcdefgl")
                              + [".", "[a-d]", "[^ab]", r"\w", r"\d"])
        elif r < 0.6:
            atom = "(" + deep_pat(depth + 1) + "|" + deep_pat(depth + 1) + ")"
        else:
            atom = "(" + deep_pat(depth + 1) + deep_pat(depth + 1) + ")"
        return atom + rng.choice(["", "", "*", "+", "?"])

    ran = 0
    for _ in range(60):
        pat = "".join(deep_pat() for _ in range(rng.randint(1, 5)))
        try:
            t0 = time.time()
            regexp_candidates(arr, pat)
            dt = time.time() - t0
        except UnsupportedRegex:
            continue
        assert dt < 3.0, (pat, dt)
        ran += 1
    assert ran >= 30


def test_unbounded_pattern_requires_max_len():
    """Regression guard: an unbounded-repetition pattern with no cap
    would make next_valid descend forever (no lexicographic minimum);
    construction must fail loudly instead."""
    import pytest

    from lucene_solr_ray.search.regexdfa import RegexDFA

    with pytest.raises(ValueError, match="max_len"):
        RegexDFA("(a|.)*b")
    with pytest.raises(ValueError, match="max_len"):
        RegexDFA("a.+")
    # finite patterns stay constructible without a cap
    assert RegexDFA("ab?c").accepts("ac")
    assert RegexDFA("(a|.)b").accepts("xb")
