"""TermAutomatonQuery — the sandbox graph-token query
(``lucene/sandbox/src/java/org/apache/lucene/search/TermAutomatonQuery
.java`` + ``TokenStreamToTermAutomatonQuery.java``).

The reference generalizes PhraseQuery/MultiPhraseQuery to an arbitrary
automaton whose transitions are labeled with terms (or ANY_TERM): a
document matches when some path from the start state to an accept state
aligns with consecutive token positions.  This is how graph token
streams (multi-word synonyms, decompounding) query correctly — shapes
MultiPhraseQuery cannot express, e.g. ``wtc`` vs ``world trade center``
where the two sides consume different numbers of positions.

Build the automaton directly (:class:`TermAutomatonQuery` —
``createState`` / ``addTransition`` / ``addAnyTransition`` /
``setAccept`` / ``finish``, the reference's public surface) or from a
token stream (:func:`token_stream_to_query` — posIncr gaps become
ANY transitions over the hole positions and posLength>1 tokens span
multiple positions, ``TokenStreamToTermAutomatonQuery.java:35-80``).

Matching semantics (``TermAutomatonScorer.java``): each transition
consumes exactly one document position; ANY matches whatever token (or
analyzer-removed hole) occupies that position.  ``match_positions``
runs the subset DP per start position over the document's per-term
position lists; a start matches when its shortest accepting prefix
exists, and the returned frequency is the number of matching start
positions (the scorer's freq accumulation, one match per docID/start).

Distribution: :func:`search_term_automaton` drives the DP from the
index — candidate docs are the UNION of the automaton terms' postings
(never a corpus scan), positions are decoded once per term with the
same cumsum-offset slicing as the phrase scorer, and the whole search
runs per shard under the doc-sharded scatter/gather (candidates and
results stay postings-bounded, so a 10^9-doc shard does work
proportional to the query terms' document frequency, not max_doc).
"""

from __future__ import annotations

import numpy as np

ANY = -1  # TermAutomatonQuery.ANY_TERM


class TermAutomatonQuery:
    def __init__(self):
        self._n_states = 0
        self._accepts: set[int] = set()
        self._trans: dict[tuple[int, str], set[int]] = {}
        self._any: dict[int, set[int]] = {}
        self._finished = False

    # -- construction (the reference's public builder surface) -------------
    def create_state(self) -> int:
        s = self._n_states
        self._n_states += 1
        return s

    def add_transition(self, from_state: int, to_state: int,
                       term: str) -> None:
        self._trans.setdefault((from_state, term), set()).add(to_state)

    def add_any_transition(self, from_state: int, to_state: int) -> None:
        self._any.setdefault(from_state, set()).add(to_state)

    def set_accept(self, state: int, accept: bool = True) -> None:
        if accept:
            self._accepts.add(state)
        else:
            self._accepts.discard(state)

    def finish(self) -> None:
        """Freeze and pre-compute the matching tables (the reference
        determinizes here; the subset DP below carries the state-set
        explicitly, so determinization is not required for parity)."""
        if not self._accepts:
            raise ValueError("automaton has no accept states")
        self.terms = sorted({t for (_, t) in self._trans})
        # per-term adjacency: state -> frozenset(next states)
        self._by_term: dict[str, dict[int, frozenset]] = {}
        for (s, t), targets in self._trans.items():
            self._by_term.setdefault(t, {})[s] = frozenset(targets)
        self._any_f = {s: frozenset(v) for s, v in self._any.items()}
        # longest simple path bound: DP depth guard (cyclic automatons
        # cap at the position span instead)
        self._max_len = max(2 * self._n_states, 8)
        # does any accepting entry ride an ANY transition?  Then matches
        # can end on a hole and the caller must bound doc length.
        self._trailing_any = any(
            targets & self._accepts for targets in self._any.values()
        )
        self._start_terms = {t for (s, t) in self._trans if s == 0}
        self._start_any = 0 in self._any
        self._finished = True

    # -- matching -----------------------------------------------------------
    def match_positions(self, posmap: dict[str, np.ndarray],
                        doc_len: int | None = None) -> int:
        """Number of start positions from which some automaton path
        aligns with consecutive positions.  ``posmap`` maps each query
        term to its sorted position array in ONE document; ``doc_len``
        (total token positions, holes included) bounds ANY transitions —
        required when an accepting path can end on ANY."""
        assert self._finished, "call finish() first"
        if self._trailing_any and doc_len is None:
            raise ValueError(
                "automaton accepts on an ANY transition: doc_len required"
            )
        # position -> set of terms occurring there
        at: dict[int, list[str]] = {}
        for t, ps in posmap.items():
            if t in self._by_term:
                for p in np.asarray(ps).tolist():
                    at.setdefault(p, []).append(t)
        if not at and not self._start_any:
            return 0
        starts: set[int] = set()
        if self._start_terms:
            for p, ts in at.items():
                if any(t in self._start_terms for t in ts):
                    starts.add(p)
        if self._start_any:
            # ANY can begin anywhere a path could still reach a real
            # term (or anywhere at all for pure-ANY automatons)
            if at:
                lo = max(0, min(at) - self._max_len + 1)
                hi = max(at)
            else:
                lo, hi = 0, (doc_len or 0) - 1
            if doc_len is not None:
                hi = min(hi, doc_len - 1)
            starts.update(range(lo, hi + 1))
        freq = 0
        max_pos = (doc_len - 1) if doc_len is not None else (
            max(at) if at else -1
        )
        for p0 in sorted(starts):
            states = frozenset((0,))
            p = p0
            for _ in range(self._max_len):
                nxt: set[int] = set()
                here = at.get(p, ())
                for s in states:
                    for t in here:
                        nxt |= self._by_term[t].get(s, frozenset())
                    if p <= max_pos or (doc_len is None):
                        nxt |= self._any_f.get(s, frozenset())
                if not nxt:
                    break
                if nxt & self._accepts:
                    freq += 1
                    break
                states = frozenset(nxt)
                p += 1
        return freq


def token_stream_to_query(tokens) -> TermAutomatonQuery:
    """``TokenStreamToTermAutomatonQuery``: tokens are (term, pos_incr)
    or (term, pos_incr, pos_length).  posIncr 0 stacks synonyms on one
    position, posIncr > 1 bridges the hole with ANY transitions, and
    posLength > 1 lets one term consume several positions."""
    q = TermAutomatonQuery()
    pos2state: dict[int, int] = {}

    def state_at(pos: int) -> int:
        if pos not in pos2state:
            pos2state[pos] = q.create_state()
        return pos2state[pos]

    pos = -1
    max_end = 0
    state_at(0)
    for tok in tokens:
        term, inc = tok[0], tok[1]
        length = tok[2] if len(tok) > 2 else 1
        pos += inc
        # bridge analyzer holes (removed stopwords) with ANY
        if inc > 1:
            for h in range(pos - inc + 1, pos):
                q.add_any_transition(state_at(h), state_at(h + 1))
        q.add_transition(state_at(pos), state_at(pos + length), term)
        max_end = max(max_end, pos + length)
    q.set_accept(state_at(max_end))
    q.finish()
    return q


def search_term_automaton(searcher, q: TermAutomatonQuery,
                          doc_len_fn=None):
    """Run the automaton against a positional index: returns
    (doc_ids, freqs) for every doc with freq > 0, docs ascending.

    Candidates = union of the automaton terms' postings; positions
    decoded once per term (cumsum-offset slicing, no per-doc decode).
    ``doc_len_fn(doc) -> int`` is only needed for trailing-ANY
    automatons."""
    assert q._finished
    data: dict[str, tuple] = {}
    for t in q.terms:
        docs, tfs, flat_pos = searcher.reader.postings_with_positions(t)
        offs = np.concatenate(([0], np.cumsum(tfs)))
        data[t] = (docs, offs, flat_pos)
    if not data:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    cand = np.unique(np.concatenate([d[0] for d in data.values()]))
    if searcher.live_docs is not None:
        cand = cand[searcher.live_docs.mask[cand]]
    out_docs, out_freqs = [], []
    for doc in cand.tolist():
        posmap = {}
        for t, (docs, offs, flat) in data.items():
            j = np.searchsorted(docs, doc)
            if j < docs.size and docs[j] == doc:
                raw = flat[offs[j]:offs[j + 1]].astype(np.int64)
                posmap[t] = np.cumsum(raw)  # delta -> absolute
        dl = doc_len_fn(doc) if doc_len_fn is not None else None
        f = q.match_positions(posmap, doc_len=dl)
        if f:
            out_docs.append(doc)
            out_freqs.append(f)
    return (np.asarray(out_docs, np.int64),
            np.asarray(out_freqs, np.int64))


def score_term_automaton(searcher, q: TermAutomatonQuery,
                         doc_len_fn=None):
    """TermAutomatonScorer scoring: the match freq feeds the BM25
    similarity under a weight built from ALL the automaton terms'
    statistics (idf summed over the TermStatistics array —
    ``TermAutomatonQuery.createWeight``/``TermAutomatonScorer.score``),
    exactly how the phrase scorer treats phraseFreq.  A linear-chain
    automaton therefore scores float32-identically to the PhraseQuery
    of the same terms (equivalence pytest)."""
    from . import bm25

    docs, freqs = search_term_automaton(searcher, q, doc_len_fn)
    if docs.size == 0:
        dtype = np.float64 if searcher.precise else np.float32
        return docs, np.empty(0, dtype)
    if searcher.precise:
        idf_sum = sum(
            float(np.log(1 + (searcher.max_doc - searcher.doc_freq(t)
                              + 0.5) / (searcher.doc_freq(t) + 0.5)))
            for t in q.terms
        )
        tf = freqs.astype(np.float64)
        dl = searcher.norms.length[docs].astype(np.float64)
        scores = (
            idf_sum * (searcher._k1 + 1.0) * tf
            / (tf + searcher._k1 * ((1 - searcher._b) + searcher._b
                                    * dl / searcher.avgdl_precise))
        )
        return docs, scores
    idf_sum = np.float32(0.0)
    for t in q.terms:  # float32 accumulation, reference order
        idf_sum = idf_sum + bm25.idf(searcher.doc_freq(t),
                                     searcher.max_doc)
    scores = bm25.score_postings(
        freqs.astype(np.float64), searcher.norms.norm[docs], idf_sum,
        searcher._cache, k1=searcher._k1,
    )
    return docs, scores
