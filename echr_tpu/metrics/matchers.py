"""METEOR 1.5 synonym / paraphrase matcher stages (pluggable data assets).

The reference's metric gate is the Java METEOR 1.5 jar (reference:
external_tool/densevid_eval/evaluate.py:16,61).  Its full matcher pipeline
is, in priority order: exact (weight 1.0) > stem (0.6) > synonym (0.8) >
paraphrase (0.6).  The synonym stage needs the jar's WordNet-derived synset
data and the paraphrase stage its paraphrase table — data assets that are
not present in this environment (the reference snapshot's coco-caption
submodule is empty too).  This module makes both stages PLUGGABLE: loaders
for the jar-style data formats plus a span-capable aligner, consumed by
``scorers.Meteor(synonyms=..., paraphrases=...)``.  The day the assets
appear, pass their paths (or set cfg.eval.meteor_synonyms /
meteor_paraphrases) and run tests/test_meteor_matchers.py's offset fixture
to pin the measured exact+stem-only offset.

Without matchers, Meteor keeps its existing (oracle-pinned) word-level
aligner path untouched.

Format notes (auto-detected, documented here because the canonical files
are unavailable to verify against):

* synonyms: one relation per line.  Either ``word id1 id2 ...`` (ids all
  integers; word -> synset-id set, jar ``english.synsets`` style) or a
  plain word group ``w1 w2 w3`` (all members mutually synonymous; each
  line becomes one synthetic synset).  Two words match when their synset
  sets intersect.
* paraphrases: plain text or gzip.  Lines ``phrase1 ||| phrase2``,
  ``prob ||| phrase1 ||| phrase2`` (probability ignored; the jar weights
  the module, not the entry), or tab-separated ``phrase1\tphrase2``.
  Matching is symmetric (either direction admits the pair).
"""
from __future__ import annotations

import gzip
from typing import Dict, FrozenSet, Iterable, List, Optional, Sequence, Tuple

# matcher module priorities (lower wins when the same span pair is matched
# by several modules), mirroring the jar's module order
PRIO_EXACT, PRIO_STEM, PRIO_SYN, PRIO_PARA = 0, 1, 2, 3


class SynonymTable:
    """word -> synset-id set; two words are synonyms iff sets intersect."""

    def __init__(self, word_synsets: Dict[str, FrozenSet[int]]):
        self.word_synsets = word_synsets

    def synsets(self, w: str) -> FrozenSet[int]:
        return self.word_synsets.get(w, frozenset())

    def match(self, a: str, b: str) -> bool:
        sa = self.word_synsets.get(a)
        if not sa:
            return False
        sb = self.word_synsets.get(b)
        return bool(sb) and not sa.isdisjoint(sb)

    @classmethod
    def from_groups(cls, groups: Iterable[Sequence[str]]) -> "SynonymTable":
        """Build from iterable of synonym groups (each group = one synset)."""
        tmp: Dict[str, set] = {}
        for sid, group in enumerate(groups):
            for w in group:
                tmp.setdefault(w, set()).add(sid)
        return cls({w: frozenset(s) for w, s in tmp.items()})

    @classmethod
    def from_file(cls, path: str) -> "SynonymTable":
        tmp: Dict[str, set] = {}
        next_sid = [1 << 30]  # synthetic ids above any file-provided id

        def add_line(parts: List[str]):
            if len(parts) < 2:
                return
            if all(p.lstrip("-").isdigit() for p in parts[1:]):
                # "word id1 id2 ..." (english.synsets style)
                tmp.setdefault(parts[0], set()).update(int(p) for p in parts[1:])
            else:
                # plain synonym group: one synthetic synset for the line
                sid = next_sid[0]
                next_sid[0] += 1
                for w in parts:
                    tmp.setdefault(w, set()).add(sid)

        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8", errors="replace") as f:
            for line in f:
                line = line.strip()
                if line and not line.startswith("#"):
                    add_line(line.split())
        return cls({w: frozenset(s) for w, s in tmp.items()})


class ParaphraseTable:
    """Set of (phrase, phrase) tuples; symmetric phrase-pair membership."""

    def __init__(self, pairs: Iterable[Tuple[Tuple[str, ...], Tuple[str, ...]]]):
        self.pairs = set()
        # index: first word of a phrase -> the phrases starting with it, so
        # candidate generation scans O(matching phrases), not O(table)
        self._by_first: Dict[str, set] = {}
        max_len = 1
        for a, b in pairs:
            a, b = tuple(a), tuple(b)
            if not a or not b or a == b:
                continue
            self.pairs.add((a, b))
            self.pairs.add((b, a))
            for p in (a, b):
                self._by_first.setdefault(p[0], set()).add(p)
                max_len = max(max_len, len(p))
        self.max_len = max_len

    def phrases_at(self, words: Sequence[str], i: int) -> List[Tuple[str, ...]]:
        """Table phrases that occur in `words` starting at index i."""
        out = []
        for p in self._by_first.get(words[i], ()):
            if tuple(words[i:i + len(p)]) == p:
                out.append(p)
        return out

    def match(self, a: Sequence[str], b: Sequence[str]) -> bool:
        return (tuple(a), tuple(b)) in self.pairs

    @classmethod
    def from_file(cls, path: str) -> "ParaphraseTable":
        pairs = []
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8", errors="replace") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                if "|||" in line:
                    fields = [p.strip() for p in line.split("|||")]
                    if len(fields) == 3:
                        # "prob ||| a ||| b" when field 0 parses as a float
                        try:
                            float(fields[0])
                            fields = fields[1:]
                        except ValueError:
                            pass  # 3-field phrase split; keep first two
                elif "\t" in line:
                    fields = [p.strip() for p in line.split("\t")]
                else:
                    continue
                if len(fields) >= 2 and fields[0] and fields[1]:
                    pairs.append((tuple(fields[0].split()),
                                  tuple(fields[1].split())))
        return cls(pairs)


class PromiscuousSynonymTable:
    """Upper-bound probe table (VERDICT r4 next-2): every word pair is
    'synonymous', so the synonym stage admits ANY non-exact, non-stem
    aligned pair at the jar's synonym weight (0.8).  Running METEOR with
    this table brackets the unmeasurable jar offset from above: any real
    WordNet synset table is a subset of this one, and the jar's paraphrase
    stage matches at a LOWER weight (0.6) than the 0.8 these admissions
    carry, so the real jar's match set is (weight-wise) dominated.  The
    residual caveat is the fragmentation penalty: maximal matching can
    carry a different chunk count than a sparser real alignment — the
    aligner's min-chunks-at-max-coverage tiebreak keeps this second-order.
    Lower bound = the default exact+stem Meteor().  See
    scorers.meteor_jar_bracket and tests/test_meteor_matchers.py."""

    _ALL = frozenset({0})

    def synsets(self, w: str) -> FrozenSet[int]:
        return self._ALL

    def match(self, a: str, b: str) -> bool:
        return True


# ---------------------------------------------------------------------------
# Span-capable aligner: generalizes scorers.Meteor._align (word-level beam
# search) to multi-word paraphrase matches.  Used ONLY when synonym or
# paraphrase matchers are supplied — the matcher-less path keeps the
# existing oracle-pinned word aligner byte-for-byte.
# ---------------------------------------------------------------------------

# a candidate match: (i0, ilen, j0, jlen, weight, prio)
Span = Tuple[int, int, int, int, float, int]


def span_candidates(
    hyp: List[str],
    ref: List[str],
    stem,
    w_exact: float,
    w_stem: float,
    w_syn: float,
    w_para: float,
    synonyms: Optional[SynonymTable],
    paraphrases: Optional[ParaphraseTable],
) -> Dict[int, List[Span]]:
    """Per hyp start index: candidate matches, highest-priority module kept
    per (hyp-span, ref-span) pair (exact > stem > synonym > paraphrase,
    the jar's module order)."""
    by_word: Dict[str, List[int]] = {}
    by_stem: Dict[str, List[int]] = {}
    for j, w in enumerate(ref):
        by_word.setdefault(w, []).append(j)
        by_stem.setdefault(stem(w), []).append(j)
    by_syn: Dict[int, List[int]] = {}
    if synonyms is not None:
        for j, w in enumerate(ref):
            for sid in synonyms.synsets(w):
                by_syn.setdefault(sid, []).append(j)

    out: Dict[int, List[Span]] = {}

    def add(i0, il, j0, jl, w, prio):
        lst = out.setdefault(i0, [])
        for k, (ai, al, aj, ajl, _, ap) in enumerate(lst):
            if (ai, al, aj, ajl) == (i0, il, j0, jl):
                if prio < ap:
                    lst[k] = (i0, il, j0, jl, w, prio)
                return
        lst.append((i0, il, j0, jl, w, prio))

    for i, w in enumerate(hyp):
        for j in by_word.get(w, ()):
            add(i, 1, j, 1, w_exact, PRIO_EXACT)
        for j in by_stem.get(stem(w), ()):
            add(i, 1, j, 1, w_stem, PRIO_STEM)
        if synonyms is not None:
            seen: set = set()
            for sid in synonyms.synsets(w):
                for j in by_syn.get(sid, ()):
                    if j not in seen:
                        seen.add(j)
                        add(i, 1, j, 1, w_syn, PRIO_SYN)
    if paraphrases is not None:
        # ref phrase occurrences once, then hyp phrases scan them
        ref_occ: Dict[Tuple[str, ...], List[int]] = {}
        for j in range(len(ref)):
            for p in paraphrases.phrases_at(ref, j):
                ref_occ.setdefault(p, []).append(j)
        for i in range(len(hyp)):
            for hp in paraphrases.phrases_at(hyp, i):
                for rp, js in ref_occ.items():
                    if paraphrases.match(hp, rp):
                        for j in js:
                            add(i, len(hp), j, len(rp), w_para, PRIO_PARA)
    for lst in out.values():
        lst.sort()
    return out


class _SpanState:
    __slots__ = ("used_hyp", "used_ref", "pairs", "last_end",
                 "chunks", "dist", "count")

    def __init__(self, used_hyp, used_ref, pairs, last_end, chunks, dist, count):
        self.used_hyp = used_hyp  # frozenset of covered hyp indices
        self.used_ref = used_ref  # frozenset of covered ref indices
        self.pairs = pairs        # tuple of Span
        self.last_end = last_end  # (hyp_end, ref_end) of last match or None
        self.chunks = chunks
        self.dist = dist
        self.count = count        # hyp words covered + ref words covered

    def key(self):
        # same resolution priorities as the word aligner: max coverage,
        # min chunks, min total start distance
        return (-self.count, self.chunks, self.dist)


def align_spans(hyp: List[str], ref: List[str],
                cands: Dict[int, List[Span]], beam_size: int
                ) -> Tuple[Span, ...]:
    """Beam search over hyp start positions; one-to-one word coverage on
    both sides; selects by (max covered words, min chunks, min distance) —
    the span generalization of scorers.Meteor._align."""
    beam = [_SpanState(frozenset(), frozenset(), (), None, 0, 0, 0)]
    for i in range(len(hyp)):
        opts = cands.get(i)
        if not opts:
            continue
        nxt = list(beam)  # option: no match starts at hyp position i
        for st in beam:
            if i in st.used_hyp:
                continue
            for (i0, il, j0, jl, w, prio) in opts:
                hspan = range(i0, i0 + il)
                rspan = range(j0, j0 + jl)
                if any(x in st.used_hyp for x in hspan):
                    continue
                if any(x in st.used_ref for x in rspan):
                    continue
                contiguous = st.last_end == (i0, j0)
                nxt.append(_SpanState(
                    st.used_hyp | frozenset(hspan),
                    st.used_ref | frozenset(rspan),
                    st.pairs + ((i0, il, j0, jl, w, prio),),
                    (i0 + il, j0 + jl),
                    st.chunks + (0 if contiguous else 1),
                    st.dist + abs(i0 - j0),
                    st.count + il + jl,
                ))
        nxt.sort(key=_SpanState.key)
        beam = nxt[:beam_size]
    return min(beam, key=_SpanState.key).pairs
