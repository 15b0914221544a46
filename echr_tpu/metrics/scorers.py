"""Pure-Python caption scorers: BLEU, ROUGE-L, CIDEr-D, METEOR.

The reference delegates to the coco-caption submodule (Py2 + a Java METEOR
1.5 jar) which is declared but NOT vendored in the snapshot
(reference: .gitmodules:1-3, evaluate.py:14-18).  These are independent
Py3 implementations of the published algorithms with coco-caption's
parameters:

  BLEU   — corpus BLEU-1..4, closest-reference-length brevity penalty.
  ROUGE  — ROUGE-L F-measure with beta=1.2.
  CIDEr  — CIDEr-D: tf-idf 4-gram cosine with length gaussian (sigma=6), x10.
  METEOR — METEOR-style alignment with exact (w=1.0) and Porter-stem
           (w=0.6) modules, fragmentation penalty gamma*(chunks/matches)^beta,
           F_mean = PR/(alpha P + (1-alpha) R) with alpha=0.85, beta=0.2,
           gamma=0.6 (METEOR 1.5 English defaults).  WordNet synonym and
           paraphrase-table modules require external assets and are
           intentionally omitted; absolute METEOR therefore differs
           slightly from the Java jar, consistently for all systems.

Interface matches pycocoevalcap: scorer.compute_score(gts, res) ->
(score, per-key scores), where gts/res map key -> [sentence].
"""
from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, List, Sequence, Tuple

try:  # Porter stemmer for METEOR's stem module
    from nltk.stem.porter import PorterStemmer

    _STEM = PorterStemmer().stem
except Exception:  # pragma: no cover
    _STEM = lambda w: w  # noqa: E731


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


# ---------------------------------------------------------------------------
# BLEU
# ---------------------------------------------------------------------------


class Bleu:
    def __init__(self, n: int = 4):
        self.n = n

    def method(self) -> str:
        return "Bleu"

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[List[float], List[List[float]]]:
        small, tiny = 1e-9, 1e-15
        clipped = [0.0] * self.n
        totals = [0.0] * self.n
        cand_len, ref_len = 0, 0
        for k in gts:
            hyp = res[k][0].split()
            refs = [r.split() for r in gts[k]]
            cand_len += len(hyp)
            # closest reference length (ties -> shorter), coco 'closest' option
            ref_len += min((abs(len(r) - len(hyp)), len(r)) for r in refs)[1]
            for n in range(1, self.n + 1):
                hc = _ngrams(hyp, n)
                max_ref = Counter()
                for r in refs:
                    for ng, c in _ngrams(r, n).items():
                        max_ref[ng] = max(max_ref[ng], c)
                clipped[n - 1] += sum(min(c, max_ref[ng]) for ng, c in hc.items())
                totals[n - 1] += max(len(hyp) - n + 1, 0)
        ratio = cand_len / (ref_len + tiny)
        bp = 1.0 if ratio > 1.0 else math.exp(1.0 - 1.0 / (ratio + tiny))
        scores = []
        logsum = 0.0
        for n in range(self.n):
            p = (clipped[n] + tiny) / (totals[n] + small)
            logsum += math.log(p)
            scores.append(bp * math.exp(logsum / (n + 1)))
        return scores, [scores for _ in gts]


# ---------------------------------------------------------------------------
# ROUGE-L
# ---------------------------------------------------------------------------


class Rouge:
    def __init__(self, beta: float = 1.2):
        self.beta = beta

    def method(self) -> str:
        return "Rouge"

    @staticmethod
    def _lcs(a: Sequence[str], b: Sequence[str]) -> int:
        if not a or not b:
            return 0
        prev = [0] * (len(b) + 1)
        for x in a:
            cur = [0]
            for j, y in enumerate(b, 1):
                cur.append(prev[j - 1] + 1 if x == y else max(cur[-1], prev[j]))
            prev = cur
        return prev[-1]

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, List[float]]:
        scores = []
        for k in gts:
            hyp = res[k][0].split()
            best = 0.0
            for ref_s in gts[k]:
                ref = ref_s.split()
                lcs = self._lcs(hyp, ref)
                if lcs == 0:
                    continue
                p = lcs / len(hyp) if hyp else 0.0
                r = lcs / len(ref) if ref else 0.0
                if p and r:
                    b2 = self.beta**2
                    best = max(best, (1 + b2) * p * r / (r + b2 * p))
            scores.append(best)
        return (sum(scores) / len(scores) if scores else 0.0), scores


# ---------------------------------------------------------------------------
# CIDEr-D
# ---------------------------------------------------------------------------


class Cider:
    def __init__(self, n: int = 4, sigma: float = 6.0):
        self.n = n
        self.sigma = sigma

    def method(self) -> str:
        return "CIDEr"

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, List[float]]:
        keys = list(gts.keys())
        # document frequency over the reference set of this (per-video) call
        df = [defaultdict(float) for _ in range(self.n)]
        ref_grams = {}
        for k in keys:
            per_ref = [
                [_ngrams(r.split(), n + 1) for n in range(self.n)] for r in gts[k]
            ]
            ref_grams[k] = per_ref
            for n in range(self.n):
                seen = set()
                for grams in per_ref:
                    seen |= set(grams[n].keys())
                for ng in seen:
                    df[n][ng] += 1.0
        ndoc = max(len(keys), 1)
        log_ndoc = math.log(max(ndoc, 1))

        def vec(grams_by_n):
            out, norms, lengths = [], [], 0
            for n in range(self.n):
                v = {}
                for ng, c in grams_by_n[n].items():
                    idf = log_ndoc - math.log(max(df[n][ng], 1.0))
                    v[ng] = c * idf
                out.append(v)
                norms.append(math.sqrt(sum(x * x for x in v.values())))
            return out, norms

        scores = []
        for k in keys:
            hyp_tokens = res[k][0].split()
            hyp_grams = [_ngrams(hyp_tokens, n + 1) for n in range(self.n)]
            hv, hn = vec(hyp_grams)
            score = 0.0
            for ref_idx, ref_s in enumerate(gts[k]):
                rv, rn = vec(ref_grams[k][ref_idx])
                ref_len = len(gts[k][ref_idx].split())
                delta = len(hyp_tokens) - ref_len
                sim = 0.0
                for n in range(self.n):
                    # CIDEr-D: clip hyp counts to ref counts
                    num = sum(
                        min(hv[n].get(ng, 0.0), rv[n][ng]) * rv[n][ng] for ng in rv[n]
                    )
                    if hn[n] and rn[n]:
                        sim += (
                            num
                            / (hn[n] * rn[n])
                            * math.exp(-(delta**2) / (2 * self.sigma**2))
                        )
                score += sim / self.n
            scores.append(10.0 * score / max(len(gts[k]), 1))
        return (sum(scores) / len(scores) if scores else 0.0), scores


# ---------------------------------------------------------------------------
# METEOR (exact + stem modules)
# ---------------------------------------------------------------------------


class Meteor:
    ALPHA, BETA, GAMMA = 0.85, 0.2, 0.6
    W_EXACT, W_STEM = 1.0, 0.6

    def method(self) -> str:
        return "METEOR"

    @staticmethod
    def _align(hyp: List[str], ref: List[str]):
        """Greedy left-to-right alignment: exact pass then stem pass.
        Returns list of (hyp_idx, ref_idx, weight)."""
        matches = []
        used_h, used_r = set(), set()
        for weight, key in ((Meteor.W_EXACT, lambda w: w), (Meteor.W_STEM, _STEM)):
            ref_keyed = defaultdict(list)
            for j, w in enumerate(ref):
                if j not in used_r:
                    ref_keyed[key(w)].append(j)
            for i, w in enumerate(hyp):
                if i in used_h:
                    continue
                cand = ref_keyed.get(key(w))
                while cand:
                    j = cand.pop(0)
                    if j not in used_r:
                        matches.append((i, j, weight))
                        used_h.add(i)
                        used_r.add(j)
                        break
        return sorted(matches)

    @classmethod
    def _pair_score(cls, hyp: List[str], ref: List[str]) -> float:
        if not hyp or not ref:
            return 0.0
        matches = cls._align(hyp, ref)
        if not matches:
            return 0.0
        m_weighted = sum(m[2] for m in matches)
        m_count = len(matches)
        p = m_weighted / len(hyp)
        r = m_weighted / len(ref)
        f_mean = p * r / (cls.ALPHA * p + (1 - cls.ALPHA) * r)
        # chunks: maximal runs contiguous in both hyp and ref order
        chunks = 1
        for (h0, r0, _), (h1, r1, _) in zip(matches, matches[1:]):
            if h1 != h0 + 1 or r1 != r0 + 1:
                chunks += 1
        frag = chunks / m_count
        penalty = cls.GAMMA * (frag**cls.BETA)
        return f_mean * (1.0 - penalty)

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, List[float]]:
        scores = []
        for k in gts:
            hyp = res[k][0].split()
            scores.append(max(self._pair_score(hyp, r.split()) for r in gts[k]))
        return (sum(scores) / len(scores) if scores else 0.0), scores
