"""Test-only independent oracle for the official coco-caption scorers.

pycocoevalcap and the Java jars are unavailable in this environment (no
JVM, no package, zero egress), so official-binary parity cannot be run
here.  This module is a from-the-published-algorithm SECOND implementation
of pycocoevalcap's BleuScorer / Rouge / CiderScorer semantics, written in a
deliberately different style (numpy vocab matrices, recursive LCS) from
echr_tpu.metrics.scorers, so that a transcription bug in either
implementation shows up as a mismatch in test_metric_parity_official.py.

Reference semantics implemented (pycocoevalcap, BSD):
  bleu_scorer.py  — option='closest', tiny=1e-15/small=1e-9, per-image and
                    corpus ratio brevity penalties.
  rouge.py        — my_lcs F_beta(1.2) from independent max-P / max-R.
  cider_scorer.py — tf-idf n-gram cosine, hyp clipping, length gaussian.
"""
from __future__ import annotations

import math
from functools import lru_cache
from typing import Dict, List, Tuple

import numpy as np


def _grams(tokens: Tuple[str, ...], n: int) -> Dict[Tuple[str, ...], int]:
    out: Dict[Tuple[str, ...], int] = {}
    for g in zip(*(tokens[i:] for i in range(n))):
        out[g] = out.get(g, 0) + 1
    return out


def bleu_corpus(gts: Dict, res: Dict, n: int = 4) -> List[float]:
    tiny, small = 1e-15, 1e-9
    correct = np.zeros(n)
    guess = np.zeros(n)
    testlen = reflen = 0
    for k in gts:
        hyp = tuple(res[k][0].split())
        refs = [tuple(r.split()) for r in gts[k]]
        testlen += len(hyp)
        # closest ref length, ties -> shorter
        best = None
        for r in refs:
            cand = (abs(len(r) - len(hyp)), len(r))
            if best is None or cand < best:
                best = cand
        reflen += best[1]
        for i in range(n):
            hg = _grams(hyp, i + 1)
            guess[i] += max(len(hyp) - i, 0)
            cmax: Dict[Tuple[str, ...], int] = {}
            for r in refs:
                for g, c in _grams(r, i + 1).items():
                    cmax[g] = max(cmax.get(g, 0), c)
            correct[i] += sum(min(c, cmax.get(g, 0)) for g, c in hg.items())
    ratio = (testlen + tiny) / (reflen + small)
    bp = math.exp(1 - 1 / ratio) if ratio < 1 else 1.0
    logp = np.log((correct + tiny) / (guess + small))
    return [bp * math.exp(np.mean(logp[: i + 1])) for i in range(n)]


def rouge_l(gts: Dict, res: Dict, beta: float = 1.2) -> float:
    def lcs(a: Tuple[str, ...], b: Tuple[str, ...]) -> int:
        @lru_cache(maxsize=None)
        def rec(i: int, j: int) -> int:
            if i == 0 or j == 0:
                return 0
            if a[i - 1] == b[j - 1]:
                return rec(i - 1, j - 1) + 1
            return max(rec(i - 1, j), rec(i, j - 1))

        out = rec(len(a), len(b))
        rec.cache_clear()
        return out

    scores = []
    for k in gts:
        hyp = tuple(res[k][0].split())
        ps, rs = [], []
        for ref_s in gts[k]:
            ref = tuple(ref_s.split())
            m = lcs(hyp, ref)
            ps.append(m / len(hyp) if hyp else 0.0)
            rs.append(m / len(ref) if ref else 0.0)
        pm, rm = max(ps), max(rs)
        if pm and rm:
            scores.append(((1 + beta**2) * pm * rm) / (rm + beta**2 * pm))
        else:
            scores.append(0.0)
    return float(np.mean(scores)) if scores else 0.0


def cider_d(gts: Dict, res: Dict, n: int = 4, sigma: float = 6.0) -> float:
    keys = list(gts.keys())
    # global vocab per order -> dense numpy tf-idf vectors
    vocab: List[Dict[Tuple[str, ...], int]] = [{} for _ in range(n)]
    docfreq: List[Dict[Tuple[str, ...], int]] = [{} for _ in range(n)]
    for k in keys:
        for i in range(n):
            present = set()
            for r in gts[k]:
                present |= set(_grams(tuple(r.split()), i + 1))
            for g in present:
                docfreq[i][g] = docfreq[i].get(g, 0) + 1
                vocab[i].setdefault(g, len(vocab[i]))
    # hyp-only ngrams also need vocab slots
    for k in keys:
        for i in range(n):
            for g in _grams(tuple(res[k][0].split()), i + 1):
                vocab[i].setdefault(g, len(vocab[i]))
    logN = math.log(max(len(keys), 1))
    idf = []
    for i in range(n):
        v = np.zeros(len(vocab[i]))
        for g, ix in vocab[i].items():
            v[ix] = logN - math.log(max(docfreq[i].get(g, 0), 1.0))
        idf.append(v)

    def tfidf(tokens: Tuple[str, ...]):
        vecs, norms = [], []
        for i in range(n):
            v = np.zeros(len(vocab[i]))
            for g, c in _grams(tokens, i + 1).items():
                v[vocab[i][g]] = c * idf[i][vocab[i][g]]
            vecs.append(v)
            norms.append(np.linalg.norm(v))
        return vecs, norms

    out = []
    for k in keys:
        hyp = tuple(res[k][0].split())
        hv, hn = tfidf(hyp)
        total = 0.0
        for ref_s in gts[k]:
            ref = tuple(ref_s.split())
            rv, rn = tfidf(ref)
            gauss = math.exp(-((len(hyp) - len(ref)) ** 2) / (2 * sigma**2))
            s = 0.0
            for i in range(n):
                num = float(np.minimum(hv[i], rv[i]) @ rv[i])
                if hn[i] and rn[i]:
                    s += num / (hn[i] * rn[i]) * gauss
            total += s / n
        out.append(10.0 * total / max(len(gts[k]), 1))
    return float(np.mean(out)) if out else 0.0
