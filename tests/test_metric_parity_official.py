"""Metric parity vs the official coco-caption evaluator semantics.

The reference scores through pycocoevalcap: Java PTBTokenizer + METEOR 1.5
jar, pure-Python Bleu/Rouge/Cider (reference:
external_tool/densevid_eval/evaluate.py:14-18,232-233,248).  Neither the
package nor a JVM exists in this environment, so binary-identical runs are
impossible here; instead:

  * Bleu / ROUGE_L / CIDEr-D are pinned two ways: (a) analytic values
    computed from first principles for hand-sized fixtures, including
    cases that DISTINGUISH the official semantics from plausible
    alternatives (closest-ref brevity penalty, independent max-P/max-R
    ROUGE, tf-idf clipping + length gaussian CIDEr); (b) randomized
    corpora cross-checked to <=1e-9 against tests/pycoco_oracle.py, an
    independently written second implementation of the official
    algorithms.
  * METEOR is pinned to the METEOR 1.5 formula (alpha=.85 beta=.2
    gamma=.6 delta=.75, exact+stem matchers) including the jar's
    aggregate-statistics corpus score and min-chunk alignment — the
    synonym/paraphrase matchers need data assets absent here; the measured
    consequence is a system-consistent downward offset (documented in
    BASELINE.md).
"""
import math
import random

import pytest

from echr_tpu.metrics import scorers

import pycoco_oracle as oracle


# ---------------------------------------------------------------------------
# analytic fixtures
# ---------------------------------------------------------------------------


def test_bleu_analytic_corpus():
    gts = {0: ["the cat sat on the mat"], 1: ["a dog barks"]}
    res = {0: ["the cat sat on mat"], 1: ["a dog barks loudly"]}
    scores, per_image = scorers.Bleu(4).compute_score(gts, res)
    # hand counts: correct=[8,5,3,1], guess=[9,7,5,3], testlen=reflen=9
    p = [8 / 9, 5 / 7, 3 / 5, 1 / 3]
    exp = []
    prod = 1.0
    for i in range(4):
        prod *= p[i]
        exp.append(prod ** (1 / (i + 1)))
    for got, want in zip(scores, exp):
        assert got == pytest.approx(want, rel=1e-6)
    # per-image list shape: one list per n-gram order (pycocoevalcap shape)
    assert len(per_image) == 4 and all(len(v) == 2 for v in per_image)
    # per-image BP: key1 hyp len 4 > ref len 3 -> no penalty; unigram 3/4
    assert per_image[0][1] == pytest.approx(3 / 4, rel=1e-6)


def test_bleu_brevity_penalty_closest_ref():
    # two refs: lengths 4 and 8, hyp length 5 -> closest is 4 -> ratio>1, BP=1
    gts = {0: ["a b c d", "a b c d e f g h"]}
    res = {0: ["a b c d e"]}
    scores, _ = scorers.Bleu(4).compute_score(gts, res)
    assert scores[0] == pytest.approx(1.0, abs=1e-6)  # all unigrams present, BP=1
    # tie in |len-testlen| breaks toward the SHORTER ref (coco 'closest')
    gts = {0: ["a b c", "a b c d e"]}  # |3-4|=|5-4|=1 -> pick 3
    res = {0: ["a b c d"]}
    scores, _ = scorers.Bleu(1).compute_score(gts, res)
    assert scores[0] == pytest.approx(1.0, abs=1e-6)  # ratio 4/3>1, no BP


def test_rouge_independent_max_p_max_r():
    # max-P comes from ref2, max-R from ref1 — distinguishes official
    # semantics from per-ref max-F
    gts = {0: ["a b x", "a b c d e f g h"]}
    res = {0: ["a b c d e"]}
    s, _ = scorers.Rouge().compute_score(gts, res)
    b2 = 1.2**2
    pm, rm = 5 / 5, 2 / 3
    want = (1 + b2) * pm * rm / (rm + b2 * pm)
    assert s == pytest.approx(want, rel=1e-9)
    # a per-ref max-F implementation would give the ref2 F instead
    not_this = (1 + b2) * 1.0 * (5 / 8) / ((5 / 8) + b2 * 1.0)
    assert abs(s - not_this) > 1e-3


def test_cider_analytic_two_docs():
    gts = {0: ["a b c d"], 1: ["e f g h"]}
    res = {0: ["a b c d"], 1: ["a b c d"]}
    s, per = scorers.Cider().compute_score(gts, res)
    # doc0: identical -> cosine 1 at every order, gaussian 1 -> 10.0
    # doc1: zero overlap -> 0
    assert per[0] == pytest.approx(10.0, rel=1e-9)
    assert per[1] == pytest.approx(0.0, abs=1e-12)
    assert s == pytest.approx(5.0, rel=1e-9)


def test_cider_length_gaussian():
    gts = {0: ["a b c d"], 1: ["p q r s"]}
    res = {0: ["a b c d x y"], 1: ["p q r s"]}
    _, per = scorers.Cider().compute_score(gts, res)
    # doc0 unigram overlap full on ref side; check the exp(-delta^2/2sigma^2)
    # factor is present: score must be strictly below the no-delta case
    assert 0.0 < per[0] < 10.0
    gauss = math.exp(-(2**2) / (2 * 6.0**2))
    # unigram cosine: hyp has 6 distinct unigrams (4 shared), ref 4
    # all idf = log2; cos = 4/ (sqrt(6)*sqrt(4)); same structure at n=2,3
    # (3/sqrt(5*3), 2/sqrt(4*2)), n=4: 1/sqrt(3*1)
    expect = (
        (4 / math.sqrt(24) + 3 / math.sqrt(15) + 2 / math.sqrt(8) + 1 / math.sqrt(3))
        / 4
        * gauss
        * 10
    )
    assert per[0] == pytest.approx(expect, rel=1e-9)


# ---------------------------------------------------------------------------
# randomized cross-check vs the independent oracle
# ---------------------------------------------------------------------------


def _random_corpus(rng, n_keys):
    vocab = ["cat", "dog", "runs", "jumps", "a", "the", "fast", "red",
             "ball", "man", "eats", "park", "over", "sits"]
    gts, res = {}, {}
    for k in range(n_keys):
        n_refs = rng.randint(1, 3)
        gts[k] = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12)))
            for _ in range(n_refs)
        ]
        res[k] = [" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12)))]
    return gts, res


@pytest.mark.parametrize("seed", range(10))
def test_randomized_oracle_parity(seed):
    rng = random.Random(seed)
    gts, res = _random_corpus(rng, rng.randint(1, 8))
    b_got, _ = scorers.Bleu(4).compute_score(gts, res)
    b_want = oracle.bleu_corpus(gts, res)
    for g, w in zip(b_got, b_want):
        assert g == pytest.approx(w, abs=1e-9)
    r_got, _ = scorers.Rouge().compute_score(gts, res)
    assert r_got == pytest.approx(oracle.rouge_l(gts, res), abs=1e-9)
    c_got, _ = scorers.Cider().compute_score(gts, res)
    assert c_got == pytest.approx(oracle.cider_d(gts, res), abs=1e-9)


# ---------------------------------------------------------------------------
# METEOR 1.5 structure pins
# ---------------------------------------------------------------------------


def test_meteor_aggregate_not_mean_of_segments():
    m = scorers.Meteor()
    gts = {0: ["cat sat mat dog"], 1: ["zz ww"]}
    res = {0: ["cat sat mat dog"], 1: ["xx yy"]}
    score, segs = m.compute_score(gts, res)
    # segment 0: P=R=1, F=1, ch=1, m=4 -> 1 - 0.6*(1/4)^0.2
    seg0 = 1 - 0.6 * 0.25**0.2
    assert segs[0] == pytest.approx(seg0, rel=1e-9)
    assert segs[1] == 0.0
    # aggregate: p=r=3/4.5 (content delta=0.75 both sides), F=2/3,
    # frag = 1/4 from summed stats — NOT the mean of segment scores
    agg = (2 / 3) * (1 - 0.6 * 0.25**0.2)
    assert score == pytest.approx(agg, rel=1e-9)
    assert abs(score - (seg0 + 0.0) / 2) > 1e-3


def test_meteor_alignment_minimizes_chunks():
    # greedy left-to-right exact matching yields 3 chunks here; the jar's
    # beam (max coverage, then min chunks) finds the 2-chunk alignment
    pairs = scorers.Meteor._align("the cat the".split(), "the the cat".split())
    assert len(pairs) == 3
    chunks = 0
    last = None
    for i, j, _ in pairs:
        if last != (i - 1, j - 1):
            chunks += 1
        last = (i, j)
    assert chunks == 2


def test_meteor_function_word_weighting():
    m = scorers.Meteor()
    # matched content word is worth more than a matched function word
    s_content = m._pair_score("cat runs".split(), "cat walks".split())
    s_function = m._pair_score("the runs".split(), "the walks".split())
    assert s_content > s_function > 0.0


def test_meteor_stem_module_weight():
    m = scorers.Meteor()
    exact = m._pair_score("running".split(), "running".split())
    stem = m._pair_score("running".split(), "runs".split())
    assert exact > stem > 0.0  # stem matches count with w=0.6 < 1.0


def test_meteor_ranking_consistency_with_other_metrics():
    # the omitted synonym/paraphrase modules shift METEOR's absolute value
    # but must not flip system rankings: a better system scores higher on
    # every metric
    gts = {
        0: ["a man is running in the park"],
        1: ["the dog jumps over a red ball"],
        2: ["a woman eats at the table"],
    }
    good = {
        0: ["a man is running in a park"],
        1: ["the dog jumps over the ball"],
        2: ["a woman eats at a table"],
    }
    bad = {
        0: ["ball red the"],
        1: ["park running man"],
        2: ["jumps dog a"],
    }
    for scorer in (scorers.Bleu(4), scorers.Meteor(), scorers.Rouge(), scorers.Cider()):
        sg, _ = scorer.compute_score(gts, good)
        sb, _ = scorer.compute_score(gts, bad)
        if isinstance(sg, list):
            sg, sb = sg[0], sb[0]
        assert sg > sb
