"""Self-critical sequence training (SCST).

The reference plumbs an RL mode but ships it broken — `init_scorer` and
`get_self_critical_reward2` are imported from nowhere and raise NameError
if the self-critical epoch is ever reached (reference: train.py:243,307).
This is a working implementation: reward = METEOR(sampled) -
METEOR(greedy baseline) per proposal against its matched GT sentence,
scored with the in-repo Py3 METEOR (metrics/scorers.py).

The policy-gradient update replays the sampled rollout through the decoder
with identical rng consumption (decoder_sample(forced_tokens=...)), so the
gathered logprobs match the rollout bit-for-bit while being differentiable
— equivalent to the reference's backward through the stored sampling graph.
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from echr_tpu.metrics.scorers import Meteor
from echr_tpu.metrics.tokenizer import tokenize_caption
from echr_tpu.utils.text import decode_sequence


def self_critical_reward(
    gen_seq: np.ndarray,  # [N, L] sampled tokens
    greedy_seq: np.ndarray,  # [N, L] greedy baseline tokens
    gt_sentences: Sequence[str],  # matched GT sentence per proposal
    vocab: Dict[str, str],
    prop_mask: np.ndarray,  # [N]
    meteor_weight: float = 1.0,
) -> np.ndarray:
    """[N, L] per-token reward (constant over the time axis, like the
    reference's broadcast of the sequence-level advantage)."""
    N, L = gen_seq.shape
    gen_sents = decode_sequence(vocab, gen_seq)
    greedy_sents = decode_sequence(vocab, greedy_seq)
    m = Meteor()
    reward = np.zeros((N,), np.float32)
    for i in range(N):
        if i >= len(gt_sentences) or prop_mask[i] <= 0:
            continue
        ref = tokenize_caption(gt_sentences[i]).split()
        s_gen = m._pair_score(tokenize_caption(gen_sents[i]).split(), ref)
        s_greedy = m._pair_score(tokenize_caption(greedy_sents[i]).split(), ref)
        reward[i] = meteor_weight * (s_gen - s_greedy)
    return np.broadcast_to(reward[:, None], (N, L)).copy()
