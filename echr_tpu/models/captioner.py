"""Caption generator — hierarchical contexts + decoder, mode dispatch.

Capability parity with the reference CaptionGenerator (reference:
CaptionGenerator.py:17-53): 'train' = teacher-forced logprobs, 'train_rl' =
multinomial + greedy rollouts for self-critical, 'eval' = greedy decode.
Everything between the already-on-device tensors and the output token ids
is one jit-compatible function — no host round trips (the reference
recomputes numpy position embeddings on host every forward,
MA_attention_8_NEW.py:38-41).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from echr_tpu.config import Config
from echr_tpu.models.contexts import Contexts, build_contexts
from echr_tpu.models.decoder import (
    decoder_forward,
    decoder_sample,
    teacher_forced_nll,
)

Array = jax.Array


class ProposalBatch(NamedTuple):
    """Statically-shaped per-video proposal selection."""

    ind_select: Array  # [N] int
    soi: Array  # [N, 2] int
    prop_mask: Array  # [N] float


def make_contexts(
    params,
    cfg: Config,
    tap_feats: Array,
    c3d_feats: Array,
    lda_feats: Array,
    props: ProposalBatch,
    frame_mask: Optional[Array] = None,
    train: bool = False,
    rng: Optional[Array] = None,
    compute_dtype=jnp.float32,
) -> Contexts:
    return build_contexts(
        params.get("fusion"),
        cfg,
        tap_feats,
        c3d_feats,
        lda_feats,
        props.ind_select,
        props.soi,
        props.prop_mask,
        frame_mask=frame_mask,
        train=train,
        rng=rng,
        compute_dtype=compute_dtype,
    )


def captioner_train_forward(
    params,
    cfg: Config,
    tap_feats: Array,
    c3d_feats: Array,
    lda_feats: Array,
    cg_labels: Array,  # [N, L+1]
    props: ProposalBatch,
    frame_mask: Optional[Array] = None,
    train: bool = True,
    rng: Optional[Array] = None,
    ss_prob: float = 0.0,
) -> Array:
    """mode='train' (reference: CaptionGenerator.py:29-31)."""
    r_ctx = r_dec = None
    if rng is not None:
        r_ctx, r_dec = jax.random.split(rng)
    ctxs = make_contexts(params, cfg, tap_feats, c3d_feats, lda_feats, props,
                         frame_mask, train, r_ctx)
    return decoder_forward(params["decoder"], cfg, ctxs, cg_labels,
                           train=train, rng=r_dec, ss_prob=ss_prob)


def captioner_train_loss(
    params,
    cfg: Config,
    tap_feats: Array,
    c3d_feats: Array,
    lda_feats: Array,
    cg_labels: Array,  # [N, L+1]
    cg_masks: Array,  # [N, L+1]
    props: ProposalBatch,
    frame_mask: Optional[Array] = None,
    train: bool = True,
    rng: Optional[Array] = None,
) -> Array:
    """mode='train' with the fused loss head (see decoder.teacher_forced_nll):
    returns language_model_loss(captioner_train_forward(...), cg_labels[:,1:],
    cg_masks[:,1:]) without materialising the [N, L, V+1] logprobs."""
    r_ctx = r_dec = None
    if rng is not None:
        r_ctx, r_dec = jax.random.split(rng)
    ctxs = make_contexts(params, cfg, tap_feats, c3d_feats, lda_feats, props,
                         frame_mask, train, r_ctx)
    return teacher_forced_nll(params["decoder"], cfg, ctxs, cg_labels, cg_masks,
                              train=train, rng=r_dec)


def captioner_sample(
    params,
    cfg: Config,
    tap_feats: Array,
    c3d_feats: Array,
    lda_feats: Array,
    props: ProposalBatch,
    frame_mask: Optional[Array] = None,
    greedy: bool = True,
    temperature: float = 1.0,
    train: bool = False,
    rng: Optional[Array] = None,
    early_exit: Optional[bool] = None,
    stream_head: Optional[bool] = None,
) -> Tuple[Array, Array, Array]:
    """mode='eval' greedy decode (reference: CaptionGenerator.py:39-44);
    returns (seq [N, L], per-step logps [N, L], active [L])."""
    r_ctx = r_dec = None
    if rng is not None:
        r_ctx, r_dec = jax.random.split(rng)
    ctxs = make_contexts(params, cfg, tap_feats, c3d_feats, lda_feats, props,
                         frame_mask, train, r_ctx)
    return decoder_sample(params["decoder"], cfg, ctxs, greedy=greedy,
                          temperature=temperature, rng=r_dec, train=train,
                          early_exit=early_exit, stream_head=stream_head)


def captioner_train_rl(
    params,
    cfg: Config,
    tap_feats: Array,
    c3d_feats: Array,
    lda_feats: Array,
    props: ProposalBatch,
    rng: Array,
    frame_mask: Optional[Array] = None,
) -> Tuple[Tuple[Array, Array], Tuple[Array, Array]]:
    """mode='train_rl' (reference: CaptionGenerator.py:32-38): a multinomial
    rollout (train-mode dropout, like the reference) and a greedy baseline
    rollout (eval mode).  Returns ((gen_seq, gen_logps), (greedy_seq, _))."""
    r_ctx, r_sample = jax.random.split(rng)
    ctxs_train = make_contexts(params, cfg, tap_feats, c3d_feats, lda_feats,
                               props, frame_mask, True, r_ctx)
    gen_seq, gen_logps, _ = decoder_sample(
        params["decoder"], cfg, ctxs_train, greedy=False, rng=r_sample, train=True
    )
    ctxs_eval = make_contexts(params, cfg, tap_feats, c3d_feats, lda_feats,
                              props, frame_mask, False, None)
    greedy_seq, greedy_logps, _ = decoder_sample(
        params["decoder"], cfg, ctxs_eval, greedy=True, train=False
    )
    return (gen_seq, gen_logps), (greedy_seq, greedy_logps)
