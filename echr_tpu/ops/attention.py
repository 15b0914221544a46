"""Additive (Bahdanau) attention over clip frames.

Reference semantics (OldModel_NEW.py:366-401 `Attention`, and the inlined
copy in ShowAttendTellCore :247-267): score = alpha(tanh(ctx2att(feat) +
h2att(h))); softmax then mask-renormalize (== masked softmax, see
ops.masked.masked_softmax); weighted sum of clip features.

TPU-first redesign: the reference materialises a padded [N, max_len, D]
window tensor per video and re-projects it through ctx2att at *every*
decode step.  Here all proposals attend over the shared [T, D] frame
sequence through a per-proposal window mask, and ctx2att(feats) is
precomputed once per video — per step only the [N, H] query projection and
one [N, T] x [T, D] matmul remain.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from echr_tpu.ops.core import dense, dense_init
from echr_tpu.ops.masked import masked_softmax

Array = jax.Array


def additive_attention_init(rng: Array, feat_dim: int, query_dim: int, hid_dim: int):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "ctx2att": dense_init(k1, feat_dim, hid_dim),
        "h2att": dense_init(k2, query_dim, hid_dim),
        "alpha_net": dense_init(k3, hid_dim, 1),
    }


def additive_attention_precompute(p, feats: Array, compute_dtype=jnp.float32) -> Array:
    """Project the shared frame features once per video: [T, D] -> [T, Hatt]."""
    return dense(p["ctx2att"], feats, compute_dtype)


def _additive_scores(alpha_p, pre_att: Array, att_h: Array, compute_dtype) -> Array:
    dot = jnp.tanh(pre_att[None, :, :] + att_h[:, None, :])  # [N, T, Hatt]
    return dense(alpha_p, dot, compute_dtype)[..., 0]  # [N, T]


# Rematerialised variant for training: without it the scan saves the
# [steps, B, N, T, Hatt] tanh intermediate for the backward pass — 7.25 GB
# at B=8 flagship dims, an instant OOM.  checkpoint() recomputes the tanh
# from (pre_att, att_h) during backprop; per-step residual drops to the
# [B, N, T] scores.  Identical gradients, ~4% extra decode-step FLOPs.
_additive_scores_remat = jax.checkpoint(_additive_scores, static_argnums=(3,))


def additive_attention_step(
    p,
    h: Array,
    feats: Array,
    pre_att: Array,
    frame_mask: Array,
    compute_dtype=None,
    use_pallas: bool = False,
    remat: bool = False,
) -> Tuple[Array, Array]:
    """One attention step for all proposals at once.

    h: [N, Hq] query; feats: [T, D]; pre_att: [T, Hatt] (precomputed);
    frame_mask: [N, T] window mask.  Returns (att_res [N, D], weights [N, T]).

    use_pallas routes the score computation through the fused Pallas kernel
    (no [N, T, H] HBM intermediate) — no-grad decode paths only.
    remat recomputes the tanh in the backward pass — training paths.
    """
    if compute_dtype is None:
        compute_dtype = p["h2att"]["w"].dtype
    att_h = dense(p["h2att"], h, compute_dtype)  # [N, Hatt]
    if use_pallas:
        from echr_tpu.ops import pallas_attention

        if pallas_attention.supported(pre_att, att_h):
            scores = pallas_attention.attention_scores(pre_att, att_h, p["alpha_net"])
        else:
            use_pallas = False
    if not use_pallas:
        fn = _additive_scores_remat if remat else _additive_scores
        scores = fn(p["alpha_net"], pre_att, att_h, compute_dtype)
    weights = masked_softmax(scores, frame_mask, axis=-1)
    att_res = jnp.dot(
        weights.astype(compute_dtype), feats.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return att_res, weights
