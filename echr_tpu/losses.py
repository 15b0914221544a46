"""Training criteria (reference: misc/utils.py:48-99).

All losses are masked so statically-padded entries contribute exactly
nothing; normalisation constants match the reference's unpadded math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# torch BCELoss clamps each log term at -100 (its documented behavior);
# keep it so saturated sigmoids don't produce inf.
_LOG_CLAMP = -100.0


def tap_loss(
    scores: Array,  # [T, K] sigmoid proposal scores
    masks: Array,  # [T, K] valid-anchor mask
    labels: Array,  # [T, K] {0,1} IoU>=thresh labels
    w1: Array,  # [K] per-anchor-length positive rate
    n_valid_frames: Array,  # scalar — the unpadded T (reference divides by T)
) -> Array:
    """Class-weighted BCE over the proposal grid
    (reference: TAPModelCriterion, misc/utils.py:78-99).

    The reference computes mean-over-[T,K] weighted BCE then multiplies by
    K, i.e. sum/T; with frame padding the denominator must stay the real T.
    """
    w0 = 1.0 - w1
    labels = labels * masks
    weights = labels * w0[None, :] + (1.0 - labels) * w1[None, :]
    scores = scores * masks
    # double-where safe logs: the zero-coefficient branch must not see a
    # log(0), or autodiff produces 0 * inf = NaN gradients.  The torch
    # BCELoss clamp (log >= -100, what the reference's criterion reports
    # for a fully saturated score) is applied via the OUTER where — the
    # 1e-38 NaN-safety floor alone would silently cap the loss at ~87.5
    # instead.  Scores in (exp(-100), 1e-38), where torch would report
    # between -100 and -87.5, cannot come out of an f32 sigmoid (needs a
    # pre-activation beyond ~-87), so sending them to the clamp too is
    # unreachable in practice.
    pos = labels > 0
    log_p = jnp.where(
        jnp.where(pos, scores, 1.0) < 1e-38, _LOG_CLAMP,
        jnp.log(jnp.where(pos, jnp.maximum(scores, 1e-38), 1.0)),
    )
    log_1mp = jnp.where(
        jnp.where(pos, 1.0, 1.0 - scores) < 1e-38, _LOG_CLAMP,
        jnp.log(jnp.where(pos, 1.0, jnp.maximum(1.0 - scores, 1e-38))),
    )
    bce = -(labels * log_p + (1.0 - labels) * log_1mp)
    return jnp.sum(weights * bce) / jnp.maximum(n_valid_frames, 1.0)


def language_model_loss(logprobs: Array, targets: Array, masks: Array) -> Array:
    """Masked NLL normalised by token count
    (reference: LanguageModelCriterion, misc/utils.py:62-75).

    logprobs [N, L, V+1]; targets/masks [N, >=L] (truncated to L like the
    reference truncates to the prediction length).
    """
    L = logprobs.shape[1]
    targets = targets[:, :L]
    masks = masks[:, :L]
    gathered = jnp.take_along_axis(logprobs, targets[..., None], axis=2)[..., 0]
    return -jnp.sum(gathered * masks) / (jnp.sum(masks) + 1e-6)


def reward_loss(sample_logprobs: Array, gen_seq: Array, reward: Array,
                prop_mask: Array = None) -> Array:
    """Self-critical policy gradient
    (reference: RewardCriterion, misc/utils.py:48-59).

    The mask covers each generated token plus one trailing position (the
    reference prepends a column of ones to the shifted seq>0 mask).

    prop_mask [N]: real-proposal mask.  The reference has no padded rows
    (its N is the raw sampled-proposal count); our bucket-padded rows
    decode real tokens with zero reward, so WITHOUT the mask they inflate
    the token-count denominator and the gradient magnitude silently
    varies with bucket fill (padding must be mathematically invisible).
    """
    m = (gen_seq > 0).astype(jnp.float32)
    mask = jnp.concatenate([jnp.ones_like(m[:, :1]), m[:, :-1]], axis=1)
    if prop_mask is not None:
        mask = mask * prop_mask[:, None].astype(jnp.float32)
    out = -sample_logprobs * reward * mask
    return jnp.sum(out) / jnp.maximum(jnp.sum(mask), 1.0)


def clip_grads_elementwise(grads, clip_value: float):
    """Per-element clamp, matching the reference's clip_gradient
    (misc/utils.py:107-111) — not a global-norm clip."""
    return jax.tree.map(lambda g: jnp.clip(g, -clip_value, clip_value), grads)
