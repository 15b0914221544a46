"""Hierarchical scene/event/frame ("video/event/clip") context builder.

Capability parity with the reference CaptionGenerator context assembly
(reference: CaptionGenerator.py:87-167):

  video (scene):  VL = LDA topic vector | VC = mean-pooled C3D |
                  VH = mean-pooled SST hidden — whole-video features.
  event:          EC = per-proposal segment-mean of C3D | EH = SST hidden at
                  the proposal end index | ER1/ER2/ER3 route EC / EH /
                  [EC|EH] through the TSRM relation module.
  clip (frame):   CC = C3D frames of the window | CH = SST hidden frames.

TPU-native redesign: no ragged windows.  Segment means are mask matmuls
(ops.masked.segment_mean); the clip level is represented as the *shared*
[T, D] frame sequence plus a [N, T] window mask — the decoder's attention
consumes that directly instead of a padded [N, max_len, D] copy.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from echr_tpu.config import Config
from echr_tpu.models.tsrm import tsrm_forward
from echr_tpu.ops.masked import masked_mean, segment_mean, segment_window_mask

Array = jax.Array


class Contexts(NamedTuple):
    """All statically-shaped; `prop_mask` marks real proposals."""

    video: Optional[Array]  # [Dv]
    event: Optional[Array]  # [N, De]
    clip_feats: Optional[Array]  # [T, Dc] shared frame features
    clip_mask: Optional[Array]  # [N, T] per-proposal window mask
    prop_mask: Array  # [N]


def build_contexts(
    fusion_params,
    cfg: Config,
    tap_feats: Array,  # [T, H]
    c3d_feats: Array,  # [T, D]
    lda_feats: Array,  # [lda_dim]
    ind_select: Array,  # [N] int — proposal end frame index
    soi: Array,  # [N, 2] int — [start, end) window
    prop_mask: Array,  # [N]
    frame_mask: Optional[Array] = None,  # [T]; None = all frames valid
    train: bool = False,
    rng: Optional[Array] = None,
    compute_dtype=jnp.float32,
) -> Contexts:
    T = c3d_feats.shape[0]
    if frame_mask is None:
        frame_mask = jnp.ones((T,), jnp.float32)

    # --- video (scene) level (reference: CaptionGenerator.py:87-104) ---
    vparts = []
    vt = cfg.context.video_context_type
    if "VL" in vt:
        vparts.append(lda_feats)
    if "VC" in vt:
        vparts.append(masked_mean(c3d_feats, frame_mask, axis=0,
                                  compute_dtype=compute_dtype))
    if "VH" in vt:
        vparts.append(masked_mean(tap_feats, frame_mask, axis=0,
                                  compute_dtype=compute_dtype))
    video = jnp.concatenate(vparts, axis=0) if vparts else None

    # --- event level (reference: CaptionGenerator.py:106-137) ---
    et = cfg.context.event_context_type
    need_ec = ("EC" in et) or ("ER1" in et) or ("ER3" in et)
    need_eh = ("EH" in et) or ("ER2" in et) or ("ER3" in et)
    EC = segment_mean(c3d_feats, soi, compute_dtype) if need_ec else None
    EH = tap_feats[ind_select] if need_eh else None

    if "ER1" in et:
        event = tsrm_forward(fusion_params, EC, soi, prop_mask, cfg, train, rng, compute_dtype)
    elif "ER2" in et:
        event = tsrm_forward(fusion_params, EH, soi, prop_mask, cfg, train, rng, compute_dtype)
    elif "ER3" in et:
        ECH = jnp.concatenate([EC, EH], axis=1)
        event = tsrm_forward(fusion_params, ECH, soi, prop_mask, cfg, train, rng, compute_dtype)
    elif need_ec and need_eh:
        raise ValueError(
            "event_context_type EC+EH without ER is not a usable reference "
            "configuration (the reference concatenates along the proposal "
            "axis, CaptionGenerator.py:133)"
        )
    elif need_ec:
        event = EC
    elif need_eh:
        event = EH
    else:
        event = None

    # --- clip (frame) level (reference: CaptionGenerator.py:140-167) ---
    ct = cfg.context.clip_context_type
    cparts = []
    if "CC" in ct:
        cparts.append(c3d_feats)
    if "CH" in ct:
        cparts.append(tap_feats)
    if cparts:
        clip_feats = jnp.concatenate(cparts, axis=1) if len(cparts) > 1 else cparts[0]
        clip_mask = segment_window_mask(soi, T) * frame_mask[None, :]
    else:
        clip_feats, clip_mask = None, None

    return Contexts(video, event, clip_feats, clip_mask, prop_mask)
