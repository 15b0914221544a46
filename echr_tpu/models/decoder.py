"""Caption decoder family.

Capability parity with the reference decoder zoo (reference:
models/OldModel_NEW.py): an embedding + logit wrapper ("OldModel",
:18-187) around pluggable recurrent cores.  Implemented cores:

  three_stream      — the ECHR paper's decoder (:762-823): three parallel
                      LSTMCells over event / attended-clip / video context,
                      output = concat(h0, h1, h2).
  show_attend_tell  — additive-attention single LSTM (:190-274).
  all_img           — no attention, mean-pooled clip (:276-323).
  h3 / h3_dense / h3_dense_add — 3 stacked LSTMCells, video->event->clip
                      hierarchy (:404-508).
  two_stream        — parallel event + clip-attention LSTMCells, late
                      fusion by concat (:511-567).

TPU-native: every core is a pure step function scanned by `lax.scan`
(teacher forcing, greedy/multinomial sampling) over statically-shaped
[N, T] proposals; clip attention reads the shared [T, D] frame sequence
through per-proposal window masks with the ctx2att projection hoisted out
of the step (see ops.attention).  Beam search — which the reference only
stubs (OldModel_NEW.py:144-146) — is implemented in models/beam.py.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from echr_tpu.config import Config
from echr_tpu.models.contexts import Contexts
from echr_tpu.ops.attention import (
    additive_attention_init,
    additive_attention_precompute,
    additive_attention_step,
)
from echr_tpu.ops.core import dense, dense_init, dropout, uniform_init
from echr_tpu.ops.masked import window_mean_padded
from echr_tpu.ops.recurrent import (
    lstm_cell,
    lstm_cell_init,
    lstm_cell_pre,
    lstm_input_proj,
)

Array = jax.Array


def _use_pallas(cfg: "Config", train: bool) -> bool:
    """Pallas fused attention: no-grad paths by default; training paths
    opt in via runtime.use_pallas_train (differentiable custom-VJP kernel,
    ops/pallas_attention.attention_scores_diff)."""
    if train:
        return bool(cfg.runtime.use_pallas_train)
    return bool(cfg.runtime.use_pallas)


class DecoderState(NamedTuple):
    h: Array  # [num_layers, N, H]
    c: Array  # [num_layers, N, H]


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _logit_input_size(cfg: Config) -> int:
    """Width of the core output feeding the logit head (reference: :41-51)."""
    m = cfg.decoder.caption_model
    H = cfg.decoder.CG_rnn_size
    if m == "h3_dense_add":  # core outputs a single residual hidden (:508)
        return H
    if "two_stream" in m or "three_stream_2stream" in m:
        return 2 * H
    if "three_stream" in m:
        return 3 * H
    if "h3_dense" in m or "H3_dense" in m:
        return 3 * H
    return H


def _input_feats_dim(cfg: Config) -> int:
    t = cfg.context.CG_input_feats_type
    d = 0
    if "V" in t:
        d += cfg.video_context_dim
    if "E" in t:
        d += cfg.event_context_dim
    if "C" in t:
        d += cfg.clip_context_dim
    return d


def _init_feats_dim(cfg: Config) -> int:
    t = cfg.context.CG_init_feats_type
    d = 0
    if "V" in t:
        d += cfg.video_context_dim
    if "E" in t:
        d += cfg.event_context_dim
    if "C" in t:
        d += cfg.clip_context_dim
    return d


def _gather_input_feats(cfg: Config, ctxs: Contexts, att_or_pooled_clip: Optional[Array], N: int):
    """Concat of selected contexts (reference: get_input_feats :228-242)."""
    t = cfg.context.CG_input_feats_type
    parts = []
    if "V" in t:
        parts.append(jnp.broadcast_to(ctxs.video[None, :], (N, ctxs.video.shape[0])))
    if "E" in t:
        parts.append(ctxs.event)
    if "C" in t:
        parts.append(att_or_pooled_clip)
    return jnp.concatenate(parts, axis=1) if parts else None


# ---------------------------------------------------------------------------
# cores
# ---------------------------------------------------------------------------
# A core is (init_fn, step_fn, num_layers_fn).  step_fn signature:
#   step(params, cfg, xt [N,E], ctxs, pre_att [T,Hatt]|None, state, train, rng)
#     -> (output [N, logit_input_size], state)


def _init_three_stream(rng: Array, cfg: Config):
    d, c = cfg.decoder, cfg
    ks = jax.random.split(rng, 5)
    E, H = d.CG_input_encoding_size, d.CG_rnn_size
    return {
        "layer0": lstm_cell_init(ks[0], c.event_context_dim + E, H),
        "layer1": lstm_cell_init(ks[1], c.clip_context_dim + E, H),
        "layer2": lstm_cell_init(ks[2], c.video_context_dim + E, H),
        "attention": additive_attention_init(ks[3], c.clip_context_dim, H, d.CG_att_hid_size),
        # NOTE: the reference also constructs a `fusion_layer` Linear that its
        # forward never uses (OldModel_NEW.py:783); intentionally omitted.
    }


def _precompute_three_stream(core_p, cfg: Config, ctxs: Contexts):
    """Hoist the decode-loop-invariant pieces of the three LSTMCell input
    projections out of the scan (measured ~25-30% decode-step win at bench
    dims): the event stream's and video stream's context gate contributions
    are constant across steps, and the three per-step word projections fuse
    into ONE [N, E] x [E, 12H] matmul."""
    E = cfg.decoder.CG_input_encoding_size
    N = ctxs.event.shape[0]
    video = jnp.broadcast_to(ctxs.video[None, :], (N, ctxs.video.shape[0]))
    l0, l1, l2 = core_p["layer0"], core_p["layer1"], core_p["layer2"]
    return {
        "wx": jnp.concatenate(
            [l0["w_ih"][:E], l1["w_ih"][:E], l2["w_ih"][:E]], axis=1),
        "const0": lstm_input_proj(l0, ctxs.event, col_start=E, with_bias=True),
        "const2": lstm_input_proj(l2, video, col_start=E, with_bias=True),
    }


def _step_three_stream(p, cfg, xt, ctxs, pre_att, state, train, rng):
    """reference: ThreeStream_Core.forward :801-823 — the dropped-out hidden
    states are what get stored back into `state`.  When the precomputed
    constants are available (the decoder_forward/sample paths) the step uses
    the fused/hoisted projections — same math modulo fp reassociation."""
    N = xt.shape[0]
    r = jax.random.split(rng, 3) if rng is not None else (None, None, None)
    pre_h1 = state.h[1]
    ts = pre_att.get("ts") if pre_att else None

    if ts is not None:
        cd = p["layer0"]["w_ih"].dtype
        xproj = jnp.dot(xt.astype(cd), ts["wx"].astype(cd),
                        preferred_element_type=jnp.float32)
        x0, x1, x2 = jnp.split(xproj, 3, axis=1)
        h0, c0 = lstm_cell_pre(p["layer0"], x0 + ts["const0"], state.h[0], state.c[0])
        h0 = dropout(r[0], h0, 0.5, train)
        att, _ = additive_attention_step(
            p["attention"], pre_h1, ctxs.clip_feats, pre_att["att"],
            ctxs.clip_mask, use_pallas=_use_pallas(cfg, train), remat=train,
                                 pallas_t_max=cfg.runtime.pallas_decode_t_max)
        E = cfg.decoder.CG_input_encoding_size
        att_proj = lstm_input_proj(p["layer1"], att, col_start=E, with_bias=True)
        h1, c1 = lstm_cell_pre(p["layer1"], x1 + att_proj, state.h[1], state.c[1])
        h1 = dropout(r[1], h1, 0.5, train)
        h2, c2 = lstm_cell_pre(p["layer2"], x2 + ts["const2"], state.h[2], state.c[2])
        h2 = dropout(r[2], h2, 0.5, train)
    else:
        video = jnp.broadcast_to(ctxs.video[None, :], (N, ctxs.video.shape[0]))
        h0, c0 = lstm_cell(p["layer0"], jnp.concatenate([xt, ctxs.event], 1), state.h[0], state.c[0])
        h0 = dropout(r[0], h0, 0.5, train)
        att, _ = additive_attention_step(p["attention"], pre_h1, ctxs.clip_feats,
                                         pre_att["att"] if pre_att else None, ctxs.clip_mask,
                                         use_pallas=_use_pallas(cfg, train), remat=train,
                                 pallas_t_max=cfg.runtime.pallas_decode_t_max)
        h1, c1 = lstm_cell(p["layer1"], jnp.concatenate([xt, att], 1), state.h[1], state.c[1])
        h1 = dropout(r[1], h1, 0.5, train)
        h2, c2 = lstm_cell(p["layer2"], jnp.concatenate([xt, video], 1), state.h[2], state.c[2])
        h2 = dropout(r[2], h2, 0.5, train)

    new_state = DecoderState(jnp.stack([h0, h1, h2]), jnp.stack([c0, c1, c2]))
    return jnp.concatenate([h0, h1, h2], axis=1), new_state


def _init_show_attend_tell(rng: Array, cfg: Config):
    d = cfg.decoder
    ks = jax.random.split(rng, 2)
    E, H = d.CG_input_encoding_size, d.CG_rnn_size
    in_dim = E + _input_feats_dim(cfg)
    # reference: nn.LSTM(..., bias=False) (:207-208); stacked layers
    layers = [
        lstm_cell_init(jax.random.fold_in(ks[0], l), in_dim if l == 0 else H, H, bias=False)
        for l in range(d.CG_num_layers)
    ]
    return {
        "layers": layers,
        "attention": additive_attention_init(ks[1], cfg.clip_context_dim, H, d.CG_att_hid_size),
    }


def _step_show_attend_tell(p, cfg, xt, ctxs, pre_att, state, train, rng):
    """reference: ShowAttendTellCore.forward :244-274 — attention queried by
    the top-layer hidden state before the update; a (possibly multi-layer)
    LSTM advances one step with inter-layer dropout."""
    d = cfg.decoder
    att, _ = additive_attention_step(p["attention"], state.h[-1], ctxs.clip_feats, pre_att["att"], ctxs.clip_mask,
                                 use_pallas=_use_pallas(cfg, train), remat=train,
                                 pallas_t_max=cfg.runtime.pallas_decode_t_max)
    input_feats = _gather_input_feats(cfg, ctxs, att, xt.shape[0])
    x = xt if input_feats is None else jnp.concatenate([xt, input_feats], 1)
    hs, cs = [], []
    for l, lp in enumerate(p["layers"]):
        h, c = lstm_cell(lp, x, state.h[l], state.c[l])
        hs.append(h)
        cs.append(c)
        x = h
        if train and l < len(p["layers"]) - 1 and rng is not None:
            rng, sub = jax.random.split(rng)
            x = dropout(sub, x, d.CG_drop_prob, True)
    return hs[-1], DecoderState(jnp.stack(hs), jnp.stack(cs))


def _init_all_img(rng: Array, cfg: Config):
    d = cfg.decoder
    E, H = d.CG_input_encoding_size, d.CG_rnn_size
    in_dim = E + _input_feats_dim(cfg)
    layers = [
        lstm_cell_init(jax.random.fold_in(rng, l), in_dim if l == 0 else H, H, bias=False)
        for l in range(d.CG_num_layers)
    ]
    return {"layers": layers}


def _step_all_img(p, cfg, xt, ctxs, pre_att, state, train, rng):
    """reference: AllImgCore.forward :320-323 — clip enters as its padded-
    window mean (the reference's clip.mean(1) quirk, see window_mean_padded)."""
    d = cfg.decoder
    pooled = None
    if "C" in cfg.context.CG_input_feats_type:
        pooled = (pre_att or {}).get("allimg_pooled")
        if pooled is None:  # direct step calls without the precompute
            pooled = window_mean_padded(
                ctxs.clip_feats, ctxs_soi(ctxs), ctxs.prop_mask)
    input_feats = _gather_input_feats(cfg, ctxs, pooled, xt.shape[0])
    x = xt if input_feats is None else jnp.concatenate([xt, input_feats], 1)
    hs, cs = [], []
    for l, lp in enumerate(p["layers"]):
        h, c = lstm_cell(lp, x, state.h[l], state.c[l])
        hs.append(h)
        cs.append(c)
        x = h
        if train and l < len(p["layers"]) - 1 and rng is not None:
            rng, sub = jax.random.split(rng)
            x = dropout(sub, x, d.CG_drop_prob, True)
    return hs[-1], DecoderState(jnp.stack(hs), jnp.stack(cs))


def _init_h3(rng: Array, cfg: Config):
    d, c = cfg.decoder, cfg
    ks = jax.random.split(rng, 4)
    E, H = d.CG_input_encoding_size, d.CG_rnn_size
    return {
        "layer0": lstm_cell_init(ks[0], c.video_context_dim + H + E, H),
        "layer1": lstm_cell_init(ks[1], c.event_context_dim + H, H),
        "layer2": lstm_cell_init(ks[2], c.clip_context_dim + H, H),
        "attention": additive_attention_init(ks[3], c.clip_context_dim, H, d.CG_att_hid_size),
    }


def _make_h3_step(variant: str):
    def step(p, cfg, xt, ctxs, pre_att, state, train, rng):
        """reference: H3_Core :404-436 / H3_dense_Core :438-471 /
        H3_dense_add_Core :474-508 — stacked hierarchy
        layer0(word+video+prev-top-h) -> layer1(event, h0) ->
        layer2(attended-clip, h1), with the reference's exact concat order,
        residual adds, and which (raw vs dropped) hiddens go into state."""
        N = xt.shape[0]
        r = jax.random.split(rng, 2) if rng is not None else (None, None)
        pre_h = state.h[-1]
        video = jnp.broadcast_to(ctxs.video[None, :], (N, ctxs.video.shape[0]))

        x0 = jnp.concatenate([xt, video, pre_h], 1)
        h0_raw, c0 = lstm_cell(p["layer0"], x0, state.h[0], state.c[0])
        h0 = dropout(r[0], h0_raw, 0.5, train)
        x1 = jnp.concatenate([ctxs.event, h0], 1)
        h1_raw, c1 = lstm_cell(p["layer1"], x1, state.h[1], state.c[1])

        if variant == "h3_dense_add":
            h1 = dropout(r[1], h1_raw + h0, 0.5, train)
        else:
            h1 = dropout(r[1], h1_raw, 0.5, train)
        att, _ = additive_attention_step(p["attention"], h1, ctxs.clip_feats, pre_att["att"], ctxs.clip_mask,
                                 use_pallas=_use_pallas(cfg, train), remat=train,
                                 pallas_t_max=cfg.runtime.pallas_decode_t_max)
        x2 = jnp.concatenate([att, h1], 1)
        h2_raw, c2 = lstm_cell(p["layer2"], x2, state.h[2], state.c[2])

        if variant == "h3":
            new_state = DecoderState(jnp.stack([h0, h1, h2_raw]), jnp.stack([c0, c1, c2]))
            out = h2_raw
        elif variant == "h3_dense":
            new_state = DecoderState(jnp.stack([h0, h1, h2_raw]), jnp.stack([c0, c1, c2]))
            out = jnp.concatenate([h0_raw, h1_raw, h2_raw], 1)
        else:  # h3_dense_add: raw hiddens in state, residual output
            new_state = DecoderState(
                jnp.stack([h0_raw, h1_raw, h2_raw]), jnp.stack([c0, c1, c2])
            )
            out = h2_raw + h1
        return out, new_state

    return step


def _init_two_stream(rng: Array, cfg: Config):
    d, c = cfg.decoder, cfg
    ks = jax.random.split(rng, 3)
    E, H = d.CG_input_encoding_size, d.CG_rnn_size
    return {
        "layer0": lstm_cell_init(ks[0], c.event_context_dim + E, H),
        "layer1": lstm_cell_init(ks[1], c.clip_context_dim + E, H),
        "attention": additive_attention_init(ks[2], c.clip_context_dim, H, d.CG_att_hid_size),
    }


def _step_two_stream(p, cfg, xt, ctxs, pre_att, state, train, rng):
    """reference: TwoStream_Core.forward :541-567 — parallel event and
    clip-attention streams, late fusion by concat."""
    r = jax.random.split(rng, 2) if rng is not None else (None, None)
    pre_h1 = state.h[1]
    h0, c0 = lstm_cell(p["layer0"], jnp.concatenate([xt, ctxs.event], 1), state.h[0], state.c[0])
    h0 = dropout(r[0], h0, 0.5, train)
    att, _ = additive_attention_step(p["attention"], pre_h1, ctxs.clip_feats, pre_att["att"], ctxs.clip_mask,
                                 use_pallas=_use_pallas(cfg, train), remat=train,
                                 pallas_t_max=cfg.runtime.pallas_decode_t_max)
    h1, c1 = lstm_cell(p["layer1"], jnp.concatenate([xt, att], 1), state.h[1], state.c[1])
    h1 = dropout(r[1], h1, 0.5, train)
    new_state = DecoderState(jnp.stack([h0, h1]), jnp.stack([c0, c1]))
    return jnp.concatenate([h0, h1], axis=1), new_state


def _step_two_stream_jump(p, cfg, xt, ctxs, pre_att, state, train, rng):
    """reference: TwoStream_jump_Core.forward :925-941 — each stream also
    sees the *other* stream's previous hidden ('jump' connections)."""
    r = jax.random.split(rng, 2) if rng is not None else (None, None)
    pre_h0, pre_h1 = state.h[0], state.h[1]
    h0, c0 = lstm_cell(p["layer0"], jnp.concatenate([xt, ctxs.event, pre_h1], 1),
                       state.h[0], state.c[0])
    h0 = dropout(r[0], h0, 0.5, train)
    att, _ = additive_attention_step(p["attention"], pre_h1, ctxs.clip_feats, pre_att["att"], ctxs.clip_mask,
                                 use_pallas=_use_pallas(cfg, train), remat=train,
                                 pallas_t_max=cfg.runtime.pallas_decode_t_max)
    h1, c1 = lstm_cell(p["layer1"], jnp.concatenate([xt, att, pre_h0], 1),
                       state.h[1], state.c[1])
    h1 = dropout(r[1], h1, 0.5, train)
    return jnp.concatenate([h0, h1], 1), DecoderState(jnp.stack([h0, h1]), jnp.stack([c0, c1]))


def _init_two_stream_jump(rng: Array, cfg: Config):
    d, c = cfg.decoder, cfg
    ks = jax.random.split(rng, 3)
    E, H = d.CG_input_encoding_size, d.CG_rnn_size
    return {
        "layer0": lstm_cell_init(ks[0], c.event_context_dim + E + H, H),
        "layer1": lstm_cell_init(ks[1], c.clip_context_dim + E + H, H),
        "attention": additive_attention_init(ks[2], c.clip_context_dim, H, d.CG_att_hid_size),
    }


def _init_two_stream_3lstm(rng: Array, cfg: Config):
    d, c = cfg.decoder, cfg
    ks = jax.random.split(rng, 4)
    E, H = d.CG_input_encoding_size, d.CG_rnn_size
    return {
        "layer0": lstm_cell_init(ks[0], c.event_context_dim + H, H),
        "layer1": lstm_cell_init(ks[1], c.clip_context_dim + H, H),
        "layer2": lstm_cell_init(ks[2], c.video_context_dim + E, H),
        "attention": additive_attention_init(ks[3], c.clip_context_dim, H, d.CG_att_hid_size),
    }


def _step_two_stream_3lstm(p, cfg, xt, ctxs, pre_att, state, train, rng):
    """reference: TwoStream3LSTM_Core.forward :985-1006 — a base word+video
    LSTM feeds both the event and clip-attention streams; output is the two
    stream hiddens only."""
    N = xt.shape[0]
    r = jax.random.split(rng, 3) if rng is not None else (None, None, None)
    pre_h1 = state.h[1]
    video = jnp.broadcast_to(ctxs.video[None, :], (N, ctxs.video.shape[0]))
    h2, c2 = lstm_cell(p["layer2"], jnp.concatenate([xt, video], 1), state.h[2], state.c[2])
    h2 = dropout(r[2], h2, 0.5, train)
    h0, c0 = lstm_cell(p["layer0"], jnp.concatenate([h2, ctxs.event], 1), state.h[0], state.c[0])
    h0 = dropout(r[0], h0, 0.5, train)
    att, _ = additive_attention_step(p["attention"], pre_h1, ctxs.clip_feats, pre_att["att"], ctxs.clip_mask,
                                 use_pallas=_use_pallas(cfg, train), remat=train,
                                 pallas_t_max=cfg.runtime.pallas_decode_t_max)
    h1, c1 = lstm_cell(p["layer1"], jnp.concatenate([h2, att], 1), state.h[1], state.c[1])
    h1 = dropout(r[1], h1, 0.5, train)
    new_state = DecoderState(jnp.stack([h0, h1, h2]), jnp.stack([c0, c1, c2]))
    return jnp.concatenate([h0, h1], 1), new_state


def _init_ts2_lda(rng: Array, cfg: Config):
    d, c = cfg.decoder, cfg
    ks = jax.random.split(rng, 3)
    E, H = d.CG_input_encoding_size, d.CG_rnn_size
    return {
        "layer0": lstm_cell_init(ks[0], c.video_context_dim + E, H),
        "layer1": lstm_cell_init(ks[1], c.clip_context_dim + E, H),
        "attention": additive_attention_init(ks[2], c.clip_context_dim, H, d.CG_att_hid_size),
    }


def _step_ts2_lda(p, cfg, xt, ctxs, pre_att, state, train, rng):
    """reference: ThreeStream_Core_2stream_CLDA :738-760 — video + clip-
    attention streams (event stream ablated)."""
    N = xt.shape[0]
    r = jax.random.split(rng, 2) if rng is not None else (None, None)
    pre_h1 = state.h[1]
    video = jnp.broadcast_to(ctxs.video[None, :], (N, ctxs.video.shape[0]))
    h0, c0 = lstm_cell(p["layer0"], jnp.concatenate([xt, video], 1), state.h[0], state.c[0])
    h0 = dropout(r[0], h0, 0.5, train)
    att, _ = additive_attention_step(p["attention"], pre_h1, ctxs.clip_feats, pre_att["att"], ctxs.clip_mask,
                                 use_pallas=_use_pallas(cfg, train), remat=train,
                                 pallas_t_max=cfg.runtime.pallas_decode_t_max)
    h1, c1 = lstm_cell(p["layer1"], jnp.concatenate([xt, att], 1), state.h[1], state.c[1])
    h1 = dropout(r[1], h1, 0.5, train)
    return jnp.concatenate([h0, h1], 1), DecoderState(jnp.stack([h0, h1]), jnp.stack([c0, c1]))


def _init_ts2_cc(rng: Array, cfg: Config):
    d, c = cfg.decoder, cfg
    ks = jax.random.split(rng, 3)
    E, H = d.CG_input_encoding_size, d.CG_rnn_size
    return {
        "layer0": lstm_cell_init(ks[0], c.clip_context_dim + E, H),
        "layer1": lstm_cell_init(ks[1], c.clip_context_dim + E, H),
        "attention": additive_attention_init(ks[2], c.clip_context_dim, H, d.CG_att_hid_size),
    }


def _step_ts2_cc(p, cfg, xt, ctxs, pre_att, state, train, rng):
    """reference: ThreeStream_Core_2stream_CC :672-696 — both streams take
    the same attended clip feature."""
    r = jax.random.split(rng, 2) if rng is not None else (None, None)
    pre_h1 = state.h[1]
    att, _ = additive_attention_step(p["attention"], pre_h1, ctxs.clip_feats, pre_att["att"], ctxs.clip_mask,
                                 use_pallas=_use_pallas(cfg, train), remat=train,
                                 pallas_t_max=cfg.runtime.pallas_decode_t_max)
    h0, c0 = lstm_cell(p["layer0"], jnp.concatenate([xt, att], 1), state.h[0], state.c[0])
    h0 = dropout(r[0], h0, 0.5, train)
    h1, c1 = lstm_cell(p["layer1"], jnp.concatenate([xt, att], 1), state.h[1], state.c[1])
    h1 = dropout(r[1], h1, 0.5, train)
    return jnp.concatenate([h0, h1], 1), DecoderState(jnp.stack([h0, h1]), jnp.stack([c0, c1]))


def ctxs_soi(ctxs: Contexts) -> Array:
    """Recover [N, 2] windows from the clip mask (start = first 1, end = last 1+1)."""
    m = ctxs.clip_mask
    T = m.shape[1]
    idx = jnp.arange(T)[None, :]
    start = jnp.min(jnp.where(m > 0, idx, T), axis=1)
    end = jnp.max(jnp.where(m > 0, idx + 1, 0), axis=1)
    return jnp.stack([start, end], axis=1)


CORE_REGISTRY = {
    # reference registry classes (OldModel_NEW.py:1009-1069); setup_lm only
    # reaches show_attend_tell/three_stream (models/__init__.py:6-12) but
    # every shipped core is available here
    "three_stream": (_init_three_stream, _step_three_stream, lambda cfg: 3),
    "show_attend_tell": (_init_show_attend_tell, _step_show_attend_tell, lambda cfg: cfg.decoder.CG_num_layers),
    "all_img": (_init_all_img, _step_all_img, lambda cfg: cfg.decoder.CG_num_layers),
    "h3": (_init_h3, _make_h3_step("h3"), lambda cfg: 3),
    "h3_dense": (_init_h3, _make_h3_step("h3_dense"), lambda cfg: 3),
    "h3_dense_add": (_init_h3, _make_h3_step("h3_dense_add"), lambda cfg: 3),
    "two_stream": (_init_two_stream, _step_two_stream, lambda cfg: 2),
    "two_stream_jump": (_init_two_stream_jump, _step_two_stream_jump, lambda cfg: 2),
    "two_stream_3lstm": (_init_two_stream_3lstm, _step_two_stream_3lstm, lambda cfg: 3),
    "three_stream_2stream": (_init_two_stream, _step_two_stream, lambda cfg: 2),
    "three_stream_2stream_LDA": (_init_ts2_lda, _step_ts2_lda, lambda cfg: 2),
    "three_stream_2stream_CC": (_init_ts2_cc, _step_ts2_cc, lambda cfg: 2),
}


def core_num_layers(cfg: Config) -> int:
    return CORE_REGISTRY[cfg.decoder.caption_model][2](cfg)


# ---------------------------------------------------------------------------
# decoder wrapper ("OldModel")
# ---------------------------------------------------------------------------


def init_decoder(rng: Array, cfg: Config):
    d = cfg.decoder
    if d.caption_model not in CORE_REGISTRY:
        raise ValueError(f"caption_model {d.caption_model!r} not supported; "
                         f"available: {sorted(CORE_REGISTRY)}")
    ks = jax.random.split(rng, 4)
    V, E = d.CG_vocab_size, d.CG_input_encoding_size
    p = {
        # reference init_weights (:66-70): U(-0.1, 0.1), logit bias 0
        "embed": uniform_init(ks[0], (V + 1, E), 0.1),
        "logit": {
            "w": uniform_init(ks[1], (_logit_input_size(cfg), V + 1), 0.1),
            "b": jnp.zeros((V + 1,), jnp.float32),
        },
        "core": CORE_REGISTRY[d.caption_model][0](ks[2], cfg),
    }
    if _init_feats_dim(cfg) > 0:
        p["init_linear"] = dense_init(
            ks[3], _init_feats_dim(cfg), core_num_layers(cfg) * d.CG_rnn_size
        )
    return p


def init_state(params, cfg: Config, ctxs: Contexts, N: int) -> DecoderState:
    """reference: OldModel.init_hidden :72-96."""
    L, H = core_num_layers(cfg), cfg.decoder.CG_rnn_size
    if "init_linear" not in params:
        z = jnp.zeros((L, N, H), jnp.float32)
        return DecoderState(z, z)
    t = cfg.context.CG_init_feats_type
    parts = []
    if "V" in t:
        parts.append(jnp.broadcast_to(ctxs.video[None, :], (N, ctxs.video.shape[0])))
    if "E" in t:
        parts.append(ctxs.event)
    if "C" in t:
        parts.append(window_mean_padded(ctxs.clip_feats, ctxs_soi(ctxs), ctxs.prop_mask))
    feats = jnp.concatenate(parts, axis=1)
    m = dense(params["init_linear"], feats).reshape(N, L, H)
    m = jnp.transpose(m, (1, 0, 2))
    return DecoderState(m, m)


def step_core_out(
    params, cfg: Config, it: Array, ctxs: Contexts, pre_att, state: DecoderState,
    train: bool = False, rng: Optional[Array] = None,
) -> Tuple[Array, DecoderState]:
    """One decode step WITHOUT the logit head: token ids -> core output
    [N, logit_input_size].  rng consumption (core split + dropout) is
    identical to step_logits, so a carried core-output loop reproduces a
    carried-logits loop exactly once the head is applied."""
    xt = params["embed"][it]
    r_core = r_drop = None
    if rng is not None:
        r_core, r_drop = jax.random.split(rng)
    step = CORE_REGISTRY[cfg.decoder.caption_model][1]
    out, state = step(params["core"], cfg, xt, ctxs, pre_att, state, train, r_core)
    out = dropout(r_drop, out, cfg.decoder.CG_drop_prob, train)
    return out, state


def step_logits(
    params, cfg: Config, it: Array, ctxs: Contexts, pre_att, state: DecoderState,
    train: bool = False, rng: Optional[Array] = None,
) -> Tuple[Array, DecoderState]:
    """One decode step: token ids -> unnormalised logits over V+1."""
    out, state = step_core_out(params, cfg, it, ctxs, pre_att, state, train, rng)
    return dense(params["logit"], out), state


# minimum decode rows before the streaming head wins (see the measured
# table inside _stream_head_setup); B=32 x N=128 batched serving = 4096
_STREAM_HEAD_MIN_ROWS = 4096


def _stream_head_setup(params, cfg: Config, N: int, greedy: bool,
                       forced_tokens, train: bool,
                       override: Optional[bool]):
    """Resolve the streaming greedy head (ops/pallas_head) for this decode.

    Returns None (use the jnp head) or (wp, bp, tr, tv) with the padded
    weights built ONCE, outside the token loop.  Eligibility: greedy,
    non-forced, eval-mode, bf16-cast logit weights (f32 parity paths keep
    the exact jnp head), a real TPU backend (CPU keeps the jnp head so
    cross-path tie-breaking on near-uniform logits stays bit-identical;
    kernel correctness is covered by interpret-mode op tests), a
    VMEM-feasible tiling, and runtime.use_pallas + use_pallas_head.
    ``override=False`` force-disables (vmapped callers — the kernel call
    must sit OUTSIDE any vmap; decoder_sample_batched flattens instead)."""
    if override is not None and not override:
        return None
    if not greedy or forced_tokens is not None or train:
        return None
    rt = cfg.runtime
    if not (rt.use_pallas and rt.use_pallas_head):
        return None
    if jax.default_backend() != "tpu":
        return None
    lp = params["logit"]
    if lp["w"].dtype != jnp.bfloat16 or "b" not in lp:
        return None
    from echr_tpu.ops.pallas_head import head_plan, pad_head_weights

    # Row-count floor (measured, real decode step, flagship dims C=1536
    # V=6001, interleaved min-of-5 windows): the kernel WINS +13%
    # captions/s at R=4096 (the B=32 batched serving path, 44.9k vs
    # 39.8k), is noise-ambiguous at R=2048, and LOSES ~5-13% at R<=1024
    # (per-video N=128: per-invocation overhead x 31 steps with a
    # underfilled row tile).  Only stream where the win is unambiguous.
    if N < _STREAM_HEAD_MIN_ROWS and override is not True:
        # stream_head=True is an explicit opt-in past the perf floor
        # (tests/probes); hard feasibility gates below still apply
        return None
    C, V1 = lp["w"].shape
    plan = head_plan(N, C, V1)
    if plan is None:
        return None
    tr, tv, _, _ = plan
    wp, bp = pad_head_weights(lp["w"], lp["b"], tv)
    return wp, bp, tr, tv


def step_logprobs(
    params, cfg: Config, it: Array, ctxs: Contexts, pre_att, state: DecoderState,
    train: bool = False, rng: Optional[Array] = None,
) -> Tuple[Array, DecoderState]:
    """One decode step: token ids -> log p(next token)
    (reference: get_logprobs_state :133-137)."""
    logits, state = step_logits(params, cfg, it, ctxs, pre_att, state, train, rng)
    return jax.nn.log_softmax(logits, axis=-1), state


def precompute_attention(params, cfg: Config, ctxs: Contexts, fuse_inputs: bool = False):
    """Hoist decode-loop invariants out of the scan.  Returns a dict:
    'att' = ctx2att(clip_feats) [T, Hatt] (cores with additive attention);
    'ts'  = fused/constant three_stream input projections, only when
            fuse_inputs — a measured win for the teacher-forced path
            (backward saves the recompute: +9%/+23% train step at B=8/32)
            but a ~3% LOSS for greedy decode, where the hoisted constants'
            per-step HBM reads cost more than the skipped matmuls."""
    pre = {}
    att_p = _find_attention_params(params["core"])
    if ctxs.clip_feats is not None and att_p is not None:
        pre["att"] = additive_attention_precompute(att_p, ctxs.clip_feats)
    if fuse_inputs and cfg.decoder.caption_model == "three_stream":
        pre["ts"] = _precompute_three_stream(params["core"], cfg, ctxs)
    if (cfg.decoder.caption_model == "all_img" and ctxs.clip_feats is not None
            and "C" in cfg.context.CG_input_feats_type):
        # all_img's per-step clip input is its loop-invariant padded-window
        # mean — hoist it like the attention precompute instead of redoing
        # the [N,T]x[T,D] pooling inside every scan step
        pre["allimg_pooled"] = window_mean_padded(
            ctxs.clip_feats, ctxs_soi(ctxs), ctxs.prop_mask)
    return pre or None


def _find_attention_params(core_params):
    return core_params.get("attention")


# ---------------------------------------------------------------------------
# teacher-forced forward (reference: OldModel.forward :98-130)
# ---------------------------------------------------------------------------


def decoder_forward(
    params,
    cfg: Config,
    ctxs: Contexts,
    seq: Array,  # [N, L+1] int token ids, col 0 = BOS(0)
    train: bool = False,
    rng: Optional[Array] = None,
    ss_prob: float = 0.0,
) -> Array:
    """Returns logprobs [N, L, V+1] for predicting seq[:, 1:].

    Scheduled sampling (reference :106-118) replaces the ground-truth input
    token with a sample from the previous step's distribution w.p. ss_prob.
    The reference's early break on all-zero rows is emulated by masking in
    the loss (identical math — see losses.language_model_loss).
    """
    N, Lp1 = seq.shape
    steps = Lp1 - 1
    pre_att = precompute_attention(params, cfg, ctxs, fuse_inputs=True)
    state0 = init_state(params, cfg, ctxs, N)
    V = cfg.decoder.CG_vocab_size

    use_ss = train and ss_prob > 0.0 and rng is not None
    has_rng = rng is not None

    def body(carry, inp):
        state, prev_logprobs = carry
        i, it_gt = inp
        it = it_gt
        r = None
        if has_rng:
            r = jax.random.fold_in(rng, i)
        if use_ss:
            r_ss, r = jax.random.split(r)
            sample_prob = jax.random.uniform(jax.random.fold_in(r_ss, 1), (N,))
            sampled = jax.random.categorical(jax.random.fold_in(r_ss, 2), prev_logprobs, axis=-1)
            take_sample = (sample_prob < ss_prob) & (i >= 1)
            it = jnp.where(take_sample, sampled, it_gt)
        logprobs, state = step_logprobs(params, cfg, it, ctxs, pre_att, state,
                                        train=train, rng=r)
        return (state, logprobs), logprobs

    ivec = jnp.arange(steps)
    (_, _), out = jax.lax.scan(
        body,
        (state0, jnp.zeros((N, V + 1), jnp.float32)),
        (ivec, jnp.swapaxes(seq[:, :steps], 0, 1)),
    )
    return jnp.swapaxes(out, 0, 1)  # [N, steps, V+1]


def decoder_forward_core_outputs(
    params,
    cfg: Config,
    ctxs: Contexts,
    seq: Array,  # [N, L+1] int token ids, col 0 = BOS(0)
    train: bool = False,
    rng: Optional[Array] = None,
) -> Array:
    """Teacher-forced CORE outputs [N, steps, logit_input_size] — the decode
    scan without the logit head.  Per-step rng consumption (core dropout +
    output dropout) is identical to decoder_forward with ss_prob=0, so
    dense(logit, outputs) + log_softmax reproduces its logprobs exactly."""
    N, Lp1 = seq.shape
    steps = Lp1 - 1
    pre_att = precompute_attention(params, cfg, ctxs, fuse_inputs=True)
    state0 = init_state(params, cfg, ctxs, N)
    step = CORE_REGISTRY[cfg.decoder.caption_model][1]

    def body(state, inp):
        i, it = inp
        r_core = r_drop = None
        if rng is not None:
            r = jax.random.fold_in(rng, i)
            r_core, r_drop = jax.random.split(r)
        xt = params["embed"][it]
        out, state = step(params["core"], cfg, xt, ctxs, pre_att, state, train, r_core)
        out = dropout(r_drop, out, cfg.decoder.CG_drop_prob, train)
        return state, out

    ivec = jnp.arange(steps)
    _, outs = jax.lax.scan(body, state0, (ivec, jnp.swapaxes(seq[:, :steps], 0, 1)))
    return jnp.swapaxes(outs, 0, 1)  # [N, steps, width]


def teacher_forced_nll(
    params,
    cfg: Config,
    ctxs: Contexts,
    seq: Array,  # [N, L+1] token ids (col 0 = BOS)
    masks: Array,  # [N, L+1] caption masks (col 0 covers BOS)
    train: bool = False,
    rng: Optional[Array] = None,
) -> Array:
    """Fused teacher-forced NLL: equals
    language_model_loss(decoder_forward(...), seq[:, 1:], masks[:, 1:])
    without ever storing [N, L, V+1] logprobs as a scan residual.  The
    logit head runs once post-scan over every step (one MXU matmul instead
    of L small ones) and the head is rematerialised in the backward pass,
    so the saved forward residual is the [N, L, core_width] outputs —
    ~(V+1)/core_width (~4-8x) less HBM at flagship dims, where the
    reference-scale vocab (~6001) dominates the 3*rnn_size core width."""
    outs = decoder_forward_core_outputs(params, cfg, ctxs, seq, train, rng)
    steps = outs.shape[1]
    targets = seq[:, 1 : steps + 1]
    m = masks[:, 1 : steps + 1].astype(jnp.float32)

    def head(logit_p, outs):
        logits = dense(logit_p, outs)  # [N, steps, V+1], fp32 accumulation
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
        # masked NLL normalised by token count (misc/utils.py:62-75)
        return -jnp.sum((tgt - lse) * m) / (jnp.sum(m) + 1e-6)

    return jax.checkpoint(head)(params["logit"], outs)


# ---------------------------------------------------------------------------
# sampling (reference: OldModel.sample :139-187)
# ---------------------------------------------------------------------------


def sort_gate(cfg: Config, ctxs: Contexts) -> bool:
    """Static gate for the window sort — shared by sort_ctxs_by_window and
    callers that must make the same decision OUTSIDE a vmap (the batched
    early-exit decode derives its loop-body cfg from it)."""
    return bool(cfg.runtime.sort_decode_props and cfg.runtime.use_pallas
                and ctxs.clip_mask is not None)


def sort_ctxs_by_window(cfg: Config, ctxs: Contexts):
    """Permute proposal rows by window start so the mask-aware Pallas score
    kernel (ops/pallas_attention.attention_scores_masked) sees clustered
    windows and can skip fully-masked tanh tiles — measured -16%/-20%
    attention-step time at T=256/512 (experiments/probe_tile_skip.py).

    BIT-EXACT for any row-independent consumer: every decoder op is
    independent in N (per-row LSTM dots, per-row attention/softmax,
    per-row logits; beam_search's top_k/gathers are per-proposal), so
    permuting ctxs rows and un-permuting the outputs with the returned
    inverse reproduces the unsorted results exactly.  Callers whose rng
    consumption is row-POSITIONAL (categorical draws, forced replays) must
    not sort.

    Returns (ctxs, cfg, inv_order); inv_order is None when the sort is
    disabled (runtime flags, or no clip windows to cluster).  cfg comes
    back with the decode T ceiling raised to pallas_decode_t_max_sorted —
    sorted windows move the tile-skipping kernel's win/lose crossover up."""
    if not sort_gate(cfg, ctxs):
        return ctxs, cfg, None
    starts = jnp.min(
        jnp.where(ctxs.clip_mask > 0,
                  jnp.arange(ctxs.clip_mask.shape[1])[None, :],
                  ctxs.clip_mask.shape[1]),
        axis=1)
    order = jnp.argsort(starts, stable=True)
    inv_order = jnp.argsort(order, stable=True)
    ctxs = ctxs._replace(
        event=None if ctxs.event is None else ctxs.event[order],
        clip_mask=ctxs.clip_mask[order],
        prop_mask=ctxs.prop_mask[order],
    )
    cfg = cfg.replace_in(
        "runtime", pallas_decode_t_max=cfg.runtime.pallas_decode_t_max_sorted)
    return ctxs, cfg, inv_order


def decoder_sample(
    params,
    cfg: Config,
    ctxs: Contexts,
    greedy: bool = True,
    temperature: float = 1.0,
    rng: Optional[Array] = None,
    train: bool = False,
    forced_tokens: Optional[Array] = None,
    early_exit: Optional[bool] = None,
    stream_head: Optional[bool] = None,
) -> Tuple[Array, Array, Array]:
    """Greedy or multinomial decode.

    Returns (seq [N, L], logps [N, L], active [L]) where L = CG_seq_length.
    ``active[t]`` mirrors the reference's break-when-all-finished: entries
    with active==0 were never appended by the reference (its returned seq is
    simply shorter).  Emitted tokens are zero-masked after a sequence ends
    and the per-step argmax/sample logprob is recorded as-is, matching the
    reference's cg_score accumulation (eval_utils.py:134).

    ``forced_tokens`` [N, L] replays a previously sampled rollout: tokens are
    taken from it instead of argmax/categorical while rng consumption stays
    identical, so the gathered per-step logprobs are bit-equal to the
    original rollout but differentiable w.r.t. params — the self-critical
    update path (see engine/steps.rl_update_step).

    When cfg.runtime.decode_early_exit is set (the default) and the call is
    not a differentiable replay, the step loop is a lax.while_loop that
    stops as soon as no real proposal is unfinished — the reference's
    break-when-all-finished (:173-181) as actual saved device time instead
    of masked-out compute.  Outputs are identical to the fixed-length scan
    (unexecuted steps hold the same zeros the post-scan active mask writes).
    """
    if not greedy and forced_tokens is None and rng is None:
        raise ValueError(
            "decoder_sample(greedy=False) needs an rng for the categorical "
            "draws (the reference's sample_max=0 path, OldModel.sample "
            ":157-167)")
    N = ctxs.prop_mask.shape[0]
    L = cfg.decoder.CG_seq_length

    # Sort proposals by window start so the mask-aware Pallas score kernel
    # sees clustered windows and can skip fully-masked tanh tiles.
    # Greedy-only here: categorical draws and forced replays consume rng by
    # row POSITION, which a sort would change (beam_search, deterministic,
    # sorts through the same helper).
    inv_order = None
    if greedy and forced_tokens is None and not train:
        ctxs, cfg, inv_order = sort_ctxs_by_window(cfg, ctxs)

    pre_att = precompute_attention(params, cfg, ctxs)
    state = init_state(params, cfg, ctxs, N)

    # streaming greedy head: carry the CORE OUTPUT [N, C] between steps and
    # fuse the logit matmul with its argmax/max/lse consumers in one Pallas
    # program (the logits never reach HBM — ops/pallas_head); None = the
    # jnp head over carried raw logits
    sh = _stream_head_setup(params, cfg, N, greedy, forced_tokens, train,
                            stream_head)
    _step = step_core_out if sh is not None else step_logits

    it0 = jnp.zeros((N,), jnp.int32)  # <bos> == 0
    r0 = jax.random.fold_in(rng, 0) if rng is not None else None
    # carry raw logits (or the core output under sh); per-token logprob =
    # logit - logsumexp avoids the full [N, V] log_softmax every step
    act, state = _step(params, cfg, it0, ctxs, pre_att, state, train=train, rng=r0)

    def step_tokens(t, act, unfinished):
        """One token selection + state advance; shared by both loop forms."""
        if sh is not None:
            from echr_tpu.ops.pallas_head import greedy_head

            wp, bp, tr, tv = sh
            it, mx, lse = greedy_head(act, wp, bp, tr, tv)
            sample_logp = mx - lse
        else:
            logits = act
            lse = jax.scipy.special.logsumexp(logits, axis=1)
            if forced_tokens is not None:
                it = forced_tokens[:, t - 1].astype(jnp.int32)
                sample_logp = jnp.take_along_axis(logits, it[:, None], axis=1)[:, 0] - lse
            elif greedy:
                sample_logp = jnp.max(logits, axis=1) - lse
                it = jnp.argmax(logits, axis=1).astype(jnp.int32)
            else:
                r_t = jax.random.fold_in(rng, 10_000 + t) if rng is not None else None
                it = jax.random.categorical(r_t, logits / temperature, axis=-1).astype(jnp.int32)
                sample_logp = jnp.take_along_axis(logits, it[:, None], axis=1)[:, 0] - lse
        unfinished = unfinished & (it > 0)
        active = jnp.any(unfinished & (ctxs.prop_mask > 0))
        return it, it * unfinished, sample_logp, unfinished, active

    # while_loop has no reverse-mode rule: the RL replay path (forced_tokens)
    # runs under value_and_grad and must keep the scan.  Batched/vmapped
    # callers pass early_exit=False: under vmap the loop runs to the LAST
    # unfinished caption across the whole batch (thousands at serving dims),
    # so the exit almost never fires on real data while the while_loop costs
    # ~12% vs scan (measured, docs/BENCH_NOTES.md) — scan is strictly better
    # there.  Per-video paths keep the cfg default.
    if early_exit is None:
        early_exit = bool(cfg.runtime.decode_early_exit)
    early_exit = early_exit and forced_tokens is None

    if early_exit:
        def cond(carry):
            t = carry[0]
            any_unfinished = carry[4]
            return (t <= L) & any_unfinished

        def body(carry):
            t, state, act, unfinished, _, seq, logps, active_buf = carry
            it, emit_it, sample_logp, unfinished, active = step_tokens(t, act, unfinished)
            # write emit*active: matches the post-scan `* active[None, :]`
            seq = jax.lax.dynamic_update_index_in_dim(
                seq, emit_it * active, t - 1, axis=1)
            logps = jax.lax.dynamic_update_index_in_dim(
                logps, sample_logp * active, t - 1, axis=1)
            active_buf = jax.lax.dynamic_update_index_in_dim(active_buf, active, t - 1, axis=0)
            r_t2 = jax.random.fold_in(rng, 20_000 + t) if rng is not None else None
            act, state = _step(params, cfg, it, ctxs, pre_att, state,
                               train=train, rng=r_t2)
            return (t + 1, state, act, unfinished, active, seq, logps, active_buf)

        init = (
            jnp.asarray(1, jnp.int32), state, act, jnp.ones((N,), bool),
            jnp.asarray(True),
            jnp.zeros((N, L), jnp.int32), jnp.zeros((N, L), jnp.float32),
            jnp.zeros((L,), bool),
        )
        carry = jax.lax.while_loop(cond, body, init)
        if inv_order is not None:
            return carry[5][inv_order], carry[6][inv_order], carry[7]
        return carry[5], carry[6], carry[7]

    def body(carry, t):
        state, act, unfinished = carry
        it, emit_it, sample_logp, unfinished, active = step_tokens(t, act, unfinished)
        r_t2 = jax.random.fold_in(rng, 20_000 + t) if rng is not None else None
        act, state = _step(params, cfg, it, ctxs, pre_att, state, train=train, rng=r_t2)
        return (state, act, unfinished), (emit_it, sample_logp, active)

    (_, _, _), (seq, logps, active) = jax.lax.scan(
        body, (state, act, jnp.ones((N,), bool)), jnp.arange(1, L + 1)
    )
    # a step is "appended" by the reference iff any real proposal was still
    # unfinished after the token update (its loop breaks *before* appending)
    seq = jnp.swapaxes(seq, 0, 1) * active[None, :]
    logps = jnp.swapaxes(logps, 0, 1) * active[None, :]
    if inv_order is not None:
        return seq[inv_order], logps[inv_order], active
    return seq, logps, active


def decoder_sample_batched(params, cfg: Config, ctxs_b: Contexts, *,
                           greedy: bool = True, temperature: float = 1.0,
                           rngs: Optional[Array] = None, train: bool = False):
    """Greedy or multinomial decode of a [B]-video Contexts batch with ONE
    batch-global early exit (the reference's break-when-all-finished,
    OldModel_NEW.py:173-181, at batch scope).

    decoder_sample's per-video while_loop is useless under vmap: vmap
    lowers it to run until the LAST unfinished row of the whole batch, so
    batched pipelines historically forced the fixed-length scan.  This
    inverts the nesting — lax.while_loop OUTSIDE, jax.vmap(step) INSIDE —
    so one loop whose condition is "any video still decoding" serves the
    whole batch, and a batch of trained-model captions (typically 8-15
    tokens of L=30) skips the tail steps for real.

    Outputs are identical to the vmapped scan path (decode_step_batched):
    unexecuted steps hold the same zeros the scan's post-hoc active mask
    writes; per-video ``active[b, t]`` semantics are unchanged.

    ``rngs`` is a [B]-vector of per-video keys (the same
    ``jax.random.split(rng, B)`` rows the vmapped scan path consumes).
    Token draws and dropout masks are bit-identical to decoder_sample's
    because every per-step key is derived by step INDEX — fold_in(rng,
    10_000+t) for the categorical draw, fold_in(rng, 20_000+t) for
    dropout — never by position in a rolling split chain, so executing
    fewer steps changes no executed step's key.  The multinomial form is
    what the SCST rollout decodes with (train-mode dropout); equality vs
    the scan form is pinned in test_decode_early_exit.py.

    Returns (seq [B, N, L], logps [B, N, L], active [B, L])."""
    if not greedy and rngs is None:
        raise ValueError(
            "decoder_sample_batched(greedy=False) needs per-video rngs for "
            "the categorical draws (see decoder_sample)")
    B, N = ctxs_b.prop_mask.shape
    L = cfg.decoder.CG_seq_length
    if rngs is None:
        rngs = jnp.zeros((B, 2), jnp.uint32)  # dummy vmap operand, unused
        has_rng = False
    else:
        has_rng = True

    # Per-video window sort, same gate as decoder_sample's greedy path
    # (greedy, rng-free, eval-mode only: draws/dropout consume rng by row
    # POSITION, which a sort would change).  The gate (and sort's cfg
    # transformation — the T-ceiling raise) is static and row-independent,
    # so derive the loop body's cfg once OUTSIDE the vmap from the shared
    # sort_gate helper.
    will_sort = (greedy and not has_rng and not train
                 and sort_gate(cfg, ctxs_b))
    cfg_setup = cfg

    # Streaming greedy head on the FLATTENED [B*N, C] rows (the kernel
    # call must sit outside the vmapped per-video step — vmap would grid
    # the pallas_call per video instead of one big row-tiled program).
    # forced=None (batched has no replay form) and the greedy/rng gates
    # match decoder_sample's.
    sh = _stream_head_setup(params, cfg, B * N, greedy and not has_rng,
                            None, train, None)
    _stepb = step_core_out if sh is not None else step_logits

    def setup(ctxs, r):
        c = cfg_setup
        inv = None
        if will_sort:
            ctxs, c, inv = sort_ctxs_by_window(c, ctxs)
        pre_att = precompute_attention(params, c, ctxs)
        state = init_state(params, c, ctxs, N)
        it0 = jnp.zeros((N,), jnp.int32)
        r0 = jax.random.fold_in(r, 0) if has_rng else None
        logits, state = _stepb(params, c, it0, ctxs, pre_att, state,
                               train=train, rng=r0)
        return ctxs, pre_att, state, logits, inv

    ctxs_b, pre_b, state_b, logits_b, inv_b = jax.vmap(setup)(ctxs_b, rngs)
    if will_sort:
        cfg = cfg.replace_in(
            "runtime",
            pallas_decode_t_max=cfg.runtime.pallas_decode_t_max_sorted)
    prop_mask_b = ctxs_b.prop_mask  # post-sort order, like the outputs

    def body(carry):
        t, state_b, logits_b, unfinished_b, _, seq_b, logps_b, active_buf = carry

        def tokens(logits, unfinished, pm, r):
            lse = jax.scipy.special.logsumexp(logits, axis=1)
            if greedy:
                sample_logp = jnp.max(logits, axis=1) - lse
                it = jnp.argmax(logits, axis=1).astype(jnp.int32)
            else:
                r_t = jax.random.fold_in(r, 10_000 + t)
                it = jax.random.categorical(
                    r_t, logits / temperature, axis=-1).astype(jnp.int32)
                sample_logp = jnp.take_along_axis(
                    logits, it[:, None], axis=1)[:, 0] - lse
            unfinished = unfinished & (it > 0)
            active = jnp.any(unfinished & (pm > 0))
            return it, it * unfinished, sample_logp, unfinished, active

        if sh is not None:
            from echr_tpu.ops.pallas_head import greedy_head

            wp, bp, tr, tv = sh
            C = logits_b.shape[-1]  # carried core outputs under sh
            it_f, mx_f, lse_f = greedy_head(
                logits_b.reshape(B * N, C), wp, bp, tr, tv)
            it_sh = it_f.reshape(B, N)
            logp_sh = (mx_f - lse_f).reshape(B, N)

            def tokens_post(it, sample_logp, unfinished, pm):
                unfinished = unfinished & (it > 0)
                active = jnp.any(unfinished & (pm > 0))
                return it, it * unfinished, sample_logp, unfinished, active

            it_b, emit_b, logp_b, unfinished_b, active_b = jax.vmap(
                tokens_post)(it_sh, logp_sh, unfinished_b, prop_mask_b)
        else:
            it_b, emit_b, logp_b, unfinished_b, active_b = jax.vmap(tokens)(
                logits_b, unfinished_b, prop_mask_b, rngs)
        # write emit*active: a finished video keeps emitting zeros while
        # others run — exactly the scan form's post-hoc `* active[:, None]`
        seq_b = jax.lax.dynamic_update_index_in_dim(
            seq_b, emit_b * active_b[:, None], t - 1, axis=2)
        logps_b = jax.lax.dynamic_update_index_in_dim(
            logps_b, logp_b * active_b[:, None], t - 1, axis=2)
        active_buf = jax.lax.dynamic_update_index_in_dim(
            active_buf, active_b, t - 1, axis=1)

        def adv(it, ctxs, pre, st, r):
            r_t2 = jax.random.fold_in(r, 20_000 + t) if has_rng else None
            return _stepb(params, cfg, it, ctxs, pre, st,
                          train=train, rng=r_t2)

        logits_b, state_b = jax.vmap(adv)(it_b, ctxs_b, pre_b, state_b, rngs)
        return (t + 1, state_b, logits_b, unfinished_b,
                jnp.any(active_b), seq_b, logps_b, active_buf)

    def cond(carry):
        return (carry[0] <= L) & carry[4]

    init = (
        jnp.asarray(1, jnp.int32), state_b, logits_b,
        jnp.ones((B, N), bool), jnp.asarray(True),
        jnp.zeros((B, N, L), jnp.int32), jnp.zeros((B, N, L), jnp.float32),
        jnp.zeros((B, L), bool),
    )
    carry = jax.lax.while_loop(cond, body, init)
    seq_b, logps_b, active_buf = carry[5], carry[6], carry[7]
    if inv_b is not None:
        seq_b = jnp.take_along_axis(seq_b, inv_b[:, :, None], axis=1)
        logps_b = jnp.take_along_axis(logps_b, inv_b[:, :, None], axis=1)
    return seq_b, logps_b, active_buf


def decoder_sample_batched_greedy(params, cfg: Config, ctxs_b: Contexts):
    """Greedy rng-free form of decoder_sample_batched (the original name;
    the eval/serving decode routes through here)."""
    return decoder_sample_batched(params, cfg, ctxs_b, greedy=True)
