"""Import reference-trained torch checkpoints into echr_tpu param trees.

The reference saves ``{'tap_model': state_dict, 'cg_model': state_dict,
...}`` (reference: train.py:456-467).  This maps those state_dicts onto the
corresponding JAX parameter pytrees so reference-trained weights can be
evaluated (and token-for-token compared) in this framework:

  * Linear:  weight [out, in] -> w [in, out] (transposed), bias -> b
  * LSTM/LSTMCell: weight_ih/hh [4H, in] -> w_ih/hh [in, 4H], biases direct
    (same i,f,g,o gate order)
  * TSRM grouped 1x1 conv: weight [d_o, d, 1, 1] -> out_w [g, d, d_o/g]
  * unused reference params (h2a_layer, ThreeStream fusion_layer, ...) are
    ignored.

Covers the flagship configuration (SST TAP + TSRM fusion + three_stream /
show_attend_tell decoders).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from echr_tpu.config import Config


def _lin(sd: Dict, prefix: str):
    p = {"w": np.ascontiguousarray(np.asarray(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        p["b"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _cell(sd: Dict, prefix: str, bias: bool = True):
    p = {
        "w_ih": np.ascontiguousarray(np.asarray(sd[f"{prefix}.weight_ih"]).T),
        "w_hh": np.ascontiguousarray(np.asarray(sd[f"{prefix}.weight_hh"]).T),
    }
    if bias and f"{prefix}.bias_ih" in sd:
        p["b_ih"] = np.asarray(sd[f"{prefix}.bias_ih"])
        p["b_hh"] = np.asarray(sd[f"{prefix}.bias_hh"])
    return p


def _lstm_layers(sd: Dict, prefix: str, num_layers: int, bias: bool = True):
    layers = []
    for l in range(num_layers):
        p = {
            "w_ih": np.ascontiguousarray(np.asarray(sd[f"{prefix}.weight_ih_l{l}"]).T),
            "w_hh": np.ascontiguousarray(np.asarray(sd[f"{prefix}.weight_hh_l{l}"]).T),
        }
        if bias and f"{prefix}.bias_ih_l{l}" in sd:
            p["b_ih"] = np.asarray(sd[f"{prefix}.bias_ih_l{l}"])
            p["b_hh"] = np.asarray(sd[f"{prefix}.bias_hh_l{l}"])
        layers.append(p)
    return layers


def _attention(sd: Dict, prefix: str):
    return {
        "ctx2att": _lin(sd, f"{prefix}.ctx2att"),
        "h2att": _lin(sd, f"{prefix}.h2att"),
        "alpha_net": _lin(sd, f"{prefix}.alpha_net"),
    }


def import_tap_state_dict(sd: Dict, cfg: Config):
    """reference SST state_dict -> init_sst-shaped params (sst_model.py)."""
    p = {
        "rnn": _lstm_layers(sd, "rnn", cfg.tap.rnn_num_layers),
        "scores": _lin(sd, "scores"),
    }
    if "reduce_dim_layer.weight" in sd:
        p["reduce_dim"] = _lin(sd, "reduce_dim_layer")
    return p


def _import_tsrm(sd: Dict, cfg: Config, prefix: str = "fusion_model"):
    f = cfg.fusion
    conv_w = np.asarray(sd[f"{prefix}.enc_attn.linear_out_1.weight"])  # [d_o, d, 1, 1]
    g, og = f.n_head, f.d_o // f.n_head
    out_w = conv_w[:, :, 0, 0].reshape(g, og, f.d_feats).transpose(0, 2, 1)
    p = {
        "event_emb": _lin(sd, f"{prefix}.event_emb"),
        "query": _lin(sd, f"{prefix}.enc_attn.query_1"),
        "key": _lin(sd, f"{prefix}.enc_attn.key_1"),
        "out_w": np.ascontiguousarray(out_w),
        "out_b": np.asarray(sd[f"{prefix}.enc_attn.linear_out_1.bias"]),
    }
    if f.use_posit:
        p["pair_pos_fc1"] = _lin(sd, f"{prefix}.enc_attn.pair_pos_fc1")
        p["pair_pos_fc2"] = _lin(sd, f"{prefix}.enc_attn.pair_pos_fc2")
    return p


def import_cg_state_dict(sd: Dict, cfg: Config):
    """reference CaptionGenerator state_dict -> init_captioner-shaped params.

    Expects keys like 'lm_model.embed.weight', 'lm_model.core.layer0.*',
    'fusion_model.enc_attn.*' (reference: CaptionGenerator composes
    fusion_model + lm_model; lm_model is an OldModel subclass).
    """
    m = cfg.decoder.caption_model
    dec = {
        "embed": np.asarray(sd["lm_model.embed.weight"]),
        "logit": _lin(sd, "lm_model.logit"),
    }
    if m == "three_stream":
        dec["core"] = {
            "layer0": _cell(sd, "lm_model.core.layer0"),
            "layer1": _cell(sd, "lm_model.core.layer1"),
            "layer2": _cell(sd, "lm_model.core.layer2"),
            "attention": _attention(sd, "lm_model.core.attention"),
        }
    elif m == "show_attend_tell":
        dec["core"] = {
            "layers": _lstm_layers(sd, "lm_model.core.rnn",
                                   cfg.decoder.CG_num_layers, bias=False),
            "attention": {
                "ctx2att": _lin(sd, "lm_model.core.ctx2att"),
                "h2att": _lin(sd, "lm_model.core.h2att"),
                "alpha_net": _lin(sd, "lm_model.core.alpha_net"),
            },
        }
    else:
        raise NotImplementedError(f"torch import for caption_model {m!r}")
    if "lm_model.init_linear.weight" in sd:
        dec["init_linear"] = _lin(sd, "lm_model.init_linear")

    params = {"decoder": dec}
    if cfg.uses_tsrm:
        params["fusion"] = _import_tsrm(sd, cfg)
    return params


def import_reference_checkpoint(pth_path: str, cfg: Config):
    """Load a reference .pth (torch.save dict with 'tap_model'/'cg_model'
    state_dicts, train.py:456-461) into (tap_params, cg_params)."""
    import torch

    payload = torch.load(pth_path, map_location="cpu", weights_only=True)
    tap_sd = {k: v.numpy() for k, v in payload["tap_model"].items()}
    cg_sd = {k: v.numpy() for k, v in payload["cg_model"].items()}
    return import_tap_state_dict(tap_sd, cfg), import_cg_state_dict(cg_sd, cfg)
