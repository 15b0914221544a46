"""TSRM — temporal-semantic relation module (cross-event multi-head attention).

Capability parity with the reference fusion model (reference:
models/MA_attention_8_NEW.py): events are embedded to d_feats, a grouped
QK attention over all event pairs is modulated by a learned affinity of
pairwise relative-position sinusoid embeddings (fST0 multiplies position
affinity with content scores), and heads are recombined by a grouped 1x1
projection.  No V projection — values are the raw embedded features
(reference: :135).

TPU-native redesign:
  * the pairwise position matrix + sinusoid embedding are computed
    *in-graph* from the [N, 2] proposal windows instead of host numpy per
    forward (reference recomputes them on host every call, :38-41);
  * the event axis is padded to a static N with a proposal mask; padded
    keys are excluded via masked softmax — identical math on real rows;
  * head grouping is an einsum, the grouped 1x1 conv a block-diagonal
    einsum; everything lands on the MXU.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from echr_tpu.config import Config
from echr_tpu.ops.core import dense, dense_init, dropout, uniform_init
from echr_tpu.ops.masked import masked_softmax

Array = jax.Array


def init_tsrm(rng: Array, cfg: Config):
    f = cfg.fusion
    in_dim = cfg.tsrm_input_dim
    d = f.d_feats
    ks = jax.random.split(rng, 6)
    p = {
        "event_emb": dense_init(ks[0], in_dim, d),
        "query": dense_init(ks[1], d, d),
        "key": dense_init(ks[2], d, d),
        # grouped 1x1 output projection: per-head [d_feats] -> [d_o/n_head]
        # (reference: nn.Conv2d(groups=n_head), :98-99).  torch conv init
        # bound = 1/sqrt(in_channels/groups * 1 * 1).
        "out_w": uniform_init(
            ks[3], (f.n_head, d, f.d_o // f.n_head), 1.0 / math.sqrt(d)
        ),
        "out_b": uniform_init(ks[4], (f.d_o,), 1.0 / math.sqrt(d)),
    }
    if f.use_posit:
        k1, k2 = jax.random.split(ks[5])
        p["pair_pos_fc1"] = dense_init(k1, d, d)
        p["pair_pos_fc2"] = dense_init(k2, d, f.n_head)
    return p


def position_matrix(soi: Array) -> Array:
    """Pairwise (|Δcenter|/length, log length-ratio): [N, 2] -> [N, N, 2]
    (reference: extract_position_matrix, :66-79 — note the abs-clamp drops
    the sign of Δcenter)."""
    s = soi[:, 0].astype(jnp.float32)
    e = soi[:, 1].astype(jnp.float32)
    center = 0.5 * (s + e)
    # real proposals always have length >= 1 (anchors are (t-k-1, t]), so
    # the clamp only fires on degenerate padding rows — without it a
    # zero-length row makes 1/0 and log(0) whose NaN poisons pair_pos_fc
    # gradients through tanh even though the forward output is masked
    length = jnp.maximum(e - s, 1.0)
    delta_center = (center[:, None] - center[None, :]) / length[:, None]
    delta_center = jnp.maximum(jnp.abs(delta_center), 1e-3)
    delta_length = jnp.log(length[None, :] / length[:, None])
    return jnp.stack([delta_center, delta_length], axis=2)


def position_embedding(pos_mat: Array, feat_dim: int, wave_length: float = 10000.0) -> Array:
    """Sinusoid embedding of the pairwise position matrix: [N, N, 2] ->
    [N, N, feat_dim] (reference: extract_position_embedding, :51-64;
    scale 100.0, wavelength 10000, layout [dc_sin|dc_cos|dl_sin|dl_cos])."""
    n_freq = feat_dim // 4
    feat_range = jnp.arange(n_freq, dtype=jnp.float32)
    dim_mat = jnp.power(wave_length, (4.0 / feat_dim) * feat_range)  # [n_freq]
    div = (100.0 * pos_mat)[..., None] / dim_mat  # [N, N, 2, n_freq]
    emb = jnp.concatenate([jnp.sin(div), jnp.cos(div)], axis=3)  # [N, N, 2, 2*n_freq]
    N = pos_mat.shape[0]
    return emb.reshape(N, pos_mat.shape[1], feat_dim)


def tsrm_forward(
    params,
    feats: Array,
    soi: Array,
    prop_mask: Array,
    cfg: Config,
    train: bool = False,
    rng: Optional[Array] = None,
    compute_dtype=None,
) -> Array:
    """feats [N, in_dim], soi [N, 2], prop_mask [N] -> [N, d_o].

    Rows with prop_mask==0 are padding: they are masked out of every
    softmax as keys; their own outputs are unspecified (callers mask them).
    """
    f = cfg.fusion
    if compute_dtype is None:
        compute_dtype = params["event_emb"]["w"].dtype
    N = feats.shape[0]
    d = f.d_feats
    g = f.n_head
    dg = d // g  # Py2 floor-div semantics (reference: :87,125)

    soi_feats = dense(params["event_emb"], feats, compute_dtype)  # [N, d]

    q = dense(params["query"], soi_feats, compute_dtype).reshape(N, g, dg)
    k = dense(params["key"], soi_feats, compute_dtype).reshape(N, g, dg)
    # content affinity [N(query), g, N(key)], scaled by 1/sqrt(d_k/g)
    aff_scale = jnp.einsum(
        "qgd,kgd->qgk", q.astype(compute_dtype), k.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ) * (1.0 / math.sqrt(dg))

    if f.use_posit:
        pos_emb = position_embedding(position_matrix(soi), d)  # [N, N, d]
        pos1 = dense(params["pair_pos_fc1"], pos_emb, compute_dtype)
        aff_weight = dense(params["pair_pos_fc2"], jnp.tanh(pos1), compute_dtype)
        aff_weight = jnp.transpose(aff_weight, (0, 2, 1))  # [N, g, N]
        if f.fST_type == "fST0":
            weighted = aff_weight * aff_scale
        elif f.fST_type == "fST1":
            weighted = aff_weight + aff_scale
        elif f.fST_type == "fST2":
            weighted = jnp.log(jnp.clip(aff_weight, 1e-6)) + aff_scale
        elif f.fST_type == "fST3":
            weighted = aff_weight
        else:
            raise ValueError(f"unknown fST_type {f.fST_type!r}")
    else:
        weighted = aff_scale

    key_mask = prop_mask[None, None, :]  # [1, 1, N]
    att = masked_softmax(weighted, jnp.broadcast_to(key_mask, weighted.shape), axis=2)
    if train and rng is not None:
        att = dropout(rng, att, 0.3, train=True)  # reference: :100,162

    # heads attend over raw embedded values (no V projection, reference :135)
    head_out = jnp.einsum(
        "qgk,kd->qgd", att.astype(compute_dtype), soi_feats.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )  # [N, g, d]
    out = jnp.einsum(
        "qgd,gdo->qgo", head_out.astype(compute_dtype),
        params["out_w"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ).reshape(N, f.d_o) + params["out_b"]
    return out
