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

from typing import Optional, Tuple

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


def additive_attention_precompute(p, feats: Array, compute_dtype=None) -> Array:
    """Project the shared frame features once per video: [T, D] -> [T, Hatt].

    compute_dtype=None follows the weight dtype like dense() everywhere
    else — under a bf16 param tree the features are cast to bf16 before
    the matmul (f32 accumulation), which also makes a bf16 feature
    TRANSFER (runtime.transfer_dtype) bit-transparent on this path."""
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


# ---------------------------------------------------------------------------
# Group-shared windowed attention — kept as infrastructure (FOURTH negative
# result on the decode-attention bottleneck, round 2b; see BENCH_NOTES).
# Proposals sorted by window start in groups of ng share ONE [tg, Hatt]
# dynamic pre_att slice, keeping the broadcast-fused form while computing
# ~tg/T of the tanh work.  Isolated fori_loop probe: 8.8 vs 13.2 ms/step
# (33% faster).  Integrated into the real vmapped decode scan: 158 vs
# 104 ms/batch (50% SLOWER) — the per-group vmap + 512 dynamic slices per
# step break XLA's scan fusion and the [ng, tg] x [tg, D] weighted sums
# underfill the MXU.  Exact modulo bf16 matmul reassociation
# (tests/test_grouped_attention.py); not wired into the decode path.
# ---------------------------------------------------------------------------


def grouped_tg_required(soi, n_group: int) -> int:
    """Host-side helper: the slice length TG needed for grouped windowed
    attention over these [N, 2] windows with groups of n_group proposals.
    The caller may use a grouped config only when the config's
    grouped_attention_tg >= this value (else windows leak out of their
    group's slice and the math breaks)."""
    import numpy as np

    soi = np.asarray(soi)
    if soi.ndim == 3:  # [B, N, 2] batched
        return max(int(grouped_tg_required(s, n_group)) for s in soi)
    if len(soi) % n_group != 0:
        # grouped_attention_precompute's dense reshape requires ng | N —
        # enforce the same contract here so both halves of the API agree
        raise ValueError(
            f"n_group={n_group} must divide the proposal count {len(soi)}"
        )
    order = np.argsort(soi[:, 0], kind="stable")
    s = soi[order, 0]
    e = soi[order, 1]
    gs = s.reshape(-1, n_group)
    ge = e.reshape(-1, n_group)
    return int((ge.max(1) - gs.min(1)).max(initial=1))


def grouped_attention_precompute(clip_mask: Array, tg: int, ng: int):
    """In-graph grouping metadata, once per video (outside the decode scan).

    Pure window geometry (no attention features).  clip_mask [N, T]
    contiguous per-proposal windows (reference: the padded clip windows of
    CaptionGenerator.get_clip_context, CaptionGenerator.py:142-160, which
    the masked full-T attention replaces).  Requires ng | N (groups are
    dense reshapes).  Returns a dict with the start-sorted proposal order,
    its inverse, each group's shared slice start (clamped into [0, T-tg]),
    and the window masks relative to the slice.  Correctness requires
    every window to fit its group's slice — verified by the CALLER on
    host (grouped_tg_required)."""
    N, T = clip_mask.shape
    idx = jnp.arange(T)[None, :]
    start = jnp.min(jnp.where(clip_mask > 0, idx, T), axis=1)  # [N]
    end = jnp.max(jnp.where(clip_mask > 0, idx + 1, 0), axis=1)
    order = jnp.argsort(start, stable=True).astype(jnp.int32)
    inv_order = jnp.argsort(order, stable=True).astype(jnp.int32)
    g = N // ng
    gs = start[order].reshape(g, ng)
    ge = end[order].reshape(g, ng)
    slice_start = jnp.clip(jnp.min(gs, axis=1), 0, T - tg).astype(jnp.int32)  # [g]
    rel_lo = (gs - slice_start[:, None])[..., None]  # [g, ng, 1]
    rel_hi = (ge - slice_start[:, None])[..., None]
    pos = jnp.arange(tg)[None, None, :]
    rel = ((pos >= rel_lo) & (pos < rel_hi)).astype(jnp.float32)  # [g, ng, tg]
    return {"order": order, "inv_order": inv_order,
            "slice_start": slice_start, "rel": rel}


def grouped_attention_step(p, h: Array, feats: Array, pre_att: Array,
                           grp, compute_dtype) -> Array:
    """Windowed attention via group-shared pre_att slices.

    Same math as the reference's per-proposal windowed additive attention
    (Attention.forward, OldModel_NEW.py:386-401 — score over the window,
    masked softmax, weighted sum): each group of ng start-sorted proposals
    computes tanh scores over ONE [tg, Hatt] dynamic slice (a shared
    broadcast operand, like the full-T path) instead of all T frames.
    Equal to the full-T masked attention up to bf16 matmul reassociation
    (the weighted sum runs over tg instead of T terms).  Returns
    att_res [N, D]; attention weights are not materialised on this path."""
    N = h.shape[0]
    g, ng, tg = grp["rel"].shape
    att_h = dense(p["h2att"], h, compute_dtype)  # [N, Hatt]
    ah = att_h[grp["order"]].reshape(g, ng, -1)

    def one_group(s0, ahg, rel):
        pslice = jax.lax.dynamic_slice(pre_att, (s0, 0), (tg, pre_att.shape[1]))
        fslice = jax.lax.dynamic_slice(feats, (s0, 0), (tg, feats.shape[1]))
        scores = dense(p["alpha_net"],
                       jnp.tanh(pslice[None] + ahg[:, None]), compute_dtype)[..., 0]
        w = masked_softmax(scores, rel, axis=-1)
        return jnp.dot(w.astype(compute_dtype), fslice.astype(compute_dtype),
                       preferred_element_type=jnp.float32)  # [ng, D]

    att = jax.vmap(one_group)(grp["slice_start"], ah, grp["rel"]).reshape(N, -1)
    return att[grp["inv_order"]]


def additive_attention_step(
    p,
    h: Array,
    feats: Array,
    pre_att: Array,
    frame_mask: Array,
    compute_dtype=None,
    use_pallas: bool = False,
    remat: bool = False,
    grouping=None,
    fused: bool = False,
    pallas_t_max: Optional[int] = None,
) -> Tuple[Array, Array]:
    """One attention step for all proposals at once.

    h: [N, Hq] query; feats: [T, D]; pre_att: [T, Hatt] (precomputed);
    frame_mask: [N, T] window mask.  Returns (att_res [N, D], weights [N, T]).

    use_pallas routes the score computation through the fused Pallas kernel
    (no [N, T, H] HBM intermediate) — no-grad decode paths only.
    remat recomputes the tanh in the backward pass — training paths.
    grouping (from grouped_attention_precompute) selects the group-shared
    windowed path — no-grad decode paths only; weights are returned as None.
    fused additionally folds the masked softmax + weighted sum into the
    kernel (flash-style online softmax; weights returned as None) —
    no-grad decode paths only.
    """
    if compute_dtype is None:
        compute_dtype = p["h2att"]["w"].dtype
    if grouping is not None:
        return grouped_attention_step(p, h, feats, pre_att, grouping, compute_dtype), None
    att_h = dense(p["h2att"], h, compute_dtype)  # [N, Hatt]
    if use_pallas and fused and not remat:
        from echr_tpu.ops import pallas_attention

        # the fused kernel's AV matmul is hardcoded to the production bf16
        # decode dtype (pallas_attention._fused_kernel) — an fp32 caller
        # (parity/fidelity modes) must take the unfused path, whose matmul
        # follows compute_dtype
        if (pallas_attention.supported(pre_att, att_h, t_max=pallas_t_max)
                and compute_dtype == jnp.bfloat16):
            return pallas_attention.attention_fused(
                pre_att, att_h, p["alpha_net"], frame_mask, feats), None
    if use_pallas:
        from echr_tpu.ops import pallas_attention

        # the differentiable (training) kernel has no T ceiling; the
        # no-grad decode kernel is gated at the measured crossover
        # (default _MAX_T_DECODE, overridable via runtime.pallas_decode_t_max)
        if pallas_attention.supported(pre_att, att_h, differentiable=remat,
                                      t_max=pallas_t_max):
            if remat:
                # training: differentiable kernel (custom VJP recomputes
                # the tanh tile-wise in VMEM — the kernel-level form of
                # the jax.checkpoint remat below)
                scores = pallas_attention.attention_scores_diff(
                    pre_att, att_h, p["alpha_net"])
            else:
                # no-grad decode: the mask-aware kernel skips fully-masked
                # [Nt, Tt] tile tanh blocks (decoder_sample sorts proposals
                # by window start to cluster them — measured -16%/-20%
                # attention step at T=256/512 sorted, +2% worst case dense,
                # experiments/probe_tile_skip.py); exact wherever mask==1
                scores = pallas_attention.attention_scores_masked(
                    pre_att, att_h, p["alpha_net"], frame_mask)
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
