"""Pallas TPU kernel: fused additive-attention scores.

The additive (Bahdanau) score is
    scores[n, t] = w_alpha . tanh(pre_att[t, :] + att_h[n, :]) + b_alpha
(reference math: OldModel_NEW.py:386-392).  Expressed in jnp this
materializes a [N, T, H] intermediate — at eval scale (128 proposals x
256 frames x 512 hidden) that is ~67 MB, far beyond VMEM, so XLA spills it
to HBM twice per decode step.  This kernel tiles (N, T) and keeps the
[Nt, Tt, H] block in VMEM, turning the op from HBM-bandwidth-bound into a
VPU tanh + small matvec.

Used on the no-gradient decode paths (greedy/beam eval); training keeps the
jnp formulation so autodiff is untouched.  Falls back to interpret mode off
TPU (CPU tests).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

# output block is [TILE_N, TILE_T]: TPU requires (sublane % 8, lane % 128)
_TILE_N = 8
_TILE_T = 128


def _kernel(pre_att_ref, att_h_ref, w_ref, b_ref, out_ref):
    # blocks: pre_att [Tt, H], att_h [Nt, H], w [H, 1], b [1, 1] -> out [Nt, Tt]
    pre = pre_att_ref[:]  # [Tt, H]
    q = att_h_ref[:]  # [Nt, H]
    y = jnp.tanh(q[:, None, :] + pre[None, :, :])  # [Nt, Tt, H]
    w = w_ref[:]  # [H, 1]
    out = jax.lax.dot_general(
        y, w, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[..., 0]  # [Nt, Tt]
    out_ref[:] = out + b_ref[0, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _attention_scores_pallas(pre_att, att_h, w, b, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, H = pre_att.shape
    N = att_h.shape[0]
    grid = (N // _TILE_N, T // _TILE_T)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((N, T), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_T, H), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_N, _TILE_T), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pre_att, att_h, w, b)


# kernel-vs-XLA crossover (measured on TPU v5e at H=512, bf16 weights —
# docs/BENCH_NOTES.md "Pallas score kernel T crossover"): the NO-GRAD
# score kernel wins up to T=384 (+10-11%/decode step) and LOSES beyond
# (-22% at T=512, -37% at T=1024) — past the crossover the dense
# broadcast amortizes its HBM traffic better than the kernel's [N, T]
# score round trip.  The DIFFERENTIABLE kernel wins at EVERY bucket
# (+24/36/27/7% fwd+bwd at T=256/384/512/1024): its backward's saving —
# never materializing the [N, T, H] tanh in HBM — grows with T, so it
# gets no ceiling.
_MAX_T_DECODE = 384


def supported(pre_att: Array, att_h: Array, *,
              differentiable: bool = False,
              t_max: Optional[int] = None) -> bool:
    T, H = pre_att.shape
    N = att_h.shape[0]
    if t_max is None:
        t_max = _MAX_T_DECODE  # overridable via runtime.pallas_decode_t_max
    return (
        N % _TILE_N == 0
        and T % _TILE_T == 0
        and (differentiable or T <= t_max)
        and H % 128 == 0
        and pre_att.dtype == jnp.float32
    )  # T buckets below 128 (or above the decode ceiling) -> jnp path


def attention_scores(pre_att: Array, att_h: Array, alpha_params) -> Array:
    """scores [N, T] = alpha(tanh(pre_att[T,H] + att_h[N,H]))."""
    w = alpha_params["w"].astype(jnp.float32)  # [H, 1]
    b = jnp.reshape(alpha_params["b"].astype(jnp.float32), (1, 1))
    interpret = jax.default_backend() != "tpu"
    return _attention_scores_pallas(
        pre_att.astype(jnp.float32), att_h.astype(jnp.float32), w, b,
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Mask-aware tile-skipping variant (no-grad decode): the window mask makes
# most [TILE_N, TILE_T] score tiles FULLY masked when proposals are sorted
# by window start (ECHR windows are short events inside a long video —
# reference: the padded clip windows of CaptionGenerator.py:142-160).
# masked_softmax ignores masked columns, so a fully-masked tile's scores
# are never read: skip its 512K-tanh block entirely and write zeros.
# Exact — identical outputs wherever mask==1 — and adaptive: dense masks
# degrade to the plain kernel plus one SMEM flag read per tile.
# ---------------------------------------------------------------------------


def _kernel_skip(pre_att_ref, att_h_ref, w_ref, b_ref, any_ref, out_ref):
    from jax.experimental import pallas as pl

    # any_ref holds the FULL [gN, gT] flag grid in SMEM (tiny); a (1, 1)
    # block would violate the TPU (8, 128) tile rule
    flag = any_ref[pl.program_id(0), pl.program_id(1)]

    @pl.when(flag > 0)
    def _compute():
        pre = pre_att_ref[:]  # [Tt, H]
        q = att_h_ref[:]  # [Nt, H]
        y = jnp.tanh(q[:, None, :] + pre[None, :, :])  # [Nt, Tt, H]
        out = jax.lax.dot_general(
            y, w_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[..., 0]  # [Nt, Tt]
        out_ref[:] = out + b_ref[0, 0]

    @pl.when(flag == 0)
    def _zero():
        # masked columns are -inf'd by the caller's masked_softmax; any
        # finite fill is correct
        out_ref[:] = jnp.zeros_like(out_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _attention_scores_pallas_masked(pre_att, att_h, w, b, tile_any,
                                    interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, H = pre_att.shape
    N = att_h.shape[0]
    gN, gT = N // _TILE_N, T // _TILE_T
    return pl.pallas_call(
        _kernel_skip,
        out_shape=jax.ShapeDtypeStruct((N, T), jnp.float32),
        grid=(gN, gT),
        in_specs=[
            pl.BlockSpec((_TILE_T, H), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((gN, gT), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_N, _TILE_T), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pre_att, att_h, w, b, tile_any)


def tile_any_mask(mask: Array) -> Array:
    """Per-[TILE_N, TILE_T]-tile any-unmasked flags [N/Nt, T/Tt] int32 for
    the tile-skipping kernel, computed in-graph from the [N, T] window
    mask (fuses into the surrounding jit; ~a few KB)."""
    N, T = mask.shape
    g = mask.reshape(N // _TILE_N, _TILE_N, T // _TILE_T, _TILE_T)
    return (jnp.max(g, axis=(1, 3)) > 0).astype(jnp.int32)


def attention_scores_masked(pre_att: Array, att_h: Array, alpha_params,
                            mask: Array) -> Array:
    """scores [N, T] with fully-masked tiles skipped (zero-filled).  Equal
    to attention_scores wherever mask==1; masked positions may differ but
    are never consumed (masked_softmax).  The caller sorts proposals by
    window start to cluster tiles (engine paths do; unsorted inputs are
    still exact, just less skippable)."""
    w = alpha_params["w"].astype(jnp.float32)  # [H, 1]
    b = jnp.reshape(alpha_params["b"].astype(jnp.float32), (1, 1))
    interpret = jax.default_backend() != "tpu"
    return _attention_scores_pallas_masked(
        pre_att.astype(jnp.float32), att_h.astype(jnp.float32), w, b,
        tile_any_mask(mask), interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Fully fused attention step (no-grad decode): scores + masked softmax +
# weighted sum in ONE kernel with an online (flash-style) softmax — the
# [N, T] scores/weights never round-trip HBM and the AV matmul (MXU)
# overlaps the next tile's tanh (VPU) inside the kernel pipeline.
# Matches ops.masked.masked_softmax semantics exactly: exp(s - rowmax)
# restricted to mask==1, fully-masked rows return zeros.
# ---------------------------------------------------------------------------


def _fused_kernel(pre_att_ref, att_h_ref, w_ref, b_ref, mask_ref, feats_ref,
                  out_ref, acc_ref, m_ref, l_ref):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)  # inner: T blocks
    gT = pl.num_programs(1)

    @pl.when(j == 0)
    def _reset():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

    pre = pre_att_ref[:]  # [Tt, H]
    q = att_h_ref[:]  # [Nt, H]
    w = w_ref[:]  # [H, 1]
    y = jnp.tanh(q[:, None, :] + pre[None, :, :])  # [Nt, Tt, H]
    s = jax.lax.dot_general(
        y, w, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[..., 0] + b_ref[0, 0]  # [Nt, Tt]
    mask = mask_ref[:] > 0
    s = jnp.where(mask, s, -1e30)

    m_prev = m_ref[:]  # [Nt, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)  # [Nt, 1]
    p_ = jnp.where(mask, jnp.exp(s - m_new), 0.0)  # [Nt, Tt]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p_, axis=1, keepdims=True)
    # AV in the production decode dtype (the unfused path matmuls
    # weights.astype(bf16) @ feats.astype(bf16) with f32 accumulation)
    av = jax.lax.dot_general(
        p_.astype(jnp.bfloat16), feats_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Nt, D]
    acc_ref[:] = acc_ref[:] * alpha + av
    m_ref[:] = m_new

    @pl.when(j == gT - 1)
    def _finish():
        l = l_ref[:]
        out_ref[:] = jnp.where(l > 0, acc_ref[:] / jnp.where(l > 0, l, 1.0), 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _attention_fused_pallas(pre_att, att_h, w, b, mask, feats,
                            interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, H = pre_att.shape
    N = att_h.shape[0]
    D = feats.shape[1]
    grid = (N // _TILE_N, T // _TILE_T)
    return pl.pallas_call(
        _fused_kernel,
        out_shape=jax.ShapeDtypeStruct((N, D), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_T, H), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((_TILE_N, _TILE_T), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_T, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_N, D), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_TILE_N, D), jnp.float32),
            pltpu.VMEM((_TILE_N, 1), jnp.float32),
            pltpu.VMEM((_TILE_N, 1), jnp.float32),
        ],
        interpret=interpret,
    )(pre_att, att_h, w, b, mask, feats)


def attention_fused(pre_att: Array, att_h: Array, alpha_params,
                    mask: Array, feats: Array) -> Array:
    """att_res [N, D] = masked_softmax(alpha(tanh(pre+q)), mask) @ feats,
    one kernel, online softmax.  No-grad decode paths only."""
    w = alpha_params["w"].astype(jnp.float32)
    b = jnp.reshape(alpha_params["b"].astype(jnp.float32), (1, 1))
    interpret = jax.default_backend() != "tpu"
    return _attention_fused_pallas(
        pre_att.astype(jnp.float32), att_h.astype(jnp.float32), w, b,
        mask.astype(jnp.float32), feats.astype(jnp.float32),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Differentiable variant (training): custom VJP whose backward kernel
# RECOMPUTES tanh per VMEM tile — like jax.checkpoint, the [N, T, H]
# intermediate never exists, but here it never exists in HBM in the
# backward either.  Grid order (T blocks OUTER, N blocks INNER) so that
#   * d_pre [T, H] accumulates across the inner (consecutive) N steps,
#   * d_w [1, H] accumulates in a constant output block,
#   * d_q is emitted as [T/Tt, N, H] partials (tiny: gT is 1-2 at our
#     bucket sizes) and reduced outside the kernel.
# ---------------------------------------------------------------------------


def _bwd_kernel(pre_att_ref, att_h_ref, w_ref, g_ref,
                d_pre_ref, d_q_ref, d_w_ref):
    from jax.experimental import pallas as pl

    j = pl.program_id(0)  # outer: T blocks
    i = pl.program_id(1)  # inner: N blocks
    pre = pre_att_ref[:]  # [Tt, H]
    q = att_h_ref[:]  # [Nt, H]
    w = w_ref[:]  # [1, H]
    g = g_ref[:]  # [Nt, Tt]
    y = jnp.tanh(q[:, None, :] + pre[None, :, :])  # [Nt, Tt, H]
    dz = (g[:, :, None] * w[None, :, :]) * (1.0 - y * y)  # [Nt, Tt, H]
    d_q_ref[:] = jnp.sum(dz, axis=1)[None]  # [1, Nt, H] partial, this T block

    @pl.when(i == 0)
    def _init_pre():
        d_pre_ref[:] = jnp.zeros_like(d_pre_ref)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init_w():
        d_w_ref[:] = jnp.zeros_like(d_w_ref)

    d_pre_ref[:] += jnp.sum(dz, axis=0)  # [Tt, H]
    d_w_ref[:] += jnp.sum(g[:, :, None] * y, axis=(0, 1))[None, :]  # [1, H]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _attention_scores_bwd_pallas(pre_att, att_h, w_row, g, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, H = pre_att.shape
    N = att_h.shape[0]
    gT, gN = T // _TILE_T, N // _TILE_N
    d_pre, d_q_part, d_w = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, H), jnp.float32),
            jax.ShapeDtypeStruct((gT, N, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ),
        grid=(gT, gN),
        in_specs=[
            pl.BlockSpec((_TILE_T, H), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, H), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, _TILE_T), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_TILE_T, H), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_N, H), lambda j, i: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(pre_att, att_h, w_row, g)
    return d_pre, jnp.sum(d_q_part, axis=0), d_w


def _scores_diff_impl(pre_att, att_h, w, b):
    interpret = jax.default_backend() != "tpu"
    return _attention_scores_pallas(pre_att, att_h, w, b, interpret=interpret)


@jax.custom_vjp
def _scores_diff(pre_att, att_h, w, b):
    return _scores_diff_impl(pre_att, att_h, w, b)


def _scores_diff_fwd(pre_att, att_h, w, b):
    return _scores_diff_impl(pre_att, att_h, w, b), (pre_att, att_h, w)


def _scores_diff_bwd(res, g):
    pre_att, att_h, w = res
    interpret = jax.default_backend() != "tpu"
    g = g.astype(jnp.float32)
    d_pre, d_q, d_w_row = _attention_scores_bwd_pallas(
        pre_att, att_h, jnp.reshape(w, (1, -1)), g, interpret=interpret)
    d_b = jnp.reshape(jnp.sum(g), (1, 1))
    return d_pre, d_q, jnp.reshape(d_w_row, w.shape), d_b


_scores_diff.defvjp(_scores_diff_fwd, _scores_diff_bwd)


def attention_scores_diff(pre_att: Array, att_h: Array, alpha_params) -> Array:
    """Differentiable fused scores for TRAINING paths: forward identical to
    attention_scores; the backward recomputes tanh tile-by-tile in VMEM
    instead of materialising the [N, T, H] intermediate in HBM (the jnp
    remat path still round-trips it through HBM inside the fused backward).
    Gradients equal the jnp formulation's (f32; pinned by
    tests/test_pallas_attention.py)."""
    w = alpha_params["w"].astype(jnp.float32)  # [H, 1]
    b = jnp.reshape(alpha_params["b"].astype(jnp.float32), (1, 1))
    return _scores_diff(
        pre_att.astype(jnp.float32), att_h.astype(jnp.float32), w, b)
