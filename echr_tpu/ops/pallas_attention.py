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


def supported(pre_att: Array, att_h: Array) -> bool:
    T, H = pre_att.shape
    N = att_h.shape[0]
    return (
        N % _TILE_N == 0
        and T % _TILE_T == 0
        and H % 128 == 0
        and pre_att.dtype == jnp.float32
    )  # T buckets below 128 fall back to the jnp path


def attention_scores(pre_att: Array, att_h: Array, alpha_params) -> Array:
    """scores [N, T] = alpha(tanh(pre_att[T,H] + att_h[N,H]))."""
    w = alpha_params["w"].astype(jnp.float32)  # [H, 1]
    b = jnp.reshape(alpha_params["b"].astype(jnp.float32), (1, 1))
    interpret = jax.default_backend() != "tpu"
    return _attention_scores_pallas(
        pre_att.astype(jnp.float32), att_h.astype(jnp.float32), w, b,
        interpret=interpret,
    )
