"""Masked array primitives.

Everything in echr_tpu is statically shaped and padded; these helpers make
padded entries mathematically invisible.  The reference instead loops over
ragged windows on the host (reference: CaptionGenerator.py:106-167); here
segment pooling is a mask matmul that lands on the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG_INF = -1e30


def masked_softmax(logits: Array, mask: Array, axis: int = -1) -> Array:
    """Softmax over ``axis`` restricted to mask==1 entries.

    Identical to the reference's softmax-then-mask-renormalize
    (reference: OldModel_NEW.py:394-397): with a shared denominator,
    softmax(x)*m / sum(softmax(x)*m) == exp(x)*m / sum(exp(x)*m).
    Fully-masked rows return all zeros.
    """
    mask = mask.astype(bool)
    masked_logits = jnp.where(mask, logits, _NEG_INF)
    m = jnp.max(masked_logits, axis=axis, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.where(mask, jnp.exp(masked_logits - m), 0.0)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.where(denom == 0.0, 1.0, denom)


def masked_mean(x: Array, mask: Array, axis: int = 0, eps: float = 0.0,
                compute_dtype=None) -> Array:
    """Mean of x over ``axis`` counting only mask==1 rows.

    compute_dtype casts x before accumulating (accumulation stays in x's
    promoted f32), matching segment_mean — under bf16 compute this makes
    bf16-quantised inputs transparent (RuntimeConfig.transfer_dtype)."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype).astype(jnp.float32)
    mask = mask.astype(x.dtype)
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    num = jnp.sum(x * mask, axis=axis)
    den = jnp.sum(mask, axis=axis)
    return num / jnp.maximum(den, 1.0 if eps == 0.0 else eps)


def segment_window_mask(soi: Array, T: int) -> Array:
    """[N, T] mask with 1 where s <= t < e for each proposal window [s, e).

    Replaces the reference's per-proposal python slicing
    (CaptionGenerator.py:111-114,148-159) with one broadcast compare.
    """
    t = jnp.arange(T)[None, :]
    s = soi[:, 0:1]
    e = soi[:, 1:2]
    return ((t >= s) & (t < e)).astype(jnp.float32)


def segment_mean(feats: Array, soi: Array, compute_dtype=jnp.float32) -> Array:
    """Per-proposal mean of ``feats[s:e]`` as a mask matmul.

    feats: [T, D]; soi: [N, 2] int windows [s, e).  Returns [N, D].
    Equivalent to the reference's ``c3d_feats[soi[0]:soi[1]].mean(0)``
    (CaptionGenerator.py:110-114) but one MXU matmul for all proposals.
    """
    T = feats.shape[0]
    m = segment_window_mask(soi, T)
    lengths = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
    pooled = jnp.dot(
        (m / lengths).astype(compute_dtype),
        feats.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return pooled


def window_mean_padded(feats: Array, soi: Array, prop_mask: Array, compute_dtype=jnp.float32) -> Array:
    """Reference-quirk mean over the *padded* clip window.

    The reference pads each clip window to the batch max length and then
    calls ``clip.mean(1)`` — dividing by max_len, not by each window's own
    length (reference: OldModel_NEW.py:89,314 with CaptionGenerator.py:142-151).
    Kept for exact parity of the AllImg / init_hidden('C') paths.
    """
    T = feats.shape[0]
    m = segment_window_mask(soi, T)
    lengths = m.sum(axis=1)
    max_len = jnp.maximum(jnp.max(jnp.where(prop_mask > 0, lengths, 0.0)), 1.0)
    pooled = jnp.dot(
        m.astype(compute_dtype), feats.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return pooled / max_len
