"""Small parameter/primitive helpers shared by all models.

Parameters are plain nested-dict pytrees of jnp arrays (fp32 master
weights); forward functions take an explicit ``compute_dtype`` so parity
gates run fp32 while production paths run bf16 with fp32 accumulation
(``preferred_element_type``) on the MXU.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def uniform_init(rng: Array, shape, bound: float, dtype=jnp.float32) -> Array:
    return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)


def dense_init(rng: Array, in_dim: int, out_dim: int, bias: bool = True, bound: Optional[float] = None):
    """Linear params with torch's default init U(-1/sqrt(fan_in), +)."""
    if bound is None:
        bound = 1.0 / math.sqrt(in_dim)
    k_w, k_b = jax.random.split(rng)
    p = {"w": uniform_init(k_w, (in_dim, out_dim), bound)}
    if bias:
        p["b"] = uniform_init(k_b, (out_dim,), bound)
    return p


def dense(p, x: Array, compute_dtype=None) -> Array:
    """y = x @ w (+ b), accumulating in fp32 on the MXU.

    compute_dtype=None follows the weight dtype, so casting a param tree to
    bf16 once (see cast_compute_dtype) switches the whole forward to bf16
    inputs with fp32 accumulation."""
    if compute_dtype is None:
        compute_dtype = p["w"].dtype
    y = jnp.dot(
        x.astype(compute_dtype),
        p["w"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y


def cast_compute_dtype(params, dtype_name: str):
    """Cast all matrix-shaped weights (ndim >= 2) to the compute dtype; keep
    biases/1-D leaves in fp32.  Master weights stay fp32 in the train state;
    casting inside the loss makes gradients flow back to fp32 (standard
    mixed precision)."""
    if dtype_name in ("float32", "fp32", None):
        return params
    dt = jnp.dtype(dtype_name)
    return jax.tree.map(
        lambda x: x.astype(dt) if hasattr(x, "ndim") and x.ndim >= 2 else x, params
    )


def dropout(rng: Optional[Array], x: Array, rate: float, train: bool) -> Array:
    """Inverted dropout (torch semantics: scale by 1/(1-p) at train time)."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
