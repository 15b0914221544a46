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


def dense(p, x: Array, compute_dtype=jnp.float32) -> Array:
    """y = x @ w (+ b), accumulating in fp32 on the MXU."""
    y = jnp.dot(
        x.astype(compute_dtype),
        p["w"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y


def dropout(rng: Optional[Array], x: Array, rate: float, train: bool) -> Array:
    """Inverted dropout (torch semantics: scale by 1/(1-p) at train time)."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
