"""Pallas fused attention-score kernel vs the jnp formulation (interpret
mode on CPU; the real kernel runs in bench/eval on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from echr_tpu.ops import pallas_attention
from echr_tpu.ops.attention import additive_attention_init, additive_attention_step
from echr_tpu.ops.core import dense


def test_pallas_scores_match_jnp():
    rng = jax.random.PRNGKey(0)
    T, H, N, D = 128, 128, 16, 96
    p = additive_attention_init(rng, D, H, H)
    pre_att = jax.random.normal(jax.random.fold_in(rng, 1), (T, H))
    att_h = jax.random.normal(jax.random.fold_in(rng, 2), (N, H))
    ref = dense(p["alpha_net"], jnp.tanh(pre_att[None] + att_h[:, None]))[..., 0]
    got = pallas_attention.attention_scores(pre_att, att_h, p["alpha_net"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_attention_step_pallas_flag_consistent():
    rng = jax.random.PRNGKey(1)
    T, H, N, D = 128, 128, 16, 96
    p = additive_attention_init(rng, D, H, H)
    feats = jax.random.normal(jax.random.fold_in(rng, 3), (T, D))
    pre_att = dense(p["ctx2att"], feats)
    h = jax.random.normal(jax.random.fold_in(rng, 4), (N, H))
    mask = (jax.random.uniform(jax.random.fold_in(rng, 5), (N, T)) > 0.3).astype(jnp.float32)
    mask = mask.at[:, 0].set(1.0)
    a1, w1 = additive_attention_step(p, h, feats, pre_att, mask, use_pallas=False)
    a2, w2 = additive_attention_step(p, h, feats, pre_att, mask, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)


def test_unsupported_shapes_fall_back():
    rng = jax.random.PRNGKey(2)
    p = additive_attention_init(rng, 10, 96, 96)  # H=96 not /128
    feats = jax.random.normal(rng, (60, 10))  # T=60 not /8... (60 is /4)
    pre_att = dense(p["ctx2att"], feats)
    h = jax.random.normal(rng, (50, 96))  # N=50 not /64
    mask = jnp.ones((50, 60))
    a, w = additive_attention_step(p, h, feats, pre_att, mask, use_pallas=True)
    assert a.shape == (50, 10)
