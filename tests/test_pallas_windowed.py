"""Windowed-attention kernel == full masked-softmax attention (interpret
mode on CPU; perf measured on TPU in bench probes)."""
import jax
import jax.numpy as jnp
import numpy as np

from echr_tpu.ops import pallas_windowed_attention as PW
from echr_tpu.ops.attention import additive_attention_init, additive_attention_step
from echr_tpu.ops.core import dense
from echr_tpu.ops.masked import segment_window_mask


def _setup(T=128, H=128, D=96, N=16, W=32, seed=0):
    rng = jax.random.PRNGKey(seed)
    p = additive_attention_init(rng, D, H, H)
    feats = jax.random.normal(jax.random.fold_in(rng, 1), (T, D))
    pre_att = dense(p["ctx2att"], feats)
    h = jax.random.normal(jax.random.fold_in(rng, 2), (N, H))
    att_h = dense(p["h2att"], h)
    r = np.random.RandomState(seed)
    starts = r.randint(0, T - 2, size=N)
    lens = np.minimum(r.randint(1, W + 1, size=N), T - starts)
    soi = jnp.asarray(np.stack([starts, starts + lens], 1).astype(np.int32))
    return p, feats, pre_att, h, att_h, soi


def test_windowed_matches_full_attention():
    p, feats, pre_att, h, att_h, soi = _setup()
    assert PW.supported(pre_att, att_h, 32)
    got = PW.windowed_attention(pre_att, feats, att_h, p["alpha_net"], soi, W=32)
    mask = segment_window_mask(soi, feats.shape[0])
    ref, _ = additive_attention_step(p, h, feats, pre_att, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_windowed_end_clamp():
    # windows touching the last frame exercise the DMA clamp + shift path
    T, W, N = 64, 16, 8
    p, feats, pre_att, h, att_h, _ = _setup(T=T, N=N, W=W, seed=3)
    starts = np.array([T - 4, T - 16, T - 1, 0, 5, 50, 60, 30])
    lens = np.array([4, 16, 1, 7, 10, 14, 4, 16])
    soi = jnp.asarray(np.stack([starts, starts + lens], 1).astype(np.int32))
    got = PW.windowed_attention(pre_att, feats, att_h, p["alpha_net"], soi, W=W)
    mask = segment_window_mask(soi, T)
    ref, _ = additive_attention_step(p, h, feats, pre_att, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
