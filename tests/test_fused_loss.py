"""Fused teacher-forced loss head == language_model_loss over decoder_forward.

The fused path (runtime.fused_loss_head) hoists the logit matmul out of the
decode scan and computes the masked NLL as (target-logit - logsumexp)
without materialising [N, L, V+1] logprobs.  These tests pin value AND
gradient equality against the reference-shaped path, with train-mode
dropout active (per-step rng consumption must line up exactly).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from echr_tpu import losses
from echr_tpu.config import flagship_config
from echr_tpu.models.captioner import (
    ProposalBatch,
    captioner_train_forward,
    captioner_train_loss,
)
from echr_tpu.models.registry import init_captioner, init_tap
from echr_tpu.models.sst import sst_forward


def _setup(caption_model="three_stream"):
    cfg = flagship_config().replace_in(
        "data", synthetic=True, lda_dim=100, time_buckets=(64,))
    cfg = cfg.replace_in("decoder", CG_vocab_size=80, CG_seq_length=9,
                         caption_model=caption_model,
                         CG_num_layers=3 if caption_model == "three_stream" else 1)
    cfg = cfg.replace_in("runtime", compute_dtype="float32", use_pallas=False)
    cfg = cfg.validate()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tap_params, cg_params = init_tap(k1, cfg), init_captioner(k2, cfg)
    T, N = 64, 8
    r = np.random.RandomState(0)
    feats = jnp.asarray(r.randn(T, cfg.tap.video_dim).astype(np.float32))
    lda = jnp.asarray(r.randn(cfg.data.lda_dim).astype(np.float32))
    fm = jnp.ones((T,), jnp.float32)
    starts = r.randint(0, T - 8, size=N)
    lens = r.randint(2, 10, size=N)
    soi = jnp.asarray(np.stack([starts, np.minimum(starts + lens, T)], 1).astype(np.int32))
    props = ProposalBatch(soi[:, 1] - 1, soi, jnp.ones((N,), jnp.float32))
    tap_feats, _ = sst_forward(tap_params, feats, train=False)
    L = cfg.decoder.CG_seq_length
    labels = np.zeros((N, L + 1), np.int32)
    masks = np.zeros((N, L + 1), np.float32)
    for i in range(N):
        n_tok = r.randint(2, L)
        labels[i, 1 : 1 + n_tok] = r.randint(1, cfg.decoder.CG_vocab_size, size=n_tok)
        masks[i, : 2 + n_tok] = 1.0  # BOS + tokens + terminating step
    return (cfg, cg_params, tap_feats, feats, lda, fm, props,
            jnp.asarray(labels), jnp.asarray(np.minimum(masks, 1.0)))


def _both_losses(cfg, cg, tap_feats, feats, lda, fm, props, labels, masks,
                 train, rng):
    def unfused(cg):
        lp = captioner_train_forward(cg, cfg, tap_feats, feats, lda, labels,
                                     props, frame_mask=fm, train=train, rng=rng)
        return losses.language_model_loss(lp, labels[:, 1:], masks[:, 1:])

    def fused(cg):
        return captioner_train_loss(cg, cfg, tap_feats, feats, lda, labels,
                                    masks, props, frame_mask=fm, train=train,
                                    rng=rng)

    return unfused, fused


@pytest.mark.parametrize("caption_model", ["three_stream", "show_attend_tell"])
@pytest.mark.parametrize("train", [False, True])
def test_fused_loss_value(caption_model, train):
    cfg, cg, *rest = _setup(caption_model)
    rng = jax.random.PRNGKey(5) if train else None
    unfused, fused = _both_losses(cfg, cg, *rest, train, rng)
    l1 = float(unfused(cg))
    l2 = float(fused(cg))
    assert l1 == pytest.approx(l2, abs=2e-5), (l1, l2)


def test_fused_loss_grads():
    cfg, cg, *rest = _setup("three_stream")
    rng = jax.random.PRNGKey(5)
    unfused, fused = _both_losses(cfg, cg, *rest, True, rng)
    g1 = jax.grad(unfused)(cg)
    g2 = jax.grad(fused)(cg)
    flat1, _ = jax.tree_util.tree_flatten_with_path(g1)
    flat2, _ = jax.tree_util.tree_flatten_with_path(g2)
    assert len(flat1) == len(flat2)
    for (p1, a), (p2, b) in zip(flat1, flat2):
        assert p1 == p2
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5,
            err_msg=jax.tree_util.keystr(p1))
