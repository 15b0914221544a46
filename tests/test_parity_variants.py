"""Value-level parity gates for the full decoder-core zoo.

Every CORE_REGISTRY entry beyond three_stream/show_attend_tell (gated in
test_parity.py / test_parity_sat.py) is gated here against MultiCoreOracle:
teacher-forced logprobs (atol 5e-4, fp32 accumulation drift) and greedy
decode token-for-token (reference: models/OldModel_NEW.py :276-323,
:404-508, :511-567, :569-760, :888-941, :944-1006)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from echr_tpu.config import flagship_config
from echr_tpu.models.captioner import ProposalBatch, captioner_sample, captioner_train_forward
from echr_tpu.models.registry import init_captioner, init_tap
from echr_tpu.models.sst import sst_forward

from oracle_torch import MultiCoreOracle
from test_parity import _oracle_ctx

VARIANTS = [
    "all_img",
    "h3",
    "h3_dense",
    "h3_dense_add",
    "two_stream",
    "two_stream_jump",
    "two_stream_3lstm",
    "three_stream_2stream",
    "three_stream_2stream_LDA",
    "three_stream_2stream_CC",
]


def _variant_cfg(model):
    c = flagship_config()
    c = c.replace_in("decoder", CG_vocab_size=120, CG_seq_length=10,
                     caption_model=model, CG_num_layers=2)
    if model == "all_img":
        # the only core consuming get_input_feats/init_linear here
        c = c.replace_in("context", CG_input_feats_type="V+E+C",
                         CG_init_feats_type="V+E+C")
    return c


def _setup(cfg, seed=7):
    rng = jax.random.PRNGKey(seed)
    k_tap, k_cap, k_feat = jax.random.split(rng, 3)
    tap_params = init_tap(k_tap, cfg)
    cap_params = init_captioner(k_cap, cfg)
    T, D = 40, cfg.tap.video_dim
    c3d = jax.random.normal(jax.random.fold_in(k_feat, 0), (T, D)) * 0.5
    lda = jax.random.normal(jax.random.fold_in(k_feat, 1), (cfg.data.lda_dim,))
    soi = np.array([[0, 6], [3, 12], [10, 11], [5, 40], [20, 30], [35, 38]])
    ind = soi[:, 1] - 1
    props = ProposalBatch(jnp.array(ind), jnp.array(soi), jnp.ones((len(soi),), jnp.float32))
    return tap_params, cap_params, c3d, lda, props, soi


@pytest.mark.parametrize("model", VARIANTS)
def test_teacher_forced_parity(model):
    cfg = _variant_cfg(model)
    tap_params, cap_params, c3d, lda, props, soi = _setup(cfg)
    N = len(soi)
    rng = np.random.RandomState(3)
    L = cfg.decoder.CG_seq_length
    seq = np.zeros((N, L + 1), dtype=np.int64)
    for i, ln in enumerate(rng.randint(2, L - 1, size=N)):
        seq[i, 1 : 1 + ln] = rng.randint(1, cfg.decoder.CG_vocab_size, size=ln)

    tap_h, _ = sst_forward(tap_params, c3d)
    jax_lp = captioner_train_forward(
        cap_params, cfg, tap_h, c3d, lda, jnp.array(seq), props, train=False
    )
    video, event, clip, clip_mask = _oracle_ctx(cfg, tap_params, cap_params, c3d, lda, soi)
    oracle = MultiCoreOracle(cap_params["decoder"], cfg)
    th_lp = oracle.teacher_forced(video, event, clip, clip_mask, torch.from_numpy(seq))
    L_oracle = th_lp.shape[1]
    np.testing.assert_allclose(
        np.asarray(jax_lp)[:, :L_oracle], th_lp.numpy(), atol=5e-4, err_msg=model
    )


@pytest.mark.parametrize("model", VARIANTS)
def test_greedy_decode_token_for_token(model):
    cfg = _variant_cfg(model)
    tap_params, cap_params, c3d, lda, props, soi = _setup(cfg)
    tap_h, _ = sst_forward(tap_params, c3d)
    jax_seq, jax_logps, active = captioner_sample(cap_params, cfg, tap_h, c3d, lda, props)
    video, event, clip, clip_mask = _oracle_ctx(cfg, tap_params, cap_params, c3d, lda, soi)
    oracle = MultiCoreOracle(cap_params["decoder"], cfg)
    th_seq, th_logps = oracle.sample_greedy(video, event, clip, clip_mask)
    L_oracle = th_seq.shape[1]
    assert int(np.asarray(active).sum()) == L_oracle, model
    np.testing.assert_array_equal(
        np.asarray(jax_seq)[:, :L_oracle], th_seq.numpy(), err_msg=model)
    assert np.asarray(jax_seq)[:, L_oracle:].sum() == 0
    np.testing.assert_allclose(
        np.asarray(jax_logps)[:, :L_oracle], th_logps.numpy(), atol=5e-4, err_msg=model)
