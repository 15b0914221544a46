"""Token-for-token greedy parity for the reference's default decoder
(show_attend_tell with V+E+C inputs and V+E init state)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from oracle_torch import ShowAttendTellOracle, TSRMOracle, padded_clip_windows

from echr_tpu.config import flagship_config
from echr_tpu.models.captioner import ProposalBatch, captioner_sample
from echr_tpu.models.registry import init_captioner, init_tap
from echr_tpu.models.sst import sst_forward
from echr_tpu.models.tsrm import position_embedding, position_matrix


def test_show_attend_tell_greedy_parity():
    cfg = flagship_config()
    cfg = cfg.replace_in("decoder", caption_model="show_attend_tell",
                         CG_num_layers=2, CG_vocab_size=90, CG_seq_length=9)
    cfg = cfg.replace_in("context", CG_input_feats_type="V+E+C",
                         CG_init_feats_type="V+E")
    cfg = cfg.validate()

    rng = jax.random.PRNGKey(21)
    k_tap, k_cap, k_f = jax.random.split(rng, 3)
    tap_params = init_tap(k_tap, cfg)
    cap_params = init_captioner(k_cap, cfg)
    T, D = 36, cfg.tap.video_dim
    c3d = jax.random.normal(jax.random.fold_in(k_f, 0), (T, D)) * 0.5
    lda = jax.random.normal(jax.random.fold_in(k_f, 1), (cfg.data.lda_dim,))
    soi = np.array([[0, 7], [4, 18], [12, 13], [20, 36], [8, 30]])
    props = ProposalBatch(jnp.array(soi[:, 1] - 1), jnp.array(soi),
                          jnp.ones((len(soi),), jnp.float32))

    tap_h, _ = sst_forward(tap_params, c3d)
    jax_seq, jax_logps, active = captioner_sample(cap_params, cfg, tap_h, c3d, lda, props)

    # oracle contexts the reference way
    tap_h_t = torch.from_numpy(np.asarray(tap_h))
    c3d_t = torch.from_numpy(np.asarray(c3d))
    EC = torch.stack([c3d_t[s:e].mean(0) for s, e in soi])
    EH = tap_h_t[soi[:, 1] - 1]
    tsrm = TSRMOracle(cap_params["fusion"], cfg.tsrm_input_dim, cfg.fusion.d_feats,
                      cfg.fusion.n_head, cfg.fusion.d_o, cfg.fusion.fST_type)
    pe = np.asarray(position_embedding(position_matrix(jnp.array(soi)), cfg.fusion.d_feats))
    event = tsrm(torch.cat([EC, EH], 1), soi, pos_emb=pe)
    clip, clip_mask = padded_clip_windows(c3d_t, soi)
    video = torch.from_numpy(np.asarray(lda))

    oracle = ShowAttendTellOracle(cap_params["decoder"], cfg)
    th_seq, th_logps = oracle.sample_greedy(video, event, clip, clip_mask)

    L = th_seq.shape[1]
    assert int(np.asarray(active).sum()) == L
    np.testing.assert_array_equal(np.asarray(jax_seq)[:, :L], th_seq.numpy())
    np.testing.assert_allclose(np.asarray(jax_logps)[:, :L], th_logps.numpy(), atol=1e-3)
