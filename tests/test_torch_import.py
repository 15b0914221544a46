"""Torch-checkpoint importer round trip: jax params -> torch oracle modules
-> reference-layout state_dict -> imported jax params == originals."""
import jax
import numpy as np
import torch

from oracle_torch import SSTOracle, ThreeStreamOracle, TSRMOracle

from echr_tpu.compat import import_cg_state_dict, import_tap_state_dict
from echr_tpu.config import flagship_config
from echr_tpu.models.registry import init_captioner, init_tap


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(la) == len(lb)
    for path, x in la:
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(lb[path]), atol=1e-6, err_msg=str(path)
        )


def test_tap_import_roundtrip():
    cfg = flagship_config().replace_in("decoder", CG_vocab_size=50, CG_seq_length=8)
    cfg = cfg.replace_in("tap", video_dim=24, hidden_dim=32, K=16)
    params = init_tap(jax.random.PRNGKey(0), cfg)
    oracle = SSTOracle(params, cfg.tap.video_dim, cfg.tap.hidden_dim, cfg.tap.K)
    sd = {f"rnn.{k}": v for k, v in oracle.rnn.state_dict().items()}
    sd.update({f"scores.{k}": v for k, v in oracle.scores.state_dict().items()})
    sd = {k: v.numpy() for k, v in sd.items()}
    got = import_tap_state_dict(sd, cfg)
    _trees_equal(params, got)


def test_cg_import_roundtrip_three_stream():
    cfg = flagship_config()
    cfg = cfg.replace_in("data", lda_dim=16)
    cfg = cfg.replace_in("tap", video_dim=24, hidden_dim=32, K=16)
    cfg = cfg.replace_in("fusion", n_head=4, d_feats=32, d_o=32)
    cfg = cfg.replace_in("decoder", CG_rnn_size=32, CG_input_encoding_size=32,
                         CG_att_hid_size=32, CG_vocab_size=50, CG_seq_length=8)
    cfg = cfg.validate()
    params = init_captioner(jax.random.PRNGKey(1), cfg)

    dec_oracle = ThreeStreamOracle(params["decoder"], cfg)
    tsrm_oracle = TSRMOracle(params["fusion"], cfg.tsrm_input_dim, cfg.fusion.d_feats,
                             cfg.fusion.n_head, cfg.fusion.d_o, cfg.fusion.fST_type)
    sd = {}
    sd["lm_model.embed.weight"] = dec_oracle.embed.state_dict()["weight"]
    for k, v in dec_oracle.logit.state_dict().items():
        sd[f"lm_model.logit.{k}"] = v
    for name, mod in [("layer0", dec_oracle.layer0), ("layer1", dec_oracle.layer1),
                      ("layer2", dec_oracle.layer2)]:
        for k, v in mod.state_dict().items():
            sd[f"lm_model.core.{name}.{k}"] = v
    for name, mod in [("ctx2att", dec_oracle.ctx2att), ("h2att", dec_oracle.h2att),
                      ("alpha_net", dec_oracle.alpha_net)]:
        for k, v in mod.state_dict().items():
            sd[f"lm_model.core.attention.{name}.{k}"] = v
    sd["fusion_model.event_emb.weight"] = tsrm_oracle.event_emb.state_dict()["weight"]
    sd["fusion_model.event_emb.bias"] = tsrm_oracle.event_emb.state_dict()["bias"]
    for name, mod in [("query_1", tsrm_oracle.query), ("key_1", tsrm_oracle.key),
                      ("pair_pos_fc1", tsrm_oracle.fc1), ("pair_pos_fc2", tsrm_oracle.fc2),
                      ("linear_out_1", tsrm_oracle.out)]:
        for k, v in mod.state_dict().items():
            sd[f"fusion_model.enc_attn.{name}.{k}"] = v
    # unused reference params must be ignored
    sd["fusion_model.h2a_layer.weight"] = torch.zeros(10, 10)
    sd["lm_model.core.fusion_layer.weight"] = torch.zeros(32, 96)
    sd = {k: v.numpy() for k, v in sd.items()}

    got = import_cg_state_dict(sd, cfg)
    _trees_equal(params, got)
