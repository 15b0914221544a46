"""Model-proposal eval with temporal NMS selection (reference:
eval_utils.py:108-111 nms_threshold path) and reranking."""
import jax
import numpy as np

from test_train_e2e import tiny_cfg

from echr_tpu.data.dataset import build_dataset
from echr_tpu.data.loader import Loader
from echr_tpu.engine.evaluate import eval_split
from echr_tpu.engine.steps import init_train_state
from echr_tpu.models.registry import init_captioner, init_tap


def test_tap_cg_with_nms_and_rerank(tmp_path):
    cfg = tiny_cfg(tmp_path)
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))

    preds, scores, _ = eval_split(
        state.tap_params, state.cg_params, loader, cfg, str(tmp_path / "nms.json"),
        {"num_vids_eval": 2, "val_all_metrics": False, "topN": 25,
         "nms_threshold": 0.7, "reranking": True, "language_eval": False,
         "get_eval_loss": False},
        flag_eval_what="tap_cg",
    )
    assert len(preds) >= 1
    for vid, info in preds.items():
        assert len(info) <= 10  # reranking keeps top-10 by re_score
        # NMS-selected proposals must be mutually below the overlap threshold
        ts = [p["timestamp"] for p in info]
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                s1, e1 = ts[i]
                s2, e2 = ts[j]
                inter = max(0.0, min(e1, e2) - max(s1, s2))
                union = (e1 - s1) + (e2 - s2) - inter
                assert inter / max(union, 1e-9) <= 0.95  # loose sanity


def test_tap_only_eval_scores_proposals(tmp_path):
    cfg = tiny_cfg(tmp_path)
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))
    preds, scores, _ = eval_split(
        state.tap_params, state.cg_params, loader, cfg, str(tmp_path / "tap.json"),
        {"num_vids_eval": 2, "val_all_metrics": False, "topN": 50},
        flag_eval_what="tap",
    )
    assert "Recall" in scores and "Precision" in scores
    assert "METEOR" not in scores  # only_recall protocol for proposals


def test_cg_extend_eval(tmp_path):
    """Sampled-good-proposal eval path (reference flag 'cg_extend')."""
    cfg = tiny_cfg(tmp_path)
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))
    preds, scores, _ = eval_split(
        state.tap_params, state.cg_params, loader, cfg, str(tmp_path / "ce.json"),
        {"num_vids_eval": 2, "val_all_metrics": False, "topN": 10,
         "language_eval": False, "get_eval_loss": False},
        flag_eval_what="cg_extend",
    )
    assert len(preds) >= 1
    for vid, info in preds.items():
        for p in info:
            assert p["proposal_score"] == 1.0  # cg_extend: unit tap prob
