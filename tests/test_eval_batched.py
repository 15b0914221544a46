"""Batched eval produces the same predictions as per-video eval."""
import jax
import numpy as np

from test_train_e2e import tiny_cfg

from echr_tpu.data.dataset import build_dataset
from echr_tpu.data.loader import Loader
from echr_tpu.engine.evaluate import eval_split, eval_split_batched
from echr_tpu.engine.steps import init_train_state
from echr_tpu.models.registry import init_captioner, init_tap


def test_batched_eval_matches_per_video(tmp_path):
    cfg = tiny_cfg(tmp_path)
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))

    kw = {"num_vids_eval": 2, "val_all_metrics": False, "topN": 15,
          "language_eval": False, "get_eval_loss": False}
    preds_a, _, _ = eval_split(
        state.tap_params, state.cg_params, loader, cfg, str(tmp_path / "a.json"),
        kw, flag_eval_what="tap_cg",
    )
    preds_b, _, _ = eval_split_batched(
        state.tap_params, state.cg_params, loader, cfg, str(tmp_path / "b.json"),
        kw, flag_eval_what="tap_cg", batch_videos=4,
    )
    assert set(preds_a) == set(preds_b)
    for vid in preds_a:
        a, b = preds_a[vid], preds_b[vid]
        assert len(a) == len(b)
        for pa, pb in zip(a, b):
            assert pa["sentence"] == pb["sentence"], vid
            assert pa["timestamp"] == pb["timestamp"]
            np.testing.assert_allclose(
                pa["sentence_confidence"], pb["sentence_confidence"], atol=1e-4
            )
