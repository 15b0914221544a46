"""End-to-end metric learning: with pattern-derived (learnable) synthetic
captions, training on GT proposals improves val METEOR."""
import jax
import numpy as np

from test_train_e2e import tiny_cfg

from echr_tpu.data.dataset import build_dataset
from echr_tpu.data.loader import Loader
from echr_tpu.engine.evaluate import eval_split
from echr_tpu.engine.steps import init_train_state, train_step
from echr_tpu.engine.train import _stack_batch
from echr_tpu.models.registry import init_captioner, init_tap


def _meteor(state, loader, cfg, tmp_path, tag):
    preds, scores, _ = eval_split(
        state.tap_params, state.cg_params, loader, cfg,
        str(tmp_path / f"m_{tag}.json"),
        {"num_vids_eval": 4, "val_all_metrics": False, "topN": 10,
         "get_eval_loss": False},
        flag_eval_what="cg",
    )
    return float(np.asarray(scores["METEOR"]).mean())


def test_meteor_improves_with_training(tmp_path):
    cfg = tiny_cfg(
        tmp_path,
        **{"data.synthetic_learnable": True, "data.synthetic_num_videos": 16,
           "train.lr": 3e-3},
    )
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))

    m0 = _meteor(state, loader, cfg, tmp_path, "before")
    steps = 0
    while steps < 120:
        batch, meta = loader.get_batch("train")
        if meta.proposal_num <= 0 or meta.n_frames <= 1:
            continue
        rng, k = jax.random.split(rng)
        state, metrics = train_step(state, _stack_batch(batch), k, cfg, "cg")
        steps += 1
    m1 = _meteor(state, loader, cfg, tmp_path, "after")
    assert m1 > m0 + 0.02, (m0, m1)
