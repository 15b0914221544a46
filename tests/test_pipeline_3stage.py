"""The published 3-stage recipe end-to-end on synthetic data:
pre_tap -> pre_cg (warm-start tap) -> cotrain (warm-start tap_cg)
(reference: experiments/train_SST.sh -> train_ECHR.sh -> finetune.sh)."""
import os

import numpy as np

from test_train_e2e import tiny_cfg

from echr_tpu.engine.train import train


def test_three_stage_pipeline(tmp_path):
    # stage 1: TAP pretrain
    cfg1 = tiny_cfg(
        tmp_path,
        **{"train.training_mode": "pre_tap", "train.tap_epochs": 1,
           "train.cg_epochs": 0},
    ).replace(run_id="SST")
    out1 = train(cfg1, max_iterations=4)
    sst_ckpt = os.path.join(out1["save_folder"], "model-last.ckpt")
    assert os.path.exists(sst_ckpt)

    # stage 2: captioner on GT proposals, warm-started from stage-1 TAP
    cfg2 = tiny_cfg(tmp_path).replace(run_id="EC")
    cfg2 = cfg2.replace_in("save", pretrain="tap", pretrain_path=sst_ckpt)
    out2 = train(cfg2, max_iterations=4)
    ec_ckpt = os.path.join(out2["save_folder"], "model-last.ckpt")
    assert os.path.exists(ec_ckpt)

    # warm start actually copied stage-1 TAP weights
    import jax

    from echr_tpu.engine import checkpoint as ckpt

    w1 = jax.tree.leaves(ckpt.load_checkpoint(sst_ckpt)["state"].tap_params)[0]

    # stage 3: joint finetune from stage-2
    cfg3 = tiny_cfg(
        tmp_path,
        **{"train.training_mode": "cotrain", "train.cg_epochs": 0,
           "train.tapcg_epochs": 1, "train.lr": 1e-5},
    ).replace(run_id="JT")
    cfg3 = cfg3.replace_in("save", pretrain="tap_cg", pretrain_path=ec_ckpt)
    out3 = train(cfg3, max_iterations=4)
    assert out3["iteration"] == 4
    assert np.isfinite(out3["best_val_score"]) or out3["best_val_score"] == -1.0


def test_resume_continues_iteration(tmp_path):
    cfg = tiny_cfg(tmp_path).replace(run_id="R")
    out = train(cfg, max_iterations=3)
    assert out["iteration"] == 3
    cfg2 = cfg.replace_in("save", start_from="R", start_from_mode="last")
    out2 = train(cfg2, max_iterations=5)
    assert out2["iteration"] == 5  # resumed from 3, ran 2 more
