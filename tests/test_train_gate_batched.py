"""The training checkpoint gate routed through the batched eval pipeline
produces identical scores/predictions to the per-video gate (VERDICT r2
next-1; reference gate: train.py:366-415)."""
import json
import os

import numpy as np

from test_train_e2e import tiny_cfg

from echr_tpu.engine.train import train


def _run(tmp_path, run_id, batch_videos):
    cfg = tiny_cfg(tmp_path).replace(run_id=run_id)
    cfg = cfg.replace_in("save", save_checkpoint_every=6, min_epoch_when_save=-1)
    cfg = cfg.replace_in("eval", num_vids_eval=2, batch_videos=batch_videos)
    return train(cfg, max_iterations=12)


def test_gate_scores_identical_batched_vs_per_video(tmp_path):
    out_a = _run(tmp_path, "GATE_PV", 1)
    out_b = _run(tmp_path, "GATE_BV", 8)
    assert out_a["best_val_score"] == out_b["best_val_score"]
    # the logged per-checkpoint val scores match too
    hist_a = _read_val_history(out_a)
    hist_b = _read_val_history(out_b)
    assert hist_a.keys() == hist_b.keys() and hist_a
    for it in hist_a:
        for k in hist_a[it]:
            np.testing.assert_allclose(hist_a[it][k], hist_b[it][k], rtol=1e-6)
    # prediction JSONs byte-equal records
    for name in sorted(os.listdir(os.path.join(out_a["save_folder"], "pred_sent"))):
        with open(os.path.join(out_a["save_folder"], "pred_sent", name)) as f:
            pa = json.load(f)["results"]
        with open(os.path.join(out_b["save_folder"], "pred_sent", name)) as f:
            pb = json.load(f)["results"]
        assert set(pa) == set(pb)
        for vid in pa:
            for ra, rb in zip(pa[vid], pb[vid]):
                assert ra["sentence"] == rb["sentence"]
                assert ra["timestamp"] == rb["timestamp"]


def _read_val_history(out):
    # histories are checkpointed; read back from the last checkpoint payload
    from echr_tpu.engine import checkpoint as ckpt

    payload = ckpt.load_checkpoint(
        os.path.join(out["save_folder"], "model-last.ckpt"))
    return payload["histories"]["val"]
