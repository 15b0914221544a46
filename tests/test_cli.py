"""CLI end-to-end: train a few steps via the train CLI surface, then the
standalone eval CLI against its checkpoint (reference: eval.py flow)."""
import os

import numpy as np

from test_train_e2e import tiny_cfg


def test_eval_cli_on_checkpoint(tmp_path, capsys):
    from echr_tpu.cli.eval import main as eval_main
    from echr_tpu.engine.train import train

    cfg = tiny_cfg(tmp_path).replace(run_id="CLI")
    train(cfg, max_iterations=2)

    eval_main([
        "--folder_id", "CLI",
        "--checkpoint_path", str(tmp_path),
        "--which", "last",
        "--flag_eval_what", "cg",
        "--topN", "10",
        "--num_vids_eval", "2",
        "--val_all_metrics", "0",
    ])
    out_files = [f for f in os.listdir(tmp_path / "CLI") if f.startswith("eval_")]
    assert out_files, "eval CLI wrote no prediction JSON"

    # --transfer_dtype overlays runtime.transfer_dtype onto the checkpoint's
    # (f32-trained) config — the batched decode-only path then wires the
    # prefetch workers to bf16 and must still emit predictions
    eval_main([
        "--folder_id", "CLI",
        "--checkpoint_path", str(tmp_path),
        "--which", "last",
        "--flag_eval_what", "tap_cg",
        "--topN", "8",
        "--num_vids_eval", "2",
        "--no_language_eval",
        "--batch_videos", "2",
        "--transfer_dtype", "bfloat16",
    ])
    tapcg = [f for f in os.listdir(tmp_path / "CLI")
             if f.startswith("eval_tap_cg")]
    assert tapcg, "bf16-wire batched eval wrote no prediction JSON"


def test_eval_cli_sota_tep_and_score_cli(tmp_path, capsys):
    """SOTA_TEP + --SOTA_json reachable from the standalone eval CLI
    (reference: eval.py:87-88,102-103,146), then the score-only CLI
    (reference: external_tool/densevid_eval/evaluate.py:338-366) on the
    produced prediction JSON."""
    import json

    from echr_tpu.cli.eval import main as eval_main
    from echr_tpu.cli.score import main as score_main
    from echr_tpu.data.dataset import build_dataset
    from echr_tpu.data.loader import Loader
    from echr_tpu.engine.train import train
    from echr_tpu.metrics.eval_score import gt_from_dataset

    cfg = tiny_cfg(tmp_path).replace(run_id="CLIS")
    train(cfg, max_iterations=2)
    eval_main([
        "--folder_id", "CLIS",
        "--checkpoint_path", str(tmp_path),
        "--which", "last",
        "--flag_eval_what", "SOTA_TEP",
        "--SOTA_json", "synthetic",
        "--topN", "5",
        "--num_vids_eval", "2",
        "--no_language_eval",
    ])
    preds = [f for f in os.listdir(tmp_path / "CLIS") if f.startswith("eval_SOTA_TEP")]
    assert preds, "SOTA_TEP eval CLI wrote no prediction JSON"

    # score-only CLI on that JSON against loader-synthesized GT
    loader = Loader(build_dataset(cfg.replace_in("data", SOTA_json="synthetic")), cfg, seed=0)
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt_from_dataset(loader)))
    scores = score_main([
        "-s", str(tmp_path / "CLIS" / preds[0]),
        "-r", str(gt_path),
        "-v",
    ])
    assert scores["tiou"] == [0.3, 0.5, 0.7, 0.9]
    assert "METEOR" in scores and "Recall" in scores
    assert len(scores["Recall"]) == 4


def test_config_cli_reference_flags():
    from echr_tpu.config import parse_config

    cfg = parse_config([
        "--training_mode", "pre_tap", "--tap_epoch", "5", "--cg_epoch", "0",
        "--caption_model", "show_attend_tell", "--K", "256", "--video_dim", "500",
        "--id", "SST", "--save_all", "--fast_eval_cg", "1", "--lda_dim", "100",
        "--video_context_type", "VL", "--event_context_type", "ER3",
        "--clip_context_type", "CC",
    ])
    assert cfg.run_id == "SST"
    assert cfg.train.tap_epochs == 5 and cfg.train.training_mode == "pre_tap"
    assert cfg.save.save_all_checkpoint and cfg.eval.fast_eval_cg
    assert cfg.tsrm_input_dim == 1012  # ER3 = video_dim 500 + hidden_dim 512
    assert cfg.video_context_dim == 100  # VL with lda_dim 100


def test_config_cli_int_tuple_flags():
    """Tuple-typed flags parse as nargs='+' strings; int-typed tuples
    (mesh_shape, time_buckets) must come back as real ints — '4' * '2'
    would blow up in build_mesh — while string tuples stay strings."""
    from echr_tpu.config import parse_config

    cfg = parse_config(["--mesh_shape", "4", "2",
                        "--time_buckets", "64", "256",
                        "--mesh_axis_names", "data", "model"])
    assert cfg.runtime.mesh_shape == (4, 2)
    assert cfg.data.time_buckets == (64, 256)
    assert cfg.runtime.mesh_axis_names == ("data", "model")


def test_dropsent_modes():
    import numpy as np

    from echr_tpu.data.batcher import caption_masks

    cap = np.zeros((2, 20), np.int64)
    cap[0, 1:16] = np.arange(1, 16)  # 15 words
    cap[1, 1:4] = [5, 6, 7]  # 3 words
    for mode in ("nodrop", "insert", "truncate"):
        lab, mask = caption_masks(cap.astype(np.int32), mode, np.random.RandomState(0))
        assert lab.shape == (3, 20)  # appended zero row (reference :414)
        assert lab[:, -1].sum() == 0
        assert mask.shape == (2, 20)
        # short row: mask covers words+BOS+EOS in every mode
        assert mask[1].sum() >= 5


def test_resume_config_overlay(tmp_path):
    """Saved config wins on resume except schedule flags (reference
    exclude_opt semantics)."""
    from echr_tpu.engine.train import overlay_resumed_config

    cli = tiny_cfg(tmp_path, **{"train.lr": 9e-9, "fusion.n_head": 4})
    saved = tiny_cfg(tmp_path, **{"train.lr": 1e-3, "fusion.n_head": 2,
                                  "decoder.CG_rnn_size": 48})
    merged = overlay_resumed_config(cli, saved)
    assert merged.train.lr == 9e-9  # excluded: CLI wins
    assert merged.fusion.n_head == 2  # saved wins (model shape)
    assert merged.decoder.CG_rnn_size == 48  # saved wins
    # --no_exclude_opt: saved wins everywhere
    cli2 = cli.replace_in("save", no_exclude_opt=True)
    merged2 = overlay_resumed_config(cli2, saved)
    assert merged2.train.lr == 1e-3


def test_sampling_eval_and_dead_flags(tmp_path):
    """sample_max=0 multinomial eval (reference: OldModel.sample :141-167,
    eval.py:119-125) reachable end-to-end, and reference dead flags are
    accepted as no-ops by the train-CLI parser."""
    from echr_tpu.cli.eval import main as eval_main
    from echr_tpu.config import parse_config
    from echr_tpu.engine.train import train

    cfg = parse_config([
        "--lambda3", "0.1",
        "--fast_eval_for_challenge",  # bare, store_true in the reference
        "--sample_max", "0", "--temperature", "1.3",
    ])
    assert cfg.eval.sample_max == 0
    assert cfg.eval.temperature == 1.3

    cfg = tiny_cfg(tmp_path).replace(run_id="SMP")
    train(cfg, max_iterations=2)
    eval_main([
        "--folder_id", "SMP",
        "--checkpoint_path", str(tmp_path),
        "--which", "last",
        "--flag_eval_what", "cg",
        "--sample_max", "0",
        "--temperature", "1.3",
        "--topN", "10",
        "--num_vids_eval", "2",
        "--no_language_eval",
    ])
    out_files = [f for f in os.listdir(tmp_path / "SMP") if f.startswith("eval_")]
    assert out_files, "sampling eval CLI wrote no prediction JSON"
