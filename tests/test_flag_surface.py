"""Mechanical flag-surface test: every CLI flag the reference declares must
be accepted by our parsers (VERDICT r2 next-9).

The lists below are the mechanically-extracted `add_argument` names from the
reference's argument parsers (data, not code):

  grep -vE '^\\s*#' /root/reference/opts.py | \
    grep -oE 'add_argument\\(\\s*[\'\"]--[A-Za-z0-9_]+[\'\"]' | sort -u

(reference: opts.py:3-294 — 100 live declarations; commented-out flags like
--input_c3d_dir / --d_pos_emb are excluded) and the same for the standalone
eval CLI (reference: eval.py:96-147).  A reference command line using any of
these must not error — flags that are declared-but-dead in the reference are
accepted as logged no-ops (config._DEAD_FLAGS).
"""
import pytest

from echr_tpu.config import build_argparser

# reference opts.py (train surface), mechanically extracted 2026-08 snapshot
REFERENCE_TRAIN_FLAGS = """
CG_att_hid_size CG_drop_prob CG_fc_feat_size CG_init_feats_type
CG_input_encoding_size CG_input_feats_type CG_num_layers CG_rnn_size
CG_rnn_type K SOTA_json batch_size beam_size caption_model cg_epochs
checkpoint_path clip_context_dim clip_context_type comment crit_type d_feats
d_o data_type dataset debug diff dropsent_mode event_context_dim
event_context_type fST_type fast_eval_cg fast_eval_for_challenge fusion_model
grad_clip hidden_dim id input_c3d_dir2 input_lda_path input_twostream_dir
iou_threshold iou_threshold_for_good_proposal lambda1 lambda2 lambda3
language_eval lda_dim learning_rate_decay_every learning_rate_decay_rate
learning_rate_decay_start losses_log_every lr m_batch meteor_reward_weight
min_epoch_when_save n_head no_exclude_opt nthreads num_samples num_vids_eval
optim optim_alpha optim_beta optim_epsilon other_features pretrain
pretrain_path prop_sample_num raw_input_dim reduce_input_dim_layer reverse_w0
rnn_dropout rnn_num_layers save_all_checkpoint save_checkpoint_every
scheduled_sampling_increase_every scheduled_sampling_increase_prob
scheduled_sampling_max_prob scheduled_sampling_start self_critical_after
shuffle start_from start_from_mode tap_epochs tap_model tap_rnn_type
tapcg_epochs train_label_for_cg training_mode use_2stream_feature
use_bottomup_feature use_c3d_feature use_posit val_label_for_cg
video_context_dim video_context_type video_data_for_cg video_dim video_json
w1_json weight_decay
""".split()

# reference eval.py (standalone-eval surface)
REFERENCE_EVAL_FLAGS = """
SOTA_json batch_size beam_size dataset debug flag_eval_what folder_id
model_path nms_threshold no_language_eval num_vids_eval old_loader reranking
sample_max split temperature topN val_all_metrics val_score_thres
""".split()

# per-flag argv values where a bare "1" doesn't parse (choice-restricted),
# and None for the reference's store_true flags (opts.py:13,52,240,252,268-269
# — tested with their bare reference spelling)
_TRAIN_VALUES = {
    "training_mode": "pre_cg",
    "start_from_mode": "best",
    "caption_model": "three_stream",
    "other_features": "lda",
    "debug": None,
    "no_exclude_opt": None,
    "reverse_w0": None,
    "save_all_checkpoint": None,
    "fast_eval_cg": None,
    "fast_eval_for_challenge": None,
}
_EVAL_VALUES = {
    "flag_eval_what": "tap_cg",
    "split": "val",
    "which": "best",
    "no_language_eval": None,  # store_true
    "old_loader": None,  # store_true
}


def test_train_flag_surface_complete():
    assert len(set(REFERENCE_TRAIN_FLAGS)) == 100
    p = build_argparser()
    missing = []
    for flag in REFERENCE_TRAIN_FLAGS:
        val = _TRAIN_VALUES.get(flag, "1")
        argv = [f"--{flag}"] + ([val] if val is not None else [])
        try:
            _, unknown = p.parse_known_args(argv)
        except SystemExit:
            missing.append(flag)
            continue
        if unknown:
            missing.append(flag)
    assert not missing, f"reference train flags not accepted: {missing}"


def test_eval_flag_surface_complete():
    from echr_tpu.cli.eval import build_parser

    p = build_parser()
    missing = []
    for flag in REFERENCE_EVAL_FLAGS:
        val = _EVAL_VALUES.get(flag, "1")
        argv = ["--folder_id", "x", f"--{flag}"] + ([val] if val is not None else [])
        try:
            _, unknown = p.parse_known_args(argv)
        except SystemExit:
            missing.append(flag)
            continue
        if unknown:
            missing.append(flag)
    assert not missing, f"reference eval flags not accepted: {missing}"


def test_float_typed_flags_accept_fractions():
    """Reference float-typed flags must accept fractional values even when
    our dataclass default happens to be an int (the argparse type derives
    from the ANNOTATION; reference: opts.py:230,232 declare type=float) —
    review r3 fourth session."""
    from echr_tpu.config import parse_config

    cfg = parse_config([
        "--learning_rate_decay_start", "7.5",
        "--learning_rate_decay_every", "1.5",
        "--lr", "0.0001",
    ])
    assert cfg.train.learning_rate_decay_start == 7.5
    assert cfg.train.learning_rate_decay_every == 1.5


def test_dead_flags_are_logged_noops(caplog):
    """--diff (opts.py:275) and friends: declared-but-never-read flags parse
    without error and are logged as ignored (VERDICT r2 missing-3)."""
    import logging

    from echr_tpu.config import parse_config

    with caplog.at_level(logging.INFO, logger="echr_tpu.config"):
        cfg = parse_config(["--diff", "--fast_eval_for_challenge", "--lr", "0.1"])
    assert cfg.train.lr == pytest.approx(0.1)
    assert any("--diff" in r.message for r in caplog.records)
