"""External (SOTA) proposal evaluation path."""
import jax
import numpy as np

from test_train_e2e import tiny_cfg

from echr_tpu.data.dataset import build_dataset
from echr_tpu.data.loader import Loader
from echr_tpu.engine.evaluate import eval_split
from echr_tpu.engine.steps import init_train_state
from echr_tpu.models.registry import init_captioner, init_tap


def test_sota_tep_eval(tmp_path):
    cfg = tiny_cfg(tmp_path, **{"data.SOTA_json": "synthetic"})
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))

    batch, meta = loader.get_batch("val")
    assert meta.SOTA_featstamps is not None
    assert len(meta.SOTA_ind) == len(meta.SOTA_scores)
    for (s, e) in meta.SOTA_featstamps:
        assert e > s and e - s <= cfg.tap.K  # K-clamped crop

    preds, scores, _ = eval_split(
        state.tap_params, state.cg_params, loader, cfg, str(tmp_path / "ps.json"),
        {"num_vids_eval": 2, "val_all_metrics": False, "topN": 20,
         "nms_threshold": 0.9},
        flag_eval_what="SOTA_TEP",
    )
    assert len(preds) >= 1
    for vid, info in preds.items():
        for p in info:
            assert p["proposal_score"] <= 1.0


def test_sota_tep_batched_matches_per_video(tmp_path):
    """SOTA_TEP through the fast pipeline must reproduce eval_split's
    predictions (sentences, timestamps, proposal scores)."""
    from echr_tpu.engine.evaluate import eval_split_batched

    cfg = tiny_cfg(tmp_path, **{"data.SOTA_json": "synthetic",
                                "data.synthetic_learnable": True,
                                "train.lr": 3e-3})
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))
    # sharpen the logits: an untrained model's near-uniform argmax flips on
    # the ~1e-5 padding-bucket drift between per-video and batched decode
    from echr_tpu.engine.steps import train_step
    from echr_tpu.engine.train import _stack_batch
    steps = 0
    while steps < 60:
        batch, meta = loader.get_batch("train")
        if meta.proposal_num <= 0 or meta.n_frames <= 1:
            continue
        rng, k = jax.random.split(rng)
        state, _ = train_step(state, _stack_batch(batch), k, cfg, "cg")
        steps += 1

    kw = {"num_vids_eval": 2, "val_all_metrics": False, "topN": 20,
          "nms_threshold": 0.9, "language_eval": False, "get_eval_loss": False}
    preds_a, _, _ = eval_split(
        state.tap_params, state.cg_params, loader, cfg, str(tmp_path / "a.json"),
        kw, flag_eval_what="SOTA_TEP",
    )
    preds_b, _, _ = eval_split_batched(
        state.tap_params, state.cg_params, loader, cfg, str(tmp_path / "b.json"),
        kw, flag_eval_what="SOTA_TEP", batch_videos=4,
    )
    assert set(preds_a) == set(preds_b) and preds_a
    for vid in preds_a:
        assert len(preds_a[vid]) == len(preds_b[vid])
        for pa, pb in zip(preds_a[vid], preds_b[vid]):
            assert pa["sentence"] == pb["sentence"]
            assert pa["timestamp"] == pb["timestamp"]
            assert pa["proposal_score"] == pb["proposal_score"]


def test_sota_tep_decode_only_matches_labels_path(tmp_path):
    """SOTA_TEP with get_eval_loss=False rides the decode-only batcher fast
    path; the dedicated crop substream (make_batch) must keep every crop —
    and therefore every proposal, timestamp, and sentence — identical to the
    labels path (get_eval_loss=True)."""
    cfg = tiny_cfg(tmp_path, **{"data.SOTA_json": "synthetic"})
    dataset = build_dataset(cfg)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))

    base = {"num_vids_eval": 2, "val_all_metrics": False, "topN": 20,
            "nms_threshold": 0.9, "language_eval": False}
    # fresh loader per run: the long-window crop is genuinely random, keyed
    # by the loader's epoch-order per-item seeds — identical only when both
    # runs start from the same global stream position
    preds_lab, _, _ = eval_split(
        state.tap_params, state.cg_params, Loader(dataset, cfg, seed=0), cfg,
        str(tmp_path / "l.json"),
        dict(base, get_eval_loss=True), flag_eval_what="SOTA_TEP",
    )
    preds_fast, _, _ = eval_split(
        state.tap_params, state.cg_params, Loader(dataset, cfg, seed=0), cfg,
        str(tmp_path / "f.json"),
        dict(base, get_eval_loss=False), flag_eval_what="SOTA_TEP",
    )
    assert set(preds_lab) == set(preds_fast) and preds_lab
    for vid in preds_lab:
        assert len(preds_lab[vid]) == len(preds_fast[vid])
        for pa, pb in zip(preds_lab[vid], preds_fast[vid]):
            assert pa["sentence"] == pb["sentence"]
            assert pa["timestamp"] == pb["timestamp"]
            assert pa["proposal_score"] == pb["proposal_score"]
