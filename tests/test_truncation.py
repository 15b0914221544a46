"""Over-long videos (T_real > max time bucket) are prefix-truncated and
must keep the REAL frame-grid time scale: feats[:T_use] cover only the
first duration*T_use/T_real seconds, so labels, gt featstamps, and every
featstamp<->time conversion use that effective duration.  The old
behavior squashed the whole timeline onto the prefix, misaligning labels
with feature content and stretching predicted timestamps by T_real/T_use
(review r3 fourth session)."""
import numpy as np

from test_train_e2e import tiny_cfg

from echr_tpu.data.batcher import make_batch
from echr_tpu.data.dataset import VideoExample


def _long_example():
    # 96 frames at exactly 1 s/frame; max bucket 64 -> dur_use = 64.0 s
    T, D, L = 96, 24, 10
    feats = np.random.RandomState(0).randn(T, D).astype(np.float32)
    timestamps = [
        (10.0, 20.0),  # fully visible
        (70.0, 90.0),  # fully beyond the truncation point
        (58.0, 80.0),  # straddles it
    ]
    cap = np.zeros((3, L), np.int32)
    cap[:, 1:4] = [[1, 2, 3], [4, 5, 6], [7, 8, 9]]
    return VideoExample(
        vid="v_long0001", feats=feats,
        lda=np.zeros((16,), np.float32), duration=96.0,
        timestamps=timestamps, sentences=["a b c", "d e f", "g h i"],
        cap_labels=cap, split="train",
    )


def _cfg(tmp_path):
    cfg = tiny_cfg(tmp_path)
    cfg = cfg.replace_in("data", time_buckets=(64,))
    return cfg


def test_truncation_keeps_real_time_scale(tmp_path):
    cfg = _cfg(tmp_path)
    ex = _long_example()
    rng = np.random.RandomState(1)
    batch, meta = make_batch(ex, cfg, rng, w1=np.ones((cfg.tap.K,), np.float32))

    assert meta.n_frames == 64
    # effective duration of the retained prefix, not the full video
    assert abs(meta.duration - 64.0) < 1e-9
    # the visible event maps to its REAL frame indices (old behavior gave
    # round(10/96*64)=7 .. round(20/96*64)=13 — misaligned with content)
    assert tuple(meta.gt_featstamps[0]) == (10, 20)
    # the straddling event is clamped to the visible window
    s2, e2 = meta.gt_featstamps[2]
    assert s2 == 58 and e2 == 63
    # clamped stamps stay valid indices everywhere
    for s, e in meta.gt_featstamps:
        assert 0 <= s < 64 and 0 < e < 64

    # the fully-invisible event is never matched by any good anchor
    good = meta.iou_scores >= cfg.tap.iou_threshold_for_good_proposal
    matched = set(np.asarray(meta.gts_index)[good].tolist())
    assert 1 not in matched
    # visible events still produce good proposals
    assert meta.proposal_num > 0
    assert 0 in matched


def test_truncation_decode_only_proposal_num_matches(tmp_path):
    cfg = _cfg(tmp_path)
    ex = _long_example()
    _, meta_l = make_batch(ex, cfg, np.random.RandomState(1),
                           w1=np.ones((cfg.tap.K,), np.float32))
    _, meta_n = make_batch(ex, cfg, np.random.RandomState(1),
                           w1=np.ones((cfg.tap.K,), np.float32), labels=False)
    assert meta_n.proposal_num == meta_l.proposal_num
    assert abs(meta_n.duration - meta_l.duration) < 1e-9
    assert [tuple(f) for f in meta_n.gt_featstamps] == [
        tuple(f) for f in meta_l.gt_featstamps]


def test_short_videos_unchanged(tmp_path):
    """T_real <= max bucket: dur_use == duration, identical to before."""
    cfg = _cfg(tmp_path)
    ex = _long_example()
    ex.feats = ex.feats[:60]
    ex.duration = 60.0
    ex.timestamps = [(10.0, 20.0), (30.0, 40.0), (45.0, 55.0)]
    _, meta = make_batch(ex, cfg, np.random.RandomState(1),
                         w1=np.ones((cfg.tap.K,), np.float32))
    assert meta.n_frames == 60 and abs(meta.duration - 60.0) < 1e-9


def test_eval_pipeline_with_truncated_videos(tmp_path):
    """End-to-end eval over a split where every video is longer than the
    max time bucket: predictions must carry timestamps on the REAL clock
    of the retained prefix (<= dur_use), and both eval pipelines must
    agree — the pipeline-level form of the time-scale fix."""
    import jax

    from echr_tpu.data.dataset import build_dataset
    from echr_tpu.data.loader import Loader
    from echr_tpu.engine.evaluate import eval_split, eval_split_batched
    from echr_tpu.engine.steps import init_train_state
    from echr_tpu.models.registry import init_captioner, init_tap

    cfg = tiny_cfg(tmp_path)
    cfg = cfg.replace_in("data", time_buckets=(32,))  # T in [40, 220) -> all truncate
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))

    kw = {"num_vids_eval": 2, "val_all_metrics": False, "topN": 10,
          "language_eval": False, "get_eval_loss": False}
    preds_a, _, _ = eval_split(
        state.tap_params, state.cg_params, loader, cfg, str(tmp_path / "t.json"),
        kw, flag_eval_what="tap_cg",
    )
    preds_b, _, _ = eval_split_batched(
        state.tap_params, state.cg_params, loader, cfg, str(tmp_path / "u.json"),
        kw, flag_eval_what="tap_cg", batch_videos=2,
    )
    assert preds_a and set(preds_a) == set(preds_b)
    for vid in preds_a:
        ix = int(vid[-5:])
        ex = dataset.get_example(ix)
        t_real = ex.feats.shape[0]
        dur_use = ex.duration * 32 / t_real
        for pa, pb in zip(preds_a[vid], preds_b[vid]):
            assert pa["timestamp"] == pb["timestamp"]
            s, e = pa["timestamp"]
            # real-clock seconds of the retained prefix, never the
            # stretched full-duration scale the old code produced
            assert 0.0 <= s < e <= dur_use + 1e-6, (vid, s, e, dur_use)


def test_serve_effective_duration():
    from echr_tpu.serve import CaptionRequest, _effective_duration

    r = CaptionRequest(vid="x", feats=np.zeros((96, 4), np.float32),
                       duration=96.0)
    assert abs(_effective_duration(r, 64) - 64.0) < 1e-9
    assert abs(_effective_duration(r, 96) - 96.0) < 1e-9
