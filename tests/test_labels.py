"""Golden tests for label synthesis vs a scalar re-derivation of the
reference semantics (reference: dataloader.py:266-365)."""
import numpy as np
import pytest

from echr_tpu.data import labels


# --- scalar oracle (independent re-derivation of the reference loop) -------


def oracle_grid(featstamps, nfeats, K):
    iou_scores = np.zeros([nfeats, K], dtype="float32")
    gts_index = np.zeros([nfeats, K], dtype="float32")
    S_iou = np.zeros([nfeats, nfeats], dtype="float32")
    tap_masks = np.zeros([nfeats, K], dtype="float32")
    S_masks = np.zeros([nfeats, nfeats], dtype="float32")
    for index in range(nfeats):
        tap_masks[index, : min(K, index)] = 1
    for t in range(nfeats):
        for k in range(K):
            if t >= k + 1:
                iou, gt_index = labels.single_iou([t - k - 1, t], featstamps)
                iou_scores[t, k] = iou
                gts_index[t, k] = gt_index
                S_iou[t - k - 1, t] = iou
                S_masks[t - k - 1, t] = 1
    return iou_scores, tap_masks, gts_index, S_iou, S_masks


CASES = [
    # (featstamps, nfeats, K)
    ([(0, 5), (3, 9)], 12, 8),
    ([(2, 4)], 6, 16),
    ([(0, 1), (0, 1), (5, 7)], 9, 4),  # duplicate GTs exercise the >= tie-break
    ([(1, 3), (1, 3)], 5, 5),
    ([(0, 30), (10, 20), (25, 40)], 48, 32),
]


@pytest.mark.parametrize("featstamps,nfeats,K", CASES)
def test_iou_grid_matches_oracle(featstamps, nfeats, K):
    got_iou, got_gts, got_mask, got_S, got_Smask = labels.iou_grid(
        featstamps, nfeats, K, with_s_grid=True
    )
    exp_iou, exp_mask, exp_gts, exp_S, exp_Smask = oracle_grid(featstamps, nfeats, K)
    np.testing.assert_allclose(got_iou, exp_iou, rtol=0, atol=0)
    np.testing.assert_array_equal(got_mask, exp_mask)
    np.testing.assert_array_equal(got_gts, exp_gts)
    np.testing.assert_allclose(got_S, exp_S, rtol=0, atol=0)
    np.testing.assert_array_equal(got_Smask, exp_Smask)


def test_all_zero_rows_select_last_gt():
    # anchors with zero overlap must still report the *last* GT index
    # (reference: dataloader.py:276-278 — `>=` updates on equality).
    iou, gts, mask = labels.iou_grid([(0, 1), (1, 2)], 20, 4)
    t, k = 19, 0  # anchor (18, 19] — far from both GTs
    assert iou[t, k] == 0.0
    assert gts[t, k] == 1.0


def test_empty_gt_list():
    iou, gts, mask = labels.iou_grid([], 8, 4)
    assert iou.shape == (8, 4) and iou.sum() == 0 and gts.sum() == 0


def test_timestamp_roundtrips_py2_round():
    # Python-2 round(0.5) == 1 (away from zero); Python-3 round(0.5) == 0.
    # 2.5 frames: 0.5s of a 10s video at 50 feats => 2.5 -> must round to 3.
    s, e = labels.timestamp_to_featstamp((0.5, 9.0), nfeats=50, duration=10.0)
    assert s == 3
    # clamping (reference: dataloader.py:294-295)
    s, e = labels.timestamp_to_featstamp((9.9, 10.0), nfeats=50, duration=10.0)
    assert s <= 48 and e <= 49 and e >= s + 1
    s, e = labels.timestamp_to_featstamp((0.0, 0.0), nfeats=50, duration=10.0)
    assert (s, e) == (0, 1)


def test_featstamp_to_time():
    start, end = labels.featstamp_to_time(0, 4, nfeats=10, duration=20.0)
    assert start == 0.0 and end == 8.0
    # end is floored to start + one feat duration
    start, end = labels.featstamp_to_time(9, 9, nfeats=10, duration=20.0)
    assert end == start + 2.0
    # start clamped to duration - time_per_feat
    start, end = labels.featstamp_to_time(10, 11, nfeats=10, duration=20.0)
    assert start == 18.0


def test_flatten_good_proposals_order():
    grid = -np.ones((5, 3), dtype=np.int64)
    grid[2, 1] = 0  # anchor (0, 2]
    grid[4, 0] = 1  # anchor (3, 4]
    grid[4, 2] = 0  # anchor (1, 4]
    tap, lm, soi = labels.flatten_good_proposals(grid)
    # row-major (t, then k) order, as the reference's nested loop produces;
    # soi is [t-k, t+1] (reference: dataloader.py:625) — one-shifted vs the
    # anchor (t-k-1, t].
    np.testing.assert_array_equal(tap, [2, 4, 4])
    np.testing.assert_array_equal(lm, [0, 1, 0])
    np.testing.assert_array_equal(soi, [[1, 3], [4, 5], [2, 5]])


def test_sample_proposals_is_prefix_of_shuffle():
    rng = np.random.RandomState(0)
    ids = labels.sample_proposals(100, 64, rng)
    assert len(ids) == 64 and len(set(ids.tolist())) == 64
    ids = labels.sample_proposals(10, 64, np.random.RandomState(0))
    assert sorted(ids.tolist()) == list(range(10))


def test_top_proposals_matches_loop_oracle():
    """Vectorized gettop1000 == the reference's row-major threshold scan
    (reference: eval_utils.py:259-287)."""
    from echr_tpu.data.labels import featstamp_to_time
    from echr_tpu.engine.proposals import top_proposals

    rng = np.random.RandomState(0)
    T, K, topN = 40, 16, 25
    pred = rng.rand(T, K).astype(np.float32)
    masks = labels.anchor_mask(T, K)
    cg_gts = rng.randint(0, 5, size=(T, K))
    duration = 33.0

    # loop oracle
    masked = pred * masks
    thr = np.sort(masked.reshape(-1))[-min(T * K, topN)]
    e_ind, e_fs, e_cg, e_ts, e_conf = [], [], [], [], []
    for n in range(T):
        for k in range(K):
            if n >= k and masked[n, k] >= thr:
                e_ind.append(n)
                e_cg.append(cg_gts[n, k])
                e_ts.append(featstamp_to_time(n - k, n + 1, T, duration))
                e_fs.append([n - k, n + 1])
                e_conf.append(float(masked[n, k]))

    g_ind, g_fs, g_cg, g_ts, g_conf = top_proposals(
        pred, masks, cg_gts, duration, featstamp_to_time, topN=topN
    )
    assert g_ind == e_ind
    assert g_fs == e_fs
    assert g_cg == e_cg
    assert g_ts == e_ts
    np.testing.assert_allclose(g_conf, e_conf, rtol=1e-6)


def test_debug_preset():
    from echr_tpu.config import parse_config

    cfg = parse_config(["--debug", "--id", "D"])
    # reference: opts.py:288-293
    assert cfg.save.min_epoch_when_save == 0
    assert cfg.save.save_checkpoint_every == 100
    assert cfg.save.losses_log_every == 50
    assert cfg.eval.num_vids_eval == 10
    assert cfg.data.shuffle is False


def test_good_proposal_count_matches_grid():
    """The labels-off fast path's windowed counter equals the full-grid
    count (iou_scores >= thr).sum() exactly, across randomized geometries
    and thresholds including the fallback regime (thr <= 0.65)."""
    from echr_tpu.data.labels import good_proposal_count, iou_grid

    r = np.random.RandomState(42)
    for _ in range(120):
        T = int(r.randint(3, 500))
        K = int(r.choice([32, 64, 256]))
        G = int(r.randint(0, 7))
        fs = []
        for _ in range(G):
            a = int(r.randint(0, T - 1))
            fs.append((a, int(r.randint(a + 1, T))))
        thr = float(r.choice([0.8, 0.7, 0.9, 0.99, 0.66, 0.5]))
        iou, _, _ = iou_grid(fs, T, K)
        assert good_proposal_count(fs, T, K, thr) == int((iou >= thr).sum()), (
            T, K, fs, thr)
