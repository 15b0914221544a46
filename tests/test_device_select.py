"""Device-side top-N proposal selection == host top_proposals, exactly.

select_topk_batched replaces the [B, T, K] score-grid fetch + host scan in
the batched eval pipeline; these tests pin selection-identity against the
golden-tested host path (engine.proposals.top_proposals) on real batcher
masks, tie storms (untrained all-zero scores), threshold clamps, and
varying n_frames.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from echr_tpu.config import flagship_config
from echr_tpu.data.labels import anchor_mask, featstamp_to_time
from echr_tpu.engine import proposals as P
from echr_tpu.engine.steps import select_topk_batched


def _host_sel(pp, nf, K, topN, thres, nb):
    masks = anchor_mask(nf, K)
    ind, soi, _, ts, tp = P.top_proposals(
        pp[:nf], masks, None, 30.0, featstamp_to_time,
        val_score_thres=thres, topN=topN,
    )
    return ind[:nb], [list(s) for s in soi[:nb]], tp[:nb]


def _device_sel(pp_b, nfr, K, topN, thres, nb):
    from echr_tpu.engine.steps import unpack_topk_selection

    idx_b, cnt_b, conf_b = select_topk_batched(
        jnp.asarray(pp_b), jnp.asarray(nfr, jnp.int32), topN=topN, nb=nb,
        val_score_thres=thres,
    )
    out = []
    for i in range(len(nfr)):
        ind, soi, _, tp = unpack_topk_selection(
            np.asarray(idx_b)[i], np.asarray(cnt_b)[i], nb, K, int(nfr[i]),
            30.0, featstamp_to_time, np.asarray(conf_b)[i])
        out.append((ind, soi, tp))
    return out


@pytest.mark.parametrize("thres", [0.0, 0.4])
@pytest.mark.parametrize("topN", [10, 100])
def test_device_select_matches_host(topN, thres):
    T, K, B, nb = 96, 64, 4, 128
    r = np.random.RandomState(0)
    pp_b = r.rand(B, T, K).astype(np.float32)
    nfr = np.array([96, 50, 7, 2])
    dev = _device_sel(pp_b, nfr, K, topN, thres, nb)
    for i in range(B):
        h_ind, h_soi, h_tp = _host_sel(pp_b[i], int(nfr[i]), K, topN, thres, nb)
        d_ind, d_soi, d_tp = dev[i]
        assert d_ind == h_ind, f"video {i}"
        assert d_soi == h_soi
        np.testing.assert_allclose(d_tp, h_tp, rtol=1e-6)


def test_device_select_tie_storm():
    """All-equal scores (untrained model): threshold==score, every valid
    anchor qualifies; both paths truncate the row-major order at nb."""
    T, K, nb = 64, 32, 128
    pp = np.full((1, T, K), 0.5, np.float32)
    dev = _device_sel(pp, np.array([T]), K, 10, 0.0, nb)
    h_ind, h_soi, h_tp = _host_sel(pp[0], T, K, 10, 0.0, nb)
    assert dev[0][0] == h_ind
    assert dev[0][1] == h_soi


def test_device_select_ties_past_topn_with_ceiling_nb():
    """Threshold ties can push the selection count past topN; with nb at
    the bucket CEILING (what eval/serve pass) the device keeps them all,
    exactly like the host path before its bucket(max_n) truncation."""
    T, K, topN, nb = 64, 32, 10, 1024
    r = np.random.RandomState(3)
    pp = (r.rand(1, T, K) * 0.5).astype(np.float32)
    pp[0, 40:50, :] = 0.9  # 10 rows x 32 cols of identical top scores
    dev = _device_sel(pp, np.array([T]), K, topN, 0.0, nb)
    h_ind, h_soi, h_tp = _host_sel(pp[0], T, K, topN, 0.0, nb)
    assert len(dev[0][0]) > topN  # ties actually expanded the selection
    assert dev[0][0] == h_ind
    assert dev[0][1] == h_soi
    np.testing.assert_allclose(dev[0][2], h_tp, rtol=1e-6)


def test_device_select_matches_batcher_masks():
    """The in-graph anchor mask must equal the batcher's tap_masks within
    the valid-frame range (the host path uses batch.tap_masks)."""
    from echr_tpu.data.batcher import make_batch
    from echr_tpu.data.dataset import SyntheticDataset

    cfg = flagship_config().replace_in(
        "data", synthetic=True, lda_dim=100, time_buckets=(64,))
    cfg = cfg.replace_in("tap", video_dim=16, hidden_dim=16, K=24,
                         prop_sample_num=8).validate()
    ds = SyntheticDataset(cfg, num_videos=3, seed=5)
    r = np.random.RandomState(1)
    for i in range(3):
        batch, meta = make_batch(ds.get_example(i), cfg, r, w1=ds.w1)
        got = np.asarray(batch.tap_masks)[: meta.n_frames]
        want = anchor_mask(meta.n_frames, cfg.tap.K)
        assert np.array_equal(got, want)
        # end-to-end: device select on this video's (random) scores
        pp = r.rand(1, np.asarray(batch.tap_masks).shape[0], cfg.tap.K).astype(np.float32)
        dev = _device_sel(pp, np.array([meta.n_frames]), cfg.tap.K, 10, 0.0, 64)
        h = _host_sel(pp[0], meta.n_frames, cfg.tap.K, 10, 0.0, 64)
        assert dev[0][0] == h[0] and dev[0][1] == h[1]


def test_tap_mode_device_selection_matches_host(tmp_path):
    """'tap' evals no longer fetch the [T, K] grids (VERDICT r3 next-5):
    device selection must produce identical predictions in BOTH eval loops,
    for 'tap' (proposal-only output) and per-video 'tap_cg'."""
    import jax

    from test_train_e2e import tiny_cfg

    from echr_tpu.data.dataset import build_dataset
    from echr_tpu.data.loader import Loader
    from echr_tpu.engine.evaluate import eval_split, eval_split_batched
    from echr_tpu.engine.steps import init_train_state
    from echr_tpu.models.registry import init_captioner, init_tap

    cfg = tiny_cfg(tmp_path)
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))

    def run(mode, batched, dev, tag):
        kw = {"num_vids_eval": 2, "val_all_metrics": False, "topN": 15,
              "language_eval": False, "get_eval_loss": False,
              "device_select": dev, "timing_out": {}}
        fn = eval_split_batched if batched else eval_split
        extra = {"batch_videos": 4} if batched else {}
        preds, _, _ = fn(state.tap_params, state.cg_params, loader, cfg,
                         str(tmp_path / f"{tag}.json"), kw,
                         flag_eval_what=mode, **extra)
        return preds, kw["timing_out"]

    for mode in ("tap", "tap_cg"):
        for batched in (False, True):
            on, tm_on = run(mode, batched, True, f"{mode}_{batched}_on")
            off, _ = run(mode, batched, False, f"{mode}_{batched}_off")
            assert set(on) == set(off) and on, (mode, batched)
            for vid in on:
                assert len(on[vid]) == len(off[vid]), (mode, batched, vid)
                for pa, pb in zip(on[vid], off[vid]):
                    assert pa["sentence"] == pb["sentence"]
                    np.testing.assert_allclose(pa["timestamp"], pb["timestamp"],
                                               rtol=0, atol=0)
                    np.testing.assert_allclose(
                        pa["proposal_score"], pb["proposal_score"], rtol=1e-6)
            if batched:
                # the breakdown instrumentation populates timing_out
                assert tm_on["groups"] >= 1
                assert tm_on["grid_fallbacks"] == 0  # no tie storm here
            else:
                # per-video route at default config (VERDICT r4 next-7):
                # every video must select via the [nb] device fetch — zero
                # tie-storm fallbacks, zero [T, K] grid fetches
                assert tm_on["device_selections"] >= 1, tm_on
                assert tm_on["grid_fallbacks"] == 0, tm_on
                assert tm_on["grid_fetches"] == 0, tm_on


def test_device_select_default_on():
    """The config default must keep device selection ON everywhere the
    two-pass fallback allows (VERDICT r4 next-7) — the eval loops read
    cfg.eval.device_select when the caller doesn't override."""
    from echr_tpu.config import Config

    assert Config().eval.device_select is True


def test_tap_overflow_count_is_visible():
    """The 'tap' tie-storm fallback trigger: when every valid anchor ties,
    the device count reports the FULL selection size even past nb, and the
    host unbounded selection has exactly that many rows — so callers can
    detect the overflow and fall back to the grid."""
    T, K, nb = 96, 64, 1024
    pp = np.full((1, T, K), 0.5, np.float32)
    idx_b, cnt_b, conf_b = select_topk_batched(
        jnp.asarray(pp), jnp.asarray([T], jnp.int32), topN=10, nb=nb,
        val_score_thres=0.0,
    )
    cnt = int(np.asarray(cnt_b)[0])
    masks = anchor_mask(T, K)
    h_ind, _, _, _, _ = P.top_proposals(
        pp[0], masks, None, 30.0, featstamp_to_time,
        val_score_thres=0.0, topN=10,
    )
    assert cnt == len(h_ind)
    assert cnt > nb  # this geometry overflows the device slots
