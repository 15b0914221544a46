"""Loader iteration/prefetch semantics: wrap flags, state save/restore,
deterministic mid-epoch resume (reference: dataloader BlobFetcher +
train.py:162-163 resume-restores data order)."""
import numpy as np

from test_train_e2e import tiny_cfg

from echr_tpu.data.dataset import build_dataset
from echr_tpu.data.loader import Loader


def test_epoch_wrap_and_reshuffle(tmp_path):
    cfg = tiny_cfg(tmp_path)
    ds = build_dataset(cfg)
    loader = Loader(ds, cfg, seed=0)
    n = loader.split_size("train")
    vids, wraps = [], []
    for _ in range(2 * n):
        b, m = loader.get_batch("train")
        vids.append(m.vid)
        wraps.append(m.wrapped)
    assert sum(wraps[:n]) == 1 and wraps[n - 1]  # exactly one wrap per epoch
    assert sorted(vids[:n]) == sorted(vids[n:])  # same videos each epoch
    # all split videos visited exactly once per epoch
    assert len(set(vids[:n])) == n


def test_state_roundtrip_resumes_order(tmp_path):
    cfg = tiny_cfg(tmp_path)
    ds = build_dataset(cfg)
    loader = Loader(ds, cfg, seed=1)
    for _ in range(3):
        loader.get_batch("train")
    st = loader.state()
    nxt = [loader.get_batch("train") for _ in range(3)]
    next_vids = [m.vid for _, m in nxt]

    loader2 = Loader(ds, cfg, seed=999)  # different seed; state must win
    loader2.load_state(st)
    resumed = [loader2.get_batch("train") for _ in range(3)]
    assert [m.vid for _, m in resumed] == next_vids
    # EXACT sample reproduction: per-item seeds derive from the
    # checkpointed (base_seed, split, epoch, pos), so sampled proposals
    # match too, not just the video order
    for (ba, _), (bb, _) in zip(nxt, resumed):
        assert np.asarray(ba.ind_select).tolist() == np.asarray(bb.ind_select).tolist()
        assert np.asarray(ba.soi).tolist() == np.asarray(bb.soi).tolist()


def test_train_seeds_independent_of_eval_cadence(tmp_path):
    """Interleaved val fetches (in-training evals) must not change the
    train stream's sampled proposals: per-item seeds are derived from
    (base_seed, split, epoch, pos), not drawn from a shared stream whose
    order depended on WHEN other splits' fetchers ran (review r3 fourth
    session)."""
    cfg = tiny_cfg(tmp_path)
    ds = build_dataset(cfg)

    def stream(interleave_val):
        loader = Loader(ds, cfg, seed=0)
        items = []
        for i in range(8):
            if interleave_val and i % 3 == 1:
                loader.reset_iterator("val")
                loader.get_batch("val")
            b, m = loader.get_batch("train")
            items.append((m.vid, np.asarray(b.ind_select).tolist(),
                          np.asarray(b.soi).tolist()))
        return items

    assert stream(False) == stream(True)


def test_wrap_resume_uses_fresh_permutation(tmp_path):
    """A checkpoint taken exactly at an epoch boundary must resume with
    the NEXT epoch's fresh shuffle, not replay the completed epoch's
    permutation (review r3 fourth session; reference reshuffles every
    epoch, dataloader.py:707-708)."""
    cfg = tiny_cfg(tmp_path)
    ds = build_dataset(cfg)
    ref = Loader(ds, cfg, seed=5)
    n = ref.split_size("train")
    epoch1 = [ref.get_batch("train")[1].vid for _ in range(n)]  # wraps at n
    epoch2 = [ref.get_batch("train")[1].vid for _ in range(n)]
    assert epoch1 != epoch2  # the reshuffle actually fired

    other = Loader(ds, cfg, seed=5)
    for _ in range(n):
        other.get_batch("train")  # consume exactly one epoch (wrapped)
    resumed = Loader(ds, cfg, seed=5)
    resumed.load_state(other.state())
    assert [resumed.get_batch("train")[1].vid for _ in range(n)] == epoch2


def test_val_split_not_shuffled(tmp_path):
    cfg = tiny_cfg(tmp_path)
    ds = build_dataset(cfg)
    loader = Loader(ds, cfg, seed=0)
    n = loader.split_size("val")
    a = [loader.get_batch("val")[1].vid for _ in range(n)]
    b = [loader.get_batch("val")[1].vid for _ in range(n)]
    assert a == b  # val order stable across epochs


def test_reset_iterator(tmp_path):
    cfg = tiny_cfg(tmp_path)
    ds = build_dataset(cfg)
    loader = Loader(ds, cfg, seed=0)
    first = loader.get_batch("val")[1].vid
    loader.get_batch("val")
    loader.reset_iterator("val")
    assert loader.get_batch("val")[1].vid == first


def test_reset_during_prefetch_is_clean(tmp_path):
    """reset_iterator stops AND JOINS the split's prefetcher before
    resetting the cursor: with live workers racing the reset, the first
    post-reset batch must always be the split's first video (review r3
    fourth session — workers could advance a freshly reset cursor)."""
    cfg = tiny_cfg(tmp_path, **{"data.nthreads": 4})
    ds = build_dataset(cfg)
    loader = Loader(ds, cfg, seed=0)
    expected = loader.get_batch("val")[1].vid
    for _ in range(15):
        loader.get_batch("val")  # leave workers mid-prefetch
        loader.reset_iterator("val")
        assert loader.get_batch("val")[1].vid == expected


def test_multithreaded_prefetch_matches_single(tmp_path):
    """nthreads>1 pool must yield the exact same ordered stream (vids,
    wrap flags, sampled proposal lists) as the single-thread prefetcher —
    the reference's order-preserving-sampler semantics (dataloader.py:
    680-682,711-718)."""
    cfg1 = tiny_cfg(tmp_path, **{"data.nthreads": 1})
    cfg4 = cfg1.replace_in("data", nthreads=4)
    n = None
    streams = []
    for cfg in (cfg1, cfg4):
        ds = build_dataset(cfg)
        loader = Loader(ds, cfg, seed=0)
        n = loader.split_size("train")
        items = []
        for _ in range(2 * n + 3):  # across an epoch wrap
            b, m = loader.get_batch("train")
            items.append((m.vid, m.wrapped, np.asarray(b.ind_select).tolist(),
                          np.asarray(b.soi).tolist()))
        streams.append(items)
    assert streams[0] == streams[1]


def test_synthetic_example_cache_invisible(tmp_path):
    """The synthetic example LRU cache (round 4: repeat epochs skip the
    ~2.5 ms/video synthesis) must be invisible: cached fetches equal
    uncached ones bit-for-bit, hits survive consumer mutation (the
    dropsent batcher paths mutate caption lists in place), and eviction
    keeps the cache bounded."""
    cfg = tiny_cfg(tmp_path)
    ds_on = build_dataset(cfg.replace_in("data", synthetic_cache_videos=4))
    ds_off = build_dataset(cfg.replace_in("data", synthetic_cache_videos=0))
    ixs = ds_on.split_ix["train"][:6] + ds_on.split_ix["val"][:2]
    for _pass in range(3):  # pass 2+ hits (and evicts: 8 ixs > cap 4)
        for ix in ixs:
            a, b = ds_on.get_example(ix), ds_off.get_example(ix)
            np.testing.assert_array_equal(a.feats, b.feats)
            np.testing.assert_array_equal(a.lda, b.lda)
            np.testing.assert_array_equal(a.cap_labels, b.cap_labels)
            assert a.timestamps == b.timestamps
            assert a.sentences == b.sentences
            assert (a.vid, a.duration, a.split) == (b.vid, b.duration, b.split)
            # consumer mutation must not leak into later hits
            a.feats[:] = -1.0
            a.sentences.append("corrupted")
            a.timestamps.append((0.0, 0.0))
    assert len(ds_on._cache) <= 4


def test_worker_exception_surfaces(tmp_path):
    """A prefetch worker that raises (corrupt .npy, h5 read error) must
    surface the exception through get_batch, not die silently and wedge
    the consumer on an empty queue forever."""
    import pytest

    cfg = tiny_cfg(tmp_path)
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    calls = {"n": 0}
    orig = dataset.get_example

    def boom(ix):
        calls["n"] += 1
        if calls["n"] > 3:
            raise RuntimeError("synthetic asset corruption")
        return orig(ix)

    dataset.get_example = boom
    with pytest.raises(RuntimeError, match="synthetic asset corruption"):
        for _ in range(16):
            loader.get_batch("train")
