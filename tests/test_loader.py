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
    next_vids = [loader.get_batch("train")[1].vid for _ in range(3)]

    loader2 = Loader(ds, cfg, seed=999)  # different rng; state must win
    loader2.load_state(st)
    resumed = [loader2.get_batch("train")[1].vid for _ in range(3)]
    assert resumed == next_vids


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
