"""export_disk round trip: the exported on-disk corpus, read back through
ActivityNetDataset (the reference-layout file readers, reference:
dataloader.py:38-96,159-263), must reproduce the in-memory SyntheticDataset
examples — feats to f32-normalisation rounding, labels/geometry exactly.
This is the equality backbone of the dress rehearsal
(experiments/dressrehearsal.py, VERDICT r4 next-3)."""
import numpy as np
import pytest

from test_train_e2e import tiny_cfg

from echr_tpu.data.dataset import ActivityNetDataset, SyntheticDataset, build_dataset
from echr_tpu.data.export_disk import disk_cfg, export_synthetic_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    cfg = tiny_cfg(root, **{"data.synthetic_num_videos": 12,
                            "data.synthetic_learnable": True})
    export_synthetic_corpus(cfg, str(root / "disk"), log_every=0)
    return cfg, str(root / "disk")


def test_round_trip_examples(corpus):
    cfg, out = corpus
    syn = SyntheticDataset(cfg)
    disk = build_dataset(disk_cfg(cfg, out))
    assert isinstance(disk, ActivityNetDataset)
    assert len(disk) == len(syn) == 12
    assert disk.split_ix == syn.split_ix
    assert disk.ix_to_word == syn.ix_to_word
    assert disk.seq_length == syn.seq_length
    np.testing.assert_allclose(disk.w1, syn.w1, rtol=1e-6)
    for ix in range(len(syn)):
        a, b = syn.get_example(ix), disk.get_example(ix)
        assert a.vid == b.vid and a.split == b.split
        assert a.duration == pytest.approx(b.duration)
        np.testing.assert_allclose(a.feats, b.feats, atol=2e-6)
        np.testing.assert_array_equal(a.cap_labels, b.cap_labels)
        np.testing.assert_allclose(np.asarray(a.timestamps),
                                   np.asarray(b.timestamps), rtol=1e-6)
        assert a.sentences == b.sentences
        np.testing.assert_allclose(a.lda, b.lda, atol=1e-7)


def test_export_idempotent(corpus):
    """A matching manifest skips the re-export (mtime unchanged)."""
    import os

    cfg, out = corpus
    before = os.path.getmtime(os.path.join(out, "anno.json"))
    export_synthetic_corpus(cfg, out, log_every=0)
    assert os.path.getmtime(os.path.join(out, "anno.json")) == before


def test_disk_corpus_trains_and_evals(corpus, tmp_path):
    """Short end-to-end through the DISK path: loader batches, a few train
    steps, and a 2-video eval — the dress rehearsal in miniature."""
    from echr_tpu.engine.train import train

    cfg, out = corpus
    dcfg = disk_cfg(cfg, out)
    dcfg = dcfg.replace_in("save", checkpoint_path=str(tmp_path),
                           save_checkpoint_every=10**9,
                           min_epoch_when_save=10**9).validate()
    res = train(dcfg, max_iterations=4)
    assert res["iteration"] == 4
