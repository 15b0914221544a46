"""ActivityNetDataset exercised against tiny on-disk assets in the EXACT
reference layout (reference: dataloader.py:38-69,159-263):

  - per-video C3D .npy features (input_c3d_dir2/<vid>.npy)
  - train/val caption-label HDF5s with labels/label_start_ix/label_end_ix
    (val file indexed by ix - train_videos, dataloader.py:388-390)
  - vocab + splits JSON (video_data_for_cg), incl. a restval video
    (unknown split -> train when train_only==0, dataloader.py:239)
  - annotation JSON (video_json), w1 JSON, LDA HDF5 keyed by video_id
  - two-stream CSV pairs under spatial/csv_action + OF/csv_action with the
    [::2] stride and min-length concat (dataloader.py:55-69,84-96), and the
    zeros fallback for missing CSVs (dataloader.py:57-60)
  - SOTA proposal JSON keyed WITHOUT the 'v_' prefix (dataloader.py:304-318)

Then a short train + eval runs end-to-end over these files.
"""
import json
import os

import h5py
import numpy as np
import pytest

from echr_tpu.config import flagship_config
from echr_tpu.data.dataset import C3D_MEAN, C3D_VAR, ActivityNetDataset, build_dataset

SEQ_LEN = 12
VIDS = ["v_fix00000", "v_fix00001", "v_fix00002", "v_fix00003", "v_fix00004"]
SPLITS = ["train", "train", "restval", "val", "val"]  # restval -> train
T_BY_VID = [48, 61, 80, 52, 73]
D_C3D = 24
N_EVENTS = [2, 3, 2, 2, 3]
VOCAB = 30


def make_fixture(root):
    rng = np.random.RandomState(0)
    data = root / "data"
    (data / "c3d_npy").mkdir(parents=True)
    # --- C3D features ---
    for vid, t in zip(VIDS, T_BY_VID):
        np.save(data / "c3d_npy" / f"{vid}.npy", rng.randn(t, D_C3D).astype(np.float32))
    # --- annotations + labels ---
    annotations = {}
    sent_words = {}
    for vi, vid in enumerate(VIDS):
        dur = float(T_BY_VID[vi] * 0.8)
        starts = np.sort(rng.rand(N_EVENTS[vi]) * dur * 0.6)
        ts = [[float(s), float(min(s + 0.2 * dur + rng.rand() * 0.2 * dur, dur))]
              for s in starts]
        words = [rng.randint(1, VOCAB + 1, size=rng.randint(3, 8)) for _ in ts]
        sent_words[vid] = words
        annotations[vid] = {
            "duration": dur,
            "timestamps": ts,
            "sentences": [" ".join(f"tok{w}" for w in ws) for ws in words],
        }
    (data / "anno.json").write_text(json.dumps(annotations))

    def write_label_h5(path, vids):
        n_caps = [len(annotations[v]["timestamps"]) for v in vids]
        total = sum(n_caps)
        labels = np.zeros((total, SEQ_LEN), np.int64)
        start = np.zeros(len(vids), np.int64)
        end = np.zeros(len(vids), np.int64)
        row = 0
        for i, v in enumerate(vids):
            start[i] = row
            for ws in sent_words[v]:
                labels[row, 1 : 1 + len(ws)] = ws  # col 0 stays 0 (BOS)
                row += 1
            end[i] = row
        with h5py.File(path, "w") as h5:
            h5["labels"] = labels
            h5["label_start_ix"] = start
            h5["label_end_ix"] = end

    train_vids = [v for v, s in zip(VIDS, SPLITS) if s != "val"]
    val_vids = [v for v, s in zip(VIDS, SPLITS) if s == "val"]
    write_label_h5(data / "train_lm.h5", train_vids)
    write_label_h5(data / "val_lm.h5", val_vids)
    # --- vocab/splits json (train + restval first, then val: the reference
    # data layout assumption behind the ix - train_videos offset) ---
    info = {
        "ix_to_word": {str(i): f"tok{i}" for i in range(1, VOCAB + 1)},
        "videos": [{"video_id": v, "split": s} for v, s in zip(VIDS, SPLITS)],
    }
    (data / "info.json").write_text(json.dumps(info))
    # --- w1, LDA, SOTA ---
    (data / "w1.json").write_text(json.dumps((0.05 + 0.1 * rng.rand(32)).tolist()))
    with h5py.File(data / "lda.h5", "w") as h5:
        for vid in VIDS:
            h5[vid] = (0.1 * rng.randn(16)).astype(np.float32)
    sota = {
        "results": {
            vid[2:]: [
                {"segment": [float(s), float(e)], "score": float(rng.rand())}
                for s, e in annotations[vid]["timestamps"]
            ]
            for vid in VIDS
        }
    }
    (data / "sota.json").write_text(json.dumps(sota))
    # --- two-stream CSVs only for VIDS[0] (others hit the zeros fallback) ---
    for stream in ("spatial", "OF"):
        (data / "twostream" / stream / "csv_action").mkdir(parents=True)
    n_rows_sp, n_rows_of = 2 * T_BY_VID[0], 2 * T_BY_VID[0] - 3  # unequal
    import pandas as pd

    pd.DataFrame(rng.randn(n_rows_sp, 200).astype(np.float32)).to_csv(
        data / "twostream" / "spatial" / "csv_action" / f"{VIDS[0]}.csv", index=False)
    pd.DataFrame(rng.randn(n_rows_of, 200).astype(np.float32)).to_csv(
        data / "twostream" / "OF" / "csv_action" / f"{VIDS[0]}.csv", index=False)
    return data


def fixture_cfg(tmp_path, **over):
    data = make_fixture(tmp_path)
    cfg = flagship_config()
    cfg = cfg.replace_in(
        "data",
        synthetic=False,
        video_json=str(data / "anno.json"),
        input_c3d_dir2=str(data / "c3d_npy"),
        input_lda_path=str(data / "lda.h5"),
        video_data_for_cg=str(data / "info.json"),
        train_label_for_cg=str(data / "train_lm.h5"),
        val_label_for_cg=str(data / "val_lm.h5"),
        w1_json=str(data / "w1.json"),
        input_twostream_dir=str(data / "twostream"),
        lda_dim=16,
        time_buckets=(128,),
    )
    cfg = cfg.replace_in("tap", video_dim=D_C3D, hidden_dim=32, K=32,
                         prop_sample_num=8, rnn_num_layers=2)
    cfg = cfg.replace_in("fusion", n_head=4, d_feats=32, d_o=32)
    cfg = cfg.replace_in("decoder", CG_rnn_size=32, CG_input_encoding_size=32,
                         CG_att_hid_size=32)
    cfg = cfg.replace_in("train", lr=5e-3, training_mode="pre_cg", cg_epochs=2)
    cfg = cfg.replace_in("save", checkpoint_path=str(tmp_path / "save"),
                         losses_log_every=5, save_checkpoint_every=10**9)
    cfg = cfg.replace_in("eval", num_vids_eval=2)
    for k, v in over.items():
        section, name = k.split(".")
        cfg = cfg.replace_in(section, **{name: v})
    return cfg.validate()


def test_construction_splits_and_vocab(tmp_path):
    cfg = fixture_cfg(tmp_path)
    ds = build_dataset(cfg)
    assert isinstance(ds, ActivityNetDataset)
    # restval video (ix 2) lands in train when train_only == 0
    assert ds.split_ix == {"train": [0, 1, 2], "val": [3, 4], "test": []}
    assert ds.seq_length == SEQ_LEN
    assert ds.vocab_size == VOCAB
    assert ds.train_videos == 3
    assert len(ds) == 5
    assert ds.w1.shape == (32,)


def test_train_only_drops_restval(tmp_path):
    cfg = fixture_cfg(tmp_path, **{"data.train_only": 1})
    ds = build_dataset(cfg)
    assert ds.split_ix["train"] == [0, 1]  # restval excluded


def test_get_example_train_and_val_offset(tmp_path):
    cfg = fixture_cfg(tmp_path)
    ds = build_dataset(cfg)
    with h5py.File(cfg.data.train_label_for_cg) as h5:
        train_labels = np.asarray(h5["labels"])
        tr_start = np.asarray(h5["label_start_ix"])
        tr_end = np.asarray(h5["label_end_ix"])
    with h5py.File(cfg.data.val_label_for_cg) as h5:
        val_labels = np.asarray(h5["labels"])
        va_start = np.asarray(h5["label_start_ix"])

    ex1 = ds.get_example(1)  # train video
    np.testing.assert_array_equal(
        ex1.cap_labels, train_labels[tr_start[1] : tr_end[1]])
    assert ex1.cap_labels.shape == (N_EVENTS[1], SEQ_LEN)
    # C3D normalisation applied
    raw = np.load(os.path.join(cfg.data.input_c3d_dir2, f"{VIDS[1]}.npy"))
    np.testing.assert_allclose(
        ex1.feats, (raw - C3D_MEAN) / np.sqrt(C3D_VAR), rtol=1e-6)
    assert ex1.lda.shape == (16,)
    assert ex1.duration == pytest.approx(T_BY_VID[1] * 0.8)
    assert len(ex1.timestamps) == len(ex1.sentences) == N_EVENTS[1]

    # val video ix=4 -> offset 4 - train_videos(3) = 1 into the VAL h5
    ex4 = ds.get_example(4)
    np.testing.assert_array_equal(
        ex4.cap_labels, val_labels[va_start[1] : va_start[1] + N_EVENTS[4]])
    assert ex4.vid == VIDS[4]


def test_twostream_csv_and_missing_fallback(tmp_path):
    cfg = fixture_cfg(tmp_path, **{"data.use_2stream_feature": True})
    ds = build_dataset(cfg)
    # VIDS[0] has CSVs: min(spatial, OF) rows, concat 400 dims, [::2] stride
    ex0 = ds.get_example(0)
    n = min(2 * T_BY_VID[0], 2 * T_BY_VID[0] - 3)
    expect_rows = min(T_BY_VID[0], (n + 1) // 2)  # vs c3d length
    assert ex0.feats.shape == (expect_rows, D_C3D + 400)
    assert np.abs(ex0.feats[:, D_C3D:]).sum() > 0  # real CSV values
    # VIDS[1] missing CSVs: zeros at c3d length then [::2] (reference
    # dataloader.py:57-60,86) -> ceil(T/2) rows and zero 2stream block
    ex1 = ds.get_example(1)
    assert ex1.feats.shape == ((T_BY_VID[1] + 1) // 2, D_C3D + 400)
    assert np.abs(ex1.feats[:, D_C3D:]).sum() == 0.0


def test_sota_proposals_keyed_without_prefix(tmp_path):
    cfg = fixture_cfg(tmp_path)
    cfg = cfg.replace_in("data", SOTA_json=str(tmp_path / "data" / "sota.json"))
    ds = build_dataset(cfg)
    ex = ds.get_example(3)
    fs, scores, ts = ds.get_sota(ex.vid, ex.feats.shape[0], ex.duration)
    assert fs is not None and len(fs) == N_EVENTS[3] == len(scores) == len(ts)
    for s, e in fs:
        assert 0 <= s <= e < ex.feats.shape[0]
    # unknown vid -> (None, None, None)
    assert ds.get_sota("v_nothere", 10, 5.0) == (None, None, None)


def test_train_and_eval_end_to_end_on_fixture(tmp_path):
    """The VERDICT-2 gate: a real train + eval run over the on-disk layout,
    executing every ActivityNetDataset branch through Loader/batcher."""
    from echr_tpu.data.loader import Loader
    from echr_tpu.engine.evaluate import eval_split
    from echr_tpu.engine.checkpoint import load_checkpoint
    from echr_tpu.engine.train import train

    cfg = fixture_cfg(tmp_path).replace(run_id="FIX")
    out = train(cfg, max_iterations=20)
    assert out["iteration"] >= 5  # 3 train videos x epochs, minus bad videos
    ckpt = load_checkpoint(os.path.join(out["save_folder"], "model-last.ckpt"))
    state = ckpt["state"]
    cfg = ckpt["config"]  # carries dataset-derived vocab/seq_length

    loader = Loader(build_dataset(cfg), cfg, seed=0)
    json_path = os.path.join(out["save_folder"], "fixture_eval.json")
    preds, scores, _ = eval_split(
        state.tap_params, state.cg_params, loader, cfg, json_path,
        eval_kwargs={"split": "val", "topN": 5, "num_vids_eval": 2,
                     "val_all_metrics": True, "language_eval": True},
        flag_eval_what="cg",
    )
    assert os.path.exists(json_path)
    assert "METEOR" in scores
