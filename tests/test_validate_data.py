"""Data-tree validator CLI: clean fixture passes, corruptions are caught."""
import json
import os

import numpy as np

from test_dataset_fixture import make_fixture

from echr_tpu.cli.validate_data import main as validate


def _args(data, **over):
    a = {
        "--video_json": str(data / "anno.json"),
        "--video_data_for_cg": str(data / "info.json"),
        "--train_label_for_cg": str(data / "train_lm.h5"),
        "--val_label_for_cg": str(data / "val_lm.h5"),
        "--w1_json": str(data / "w1.json"),
        "--input_c3d_dir2": str(data / "c3d_npy"),
        "--input_lda_path": str(data / "lda.h5"),
        "--SOTA_json": str(data / "sota.json"),
        "--K": "32",
        "--video_dim": "24",
        "--lda_dim": "16",
    }
    a.update(over)
    return [x for kv in a.items() for x in kv]


def test_clean_fixture_passes(tmp_path, capsys):
    data = make_fixture(tmp_path)
    assert validate(_args(data)) == 0
    out = capsys.readouterr().out
    assert "0 error(s)" in out


def test_corruptions_detected(tmp_path, capsys):
    data = make_fixture(tmp_path)
    os.remove(data / "c3d_npy" / "v_fix00001.npy")
    np.save(data / "c3d_npy" / "v_fix00002.npy", np.zeros((10, 99), np.float32))
    s = json.loads((data / "sota.json").read_text())
    s["results"] = {("v_" + k): v for k, v in s["results"].items()}
    (data / "sota.json").write_text(json.dumps(s))
    info = json.loads((data / "info.json").read_text())
    info["videos"] = info["videos"][::-1]  # val first -> offset misindex
    (data / "info.json").write_text(json.dumps(info))

    assert validate(_args(data)) == 1
    out = capsys.readouterr().out
    assert "not train-then-val ordered" in out
    assert "expected [T, 24]" in out
    assert ".npy missing" in out
    assert "'v_' prefix" in out


def test_corrupt_label_ix_detected(tmp_path, capsys):
    """Corrupt h5 label_start/end_ix — end<start, out-of-bounds slice, and
    token ids past the vocab (every one an hour-0 crash or silent-garbage
    mode of reference dataloader.py:193-214)."""
    import h5py

    data = make_fixture(tmp_path)
    with h5py.File(data / "train_lm.h5", "r+") as h5:
        start = np.asarray(h5["label_start_ix"])
        end = np.asarray(h5["label_end_ix"])
        start[0], end[0] = end[0], start[0]          # end < start
        end[-1] = h5["labels"].shape[0] + 7          # out-of-bounds slice
        del h5["label_start_ix"], h5["label_end_ix"]
        h5["label_start_ix"], h5["label_end_ix"] = start, end
        h5["labels"][0, 1] = 10_000                  # token id >> vocab
    assert validate(_args(data)) == 1
    out = capsys.readouterr().out
    assert "label_end_ix < label_start_ix" in out
    assert "label ix out of bounds" in out
    assert "exceeds vocab size" in out


def test_missing_h5_dataset_detected(tmp_path, capsys):
    import h5py

    data = make_fixture(tmp_path)
    with h5py.File(data / "val_lm.h5", "r+") as h5:
        del h5["label_end_ix"]
    assert validate(_args(data)) == 1
    assert "missing datasets" in capsys.readouterr().out


def test_nonfinite_npy_detected(tmp_path, capsys):
    data = make_fixture(tmp_path)
    arr = np.load(data / "c3d_npy" / "v_fix00000.npy")
    arr[0, 0] = np.nan
    np.save(data / "c3d_npy" / "v_fix00000.npy", arr)
    assert validate(_args(data)) == 1
    assert "non-finite values" in capsys.readouterr().out


def test_lda_missing_video_and_dim_detected(tmp_path, capsys):
    import h5py

    data = make_fixture(tmp_path)
    with h5py.File(data / "lda.h5", "r+") as h5:
        del h5["v_fix00003"]
    assert validate(_args(data)) == 1
    assert "videos missing" in capsys.readouterr().out
    data2 = make_fixture(tmp_path / "b")
    assert validate(_args(data2, **{"--lda_dim": "99"})) == 1
    assert "!= lda_dim" in capsys.readouterr().out


def _ts_args(data):
    return _args(data, **{"--input_twostream_dir": str(data / "twostream"),
                          "--sample_videos": "0"})


def test_twostream_clean_passes(tmp_path, capsys):
    data = make_fixture(tmp_path)
    assert validate(_ts_args(data)) == 0
    out = capsys.readouterr().out
    assert "input_twostream_dir" in out and "zeros fallback" in out


def test_truncated_csv_detected(tmp_path, capsys):
    """Truncated CSV — cut mid-row so a cell goes non-numeric/ragged
    (the named hour-0 failure of the reference's pd.read_csv path,
    dataloader.py:61-62)."""
    data = make_fixture(tmp_path)
    p = data / "twostream" / "spatial" / "csv_action" / "v_fix00000.csv"
    txt = p.read_text()
    p.write_text(txt[: int(len(txt) * 0.6)].rsplit(",", 1)[0] + ",oops")
    assert validate(_ts_args(data)) == 1
    out = capsys.readouterr().out
    assert "non-numeric" in out or "unparseable" in out


def test_twostream_of_missing_detected(tmp_path, capsys):
    data = make_fixture(tmp_path)
    os.remove(data / "twostream" / "OF" / "csv_action" / "v_fix00000.csv")
    assert validate(_ts_args(data)) == 1
    assert "read_csv(OF) crashes" in capsys.readouterr().out


def test_twostream_severe_truncation_detected(tmp_path, capsys):
    """A stream file with far fewer rows than its sibling = likely
    truncated upload; the reference would silently truncate the GOOD
    stream to match (dataloader.py:63-67)."""
    import pandas as pd

    data = make_fixture(tmp_path)
    p = data / "twostream" / "OF" / "csv_action" / "v_fix00000.csv"
    df = pd.read_csv(p)
    df.iloc[: len(df) // 4].to_csv(p, index=False)
    assert validate(_ts_args(data)) == 1
    assert "likely truncated file" in capsys.readouterr().out


def test_caption_count_mismatch_detected(tmp_path, capsys):
    data = make_fixture(tmp_path)
    anno = json.loads((data / "anno.json").read_text())
    vid = "v_fix00000"
    anno[vid]["timestamps"].append([0.0, 1.0])  # extra event, no h5 row
    anno[vid]["sentences"].append("ghost event")
    (data / "anno.json").write_text(json.dumps(anno))
    assert validate(_args(data)) == 1
    out = capsys.readouterr().out
    assert "caption rows in h5 vs" in out
