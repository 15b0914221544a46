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
