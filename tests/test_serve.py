"""Batched caption service end-to-end, incl. from_checkpoint."""
import numpy as np

from test_train_e2e import tiny_cfg

from echr_tpu.engine.train import train
from echr_tpu.serve import CaptionRequest, from_checkpoint


def test_caption_service(tmp_path):
    cfg = tiny_cfg(tmp_path).replace(run_id="SRV")
    out = train(cfg, max_iterations=2)
    svc = from_checkpoint(
        f"{out['save_folder']}/model-last.ckpt", batch_videos=4, topN=10
    )
    rng = np.random.RandomState(0)
    reqs = [
        CaptionRequest(
            vid=f"q{i}", feats=rng.randn(50 + 10 * i, cfg.tap.video_dim).astype(np.float32),
            duration=30.0 + i, lda=rng.randn(cfg.data.lda_dim).astype(np.float32),
        )
        for i in range(5)
    ]
    res = svc.caption(reqs)
    assert set(res) == {f"q{i}" for i in range(5)}
    for vid, caps in res.items():
        assert len(caps) > 0
        for c in caps:
            assert c.timestamp[1] > c.timestamp[0]
            assert 0.0 <= c.proposal_score <= 1.0

    svc_beam = from_checkpoint(
        f"{out['save_folder']}/model-last.ckpt", batch_videos=4, topN=5, beam_size=2
    )
    res_b = svc_beam.caption(reqs[:2])
    assert len(res_b) == 2


def test_caption_service_mesh(tmp_path):
    """Multi-chip serving over the CPU mesh: same request set, batch rows
    sharded over the data axis (incl. a chunk size NOT divisible by dp)."""
    from echr_tpu.parallel.mesh import build_mesh

    cfg = tiny_cfg(tmp_path).replace(run_id="SRVM")
    out = train(cfg, max_iterations=2)
    mesh = build_mesh(shape=(4, 1))
    svc = from_checkpoint(
        f"{out['save_folder']}/model-last.ckpt", batch_videos=3, topN=10, mesh=mesh
    )
    rng = np.random.RandomState(0)
    reqs = [
        CaptionRequest(
            vid=f"m{i}", feats=rng.randn(60, cfg.tap.video_dim).astype(np.float32),
            duration=30.0, lda=rng.randn(cfg.data.lda_dim).astype(np.float32),
        )
        for i in range(5)
    ]
    res = svc.caption(reqs)
    assert set(res) == {f"m{i}" for i in range(5)}
    for caps in res.values():
        assert len(caps) > 0
        for c in caps:
            assert c.timestamp[1] > c.timestamp[0]


def test_serve_cli(tmp_path):
    """Serving CLI: checkpoint + directory of .npy C3D features -> caption
    JSON in the eval pipeline's record shape."""
    import json

    from echr_tpu.cli.serve import main as serve_main

    cfg = tiny_cfg(tmp_path).replace(run_id="SRVC")
    out = train(cfg, max_iterations=2)
    fd = tmp_path / "feats"
    fd.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        np.save(fd / f"v{i}.npy",
                rng.randn(40 + 5 * i, cfg.tap.video_dim).astype(np.float32))
    out_json = tmp_path / "caps.json"
    serve_main([
        "--checkpoint", f"{out['save_folder']}/model-last.ckpt",
        "--features_dir", str(fd), "--output", str(out_json),
        "--batch_videos", "2", "--topN", "5",
    ])
    data = json.loads(out_json.read_text())
    assert set(data["results"]) == {"v0", "v1", "v2"}
    for vid, recs in data["results"].items():
        assert recs
        r0 = recs[0]
        assert r0["sentence"] is not None
        assert r0["timestamp"][1] > r0["timestamp"][0]
