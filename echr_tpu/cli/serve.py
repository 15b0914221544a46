"""Batch caption-serving CLI — net-new vs the reference (which has no
serving path; its eval loop is one video at a time through Python,
eval_utils.py:38).

Loads a training checkpoint, builds a CaptionService (echr_tpu.serve), and
captions a directory of C3D feature files (.npy, [T, video_dim], the
reference's on-disk feature format, dataloader.py:47-53), writing one JSON
with dense captions + timestamps per video — the same record shape as the
eval pipeline's prediction JSON, so the output can be scored directly with
echr_tpu.cli.score.

Example:
  python -m echr_tpu.cli.serve --checkpoint save/RUN/model-best.ckpt \
      --features_dir /data/c3d --output captions.json --beam_size 4
"""
from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import time

import numpy as np

log = logging.getLogger("echr_tpu.serve_cli")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("echr_tpu.serve")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="path to a model-*.ckpt training checkpoint")
    p.add_argument("--features_dir", type=str, required=True,
                   help="directory of <vid>.npy C3D feature files [T, video_dim]")
    p.add_argument("--output", type=str, required=True, help="output JSON path")
    p.add_argument("--duration_json", type=str, default=None,
                   help="optional {vid: seconds} map; defaults to frames * "
                        "feature_seconds per video")
    p.add_argument("--feature_seconds", type=float, default=2.0,
                   help="seconds of video per feature row (64-frame C3D "
                        "stride at 32 fps ~= 2s)")
    p.add_argument("--batch_videos", type=int, default=32)
    p.add_argument("--topN", type=int, default=100)
    p.add_argument("--nms_threshold", type=float, default=0.0)
    p.add_argument("--beam_size", type=int, default=1)
    p.add_argument("--limit", type=int, default=0, help="cap #videos (0 = all)")
    p.add_argument("--pre_normalized", action="store_true",
                   help="features are ALREADY (f - C3D_MEAN)/sqrt(C3D_VAR) "
                        "normalized; by default the CLI applies the same "
                        "normalization the training/eval pipeline applies to "
                        "raw on-disk C3D features (dataset.py, reference: "
                        "dataloader.py:49-51)")
    return p


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="[%(asctime)s] %(message)s")
    from echr_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    ns = build_parser().parse_args(argv)

    from echr_tpu.serve import CaptionRequest, from_checkpoint

    service = from_checkpoint(
        ns.checkpoint,
        batch_videos=ns.batch_videos,
        topN=ns.topN,
        nms_threshold=ns.nms_threshold,
        beam_size=ns.beam_size,
    )

    durations = {}
    if ns.duration_json:
        with open(ns.duration_json) as f:
            durations = json.load(f)

    files = sorted(glob.glob(os.path.join(ns.features_dir, "*.npy")))
    if ns.limit:
        files = files[: ns.limit]
    if not files:
        raise FileNotFoundError(f"no .npy feature files under {ns.features_dir}")

    # stream: load + caption batch_videos files at a time so host RAM holds
    # one chunk of features, not the whole directory (ActivityNet-scale
    # dirs are multiple GB)
    results = {}
    t0 = time.time()
    for i0 in range(0, len(files), ns.batch_videos):
        requests = []
        for path in files[i0 : i0 + ns.batch_videos]:
            vid = os.path.splitext(os.path.basename(path))[0]
            feats = np.load(path).astype(np.float32)
            if not ns.pre_normalized:
                # the model trained on normalized features; raw on-disk
                # C3D would be mis-scaled ~1.39x (review r3 fourth session)
                from echr_tpu.data.dataset import C3D_MEAN, C3D_VAR

                feats = (feats - C3D_MEAN) / np.sqrt(C3D_VAR)
            dur = float(durations.get(vid, feats.shape[0] * ns.feature_seconds))
            requests.append(CaptionRequest(vid=vid, feats=feats, duration=dur))
        results.update(service.caption(requests))
    dt = time.time() - t0
    n_caps = sum(len(v) for v in results.values())
    log.info("captioned %d videos (%d captions) in %.2fs (%.1f captions/s)",
             len(results), n_caps, dt, n_caps / max(dt, 1e-9))

    out = {
        "results": {
            vid: [
                {
                    "sentence": c.sentence,
                    "timestamp": list(c.timestamp),
                    "proposal_score": c.proposal_score,
                    "sentence_confidence": c.sentence_confidence,
                }
                for c in caps
            ]
            for vid, caps in results.items()
        },
        "version": "VERSION 1.0",
        "external_data": {"used": True, "details": "C3D features"},
    }
    os.makedirs(os.path.dirname(ns.output) or ".", exist_ok=True)
    with open(ns.output, "w") as f:
        json.dump(out, f)
    log.info("wrote %s", ns.output)


if __name__ == "__main__":
    main()
