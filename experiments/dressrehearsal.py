"""Full-scale ON-DISK dress rehearsal (VERDICT r4 next-3).

The reference's loader ran against the real 19k-video ActivityNet tree
(reference: dataloader.py:159-263); until round 5 our disk path
(ActivityNetDataset) had only ever seen 5-video test fixtures — every
perf run used the in-memory synthesizer.  This driver:

  1. exports the synthetic corpus to the REAL on-disk layout at ~5k-video
     scale (per-video .npy, train/val label .h5, annotation/vocab JSONs,
     w1.json, LDA .h5) via echr_tpu.data.export_disk;
  2. runs the published stage-1 (TAP) + stage-2 (CG) recipe SHORT —
     the real `cli/train` through experiments/train_SST.sh /
     train_ECHR.sh — entirely from disk;
  3. times the fullscale val-split eval twice through `cli/eval`
     (cold page cache, then warm) and reports disk-path videos/s.

Usage:
    python experiments/dressrehearsal.py [--videos 6556]
        [--root save/dress_corpus] [--skip-export] [--skip-train]

Defaults: 6,556 videos -> 4,917 train / 1,639 val (the real ActivityNet
val-split size for the TRAIN side).  Corpus is ~3 GB on disk; export
~3-5 min, stages ~1 epoch each.  Results land in stdout as one JSON line
(recorded in docs/BENCH_NOTES.md next to the in-memory numbers).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def flagship_corpus_cfg(n_videos: int):
    from echr_tpu.config import flagship_config

    cfg = flagship_config()
    cfg = cfg.replace_in(
        "data", synthetic=True, lda_dim=100, time_buckets=(256,),
        synthetic_num_videos=n_videos, synthetic_vocab_size=6000,
        synthetic_seq_length=30, synthetic_learnable=True,
        # exporting shouldn't blow host RAM on a 6.5k-video corpus
        synthetic_cache_videos=0,
    )
    return cfg.validate()


def disk_flags(root: str):
    return [
        "--synthetic", "0",
        "--video_json", os.path.join(root, "anno.json"),
        "--input_c3d_dir2", os.path.join(root, "c3d_npy"),
        "--input_lda_path", os.path.join(root, "lda.h5"),
        "--video_data_for_cg", os.path.join(root, "info.json"),
        "--train_label_for_cg", os.path.join(root, "train_lm.h5"),
        "--val_label_for_cg", os.path.join(root, "val_lm.h5"),
        "--w1_json", os.path.join(root, "w1.json"),
    ]


def run(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    subprocess.run(cmd, check=True, cwd=ROOT, **kw)
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=6556)
    ap.add_argument("--root", default="save/dress_corpus")
    ap.add_argument("--tag", default="DRESS")
    ap.add_argument("--skip-export", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--eval-videos", type=int, default=0,
                    help="cap eval split (0 = the full val split)")
    args = ap.parse_args()
    root = os.path.join(ROOT, args.root)

    out = {"videos": args.videos, "root": args.root}

    if not args.skip_export:
        from echr_tpu.data.export_disk import export_synthetic_corpus

        t0 = time.time()
        export_synthetic_corpus(flagship_corpus_cfg(args.videos), root)
        out["export_s"] = round(time.time() - t0, 1)
        print(f"export: {out['export_s']}s", flush=True)

    dflags = disk_flags(root)
    # batch_size 32: the framework's production posture (the reference
    # cadence is per-video; at 4,917 train videos that is ~5k dispatches
    # per stage through the relay — the dress rehearsal's subject is the
    # DISK pipeline, which the batched loader exercises identically)
    common = ["--losses_log_every", "50", "--save_checkpoint_every",
              "1000000", "--num_vids_eval", "64", "--batch_size", "32"]
    if not args.skip_train:
        # stage 1: TAP pretrain, 1 epoch from disk
        out["stage1_s"] = round(run(
            ["bash", "experiments/train_SST.sh", f"{args.tag}_SST",
             *dflags, *common, "--tap_epoch", "1"]), 1)
        # stage 2: CG on GT proposals, 1 epoch, warm-started from stage 1.
        # model-LAST: the short stage-1 run suppresses periodic gating, so
        # only the end-of-training checkpoint exists (later flag wins over
        # the script's model-best default)
        out["stage2_s"] = round(run(
            ["bash", "experiments/train_ECHR.sh", f"{args.tag}_SST",
             f"{args.tag}_EC", *dflags, *common, "--cg_epoch", "1",
             "--min_epoch_when_save", "0",
             "--pretrain_path", f"save/{args.tag}_SST/model-last.ckpt"]), 1)

    # fullscale eval from disk: pass 1 cold-ish, pass 2 warm page cache +
    # warm compile cache (best-pass convention, like bench_e2e_eval)
    # --transfer_dtype bfloat16: the bench_e2e_eval/serving wire posture
    # (the checkpoint's training config carries float32); keeps the disk
    # number comparable to the in-memory fullscale one
    eval_cmd = [sys.executable, "-m", "echr_tpu.cli.eval",
                "--folder_id", f"{args.tag}_EC", "--which", "last",
                "--flag_eval_what", "tap_cg", "--topN", "128",
                "--no_language_eval", "--batch_videos", "32",
                "--transfer_dtype", "bfloat16"]
    if args.eval_videos:
        eval_cmd += ["--num_vids_eval", str(args.eval_videos)]

    import re

    def timed_eval():
        print("+", " ".join(eval_cmd), flush=True)
        p = subprocess.run(eval_cmd, check=True, cwd=ROOT,
                           capture_output=True, text=True)
        txt = p.stdout + p.stderr
        sys.stdout.write(txt[-2000:])
        m = re.search(r"eval wall ([0-9.]+)s \(([0-9.]+) videos/s\)", txt)
        if not m:
            raise RuntimeError("no 'eval wall' line in cli.eval output")
        return float(m.group(1)), float(m.group(2))

    (cold_s, cold_vps), (warm_s, warm_vps) = timed_eval(), timed_eval()
    with open(os.path.join(root, "info.json")) as f:
        n_val = sum(1 for v in json.load(f)["videos"] if v["split"] == "val")
    out["eval_cold_s"], out["eval_warm_s"] = cold_s, warm_s
    out["disk_eval_videos_per_s"] = max(cold_vps, warm_vps)
    out["n_eval_videos"] = args.eval_videos or n_val
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
