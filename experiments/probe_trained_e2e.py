"""Trained-checkpoint e2e eval: decode_early_exit_batched ON vs OFF.

bench.py's e2e pipeline runs UNTRAINED params, where argmax over
near-uniform logits ~never emits EOS, so the batch-global early-exit
while_loop (decoder_sample_batched_greedy / beam_search_batched) runs all
L steps and can only show its overhead.  This probe loads a soak-trained
checkpoint (captions genuinely end at 8-15 of L=30 tokens) and measures
the full eval_split_batched pipeline — loader -> batched encode ->
device top-N -> batched decode -> prediction JSON — with the flag ON vs
OFF, interleaved passes with a per-config MIN (relay drift, CLAUDE.md).

Reports videos/s for both forms plus the mean emitted caption length
(the exit's firing depth).  Usage:

  python experiments/probe_trained_e2e.py [folder_id] [beam] [num_videos] [batch_videos]

defaults: R4S_JT, greedy, 384 synthetic videos (96-video val split), 32.
"""
from __future__ import annotations

import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

from echr_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

from echr_tpu.data.dataset import SyntheticDataset  # noqa: E402
from echr_tpu.data.loader import Loader  # noqa: E402
from echr_tpu.engine import checkpoint as ckpt  # noqa: E402
from echr_tpu.engine.evaluate import eval_split_batched  # noqa: E402


def main():
    folder = sys.argv[1] if len(sys.argv) > 1 else "R4S_JT"
    beam = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    num_videos = int(sys.argv[3]) if len(sys.argv) > 3 else 384
    batch_videos = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    payload = ckpt.load_checkpoint(f"save/{folder}/model-best.ckpt")
    cfg = payload["config"]
    state = payload["state"]

    # mirror bench.bench_e2e_eval's pipeline settings so the numbers are
    # comparable to the untrained headline e2e (one 256 bucket, deep
    # prefetch, whole-split example cache, bf16 feature transfer)
    cfg = cfg.replace_in(
        "data", synthetic=True, synthetic_num_videos=num_videos,
        shuffle=False, time_buckets=(256,),
        synthetic_cache_videos=num_videos, prefetch=3 * batch_videos)
    cfg = cfg.replace_in("runtime", transfer_dtype="bfloat16")
    ds = SyntheticDataset(cfg, num_videos=num_videos, seed=11)
    loader = Loader(ds, cfg, seed=0, process_index=0, process_count=1)
    n_val = loader.split_size("val")

    kw = {"language_eval": False, "get_eval_loss": False, "topN": 128,
          "timing_out": {}}
    if beam > 1:
        kw["beam_size"] = beam

    runs = {}
    for form in ("exit", "scan"):
        runs[form] = cfg.replace_in(
            "runtime", decode_early_exit_batched=(form == "exit"))

    best = {k: float("inf") for k in runs}
    lens = {}
    with tempfile.TemporaryDirectory() as td:
        for form, c in runs.items():  # compile pass
            eval_split_batched(state.tap_params, state.cg_params, loader, c,
                               f"{td}/warm.json", eval_kwargs=dict(kw),
                               flag_eval_what="tap_cg",
                               batch_videos=batch_videos)
        WINDOWS = 5
        for _ in range(WINDOWS):
            for form, c in runs.items():
                t0 = time.time()
                preds, _, _ = eval_split_batched(
                    state.tap_params, state.cg_params, loader, c,
                    f"{td}/bench.json", eval_kwargs=dict(kw),
                    flag_eval_what="tap_cg", batch_videos=batch_videos)
                w = time.time() - t0
                if w < best[form]:
                    best[form] = w
                    lens[form + "_tm"] = dict(kw["timing_out"])
                if form not in lens:
                    toks = [len(p["sentence"].split())
                            for v in preds.values() for p in v]
                    lens[form] = (float(np.mean(toks)), len(toks))
    for form in runs:
        mean_len, n_caps = lens[form]
        print(f"{folder} beam={beam} B={batch_videos} {form:4s}: "
              f"{n_val} videos in {best[form]:.2f}s -> "
              f"{n_val/best[form]:6.1f} videos/s "
              f"(mean caption len {mean_len:.1f} of L={cfg.decoder.CG_seq_length}, "
              f"{n_caps} captions) [min of {WINDOWS} interleaved windows]",
              flush=True)
        tm = lens.get(form + "_tm", {})
        brk = {k: round(v, 3) for k, v in tm.items() if isinstance(v, float)}
        print(f"  breakdown: {brk} (groups={tm.get('groups')})", flush=True)


if __name__ == "__main__":
    main()
