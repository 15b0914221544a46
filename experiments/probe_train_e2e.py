"""E2E train-loop rate vs the device-resident train_step (round 4).

bench_train times train_step on device-resident batches (229 videos/s at
B=32 flagship dims).  The REAL train() loop adds, per update: B loader
pulls (prefetch-hidden), B host bf16 casts, bucket stacking, the ~8 MB
H2D batch upload through the relay at dispatch time, and the metrics
device->host fetch.  The reference never separates these either — its
only perf log is the e2e time/batch line (reference: train.py:343-349).

This probe runs the real train() (synthetic data, eval/checkpoint
disabled) at bench dims and prints the steady-state videos/s plus the
timing_out section breakdown, so the gap to bench_train's device rate is
attributable line by line.

Usage: python experiments/probe_train_e2e.py [--iters 24] [--batch 32]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SEQ_LEN, T_BUCKET, VOCAB, log  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=24, help="update steps")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--skip", type=int, default=4,
                    help="warmup updates excluded from the steady-state rate")
    ap.add_argument("--sync", action="store_true",
                    help="force the synchronous loop (train_pipeline=False) "
                         "for an A/B against the pipelined default")
    ap.add_argument("--inflight", type=int, default=None,
                    help="override runtime.train_inflight (dispatch depth)")
    ap.add_argument("--transfer", choices=("float32", "bfloat16"),
                    default="bfloat16",
                    help="runtime.transfer_dtype for the H2D batch upload "
                         "(bfloat16 compresses feats 2x + binary grids 4x "
                         "in _compress_batch; exact under bf16 compute). "
                         "Default matches bench_e2e_train's production "
                         "posture so a default probe run is comparable to "
                         "the bench JSON line; pass float32 for the wire-"
                         "compression A/B")
    args = ap.parse_args()

    from echr_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from bench import e2e_train_cfg  # shared cfg — keeps A/Bs comparable
    from echr_tpu.engine.train import train

    cfg = e2e_train_cfg(args.batch, run_id="probe_train_e2e")
    if args.sync:
        cfg = cfg.replace_in("runtime", train_pipeline=False)
    if args.inflight is not None:
        cfg = cfg.replace_in("runtime", train_inflight=args.inflight)
    cfg = cfg.replace_in("runtime", transfer_dtype=args.transfer)
    cfg = cfg.validate()

    tm: dict = {}
    train(cfg, max_iterations=args.iters, timing_out=tm)

    iters = tm["iters"]
    if len(iters) < args.skip + 2:
        log(f"too few updates recorded ({len(iters)}) for a steady-state rate")
        return
    skip = args.skip
    t0, t1 = iters[skip][1], iters[-1][1]
    n_updates = iters[-1][0] - iters[skip][0]
    vps = n_updates * args.batch / (t1 - t0)
    per_update = {
        k: round(tm.get(k, 0.0) / len(iters) * 1e3, 1)
        for k in ("loader", "compress", "collate", "put", "step", "fetch",
                  "boundary")
    }
    out = {
        "e2e_train_videos_per_s": round(vps, 1),
        "updates_timed": n_updates,
        "batch": args.batch,
        "ms_per_update_incl_warmup": per_update,
        "steady_ms_per_update": round((t1 - t0) / n_updates * 1e3, 1),
    }
    log(f"e2e train: {vps:.1f} videos/s over {n_updates} steady updates "
        f"(B={args.batch}); section ms/update (incl. warmup): {per_update}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
