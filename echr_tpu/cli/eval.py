"""Standalone evaluation CLI (reference: eval.py:26-154).

Loads the best/last checkpoint of a run folder, overlays CLI flags onto
the checkpoint's saved config (reference: eval.py:32-35), rebuilds the
loader and runs eval_split with the requested flag_eval_what in
{tap, cg, tap_cg, cg_extend, SOTA_TEP} (reference: eval.py:87-88,102-103);
--SOTA_json overrides the external-proposal file (reference: eval.py:146).
"""
from __future__ import annotations

import argparse
import logging
import os
import sys
import time

import numpy as np

from echr_tpu.config import Config
from echr_tpu.data.dataset import build_dataset
from echr_tpu.data.loader import Loader
from echr_tpu.engine import checkpoint as ckpt
from echr_tpu.engine.evaluate import eval_split

log = logging.getLogger("echr_tpu.eval_cli")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("echr_tpu.eval")
    p.add_argument("--folder_id", type=str, required=True, help="run id under save/")
    p.add_argument("--checkpoint_path", type=str, default="save")
    p.add_argument("--model_path", type=str, default=None, help="explicit .ckpt path")
    p.add_argument("--which", type=str, default="best", choices=["best", "last"])
    p.add_argument("--flag_eval_what", type=str, default="tap_cg",
                   choices=["tap", "cg", "tap_cg", "cg_extend", "SOTA_TEP"])
    p.add_argument("--SOTA_json", type=str, default=None,
                   help="external proposal JSON override (reference: eval.py:146)")
    p.add_argument("--topN", type=int, default=1000)
    p.add_argument("--val_score_thres", type=float, default=0.0)
    p.add_argument("--nms_threshold", type=float, default=0.0)
    p.add_argument("--reranking", type=int, default=0)
    p.add_argument("--num_vids_eval", type=int, default=0)
    p.add_argument("--no_language_eval", action="store_true")
    p.add_argument("--val_all_metrics", type=int, default=1)
    p.add_argument("--beam_size", type=int, default=1)
    p.add_argument("--sample_max", type=int, default=1,
                   help="1=greedy argmax; 0=multinomial sampling "
                        "(reference: eval.py:119-122)")
    p.add_argument("--temperature", type=float, default=1.0,
                   help="sampling temperature when sample_max=0 "
                        "(reference: eval.py:123-125)")
    p.add_argument("--sample_seed", type=int, default=0,
                   help="RNG seed for multinomial sampling (sample_max=0)")
    p.add_argument("--wait_for_checkpoint", type=int, default=0,
                   help="poll until the checkpoint exists (reference: eval.py:53-55)")
    p.add_argument("--batch_videos", type=int, default=None,
                   help=">1 selects the batched throughput eval pipeline "
                        "(default 1; multihost runs default to 8 — the "
                        "sweep is batched-only, so an explicit 1 errors)")
    p.add_argument("--data_parallel", type=int, default=0,
                   help=">1 shards the batched eval's video axis over a "
                        "(data, model=1) mesh of that many chips")
    p.add_argument("--spmd_mode", type=str, default=None,
                   choices=["auto", "shard_map"],
                   help="override runtime.spmd_mode for --data_parallel: "
                        "'shard_map' runs each batched step as an explicit "
                        "per-device program (Pallas kernels fire at local "
                        "shapes); default keeps the checkpoint's setting")
    p.add_argument("--eval_inflight", type=int, default=None,
                   help="dispatched-but-uncollected device batches the "
                        "batched pipeline keeps in flight (default "
                        "cfg.eval.eval_inflight; raise on high-RTT links)")
    p.add_argument("--device_select", type=int, default=None,
                   help="0 forces host-side top-N proposal selection "
                        "(default cfg.eval.device_select=1: the tap/tap_cg "
                        "no-NMS paths select on device)")
    p.add_argument("--transfer_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="host->device feature wire dtype for the decode-only "
                        "paths (default: the checkpoint's "
                        "runtime.transfer_dtype — often float32 from "
                        "training; 'bfloat16' is the serving posture and "
                        "~2.6x smaller on the wire, bit-identical under "
                        "bf16 compute)")
    p.add_argument("--split", type=str, default="val", choices=["val", "test"])
    # reference eval.py flag-surface compatibility (accepted no-ops):
    # --dataset is informational (eval.py:105, always ActivityNet here),
    # --batch_size is the loader batch (eval.py:112, effectively always 1 in
    # the reference; our throughput knob is --batch_videos), --debug
    # (eval.py:129) and --old_loader (eval.py:142) are never read downstream
    p.add_argument("--dataset", type=str, default="ActivityNet")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--debug", nargs="?", const="1", default=None)
    p.add_argument("--old_loader", action="store_true")
    return p


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="[%(asctime)s] %(message)s")
    from echr_tpu.parallel.distributed import maybe_initialize_from_env
    from echr_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    # parse BEFORE joining the cluster: a --help/typo exit must happen
    # before jax.distributed.initialize, or this host would join (and then
    # abandon) the barrier and wedge every other host at its first
    # collective
    ns = build_parser().parse_args(argv)
    # multi-host eval sweep: same command on every host with the cluster
    # env set — each process evaluates its val shard, predictions are
    # all-gathered, every host reports the full split (docs/OPERATIONS.md)
    multihost = maybe_initialize_from_env()
    if multihost:
        import jax

        multihost = jax.process_count() > 1
    folder = os.path.join(ns.checkpoint_path, ns.folder_id)
    path = ns.model_path or os.path.join(folder, f"model-{ns.which}.ckpt")
    while not os.path.exists(path):
        if not ns.wait_for_checkpoint:
            raise FileNotFoundError(path)
        log.info("waiting for checkpoint %s ...", path)
        time.sleep(60)

    payload = ckpt.load_checkpoint(path)
    cfg: Config = payload.get("config")
    if cfg is None:
        raise FileNotFoundError(
            f"{path}.config.json is missing — the eval CLI rebuilds the "
            "model from the checkpoint's config sidecar; copy it alongside "
            "the .ckpt file")
    cfg = cfg.replace_in(
        "eval",
        topN=ns.topN,
        val_score_thres=ns.val_score_thres,
        nms_threshold=ns.nms_threshold,
        reranking=bool(ns.reranking),
        num_vids_eval=ns.num_vids_eval,
        language_eval=not ns.no_language_eval,
        val_all_metrics=bool(ns.val_all_metrics),
        beam_size=ns.beam_size,
        sample_max=ns.sample_max,
        temperature=ns.temperature,
    )
    if ns.SOTA_json:
        cfg = cfg.replace_in("data", SOTA_json=ns.SOTA_json)
    if ns.spmd_mode:
        cfg = cfg.replace_in("runtime", spmd_mode=ns.spmd_mode)
    if ns.transfer_dtype:
        cfg = cfg.replace_in("runtime", transfer_dtype=ns.transfer_dtype)
    dataset = build_dataset(cfg)
    if multihost:
        if ns.batch_videos is None:
            ns.batch_videos = 8  # the multihost sweep is the batched path
            log.info("multihost eval: defaulting --batch_videos 8")
        elif ns.batch_videos <= 1:
            # don't silently reroute an explicit request onto a different
            # code path — the per-video pipeline has no multihost gather
            raise ValueError(
                "multihost eval runs the batched pipeline only; "
                "--batch_videos must be > 1 (or omitted for the default 8)")
    elif ns.batch_videos is None:
        ns.batch_videos = 1
    # batched eval drains batch_videos items per group in one burst — keep
    # the prefetch queue deep enough that the producer runs ahead during
    # device waits instead of stalling the consumer at every group boundary
    if ns.batch_videos > 1 and cfg.data.prefetch < 2 * ns.batch_videos:
        cfg = cfg.replace_in("data", prefetch=2 * ns.batch_videos)
    if multihost:
        # per-host shard of the eval split; eval_split_batched(multihost=
        # True) all-gathers predictions so every host scores the full split
        loader = Loader(dataset, cfg, seed=0, shard_splits=(ns.split,))
    else:
        loader = Loader(dataset, cfg, seed=0)
    state = payload["state"]

    stamp = f"{ns.flag_eval_what}_top{ns.topN}_thr{ns.val_score_thres}_nms{ns.nms_threshold}"
    # decode-mode dimensions, so a beam/sampling run doesn't overwrite the
    # greedy run's predictions for the same proposal settings
    if ns.beam_size > 1:
        stamp += f"_beam{ns.beam_size}"
    if not ns.sample_max:
        stamp += f"_sampleT{ns.temperature}_s{ns.sample_seed}"
    json_path = os.path.join(folder, f"eval_{stamp}.json")
    if ns.batch_videos > 1:
        from echr_tpu.engine.evaluate import eval_split_batched

        mesh = None
        if ns.data_parallel > 1:
            import jax

            from echr_tpu.parallel.mesh import build_mesh

            # host-LOCAL chips only: under a multihost cluster each process
            # evaluates its own Loader shard, so per-host group counts
            # differ and a global mesh cannot work (and jax.device_put
            # cannot target non-addressable devices); slicing the device
            # list also stops build_mesh's fallback from silently spanning
            # every chip when N < the local count
            local = jax.local_devices()
            if ns.data_parallel > len(local):
                raise ValueError(
                    f"--data_parallel {ns.data_parallel} exceeds the "
                    f"{len(local)} local devices")
            mesh = build_mesh(shape=(ns.data_parallel, 1),
                              devices=local[: ns.data_parallel])
        runner = lambda *a, **k: eval_split_batched(  # noqa: E731
            *a, batch_videos=ns.batch_videos, mesh=mesh,
            multihost=multihost, **k)
    else:
        runner = eval_split
    tm: dict = {}
    t0 = time.time()
    preds, scores, val_loss = runner(
        state.tap_params, state.cg_params, loader, cfg, json_path,
        eval_kwargs={
            "split": ns.split,
            "topN": ns.topN,
            "num_vids_eval": ns.num_vids_eval,
            "val_all_metrics": bool(ns.val_all_metrics),
            "language_eval": not ns.no_language_eval,
            "nms_threshold": ns.nms_threshold,
            "val_score_thres": ns.val_score_thres,
            "reranking": bool(ns.reranking),
            "beam_size": ns.beam_size,
            "sample_seed": ns.sample_seed,
            # reference standalone eval passes crits=None => no val losses
            # (eval.py:87-88); also engages the decode-only batcher fast path
            "get_eval_loss": False,
            "timing_out": tm,
            **({"eval_inflight": ns.eval_inflight}
               if ns.eval_inflight is not None else {}),
            **({"device_select": bool(ns.device_select)}
               if ns.device_select is not None else {}),
        },
        flag_eval_what=ns.flag_eval_what,
    )
    eval_wall = time.time() - t0
    avg = {k: float(np.asarray(v, dtype=float).mean()) for k, v in scores.items()}
    log.info("predictions: %d videos -> %s", len(preds), json_path)
    # eval-only wall (excludes process startup / backend init / checkpoint
    # load — the dress-rehearsal and ops-facing throughput number), plus
    # the selection counters so silent grid fallbacks are visible
    log.info(
        "eval wall %.2fs (%.2f videos/s)%s", eval_wall,
        len(preds) / max(eval_wall, 1e-9),
        "".join(f", {k} {tm[k]}" for k in
                ("device_selections", "grid_fallbacks", "grid_fetches")
                if k in tm))
    log.info("avg scores: %s", {k: round(v, 4) for k, v in avg.items()})


if __name__ == "__main__":
    main(sys.argv[1:])
