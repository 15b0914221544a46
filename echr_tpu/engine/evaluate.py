"""Evaluation loop: proposal selection -> batched decode -> prediction JSON
-> dense-captioning metrics.

Capability parity with the reference eval loop (reference:
eval_utils.py:14-227): per val video run the TAP model, select proposals by
`flag_eval_what` ('cg' GT segments | 'cg_extend' sampled good proposals |
'tap' proposals only | 'tap_cg' model proposals via top-N or NMS |
'SOTA_TEP' external proposals), greedily decode a caption per proposal,
score re_score = 10*tap_prob + cg_score, optionally rerank to top-10, dump
the prediction JSON and invoke the ActivityNet dense-captioning evaluator.

TPU-native: decoding pads the proposal axis to a small set of buckets so
each (T-bucket, N-bucket) pair compiles once; all proposals of a video
decode in one jitted call (the reference decodes every proposal of every
video through a Python step loop).
"""
from __future__ import annotations

import gc as _gc
import json
import logging
import os
import queue as _pyq
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from echr_tpu.config import Config
from echr_tpu.data.labels import featstamp_to_time
from echr_tpu.data.loader import Loader
from echr_tpu.engine import proposals as P
from echr_tpu.engine.steps import decode_step, encode_step, val_loss_step
from echr_tpu.models.captioner import ProposalBatch
from echr_tpu.utils.text import decode_sequence

log = logging.getLogger("echr_tpu.eval")

PROP_BUCKETS = (64, 128, 256, 512, 1024)


def _pad_props(ind, soi, n_bucket, device=True):
    import jax.numpy as jnp

    n = len(ind)
    pi = np.zeros((n_bucket,), np.int32)
    ps = np.tile(np.array([[0, 1]], np.int32), (n_bucket, 1))
    pm = np.zeros((n_bucket,), np.float32)
    if n:  # an empty selection is all padding (np.asarray([]) is 1-D)
        pi[:n] = np.asarray(ind)[:n]
        ps[:n] = np.asarray(soi)[:n].reshape(n, 2)
        pm[:n] = 1.0
    if not device:  # batched callers stack on host, then ONE device_put
        return ProposalBatch(pi, ps, pm)
    return ProposalBatch(jnp.asarray(pi), jnp.asarray(ps), jnp.asarray(pm))


def select_proposals(flag_eval_what, batch, meta, pp, masks, cfg, *,
                     nms_threshold, val_score_thres, topN):
    """Per-video host-side proposal selection for every flag_eval_what
    mode — the ONE copy shared by eval_split and eval_split_batched
    (reference: eval_utils.py:60-118).  `pp`/`masks` are the [n_frames, K]
    score grid / anchor mask (only read by tap/tap_cg).  Returns
    (ind, soi, cg_sel, timestamps, tap_prob), or None for a SOTA_TEP
    video without external proposals (the reference's bad-video skip,
    eval_utils.py:77-80)."""
    if flag_eval_what == "cg":
        n_gt = len(meta.gt_featstamps)
        ind = [f[1] for f in meta.gt_featstamps]
        soi = [[f[0], f[1] + 1] for f in meta.gt_featstamps]
        return ind, soi, list(range(n_gt)), list(meta.timestamps), [1.0] * n_gt
    if flag_eval_what == "cg_extend":
        pm = np.asarray(batch.prop_mask) > 0
        ind = np.asarray(batch.ind_select)[pm].tolist()
        soi = np.asarray(batch.soi)[pm].tolist()
        cg_sel = list(meta.cg_select[: pm.sum()])
        timestamps = [
            featstamp_to_time(s, e, meta.n_frames, meta.duration) for s, e in soi
        ]
        return ind, soi, cg_sel, timestamps, [1.0] * len(ind)
    if flag_eval_what == "SOTA_TEP":
        # external proposals with score threshold / NMS / topN cap
        # (reference: eval_utils.py:76-104)
        if meta.SOTA_scores is None:
            return None
        _ind, _soi = meta.SOTA_ind, meta.SOTA_soi
        _cg, _ts, _tp = meta.SOTA_cg_select, meta.SOTA_timestamps, meta.SOTA_scores
        if nms_threshold > 0:
            _, _, pick = P.external_proposals_nms(
                _ts, _tp, _tp, nms_overlap=nms_threshold, topN=1000
            )
            pick = set(int(p) for p in pick)
        else:
            pick = set(range(len(_tp)))
        ind, soi, cg_sel, timestamps, tap_prob = [], [], [], [], []
        for i2, p_score in enumerate(_tp):
            if i2 not in pick:
                continue
            if p_score >= val_score_thres:
                ind.append(_ind[i2])
                soi.append(_soi[i2])
                cg_sel.append(_cg[i2])
                timestamps.append(_ts[i2])
                tap_prob.append(_tp[i2])
            if len(ind) >= topN:
                break
        return ind, soi, cg_sel, timestamps, tap_prob
    if flag_eval_what in ("tap", "tap_cg"):
        if nms_threshold:
            return P.top_proposals_nms(
                pp, masks, meta.gts_index, meta.duration, featstamp_to_time,
                overlap=nms_threshold, topN=topN,
            )
        cg_gts = meta.gts_index * (
            meta.iou_scores >= cfg.tap.iou_threshold_for_good_proposal)
        return P.top_proposals(
            pp, masks, cg_gts, meta.duration, featstamp_to_time,
            val_score_thres=val_score_thres, topN=topN,
        )
    raise ValueError(f"flag_eval_what {flag_eval_what!r} not supported")


def device_selection_row(flag_eval_what, idx_row, cnt, conf_row, nb_sel,
                         batch, meta, cfg, *, nms_threshold, val_score_thres,
                         topN, grid_fetch, want_cg_sel=False):
    """One video's selection from a device top-N fetch — the ONE home of
    the two-pass contract (steps.select_topk_batched; review r4): trust
    the device selection when count <= nb, and for 'tap' (whose host
    selection is UNBOUNDED — no proposal-bucket truncation) fall back to
    the full host path over the lazily fetched [*, K] score grid when the
    count overflows the slots (threshold-tie storm).  Shared by
    eval_split, eval_split_batched.stage_b, and any future caller.

    grid_fetch() -> the video's proposal-score grid (device or host array;
    rows past n_frames are sliced off here).  want_cg_sel additionally
    derives cg_sel from the meta label grids at the selected anchors, like
    P.top_proposals's cg_gts[n_idx, k_idx] (the batched loop computes its
    val losses on device and skips this).

    Returns ((ind, soi, cg_sel, timestamps, tap_prob), fell_back)."""
    from echr_tpu.engine.steps import unpack_topk_selection

    if flag_eval_what == "tap" and int(cnt) > nb_sel:
        pp = np.asarray(grid_fetch())[: meta.n_frames]
        masks = np.asarray(batch.tap_masks)[: meta.n_frames]
        return select_proposals(
            flag_eval_what, batch, meta, pp, masks, cfg,
            nms_threshold=nms_threshold, val_score_thres=val_score_thres,
            topN=topN,
        ), True
    ind, soi, ts, tp = unpack_topk_selection(
        idx_row, cnt, nb_sel, cfg.tap.K, meta.n_frames, meta.duration,
        featstamp_to_time, conf_row)
    cg_sel: List[int] = []
    if want_cg_sel:
        gi = getattr(meta, "gts_index", None)
        iou = getattr(meta, "iou_scores", None)
        if gi is not None and np.size(gi) and iou is not None:
            cg_gts = np.asarray(gi) * (
                np.asarray(iou) >= cfg.tap.iou_threshold_for_good_proposal)
            flat = np.asarray(idx_row)[: min(int(cnt), nb_sel)].astype(np.int64)
            cg_sel = cg_gts[flat // cfg.tap.K,
                            flat % cfg.tap.K].astype(np.int64).tolist()
    return (ind, soi, cg_sel, ts, tp), False


def _prop_bucket(n: int) -> int:
    for b in PROP_BUCKETS:
        if n <= b:
            return b
    return PROP_BUCKETS[-1]


def eval_split(
    tap_params,
    cg_params,
    loader: Loader,
    cfg: Config,
    json_path: str,
    eval_kwargs: Optional[Dict] = None,
    flag_eval_what: str = "tap_cg",
) -> Tuple[Dict, Dict, np.ndarray]:
    """Returns (predictions, score dict, mean val losses) like the reference."""
    import jax
    import jax.numpy as jnp

    # device-resident params before the loop (no-op on live device arrays;
    # host-numpy checkpoint trees would re-upload in full per dispatch —
    # see the eval_split_batched counterpart for the measured effect)
    tap_params = jax.tree.map(jnp.asarray, tap_params)
    cg_params = jax.tree.map(jnp.asarray, cg_params)

    kw = dict(eval_kwargs or {})
    split = kw.get("split", "val")
    lang_eval = kw.get("language_eval", cfg.eval.language_eval)
    val_score_thres = kw.get("val_score_thres", cfg.eval.val_score_thres)
    nms_threshold = kw.get("nms_threshold", cfg.eval.nms_threshold)
    is_reranking = kw.get("reranking", cfg.eval.reranking)
    topN = kw.get("topN", cfg.eval.topN)
    num_vids_eval = kw.get("num_vids_eval", cfg.eval.num_vids_eval) or loader.split_size(split)
    get_eval_loss = kw.get("get_eval_loss", True)
    val_all_metrics = kw.get("val_all_metrics", cfg.eval.val_all_metrics)
    # sample_max=1 greedy / 0 multinomial at `temperature`
    # (reference: OldModel.sample :141-167, eval.py:119-125)
    greedy = bool(int(kw.get("sample_max", cfg.eval.sample_max)))
    temperature = float(kw.get("temperature", cfg.eval.temperature))

    # selection-path observability (VERDICT r4 next-7, mirrors the batched
    # route): device_selections = videos selected from the [nb] device
    # top-N fetch; grid_fallbacks = tie-storm overflows that fell back to
    # the full [T, K] grid; grid_fetches = videos that fetched the grid
    # because device selection was off/ineligible.  At default config a
    # tap/tap_cg eval should report zero for both grid counters.
    tm = kw.get("timing_out")
    if tm is not None:
        tm.setdefault("device_selections", 0)
        tm.setdefault("grid_fallbacks", 0)
        tm.setdefault("grid_fetches", 0)

    # decode-only fast path: skip training-label synthesis in the batcher
    # (the reference always pays it, dataloader.py:320-365; see make_batch
    # labels=False).  cg/cg_extend need the label fields; so do val losses.
    # SOTA_TEP qualifies too: its long-window random crop draws from a
    # dedicated substream seeded at a fixed rng position (make_batch), so
    # crops are identical on both label paths; its cg_select (zeroed on the
    # fast path) is only consumed by val losses, which decode-only excludes.
    decode_only = (not get_eval_loss) and flag_eval_what in (
        "tap", "tap_cg", "SOTA_TEP")
    labels_before = loader.labels_for(split)
    loader.set_labels(not decode_only, split)
    loader.reset_iterator(split)
    vocab = loader.dataset.ix_to_word
    predictions: Dict[str, List[dict]] = {}
    loss_sum = np.zeros(5)
    it = 0
    bad_vid_num = 0

    progress_every = max(num_vids_eval // 100, 1)
    # pause cyclic GC for the pass (same rationale + numbers as
    # eval_split_batched: gen-2 rescans of the accumulated predictions
    # grow quadratically on full-split evals)
    gc_was_enabled = _gc.isenabled()
    if gc_was_enabled and bool(kw.get("gc_pause", True)):
        _gc.disable()
    from echr_tpu.utils.watchdog import HangWatchdog

    wd = HangWatchdog("eval", cfg.runtime.hang_warn_s).start()
    try:
        while True:
            wd.beat()
            batch, meta = loader.get_batch(split)
            if it % progress_every == 0 and it:
                # reference: eval_utils.py:41-42 progress print
                log.info("generating result.json: %.1f%%", 100.0 * it / num_vids_eval)
            if meta.proposal_num <= 0 or meta.n_frames <= 1:
                if meta.wrapped or it >= num_vids_eval:
                    break
                continue

            feats = jnp.asarray(batch.feats)
            tap_feats, pred_props = encode_step(tap_params, batch, cfg)

            # device-side top-N selection for the tap/tap_cg no-NMS modes:
            # fetch [nb] indices + count + confidences instead of the [T, K]
            # score grid (VERDICT r3 next-5; selection-identical to
            # P.top_proposals — see steps.select_topk_batched).  'tap' output
            # is unbounded on the host path, so a threshold-tie storm whose
            # count overflows the device slots falls back to the grid fetch.
            sel = None
            use_dev_sel = (
                bool(kw.get("device_select", cfg.eval.device_select))
                and flag_eval_what in ("tap", "tap_cg") and not nms_threshold)
            if use_dev_sel:
                from echr_tpu.engine.steps import select_topk_batched

                nb_sel = PROP_BUCKETS[-1]
                # ONE host round trip for all three arrays (device_get batches
                # the transfers; 3x sequential np.asarray pays 3x the relay RTT)
                idx_np, cnt_np, conf_np = jax.device_get(select_topk_batched(
                    pred_props[None], jnp.asarray([meta.n_frames], jnp.int32),
                    topN=topN, nb=nb_sel, val_score_thres=val_score_thres))
                sel, _fb = device_selection_row(
                    flag_eval_what, idx_np[0], cnt_np[0], conf_np[0], nb_sel,
                    batch, meta, cfg, nms_threshold=nms_threshold,
                    val_score_thres=val_score_thres, topN=topN,
                    grid_fetch=lambda: pred_props, want_cg_sel=True)
                if tm is not None:
                    tm["grid_fallbacks"] += int(_fb)
                    tm["device_selections"] += int(not _fb)
            if sel is None:
                need_grid = flag_eval_what in ("tap", "tap_cg")
                if tm is not None and need_grid:
                    tm["grid_fetches"] += 1
                pp = np.asarray(pred_props)[: meta.n_frames] if need_grid else None
                masks = np.asarray(batch.tap_masks)[: meta.n_frames] if need_grid else None
                sel = select_proposals(
                    flag_eval_what, batch, meta, pp, masks, cfg,
                    nms_threshold=nms_threshold, val_score_thres=val_score_thres,
                    topN=topN,
                )
            if sel is None:  # SOTA_TEP video without external proposals
                log.info("bad video for SOTA_TEP, vid:%s", meta.vid)
                bad_vid_num += 1
                if meta.wrapped or it >= num_vids_eval:
                    break
                continue
            ind, soi, cg_sel, timestamps, tap_prob = sel

            beam_size = int(kw.get("beam_size", cfg.eval.beam_size) or 1)
            if len(ind) == 0:
                sents: List[str] = []
            elif flag_eval_what == "tap":
                sents = ["" for _ in ind]
                cg_score = [0.0] * len(ind)
            else:
                nb = _prop_bucket(len(ind))
                props = _pad_props(ind[:nb], soi[:nb], nb)
                n_real = min(len(ind), nb)
                if beam_size > 1:
                    from echr_tpu.engine.steps import beam_decode_step

                    seq, logprob = beam_decode_step(
                        cg_params, cfg, tap_feats, feats, jnp.asarray(batch.lda),
                        jnp.asarray(batch.frame_mask), props, beam_size,
                        length_alpha=float(kw.get("beam_length_alpha",
                                                  cfg.eval.beam_length_alpha)),
                    )
                    seq_np = np.asarray(seq)[:n_real]
                    cg_score = np.asarray(logprob)[:n_real].astype(float).tolist()
                    sents = decode_sequence(vocab, seq_np)
                else:
                    r_dec = None
                    if not greedy:
                        import jax

                        r_dec = jax.random.fold_in(
                            jax.random.PRNGKey(int(kw.get("sample_seed", 0))), it)
                    seq, logps, active = decode_step(
                        cg_params, cfg, tap_feats, feats, jnp.asarray(batch.lda),
                        jnp.asarray(batch.frame_mask), props,
                        greedy=greedy, temperature=temperature, rng=r_dec,
                    )
                    seq_np = np.asarray(seq)[:n_real]
                    if not bool(np.asarray(active)[0]):
                        sents = []  # reference: sample() returned [] (all ended at t=1)
                    else:
                        cg_score = np.asarray(logps)[:n_real].sum(axis=1).astype(float).tolist()
                        sents = decode_sequence(vocab, seq_np)

            if get_eval_loss and split != "test" and len(cg_sel):
                m = val_loss_step(tap_params, cg_params, batch, cfg,
                                  phase=("tap" if flag_eval_what == "tap" else "tap_cg"))
                loss_sum[0] += float(m["tap_loss"])
                if flag_eval_what != "tap":
                    loss_sum[1] += float(m["cg_loss"])
                    loss_sum[2] += float(m["total_loss"])

            vid_info = []
            for i, sent in enumerate(sents):
                vid_info.append(
                    {
                        "sentence": sent,
                        "timestamp": list(timestamps[i]),
                        "sentence_confidence": (cg_score[i] if sents else 0.0),
                        "proposal_score": float(tap_prob[i]),
                        "re_score": 10 * float(tap_prob[i]) + float(cg_score[i]),
                        "num": [i, len(sents)],
                    }
                )
            if vid_info:
                if is_reranking:
                    vid_info = P.rerank_top10(vid_info)
                predictions[meta.vid] = vid_info

            it += 1
            if meta.wrapped or it >= num_vids_eval:
                break

    finally:
        wd.stop()
        if gc_was_enabled and not _gc.isenabled():
            _gc.enable()
            _gc.collect()
    loader.set_labels(labels_before, split)
    pred2json = {
        "results": predictions,
        "version": "VERSION 1.0",
        "external_data": {"used": True, "details": "C3D features"},
    }
    os.makedirs(os.path.dirname(json_path) or ".", exist_ok=True)
    with open(json_path, "w") as f:
        json.dump(pred2json, f)

    score: Dict[str, np.ndarray] = {}
    if lang_eval:
        from echr_tpu.metrics.eval_score import eval_score

        references = kw.get("references") or list(cfg.eval.references)
        sample_score = eval_score(
            json_path,
            only_recall=(flag_eval_what == "tap"),
            verbose=bool(val_all_metrics),
            topN=topN,
            references=references,
            gt_from_loader=loader,
            meteor_synonyms=cfg.eval.meteor_synonyms,
            meteor_paraphrases=cfg.eval.meteor_paraphrases,
        )
        for k, v in sample_score.items():
            score[k] = np.array(v)

    return predictions, score, loss_sum / max(it, 1)


def eval_split_batched(
    tap_params,
    cg_params,
    loader: Loader,
    cfg: Config,
    json_path: str,
    eval_kwargs: Optional[Dict] = None,
    flag_eval_what: str = "tap_cg",
    batch_videos: int = 8,
    mesh=None,
    multihost: bool = False,
) -> Tuple[Dict, Dict, np.ndarray]:
    """Throughput variant of eval_split: groups videos by time bucket and
    runs encode + decode for `batch_videos` videos per device program
    (identical per-video math — the decode is the vmapped captioner;
    greedy, multinomial via sample_max/temperature, or beam via
    beam_size > 1 with the vmapped beam search).

    Supports every flag_eval_what mode (cg, cg_extend, tap, tap_cg,
    SOTA_TEP); val-loss bookkeeping matches eval_split (vmapped
    val_loss_step), so checkpoint gating can use this fast path.

    mesh: a (data, model) jax.sharding.Mesh for the multi-chip eval sweep —
    the video batch axis is sharded over 'data' (groups padded to a dp
    multiple), params replicated, and XLA partitions the vmapped
    encode/decode across chips.  Identical outputs to single-chip.

    multihost: multi-HOST eval sweep (net-new, SURVEY §5.8) — each process
    evaluates its Loader shard of the split (build the Loader with
    shard_splits including it), then predictions and loss sums are
    all-gathered over DCN and merged, so every process returns the FULL
    split's predictions/scores (identical on all processes — safe for
    checkpoint gating).  Process 0 writes json_path; other processes write
    json_path + '.procN' so a shared filesystem sees no write race.
    """
    import jax
    import jax.numpy as jnp

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as PS

        _rep = NamedSharding(mesh, PS())
        _dp = NamedSharding(mesh, PS("data"))
        tap_params = jax.device_put(tap_params, _rep)
        cg_params = jax.device_put(cg_params, _rep)
    else:
        # params must live on device BEFORE the loop: host-numpy trees (a
        # freshly unpickled checkpoint, e.g. from cli.eval) are otherwise
        # re-uploaded in full on EVERY dispatch — measured 10x on the whole
        # pass through the relay (disk dress rehearsal: select_fetch 10.5
        # vs ~0.9 s/group adjacent in time; same mechanism as the
        # bench_trained_eval 4318 -> 10.4 captions/s regression).
        # jnp.asarray is a no-op on live device arrays.
        tap_params = jax.tree.map(jnp.asarray, tap_params)
        cg_params = jax.tree.map(jnp.asarray, cg_params)

    # resolves auto vs explicit-SPMD (runtime.spmd_mode="shard_map") step
    # routing in ONE place: under a dp mesh the shard_map variants run each
    # batched step as a per-device program over its local rows, so the
    # Pallas decode kernel (runtime.use_pallas) fires at local shapes —
    # the GSPMD partitioner would replicate the opaque pallas_call.
    # Identical outputs (rows independent; same per-row rng).
    from echr_tpu.engine.steps import eval_steps_for

    ES = eval_steps_for(cfg, mesh)

    kw = dict(eval_kwargs or {})
    split = kw.get("split", "val")
    lang_eval = kw.get("language_eval", cfg.eval.language_eval)
    val_score_thres = kw.get("val_score_thres", cfg.eval.val_score_thres)
    nms_threshold = kw.get("nms_threshold", cfg.eval.nms_threshold)
    is_reranking = kw.get("reranking", cfg.eval.reranking)
    topN = kw.get("topN", cfg.eval.topN)
    num_vids_eval = kw.get("num_vids_eval", cfg.eval.num_vids_eval) or loader.split_size(split)
    val_all_metrics = kw.get("val_all_metrics", cfg.eval.val_all_metrics)
    get_eval_loss = kw.get("get_eval_loss", True)
    greedy = bool(int(kw.get("sample_max", cfg.eval.sample_max)))
    temperature = float(kw.get("temperature", cfg.eval.temperature))
    beam_size = int(kw.get("beam_size", cfg.eval.beam_size) or 1)
    sample_base = jax.random.PRNGKey(int(kw.get("sample_seed", 0)))
    dispatch_count = [0]

    # decode-only fast path (see eval_split; SOTA_TEP included — its crop
    # substream is position-independent of the label-path draws)
    decode_only = (not get_eval_loss) and flag_eval_what in (
        "tap", "tap_cg", "SOTA_TEP")
    labels_before = loader.labels_for(split)
    loader.set_labels(not decode_only, split)
    feats_dtype_before = loader.feats_dtype_for(split)
    if cfg.runtime.transfer_dtype == "bfloat16" and decode_only:
        # cast feats in the prefetch workers instead of the consumer
        # thread.  decode_only guard: the val-loss path consumes the
        # stacked batch tree directly, and its feats must stay float32
        # (the transfer cast is an encode-input optimization only)
        loader.set_feats_dtype(np.dtype(jnp.bfloat16), split)
    loader.reset_iterator(split)
    vocab = loader.dataset.ix_to_word
    predictions: Dict[str, List[dict]] = {}
    loss_sum = np.zeros(5)
    it_vids = 0  # usable videos iterated — the reference's val-loss
    # denominator `iter` (eval_utils.py:227), matching eval_split's /max(it,1)

    groups: Dict[int, List] = {}
    done = False
    encoded = []  # stage-A output: encode/select dispatched, fetch pending
    pending = []  # stage-B output: decode dispatched, fetch pending
    inflight = max(int(kw.get("eval_inflight", cfg.eval.eval_inflight)), 1)
    device_select = bool(kw.get("device_select", cfg.eval.device_select))
    import time as _clk

    # wall-time breakdown (VERDICT r3 next-2): written to the log at the
    # end and into eval_kwargs["timing_out"] when the caller passes a dict
    tm = {"loader": 0.0, "host_prep": 0.0, "prep_stack": 0.0,
          "prep_put": 0.0, "prep_encode": 0.0, "select_fetch": 0.0,
          "host_select": 0.0, "loss_fetch": 0.0, "decode_dispatch": 0.0,
          "decode_fetch": 0.0, "assemble": 0.0, "groups": 0,
          "grid_fallbacks": 0}

    def shard(x):
        return jax.device_put(x, _dp) if mesh is not None else x

    def stage_a(items: List):
        """Encode + device top-N + val-loss DISPATCH for one group — no
        blocking device fetches here: they block in stage_b, by which time
        the NEXT group's device work is already queued behind this one.

        Runs on the PREP THREAD when async_prep (the default): the group
        feature stack + batched device_put (~0.4 s/pass of pure host work
        at bench dims) then overlaps the main thread's stage_b fetches,
        which block on the device with the GIL released.  Only `tm` keys
        owned by this stage are written here (each tm key has exactly one
        writer thread), and `items` is popped from `groups` by the caller,
        so no shared state races."""
        if not items:
            return None
        t0 = _clk.time()
        B = len(items)
        # pad every group to the STATIC batch_videos rows (and a data-axis
        # multiple under a mesh) so each time bucket compiles exactly ONE
        # program regardless of how full the tail groups are — partial
        # groups otherwise each trigger a fresh (bucket, B) compile, which
        # is minutes through the axon relay.  Padded rows replay the last
        # video and are dropped on collect; vmapped rows are cheap.
        pad_to = batch_videos
        if mesh is not None:
            dp = mesh.shape["data"]
            pad_to = ((batch_videos + dp - 1) // dp) * dp
        items_p = items + [items[-1]] * (pad_to - B)

        t_s = _clk.time()
        feats_np = np.stack([b.feats for b, _ in items_p])
        tm["prep_stack"] += _clk.time() - t_s
        t_s = _clk.time()
        if cfg.runtime.transfer_dtype == "bfloat16":
            # halve the dominant host->device payload; upcast on device so
            # downstream dtypes are unchanged (see RuntimeConfig.transfer_dtype).
            # The cast usually already happened in the prefetch workers
            # (loader.set_feats_dtype) — only in-flight overlap items or
            # non-prefetched paths still arrive float32 here.
            if feats_np.dtype != np.dtype(jnp.bfloat16):
                feats_np = feats_np.astype(jnp.bfloat16)
            feats_b = shard(jnp.asarray(feats_np).astype(jnp.float32))
        else:
            feats_b = shard(jnp.asarray(feats_np))
        tm["prep_put"] += _clk.time() - t_s
        t_s = _clk.time()
        tap_feats_b, pred_props_b = ES.encode(tap_params, feats_b, cfg)
        tm["prep_encode"] += _clk.time() - t_s
        a = {"items": items, "items_p": items_p, "B": B, "feats_b": feats_b,
             "tap_feats_b": tap_feats_b, "pred_props_b": pred_props_b}
        # tap/tap_cg without NMS: top-N selection runs ON DEVICE
        # (selection-identical to P.top_proposals, see select_topk_batched)
        # — fetches [B, nb] indices instead of the [B, T, K] score grid.
        # 'tap' output is unbounded on the host path (no proposal-bucket
        # truncation), so a video whose threshold-tie count overflows the
        # nb slots falls back to fetching ITS grid row in stage_b.
        a["device_sel"] = (device_select and not nms_threshold
                           and flag_eval_what in ("tap", "tap_cg"))
        if a["device_sel"]:
            # bucket CEILING, not bucket(topN): threshold ties can exceed
            # topN and the host path truncates at bucket(max_n) <= ceiling
            a["nb_sel"] = PROP_BUCKETS[-1]
            nfr = shard(jnp.asarray([m.n_frames for _, m in items_p], jnp.int32))
            a["sel_dev"] = ES.select_topk(
                pred_props_b, nfr, topN=topN, nb=a["nb_sel"],
                val_score_thres=val_score_thres,
            )
        if get_eval_loss and split != "test":
            # dispatched unconditionally (the compute is selection-
            # independent); stage_b adds it gated like eval_split's
            # `len(cg_sel)` check: a video whose selection is empty
            # contributes no loss but DOES count in the /iter denominator
            # (reference: eval_utils.py:227)
            # stack on host, then ONE batched device transfer for the whole
            # VideoBatch tree (per-leaf jnp.stack+shard pays the relay RTT
            # per field)
            stacked_np = jax.tree.map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]),
                *[b for b, _ in items_p],
            )
            stacked = (jax.device_put(stacked_np, _dp) if mesh is not None
                       else jax.device_put(stacked_np))
            a["loss_m"] = ES.val_loss(
                tap_params, cg_params, stacked, cfg,
                phase=("tap" if flag_eval_what == "tap" else "tap_cg"),
            )
        tm["host_prep"] += _clk.time() - t0
        tm["groups"] += 1
        return a

    def stage_b(a):
        """Blocking selection/loss fetches + host-side per-video selection
        + decode DISPATCH.  Returns a pending decode entry, or None when
        the mode decodes nothing ('tap')."""
        if a is None:
            return None
        items, items_p, B = a["items"], a["items_p"], a["B"]

        t0 = _clk.time()
        if a["device_sel"]:
            # ONE host round trip for all three arrays (device_get batches
            # the transfers; sequential np.asarray pays the relay RTT each)
            idx_np, cnt_np, conf_np = jax.device_get(a["sel_dev"])
            pp_b = None
        else:
            pp_b = np.asarray(a["pred_props_b"])
        tm["select_fetch"] += _clk.time() - t0

        t0 = _clk.time()
        sel = []
        max_n = 1
        for i, (batch, meta) in enumerate(items):
            if a["device_sel"]:
                # two-pass contract incl. the 'tap' tie-storm grid-row
                # fallback: shared with eval_split (device_selection_row)
                (ind, soi, _, ts, tp), fell_back = device_selection_row(
                    flag_eval_what, idx_np[i], cnt_np[i], conf_np[i],
                    a["nb_sel"], batch, meta, cfg,
                    nms_threshold=nms_threshold,
                    val_score_thres=val_score_thres, topN=topN,
                    grid_fetch=lambda i=i: a["pred_props_b"][i])
                tm["grid_fallbacks"] += int(fell_back)
                sel.append((ind, soi, ts, tp))
                max_n = max(max_n, len(ind))
                continue
            pp = pp_b[i][: meta.n_frames]
            masks = np.asarray(batch.tap_masks)[: meta.n_frames]
            # SOTA-less videos were filtered out at grouping time, so the
            # shared helper never returns None here
            ind, soi, _, ts, tp = select_proposals(
                flag_eval_what, batch, meta, pp, masks, cfg,
                nms_threshold=nms_threshold, val_score_thres=val_score_thres,
                topN=topN,
            )
            sel.append((ind, soi, ts, tp))
            max_n = max(max_n, len(ind))
        tm["host_select"] += _clk.time() - t0

        if "loss_m" in a and any(len(s[0]) for s in sel):
            t0 = _clk.time()
            m = jax.device_get(a["loss_m"])  # one batched transfer
            has_sel = np.array([len(s[0]) > 0 for s in sel], bool)
            loss_sum[0] += float(m["tap_loss"][:B][has_sel].sum())
            if flag_eval_what != "tap":
                loss_sum[1] += float(m["cg_loss"][:B][has_sel].sum())
                loss_sum[2] += float(m["total_loss"][:B][has_sel].sum())
            tm["loss_fetch"] += _clk.time() - t0

        if flag_eval_what == "tap":
            for (batch, meta), (ind, soi, ts, tp) in zip(items, sel):
                vid_info = [
                    {"sentence": "", "timestamp": list(ts[i]),
                     "sentence_confidence": 0.0, "proposal_score": float(tp[i]),
                     "re_score": 10 * float(tp[i]), "num": [i, len(ind)]}
                    for i in range(len(ind))
                ]
                if vid_info:
                    predictions[meta.vid] = vid_info
            return None

        t0 = _clk.time()
        nb = _prop_bucket(max_n)
        sel_p = sel + [sel[-1]] * (len(items_p) - B)
        # ONE batched host->device transfer for props+lda+frame_mask
        # (device_put on a pytree issues the copies together; per-array
        # jnp.asarray pays the relay RTT each)
        props_np = jax.tree.map(
            lambda *xs: np.stack(xs),
            *[_pad_props(ind[:nb], soi[:nb], nb, device=False)
              for (ind, soi, _, _) in sel_p],
        )
        lda_np = np.stack([b.lda for b, _ in items_p])
        fm_np = np.stack([b.frame_mask for b, _ in items_p])
        if mesh is not None:
            props, lda_b, fm_b = jax.device_put((props_np, lda_np, fm_np),
                                                _dp)
        else:
            props, lda_b, fm_b = jax.device_put((props_np, lda_np, fm_np))
        feats_b, tap_feats_b = a["feats_b"], a["tap_feats_b"]
        if beam_size > 1:
            seq_b, logprob_b = ES.beam(
                cg_params, cfg, tap_feats_b, feats_b, lda_b, fm_b, props,
                beam_size,
                length_alpha=float(kw.get("beam_length_alpha",
                                          cfg.eval.beam_length_alpha)),
            )
            tm["decode_dispatch"] += _clk.time() - t0
            return (items, sel, nb, seq_b, logprob_b, None)
        r_dec = None
        if not greedy:
            r_dec = jax.random.fold_in(sample_base, dispatch_count[0])
            dispatch_count[0] += 1
        seq_b, logps_b, active_b = ES.decode(
            cg_params, cfg, tap_feats_b, feats_b, lda_b, fm_b, props,
            greedy=greedy, temperature=temperature, rng=r_dec,
        )
        tm["decode_dispatch"] += _clk.time() - t0
        return (items, sel, nb, seq_b, logps_b, active_b)

    def _collect_entry(entry):
        """Blocking decode fetch + caption assembly for one group.  Runs on
        the ASSEMBLER THREAD (async_assemble, the default): the fetch wait
        releases the GIL and the Python assembly overlaps the main thread's
        device dispatches, so neither shows up in the pipeline's critical
        path.  predictions is written only from this thread (or only from
        the main thread when async_assemble=False) — never both."""
        t0 = _clk.time()
        items, sel, nb, seq_b, logps_b, active_b = entry
        is_beam = active_b is None  # beam entries carry [B, N] total logprobs
        if is_beam:
            seq_np, logps_np = jax.device_get((seq_b, logps_b))
            active_np = None
        else:  # one batched transfer for the whole entry (single relay RTT)
            seq_np, logps_np, active_np = jax.device_get(
                (seq_b, logps_b, active_b))
        tm["decode_fetch"] += _clk.time() - t0
        t0 = _clk.time()
        for i, ((batch, meta), (ind, soi, ts, tp)) in enumerate(zip(items, sel)):
            n_real = min(len(ind), nb)
            if n_real == 0 or (not is_beam and not bool(active_np[i][0])):
                continue
            sents = decode_sequence(vocab, seq_np[i][:n_real])
            cg_score = (logps_np[i][:n_real] if is_beam
                        else logps_np[i][:n_real].sum(axis=1))
            # bulk-convert once (per-item float()/list() boxing of numpy
            # scalars is ~4x slower across a 12k-caption pass)
            cg_l = cg_score.astype(float).tolist()
            tp_l = np.asarray(tp[:n_real], dtype=float).tolist()
            ts_l = np.asarray(ts[:n_real], dtype=float).tolist()
            n = len(sents)
            vid_info = [
                {
                    "sentence": s,
                    "timestamp": ts_l[j],
                    "sentence_confidence": cg_l[j],
                    "proposal_score": tp_l[j],
                    "re_score": 10 * tp_l[j] + cg_l[j],
                    "num": [j, n],
                }
                for j, s in enumerate(sents)
            ]
            if is_reranking:
                vid_info = P.rerank_top10(vid_info)
            predictions[meta.vid] = vid_info
        tm["assemble"] += _clk.time() - t0

    # --- assembler thread (VERDICT r3 next-2): decode fetches + caption
    # assembly off the main thread.  Bounded queue = the in-flight decode
    # cap (backpressure: collect() blocks when the assembler falls behind).
    asm_q: "_pyq.Queue" = _pyq.Queue(maxsize=inflight)
    asm_exc: List[BaseException] = []

    def _asm_run():
        while True:
            entry = asm_q.get()
            if entry is None:
                return
            if asm_exc:
                continue  # keep draining so collect() never deadlocks
            try:
                _collect_entry(entry)
            except BaseException as e:  # re-raised at join
                asm_exc.append(e)

    async_assemble = bool(kw.get("async_assemble", True))
    asm_thread = None
    if async_assemble:
        asm_thread = threading.Thread(
            target=_asm_run, name="eval-assembler", daemon=True)
        asm_thread.start()

    # --- prep thread: stage_a's host stacking + dispatch off the main
    # thread, overlapping stage_b's device-blocked fetches (round 4; the
    # bench-split breakdown showed ~0.4 s/pass of serial stage-A host work
    # under a ~0.5 s device wait).  Single worker keeps dispatch order.
    async_prep = bool(kw.get("async_prep", True))
    prep_pool = None
    if async_prep:
        import concurrent.futures as _fut

        prep_pool = _fut.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="eval-prep")

    def submit_a(items):
        if prep_pool is not None:
            return prep_pool.submit(stage_a, items)
        return stage_a(items)  # sync path: eager, exactly the old behavior

    def resolve_a(entry):
        return entry.result() if prep_pool is not None else entry

    def collect(entry):
        if entry is None:
            return
        if asm_thread is not None:
            asm_q.put(entry)
        else:
            _collect_entry(entry)

    def finish_assembly(reraise: bool = True):
        """Stop + join the assembler (idempotent).  reraise=False is the
        abort path: never mask the primary exception with the assembler's."""
        nonlocal asm_thread
        if asm_thread is not None:
            asm_q.put(None)
            asm_thread.join()
            asm_thread = None
            if asm_exc:
                if reraise:
                    raise asm_exc[0]
                log.warning("eval assembler raised during an aborted pass: %r",
                            asm_exc[0])

    def drain(a_keep: int, b_keep: int):
        """Advance the pipeline so at most a_keep stage-A and b_keep
        stage-B entries stay in flight.  Stage-A depth 1 means group k's
        blocking selection fetch (stage_b) happens only after group k+1's
        encode is already queued on the device (async_prep: ...or being
        prepared on the prep thread while this fetch blocks)."""
        while len(encoded) > a_keep:
            entry = stage_b(resolve_a(encoded.pop(0)))
            if entry is not None:
                pending.append(entry)
        while len(pending) > b_keep:
            collect(pending.pop(0))

    import jax

    # Pause cyclic GC for the pass: the predictions dict accumulates
    # millions of small dicts/strings on full-split evals and every gen-2
    # collection rescans them — measured 190s -> ~140s on the 4,917-video
    # fullscale sweep (docs/BENCH_NOTES.md).  Refcounting still frees all
    # the per-group numpy buffers; a collect runs at restore.
    gc_was_enabled = _gc.isenabled()
    if gc_was_enabled and bool(kw.get("gc_pause", True)):
        _gc.disable()
    # hang observability: a wedged relay dispatch/fetch inside stage_b /
    # collect otherwise stalls the pass silently (see utils/watchdog)
    from echr_tpu.utils.watchdog import HangWatchdog

    wd = HangWatchdog("eval", cfg.runtime.hang_warn_s).start()
    try:
        t_load = _clk.time()
        while not done:
            wd.beat()
            batch, meta = loader.get_batch(split)
            tm["loader"] += _clk.time() - t_load
            usable = meta.proposal_num > 0 and meta.n_frames > 1
            if flag_eval_what == "SOTA_TEP" and meta.SOTA_scores is None:
                usable = False  # reference: bad video for SOTA_TEP (eval_utils.py:77-80)
            if usable:
                it_vids += 1
            # bad videos do NOT count toward num_vids_eval, matching
            # eval_split and the reference (eval_utils.py:44 `continue`s
            # before iter+=1)
            done = meta.wrapped or it_vids >= num_vids_eval
            if usable:
                groups.setdefault(meta.t_bucket, []).append((batch, meta))
                if len(groups[meta.t_bucket]) >= batch_videos:
                    encoded.append(submit_a(groups.pop(meta.t_bucket)))
                    drain(1, inflight)
            t_load = _clk.time()
        for bucket in list(groups):
            encoded.append(submit_a(groups.pop(bucket)))
        drain(0, 0)
        finish_assembly()
    finally:
        # abort-safe teardown: a mid-pass exception must not leak the
        # split's bf16 transfer dtype into a later f32 fidelity eval, nor
        # leave the daemon assembler blocked on asm_q.get() pinning queued
        # decode buffers (review r4).  finish_assembly is idempotent — on
        # the success path it already ran (and reraised) above.
        if prep_pool is not None:
            # join the prep thread before restoring loader state (stage_a
            # is short; wait=True also surfaces nothing — drain already
            # re-raised any stage_a exception via Future.result).
            # cancel_futures: on an abort the tail flush may have queued
            # several stage_a's — don't run their multi-MB device_puts
            # (possibly against a wedged relay) just to tear down (review)
            prep_pool.shutdown(wait=True, cancel_futures=True)
        wd.stop()
        finish_assembly(reraise=False)
        loader.set_labels(labels_before, split)
        loader.set_feats_dtype(feats_dtype_before, split)
        if gc_was_enabled and not _gc.isenabled():
            _gc.enable()
            _gc.collect()
    if tm["groups"]:
        log.info(
            "eval pipeline breakdown (%d groups): loader %.2fs, host_prep "
            "%.2fs, select_fetch %.2fs, host_select %.2fs, loss_fetch %.2fs, "
            "decode_dispatch %.2fs, decode_fetch %.2fs, assemble %.2fs, "
            "grid_fallbacks %d",
            tm["groups"], tm["loader"], tm["host_prep"], tm["select_fetch"],
            tm["host_select"], tm["loss_fetch"], tm["decode_dispatch"],
            tm["decode_fetch"], tm["assemble"], tm["grid_fallbacks"])
    if isinstance(kw.get("timing_out"), dict):
        kw["timing_out"].update(tm)

    if multihost and jax.process_count() > 1:
        from echr_tpu.parallel.distributed import allgather_object, gather_predictions

        predictions = gather_predictions(predictions)
        parts = allgather_object((loss_sum.tolist(), it_vids))
        loss_sum = np.sum([np.asarray(p[0]) for p in parts], axis=0)
        it_vids = int(sum(p[1] for p in parts))
        if jax.process_index() != 0:
            json_path = f"{json_path}.proc{jax.process_index()}"

    pred2json = {
        "results": predictions,
        "version": "VERSION 1.0",
        "external_data": {"used": True, "details": "C3D features"},
    }
    os.makedirs(os.path.dirname(json_path) or ".", exist_ok=True)
    with open(json_path, "w") as f:
        json.dump(pred2json, f)

    score: Dict[str, np.ndarray] = {}
    if lang_eval:
        from echr_tpu.metrics.eval_score import eval_score

        references = kw.get("references") or list(cfg.eval.references)
        sample_score = eval_score(
            json_path, only_recall=(flag_eval_what == "tap"),
            verbose=bool(val_all_metrics), topN=topN, references=references,
            gt_from_loader=loader,
            meteor_synonyms=cfg.eval.meteor_synonyms,
            meteor_paraphrases=cfg.eval.meteor_paraphrases,
        )
        for k, v in sample_score.items():
            score[k] = np.array(v)
    return predictions, score, loss_sum / max(it_vids, 1)
