"""Host-side proposal selection for evaluation.

Vectorized ports of the reference's O(T*K) Python scans (reference:
eval_utils.py:230-331): score-threshold top-N selection over the [T, K]
anchor grid, greedy temporal NMS, and the external-proposal NMS variant.
Ordering and tie-breaking match the reference exactly (row-major grid
order; argsort-based NMS processing).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np


def top_proposals(
    pred_proposals: np.ndarray,  # [T, K] scores
    tap_masks: np.ndarray,  # [T, K]
    cg_gts: Optional[np.ndarray],  # [T, K] int caption index, or None
    duration: float,
    featstamp_to_time: Callable,
    val_score_thres: float = 0.0,
    topN: int = 1000,
):
    """Vectorized `gettop1000` (reference: eval_utils.py:259-287).

    Returns (index_select_list, featstamp_list, cg_select_list,
    timestamp_list, confidence) in row-major (t, k) grid order.
    """
    nfeats, K = pred_proposals.shape
    masked = pred_proposals * tap_masks
    flat = np.sort(masked.reshape(-1))
    score_threshold = flat[-min(len(flat), topN)]
    thr = max(score_threshold, val_score_thres)

    n_idx, k_idx = np.nonzero(masked >= thr)
    keep = n_idx >= k_idx  # reference guard (:278)
    n_idx, k_idx = n_idx[keep], k_idx[keep]

    index_select = n_idx.astype(np.int64)
    featstamps = np.stack([n_idx - k_idx, n_idx + 1], axis=1).astype(np.int64)
    cg_select = cg_gts[n_idx, k_idx].astype(np.int64) if cg_gts is not None and len(cg_gts) else np.zeros((0,), np.int64)
    timestamps = [featstamp_to_time(int(s), int(e), nfeats, duration) for s, e in featstamps]
    confidence = masked[n_idx, k_idx].astype(np.float64)
    return (
        index_select.tolist(),
        featstamps.tolist(),
        cg_select.tolist() if cg_gts is not None and len(cg_gts) else [],
        timestamps,
        confidence.tolist(),
    )


def top_proposals_nms(
    pred_proposals: np.ndarray,
    tap_masks: np.ndarray,  # unused; kept for signature parity
    cg_gts: Optional[np.ndarray],
    duration: float,
    featstamp_to_time: Callable,
    overlap: float = 0.8,
    topN: int = 1000,
):
    """Greedy temporal NMS over all valid anchors
    (reference: gettop1000_nms, eval_utils.py:290-331)."""
    nfeats, K = pred_proposals.shape
    # all valid anchors: k < min(n, K), row-major order
    n_idx, k_idx = np.nonzero(
        np.arange(K)[None, :] < np.minimum(np.arange(nfeats), K)[:, None]
    )
    props = np.stack([n_idx - k_idx, n_idx + 1], axis=1).astype(np.int64)
    scores = pred_proposals[n_idx, k_idx].astype(np.float64)
    prop_gts = (
        cg_gts[n_idx, k_idx].astype(np.int64)
        if cg_gts is not None and len(cg_gts)
        else None
    )

    from echr_tpu import native

    if native.available():
        pick = native.nms_temporal(props, scores, overlap, topN).tolist()
    else:
        t1, t2 = props[:, 0].astype(np.float64), props[:, 1].astype(np.float64)
        area = t2 - t1 + 1.0
        ind = np.argsort(scores, kind="stable")
        pick = []
        while len(ind) > 0 and len(pick) < topN:
            i = ind[-1]
            pick.append(i)
            ind = ind[:-1]
            tt1 = np.maximum(t1[i], t1[ind])
            tt2 = np.minimum(t2[i], t2[ind])
            wh = np.maximum(0.0, tt2 - tt1 + 1.0)
            o = wh / (area[i] + area[ind] - wh)
            ind = ind[o <= overlap]

    nms_props = props[pick]
    nms_scores = scores[pick]
    sel_gts = prop_gts[pick] if prop_gts is not None else np.zeros((0,), np.int64)
    index_select = (nms_props[:, 1] - 1).astype(np.int64)
    timestamps = [featstamp_to_time(int(s), int(e), nfeats, duration) for s, e in nms_props]
    return (
        index_select.tolist(),
        nms_props.tolist(),
        sel_gts.tolist() if prop_gts is not None else [],
        timestamps,
        nms_scores.tolist(),
    )


def external_proposals_nms(
    props: Sequence[Sequence[float]],
    prop_scores: Sequence[float],
    sent_score: Sequence[float],
    nms_overlap: float = 0.999,
    topN: int = 1000,
):
    """NMS for external (SOTA) proposals choosing the best-sentence-score
    representative of each overlap cluster (reference: gettopN_nms,
    eval_utils.py:230-256).  Returns (props, scores, pick).  Dispatches to
    the native C++ kernel when available (selection-identical,
    tests/test_native.py), like top_proposals_nms."""
    props = np.asarray(props, dtype=np.float64)
    prop_scores = np.asarray(prop_scores, dtype=np.float64)
    sent_score = np.asarray(sent_score, dtype=np.float64)

    from echr_tpu import native

    if native.available():
        pick = [int(i) for i in native.nms_external(
            props, prop_scores, sent_score, nms_overlap, topN)]
        return props[pick].tolist(), prop_scores[pick].tolist(), pick
    return _external_proposals_nms_numpy(
        props, prop_scores, sent_score, nms_overlap, topN)


def _external_proposals_nms_numpy(props, prop_scores, sent_score,
                                  nms_overlap, topN):
    """Pure-numpy reference path for external_proposals_nms."""
    t1, t2 = props[:, 0], props[:, 1]
    ind = np.argsort(prop_scores, kind="stable")
    area = t2 - t1 + 1e-3
    pick: List[int] = []
    while len(ind) > 0 and len(pick) < topN:
        i = ind[-1]
        tt1 = np.maximum(t1[i], t1[ind])
        tt2 = np.minimum(t2[i], t2[ind])
        wh = np.maximum(0.0, tt2 - tt1 + 1e-3)
        o = wh / (area[i] + area[ind] - wh)
        same = ind[o >= nms_overlap]
        pick.append(int(same[np.argmax(sent_score[same])]))
        ind = ind[o <= nms_overlap]
    return props[pick].tolist(), prop_scores[pick].tolist(), pick


def rerank_top10(vid_info: List[dict]) -> List[dict]:
    """Keep the top-10 proposals by re_score (reference: reranking,
    eval_utils.py:334-345)."""
    rs = np.array([v["re_score"] for v in vid_info])
    rs_sorted = np.sort(rs)
    thr = rs_sorted[-min(len(rs_sorted), 10)]
    return [v for v in vid_info if v["re_score"] >= thr]
