"""Host-side label synthesis for temporal action proposals.

The reference builds a dense [T, K] IoU matrix between every anchor
``(t-k-1, t]`` and every ground-truth event with an O(T*K*n_gt) Python
triple loop (reference: dataloader.py:320-365, iou at :266-281).  Here the
whole grid is one numpy broadcast; a native C++ fast path is used when
built (see echr_tpu/data/_native).  Semantics are bit-compatible with the
reference, including:

  * the +-0.01 nudge applied to GT boundaries (dataloader.py:271-272),
  * the ``>=`` running-max tie-break, i.e. the *last* GT achieving the max
    IoU wins, and an all-zero row selects the last GT (dataloader.py:276-278),
  * Python-2 ``round()`` (half away from zero) in timestamp conversion
    (dataloader.py:292-296).
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import numpy as np

__all__ = [
    "timestamp_to_featstamp",
    "featstamp_to_time",
    "iou_grid",
    "anchor_mask",
    "good_proposal_count",
    "flatten_good_proposals",
    "sample_proposals",
    "single_iou",
]


def _py2_round(x: float) -> int:
    """Python-2 round: half away from zero (Py3 rounds half to even)."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def timestamp_to_featstamp(
    timestamp: Sequence[float], nfeats: int, duration: float
) -> Tuple[int, int]:
    """Seconds -> feature indices (reference: dataloader.py:292-296)."""
    start, end = timestamp
    start_f = max(min(_py2_round(start / duration * nfeats), nfeats - 2), 0)
    end_f = min(max(_py2_round(end / duration * nfeats), start_f + 1), nfeats - 1)
    return start_f, end_f


def featstamp_to_time(
    start_f: float, end_f: float, nfeats: int, duration: float
) -> Tuple[float, float]:
    """Feature indices -> seconds (reference: dataloader.py:298-302)."""
    time_per_feat = duration / nfeats
    start = min(max(0, start_f * time_per_feat), duration - time_per_feat)
    end = max(end_f * time_per_feat, start + time_per_feat)
    return start, end


def featstamps_to_times(soi, nfeats: int, duration: float):
    """Vectorized featstamp_to_time over an [n, 2] window array — identical
    per-row math (the eval pipelines convert up to topN proposals per video;
    the scalar loop was a measurable host cost at batch_videos=32)."""
    import numpy as np

    soi = np.asarray(soi, np.float64)
    time_per_feat = duration / nfeats
    start = np.clip(soi[:, 0] * time_per_feat, 0, duration - time_per_feat)
    end = np.maximum(soi[:, 1] * time_per_feat, start + time_per_feat)
    return np.stack([start, end], axis=1)


def single_iou(
    interval: Sequence[float], featstamps: Sequence[Sequence[float]]
) -> Tuple[float, int]:
    """IoU of one interval vs a GT list, with the reference's running-max
    ``>=`` tie-break (reference: dataloader.py:266-281).  Returns (iou, gt_index).
    """
    start_i, end_i = interval[0], interval[1]
    best, gt_index = 0.0, -1
    for i, (start, end) in enumerate(featstamps):
        start = start - 0.01
        end = end + 0.01
        intersection = max(0, min(end, end_i) - max(start, start_i))
        union = min(max(end, end_i) - min(start, start_i), end - start + end_i - start_i)
        overlap = float(intersection) / (union + 1e-8)
        if overlap >= best:
            best = overlap
            gt_index = i
    return best, gt_index


def anchor_mask(nfeats: int, K: int) -> np.ndarray:
    """[T, K] validity mask: anchor (t-k-1, t] is valid iff t >= k+1
    (reference: dataloader.py:347-348)."""
    t = np.arange(nfeats)[:, None]
    k = np.arange(K)[None, :]
    return (k < np.minimum(K, t)).astype(np.float32)


def iou_grid(
    featstamps: Sequence[Sequence[int]], nfeats: int, K: int, with_s_grid: bool = False
):
    """Dense anchor/GT IoU grid, vectorized.

    Replaces the reference's triple loop (dataloader.py:350-357).  Returns
    (iou_scores [T,K] f32, gts_index [T,K] f32, tap_masks [T,K] f32) and,
    when ``with_s_grid``, additionally (S_iou_scores [T,T], S_tap_masks [T,T])
    — the start/end-indexed variant kept for parity (dataloader.py:341-345).
    """
    T = int(nfeats)
    mask = anchor_mask(T, K)
    G = len(featstamps)
    if G == 0:
        z = np.zeros((T, K), dtype=np.float32)
        out = (z, z.copy(), mask)
        if with_s_grid:
            return out + (np.zeros((T, T), np.float32), _s_mask(T, K))
        return out

    from echr_tpu import native

    if native.available():
        iou_scores, gts_f, mask = native.iou_grid(featstamps, T, K)
        if not with_s_grid:
            return iou_scores, gts_f, mask
        tt, kk = np.nonzero(mask.astype(bool))
        S_iou = np.zeros((T, T), dtype=np.float32)
        S_mask = np.zeros((T, T), dtype=np.float32)
        S_iou[(tt - kk - 1).astype(int), tt] = iou_scores[tt, kk]
        S_mask[(tt - kk - 1).astype(int), tt] = 1.0
        return iou_scores, gts_f, mask, S_iou, S_mask

    gt = np.asarray(featstamps, dtype=np.float64)  # [G, 2]
    gs = gt[:, 0] - 0.01  # reference nudges, dataloader.py:271-272
    ge = gt[:, 1] + 0.01

    t = np.arange(T, dtype=np.float64)[:, None, None]  # anchor end
    k = np.arange(K, dtype=np.float64)[None, :, None]
    a_start = t - k - 1.0
    inter = np.minimum(ge, t) - np.maximum(gs, a_start)
    np.clip(inter, 0.0, None, out=inter)
    union = np.minimum(
        np.maximum(ge, t) - np.minimum(gs, a_start), (ge - gs) + (k + 1.0)
    )
    iou = inter / (union + 1e-8)  # [T, K, G]

    # Last-argmax tie-break == the reference's ``>=`` running max.
    best = iou.max(axis=2)
    gts_index = (G - 1) - np.argmax(iou[:, :, ::-1], axis=2)

    valid = mask.astype(bool)
    iou_scores = np.where(valid, best, 0.0).astype(np.float32)
    gts_f = np.where(valid, gts_index.astype(np.float64), 0.0).astype(np.float32)
    if not with_s_grid:
        return iou_scores, gts_f, mask

    # S grids: S[t-k-1, t] = iou_scores[t, k] (reference: dataloader.py:356-357)
    tt, kk = np.nonzero(valid)
    S_iou = np.zeros((T, T), dtype=np.float32)
    S_mask = np.zeros((T, T), dtype=np.float32)
    S_iou[(tt - kk - 1).astype(int), tt] = iou_scores[tt, kk]
    S_mask[(tt - kk - 1).astype(int), tt] = 1.0
    return iou_scores, gts_f, mask, S_iou, S_mask


def _s_mask(T: int, K: int) -> np.ndarray:
    S_mask = np.zeros((T, T), dtype=np.float32)
    tt, kk = np.nonzero(anchor_mask(T, K))
    S_mask[(tt - kk - 1).astype(int), tt] = 1.0
    return S_mask


def flatten_good_proposals(
    tap_gts_for_good_proposal: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten all 'good' anchors into (end-index, caption-index, [start, end))
    triples in row-major (t, then k) order (reference: dataloader.py:615-639).

    ``tap_gts_for_good_proposal`` is the [T, K] int grid whose entry is the
    matched caption index for good anchors and -1 elsewhere
    (reference: dataloader.py:124).
    """
    grid = np.asarray(tap_gts_for_good_proposal)
    tt, kk = np.nonzero(grid != -1)
    tap_list = tt.astype(np.int64)
    lm_list = grid[tt, kk].astype(np.int64)
    soi_list = np.stack([tt - kk, tt + 1], axis=1).astype(np.int64)
    return tap_list, lm_list, soi_list


def sample_proposals(
    proposal_num: int, prop_sample_num: int, rng: np.random.RandomState
) -> np.ndarray:
    """Uniformly sample proposal rows (reference: dataloader.py:626-629)."""
    ids = np.arange(proposal_num, dtype=np.int64)
    rng.shuffle(ids)
    return ids[: min(proposal_num, prop_sample_num)]


def good_proposal_count(
    featstamps: Sequence[Sequence[int]], nfeats: int, K: int, thr: float
) -> int:
    """Exact count of valid anchors whose max-GT IoU >= thr, WITHOUT the
    full [T, K, G] grid — the labels-off eval fast path's bad-video check
    (reference semantics: dataloader.py:107-124 via iou_grid; equality vs
    the grid is pinned in tests/test_labels.py).

    An anchor of length la can reach IoU >= thr with a GT of length lg only
    when thr*lg <= la <= lg/thr and its end lies within lg*(1-thr^2)/thr of
    the GT (for thr > ~0.62 the union is necessarily the span, bounding the
    non-overlap by (1-thr)*span <= (1-thr)(la+lg)).  Each GT therefore
    yields a small candidate sub-grid; exact IoUs are computed there and
    the per-GT hit sets unioned.  Falls back to the full grid for small
    thresholds where the windows stop being small."""
    T, G = int(nfeats), len(featstamps)
    if G == 0:
        return 0
    if thr <= 0.65:  # union=span argument needs thr^2+thr>1; windows big anyway
        iou, _, _ = iou_grid(featstamps, T, K)
        return int((iou >= thr).sum())
    hits = []
    for s, e in featstamps:
        gs, ge = s - 0.01, e + 0.01  # reference nudges (dataloader.py:271-272)
        lg = ge - gs
        k_lo = max(0, int(thr * lg) - 4)
        k_hi = min(K, int(lg / thr) + 5)
        m = lg * (1.0 - thr * thr) / thr
        t_lo = max(1, int(gs) - 4)
        t_hi = min(T, int(ge + m) + 5)
        if k_lo >= k_hi or t_lo >= t_hi:
            continue
        t = np.arange(t_lo, t_hi, dtype=np.float64)[:, None]
        k = np.arange(k_lo, k_hi, dtype=np.float64)[None, :]
        a_start = t - k - 1.0
        inter = np.clip(np.minimum(ge, t) - np.maximum(gs, a_start), 0.0, None)
        union = np.minimum(np.maximum(ge, t) - np.minimum(gs, a_start), lg + k + 1.0)
        iou = (inter / (union + 1e-8)).astype(np.float32)  # grid casts f32 pre-compare
        valid = k < np.minimum(K, t)
        tt, kk = np.nonzero((iou >= thr) & valid)
        if len(tt):
            hits.append((tt + t_lo) * K + (kk + k_lo))
    if not hits:
        return 0
    return int(np.unique(np.concatenate(hits)).size)


def event_distance(featstamp1, featstamp2) -> float:
    """Symmetric overlap ratio between two events
    (reference: dataloader.py:283-289)."""
    s1, e1 = featstamp1
    s2, e2 = featstamp2
    intersection = max(0, min(e1, e2) - max(s1, s2))
    return float(intersection) / (e1 - s1) + float(intersection) / (e2 - s2)


def event_pair_indices(soi_select_list) -> np.ndarray:
    """[N, N, 10] event-pair decomposition index templates.

    Vectorized port of the reference's (dead but documented) pairwise
    intersection / left-difference / right-difference window templates
    (reference: get_segment_indics, dataloader.py:575-610): for each pair
    (host i, customer j) the 10 columns are the [start, end] bounds of
    A∩B, A-B(left), A-B(right), B-A(left), B-A(right), each zeroed where
    the corresponding segment is empty.
    """
    soi = np.asarray([(s, e - 1) for s, e in soi_select_list], dtype=np.int64)
    s1, e1 = soi[:, None, 0:1], soi[:, None, 1:2]  # [N, 1, 1]
    s2, e2 = soi[None, :, 0:1], soi[None, :, 1:2]  # [1, N, 1]
    templates = np.concatenate(
        [
            np.maximum(s1, s2), np.minimum(e1, e2),
            s1 + 0 * s2, np.minimum(e1, s2),
            np.maximum(e2, s1), e1 + 0 * e2,
            s2 + 0 * s1, np.minimum(e2, s1),
            np.maximum(e1, s2), e2 + 0 * e1,
        ],
        axis=2,
    )  # [N, N, 10]
    m1 = np.minimum(e1, e2) - np.maximum(s1, s2) > 0
    m21 = np.minimum(e1, s2) - s1 > 0
    m22 = e1 - np.maximum(e2, s1) > 0
    m31 = np.minimum(e2, s1) - s2 > 0
    m32 = e2 - np.maximum(e1, s2) > 0
    masks = np.concatenate([m1, m1, m21, m21, m22, m22, m31, m31, m32, m32], axis=2)
    return templates * masks
