"""ctypes bindings for the native host kernels (see echr_native.cc).

The library auto-builds with g++ on first use and degrades gracefully: all
call sites keep a pure-numpy fallback (`available()` gates dispatch), so
the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger("echr_tpu.native")

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "echr_native.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def ensure_built() -> bool:
    src = os.path.join(_DIR, "echr_native.cc")
    try:
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(src):
            return True
    except OSError:  # source missing (packaged install) — try the .so as-is
        return os.path.exists(_SO)
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-o", _SO, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # pragma: no cover
        log.warning("native build failed, using numpy fallbacks: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("ECHR_TPU_NO_NATIVE"):
        return None
    if not ensure_built():
        return None
    # every failure mode here (corrupt/foreign-arch .so, missing symbol)
    # must degrade to the numpy fallbacks, per the module contract
    try:
        lib = ctypes.CDLL(_SO)
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.iou_grid.argtypes = [i64p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                 f32p, f32p, f32p]
        lib.iou_grid.restype = None
        lib.nms_temporal.argtypes = [i64p, f64p, ctypes.c_int, ctypes.c_double,
                                     ctypes.c_int, ctypes.c_double, i32p]
        lib.nms_temporal.restype = ctypes.c_int
        lib.nms_external.argtypes = [f64p, f64p, f64p, ctypes.c_int,
                                     ctypes.c_double, ctypes.c_int, i32p]
        lib.nms_external.restype = ctypes.c_int
        lib.render_captions.argtypes = [
            ctypes.c_char_p, i32p, ctypes.c_int, i32p, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")]
        lib.render_captions.restype = ctypes.c_int64
        # smoke-run a tiny grid: catches a loadable-but-broken binary (e.g.
        # built with -march=native on a different CPU and copied over)
        # before any production call site dispatches to it
        iou = np.empty((2, 2), np.float32)
        gts = np.empty((2, 2), np.float32)
        msk = np.empty((2, 2), np.float32)
        lib.iou_grid(np.ascontiguousarray([[0, 1]], np.int64), 1, 2, 2,
                     iou, gts, msk)
        if not np.isfinite(iou).all():
            raise ValueError("native iou_grid smoke run produced non-finite")
    except Exception as e:
        log.warning("native library unusable, using numpy fallbacks: %s", e)
        return None
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def iou_grid(featstamps, nfeats: int, K: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Native IoU grid: returns (iou [T,K] f32, gts_index [T,K] f32, mask [T,K] f32)."""
    lib = _load()
    assert lib is not None
    gt = np.ascontiguousarray(np.asarray(featstamps, dtype=np.int64).reshape(-1, 2))
    T = int(nfeats)
    iou = np.empty((T, K), np.float32)
    gts = np.empty((T, K), np.float32)
    mask = np.empty((T, K), np.float32)
    lib.iou_grid(gt, gt.shape[0], T, K, iou, gts, mask)
    return iou, gts, mask


def nms_temporal(props: np.ndarray, scores: np.ndarray, overlap: float,
                 topN: int, pad: float = 1.0) -> np.ndarray:
    lib = _load()
    assert lib is not None
    props = np.ascontiguousarray(props, dtype=np.int64)
    scores = np.ascontiguousarray(scores, dtype=np.float64)
    pick = np.empty((min(topN, len(scores)),), np.int32)
    n = lib.nms_temporal(props, scores, len(scores), float(overlap),
                         len(pick), float(pad), pick)
    return pick[:n]


def render_captions(words_packed: bytes, offsets: np.ndarray,
                    seq: np.ndarray) -> list:
    """ids -> sentences via the native joiner (GIL-free during the C call).

    words_packed/offsets come from utils.text's packed-vocab cache; seq is
    [N, L] int32 (id 0 ends a row; out-of-range ids render as nothing).
    Returns a list of N python strings."""
    lib = _load()
    assert lib is not None
    seq = np.ascontiguousarray(seq, dtype=np.int32)
    N, L = seq.shape
    V = len(offsets) - 1
    # worst case: every token is the longest word + a separator
    max_word = int(np.max(np.diff(offsets))) if V > 0 else 0
    cap = N * L * (max_word + 1) + 1
    out = ctypes.create_string_buffer(cap)
    out_off = np.empty((N + 1,), np.int64)
    w = lib.render_captions(words_packed, offsets, V, seq, N, L, out,
                            cap, out_off)
    assert w >= 0, "render_captions capacity underestimated"
    raw = out.raw
    return [raw[out_off[i]:out_off[i + 1]].decode("utf-8")
            for i in range(N)]


def nms_external(props: np.ndarray, prop_scores: np.ndarray, sent_scores: np.ndarray,
                 overlap: float, topN: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    props = np.ascontiguousarray(props, dtype=np.float64)
    prop_scores = np.ascontiguousarray(prop_scores, dtype=np.float64)
    sent_scores = np.ascontiguousarray(sent_scores, dtype=np.float64)
    pick = np.empty((min(topN, len(prop_scores)),), np.int32)
    n = lib.nms_external(props, prop_scores, sent_scores, len(prop_scores),
                         float(overlap), len(pick), pick)
    return pick[:n]
