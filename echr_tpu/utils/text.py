"""Token-sequence utilities (reference: misc/utils.py:24-38)."""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# vocab-dict -> rendering tables, cached by identity (the vocab is loaded
# once per run; rendering ~370k tokens/pass through per-token dict lookups
# was a measurable slice of the e2e eval pipeline).  Two forms per vocab:
# an object array for the numpy path, and a (packed utf-8 bytes, [V+1]
# offsets) pair for the native GIL-free joiner.  Bounded: a long-lived
# process that loads many checkpoints/datasets must not pin every vocab
# forever (review r4) — oldest entry evicted past the cap; the
# `hit[0] is ix_to_word` identity check makes id() reuse after an
# eviction harmless.
_TABLE_CACHE: Dict[int, Tuple[Dict[str, str], np.ndarray, bytes, np.ndarray]] = {}
_TABLE_CACHE_MAX = 8


def _tables(ix_to_word: Dict[str, str]):
    key = id(ix_to_word)
    hit = _TABLE_CACHE.get(key)
    if hit is not None and hit[0] is ix_to_word:
        return hit
    size = max((int(k) for k in ix_to_word), default=0) + 1
    table = np.empty(size, dtype=object)
    table[:] = ""
    for k, w in ix_to_word.items():
        table[int(k)] = w
    packed = bytearray()
    offsets = np.zeros((size + 1,), np.int32)
    for i in range(size):
        packed.extend(table[i].encode("utf-8"))
        offsets[i + 1] = len(packed)
    entry = (ix_to_word, table, bytes(packed), offsets)
    # the entry keeps the dict reference alive so the id() key cannot be
    # reused WHILE CACHED; eviction drops the pin (identity check above
    # covers the reuse case)
    while len(_TABLE_CACHE) >= _TABLE_CACHE_MAX:
        _TABLE_CACHE.pop(next(iter(_TABLE_CACHE)))
    _TABLE_CACHE[key] = entry
    return entry


def decode_sequence(ix_to_word: Dict[str, str], seq: np.ndarray) -> List[str]:
    """ids -> sentences; 0 is the END token and stops the row."""
    seq = np.asarray(seq)
    if seq.ndim == 1:
        seq = seq[None]
    _, table, packed, offsets = _tables(ix_to_word)

    from echr_tpu import native

    if native.available():
        # C++ joiner: releases the GIL, so caption assembly overlaps the
        # prefetch workers instead of contending with them
        return native.render_captions(packed, offsets, seq)

    # numpy fallback: a row stops at its first id <= 0 (END); ids >= V
    # render as nothing, exactly like the native joiner's out-of-vocab
    # guard (review r4 — previously this path raised IndexError where the
    # native path skipped)
    keep = np.logical_and.accumulate(seq > 0, axis=-1)
    out = []
    for row, k in zip(seq, keep):
        ids = row[k]
        out.append(" ".join(table[ids[ids < table.size]]))
    return out
