"""Token-sequence utilities (reference: misc/utils.py:24-38)."""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# vocab-dict -> object-array lookup table, cached by identity (the vocab is
# loaded once per run; rendering ~370k tokens/pass through per-token dict
# lookups was a measurable slice of the e2e eval pipeline)
_TABLE_CACHE: Dict[int, Tuple[Dict[str, str], np.ndarray]] = {}


def _lookup_table(ix_to_word: Dict[str, str]) -> np.ndarray:
    key = id(ix_to_word)
    hit = _TABLE_CACHE.get(key)
    if hit is not None and hit[0] is ix_to_word:
        return hit[1]
    size = max((int(k) for k in ix_to_word), default=0) + 1
    table = np.empty(size, dtype=object)
    table[:] = ""
    for k, w in ix_to_word.items():
        table[int(k)] = w
    # keep the dict reference alive so the id() key cannot be reused
    _TABLE_CACHE[key] = (ix_to_word, table)
    return table


def decode_sequence(ix_to_word: Dict[str, str], seq: np.ndarray) -> List[str]:
    """ids -> sentences; 0 is the END token and stops the row."""
    seq = np.asarray(seq)
    if seq.ndim == 1:
        seq = seq[None]
    table = _lookup_table(ix_to_word)
    # a row stops at its first id <= 0 (END) — tokens after it are dropped
    keep = np.logical_and.accumulate(seq > 0, axis=-1)
    return [" ".join(table[row[k]]) for row, k in zip(seq, keep)]
