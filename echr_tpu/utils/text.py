"""Token-sequence utilities (reference: misc/utils.py:24-38)."""
from __future__ import annotations

from typing import Dict, List

import numpy as np


def decode_sequence(ix_to_word: Dict[str, str], seq: np.ndarray) -> List[str]:
    """ids -> sentences; 0 is the END token and stops the row."""
    seq = np.asarray(seq)
    out = []
    for row in seq:
        words = []
        for ix in row:
            if ix <= 0:
                break
            words.append(ix_to_word[str(int(ix))])
        out.append(" ".join(words))
    return out
