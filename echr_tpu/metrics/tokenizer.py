"""PTB-style tokenizer, pure Python.

The reference tokenizes through coco-caption's PTBTokenizer, a Stanford
CoreNLP **Java** subprocess (reference: evaluate.py:14,232-233; the
submodule/jar is not vendored in the snapshot).  This is a host-side,
off-hot-path re-implementation of its observable behavior: lowercase,
split PTB-style (contractions kept as single units the way PTBTokenizer
emits them for captions), and drop the punctuation token list coco uses.
"""
from __future__ import annotations

import re
from typing import Dict, List

# coco-caption PTBTokenizer removes exactly these tokens after tokenizing
PUNCTUATIONS = {
    "''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
    ".", "?", "!", ",", ":", "-", "--", "...", ";",
}

_WORD_RE = re.compile(
    r"[a-z0-9]+(?:'[a-z0-9]+)*|\.\.\.|--|[.,?!:;`\-]|''|``|'"
)


def tokenize_caption(s: str) -> str:
    s = s.lower().replace("\n", " ")
    toks = _WORD_RE.findall(s)
    return " ".join(tk for tk in toks if tk not in PUNCTUATIONS)


def tokenize(captions: Dict[int, List[Dict[str, str]]]) -> Dict[int, List[str]]:
    """coco-style interface: {idx: [{'caption': str}]} -> {idx: [str]}."""
    return {
        k: [tokenize_caption(item["caption"]) for item in v]
        for k, v in captions.items()
    }
