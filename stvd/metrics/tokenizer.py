"""PTB-style tokenizer, pure Python.

Replaces the Java Stanford PTBTokenizer subprocess the reference's scorer
shells out to (reference ``cocoeval.py`` -> coco-caption ``tokenizer/`` —
SURVEY.md §3.5).  Implements the same normalization the PTBTokenizer
applies to captions: lowercase, punctuation removal, whitespace split.
(Caption text has no contractions-with-clitics subtleties that matter for
n-gram metrics; validated against NLTK tokenization in tests.)
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence

# punctuation set the COCO tokenizer strips from captions
_PUNCT = re.compile(
    r"[\"'`\.\?\!,;:\-\(\)\[\]\{\}<>@#\$%\^&\*\+=~_/\\\|]")
_WS = re.compile(r"\s+")


def ptb_tokenize(text: str) -> List[str]:
    """Tokenize one caption the way the COCO eval pipeline does."""
    t = text.lower()
    t = _PUNCT.sub(" ", t)
    return [w for w in _WS.split(t) if w]


def tokenize_corpus(d: Dict[str, Sequence[str]]) -> Dict[str, List[List[str]]]:
    """Tokenize an {id: [caption strings]} dict (the COCOScorer input
    format the reference uses)."""
    return {k: [ptb_tokenize(c) for c in caps] for k, caps in d.items()}
