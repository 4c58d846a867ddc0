"""Structured synthetic video-caption data.

The machine has no real MSVD/MSR-VTT feature banks (SURVEY.md §7 'No
real MSVD features on this machine yet'), so quality-loop validation
needs a dataset where captions are *predictable from features* yet
non-trivial: each video is a latent (subject, verb, scene) triple;
features embed the triple (+noise), captions are templated paraphrases.
Held-out videos use unseen triples of seen concepts, so a model must
actually bind feature directions to words to score well — BLEU/METEOR
on the valid split are meaningful, unlike the iid-random
``synthetic_dataset`` used by unit tests.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from .bank import FeatureBank
from .batching import Dataset, build_caption_set
from .text import Vocab

SUBJECTS = ["man", "woman", "dog", "cat", "boy", "girl", "monkey", "baby"]
VERBS = ["running", "jumping", "cooking", "dancing", "singing", "swimming",
         "playing", "eating"]
SCENES = ["park", "kitchen", "street", "pool", "stage", "garden", "room",
          "field"]
ADJECTIVES = ["young", "old", "small", "big", "happy", "tired"]

_TEMPLATES = [
    "a {s} is {v} in the {p}",
    "the {s} is {v}",
    "a {s} {v} in a {p}",
]

_HARD_TEMPLATES = [
    "a {a} {s} is {v} in the {p}",
    "the {a} {s} is {v}",
    "a {s} is {v} in the {p}",
    "there is a {a} {s} {v} in a {p}",
    "the {s} {v} in the {p}",
]


def _captions(s: str, v: str, p: str) -> List[List[str]]:
    return [t.format(s=s, v=v, p=p).split() for t in _TEMPLATES]


def _hard_captions(s: str, v: str, p: str, a: str,
                   rng: np.random.RandomState,
                   n_refs: int = 4) -> List[List[str]]:
    """Paraphrase set with optional adjective mention and template
    variety — references disagree on wording, like real MSVD captions."""
    idx = rng.choice(len(_HARD_TEMPLATES), size=n_refs, replace=True)
    return [_HARD_TEMPLATES[i].format(s=s, v=v, p=p, a=a).split()
            for i in idx]


def structured_splits(
    n_train: int = 200,
    n_valid: int = 32,
    n_test: int = 32,
    k: int = 8,
    d: int = 128,
    n_regions: int = 0,
    region_dim: int = 64,
    motion_dim: int = 0,
    maxlen: int = 12,
    noise: float = 0.3,
    seed: int = 0,
    hard: bool = False,
) -> Dict[str, Dataset]:
    """Build train/valid/test Datasets over latent concept triples.

    Valid/test triples are disjoint from train triples (compositional
    held-out), but every individual concept appears in training.

    ``hard=True`` adds a per-video adjective concept, 5 disagreeing
    paraphrase templates per video, and higher feature noise — scores
    come out MSVD-like (<1.0) instead of saturated.
    """
    rng = np.random.RandomState(seed)
    if hard:
        noise = max(noise, 0.6)
    # concept embeddings (fixed directions in feature space)
    emb = {c: rng.randn(d).astype(np.float32)
           for c in SUBJECTS + VERBS + SCENES + ADJECTIVES}
    if motion_dim:
        memb = {c: rng.randn(motion_dim).astype(np.float32) for c in VERBS}
    if n_regions:
        remb = {c: rng.randn(region_dim).astype(np.float32)
                for c in SUBJECTS + SCENES}

    triples = [(s, v, p) for s in SUBJECTS for v in VERBS for p in SCENES]
    rng.shuffle(triples)
    need = n_train + n_valid + n_test
    if need > len(triples):
        raise ValueError(f"need <= {len(triples)} videos total")
    take = {"train": triples[:n_train],
            "valid": triples[n_train:n_train + n_valid],
            "test": triples[n_train + n_valid:need]}

    function_words = "a the is in there".split()
    vocab = Vocab.build(
        [[w] for w in SUBJECTS + VERBS + SCENES + ADJECTIVES
         + function_words],
        max_words=2000)

    out: Dict[str, Dataset] = {}
    for split, trs in take.items():
        n = len(trs)
        frames = np.zeros((n, k, d), np.float32)
        mask = np.ones((n, k), np.float32)
        regions = (np.zeros((n, k, n_regions, region_dim), np.float32)
                   if n_regions else None)
        motion = (np.zeros((n, k, motion_dim), np.float32)
                  if motion_dim else None)
        ids, refs, pairs = [], [], []
        for i, (s, v, p) in enumerate(trs):
            vid = f"{split}{i:04d}"
            ids.append(vid)
            sig = emb[s] + emb[v] + emb[p]
            if hard:
                adj = ADJECTIVES[rng.randint(len(ADJECTIVES))]
                sig = sig + emb[adj]
            frames[i] = sig + noise * rng.randn(k, d)
            if regions is not None:
                # subject signal in the first region, scene in the last —
                # spatial attention has something real to find
                regions[i] += noise * rng.randn(k, n_regions, region_dim)
                regions[i, :, 0] += remb[s]
                regions[i, :, -1] += remb[p]
            if motion is not None:
                motion[i] = memb[v] + noise * rng.randn(k, motion_dim)
            caps = (_hard_captions(s, v, p, adj, rng) if hard
                    else _captions(s, v, p))
            refs.append(caps)
            pairs.extend((vid, c) for c in caps)
        bank = FeatureBank(ids=ids, frames=frames, frame_mask=mask,
                           regions=regions, motion=motion)
        cset = build_caption_set(pairs, bank, vocab, maxlen, len(vocab))
        out[split] = Dataset(bank=bank, captions=cset, vocab=vocab,
                             references=refs)
    return out
