"""v2 discriminative benchmark (stvd/data/synthetic.py
``discriminative_splits``): the quality axis must be able to
DISCRIMINATE (round-4 verdict Weak #4), which requires the information
placement the generator promises.  These tests verify it functionally:
a nearest-centroid probe can recover the latent concept from the stream
that is supposed to carry it, and cannot from the stream that isn't.
"""

import numpy as np
import pytest

from stvd.data.synthetic import (ADJECTIVES2, SCENES2, SUBJECTS2, VERBS2,
                                 discriminative_splits)


def _centroid_acc(feats: np.ndarray, labels):
    """Leave-nothing-out nearest-centroid accuracy — an upper-ish bound
    on how much linear info the stream carries about the label."""
    labels = np.asarray(labels)
    cents = {l: feats[labels == l].mean(axis=0) for l in set(labels.tolist())}
    keys = list(cents)
    C = np.stack([cents[l] for l in keys])
    pred = np.argmin(((feats[:, None, :] - C[None]) ** 2).sum(-1), axis=1)
    return float(np.mean([keys[p] == l for p, l in zip(pred, labels)]))


def test_v2_deterministic_and_shapes():
    a, la = discriminative_splits(n_train=40, n_valid=8, n_test=8,
                                  with_latents=True, seed=3)
    b = discriminative_splits(n_train=40, n_valid=8, n_test=8, seed=3)
    np.testing.assert_array_equal(a["train"].bank.frames,
                                  b["train"].bank.frames)
    assert a["train"].bank.regions.shape == (40, 8, 6, 64)
    assert len(la["train"]) == 40 and la["train"][0]["slot"] >= 0


def test_v2_subject_only_in_salient_region_slot():
    """subject_in='regions': frames must NOT identify the subject
    (temporal-only models are blind to it by construction); the salient
    region slot MUST."""
    splits, lat = discriminative_splits(
        n_train=240, n_valid=12, n_test=12, subject_in="regions",
        verb_in="frames", confusable=0.0, with_latents=True, seed=1)
    bank, lt = splits["train"].bank, lat["train"]
    subs = [l["subject"] for l in lt]
    fr = bank.frames.mean(axis=1)                      # (N, d)
    acc_frames = _centroid_acc(fr, [s[1] + s[0] for s in subs])
    sal = np.stack([bank.regions[i, :, l["slot"]].mean(axis=0)
                    for i, l in enumerate(lt)])        # (N, region_dim)
    acc_regions = _centroid_acc(sal, [s[1] + s[0] for s in subs])
    assert acc_frames < 0.3, f"frames leak subject: {acc_frames}"
    assert acc_regions > 0.8, f"salient slot uninformative: {acc_regions}"


def test_v2_verb_only_in_motion():
    splits, lat = discriminative_splits(
        n_train=240, n_valid=12, n_test=12, n_regions=0, motion_dim=64,
        subject_in="frames", verb_in="motion", confusable=0.0,
        with_latents=True, seed=2)
    bank, lt = splits["train"].bank, lat["train"]
    verbs = [l["verb"] for l in lt]
    acc_frames = _centroid_acc(bank.frames.mean(axis=1), verbs)
    acc_motion = _centroid_acc(bank.motion.mean(axis=1), verbs)
    assert acc_frames < 0.3, f"frames leak verb: {acc_frames}"
    assert acc_motion > 0.8, f"motion uninformative: {acc_motion}"
    # and the subject IS in frames for this variant
    acc_sub = _centroid_acc(bank.frames.mean(axis=1),
                            [s[1] + s[0] for s in [l["subject"]
                                                   for l in lt]])
    assert acc_sub > 0.7


def test_v2_references_disagree_and_vocab_covers():
    splits = discriminative_splits(n_train=60, n_valid=8, n_test=8,
                                   seed=4)
    ds = splits["train"]
    distinct = [len({" ".join(c) for c in refs}) for refs in
                ds.references]
    assert np.mean([d > 1 for d in distinct]) > 0.8, \
        "references must disagree like real annotators"
    vocab_words = set(ds.vocab.word_to_id)
    for refs in ds.references:
        for c in refs:
            assert set(c) <= vocab_words


def test_v2_compositional_heldout_disjoint():
    _, lat = discriminative_splits(n_train=120, n_valid=24, n_test=24,
                                   with_latents=True, seed=5)
    key = lambda l: (l["subject"], l["verb"], l["scene"])
    tr = {key(l) for l in lat["train"]}
    te = {key(l) for l in lat["test"]} | {key(l) for l in lat["valid"]}
    assert not (tr & te)
    # but every individual concept family is finite and shared
    assert {l["subject"] for l in lat["train"]} == set(
        tuple(s) for s in SUBJECTS2)


def test_v2_validation_errors():
    with pytest.raises(ValueError, match="motion_dim"):
        discriminative_splits(verb_in="motion", motion_dim=0)
    with pytest.raises(ValueError, match="n_regions"):
        discriminative_splits(subject_in="regions", n_regions=0)


def test_v2_beam_trap_reference_distribution():
    """The beam-trap PRECONDITION is distributional (p_generic > 0):
    at the subject branch point (token after the article) the generic
    token's marginal must exceed EITHER specific surface form's
    marginal (greedy commits generic) while staying below their sum
    (the subject signal dominates jointly, so beam recovers it), and
    the continuation after the generic token must carry more entropy
    than after a specific first word."""
    from collections import Counter

    from stvd.data.synthetic import ALT_PREFIX2

    splits, lat = discriminative_splits(
        n_train=160, n_valid=16, n_test=16, n_regions=0,
        subject_in="frames", confusable=0.0, p_generic=0.4,
        with_latents=True, seed=7)
    refs = splits["train"].references
    # per-SUBJECT branch-token distribution: the model's conditional at
    # the branch point aggregates over all videos sharing a subject
    per_subj = {}               # subject -> Counter(branch token)
    nxt = {}                    # 'generic'/'specific' -> Counter(next)
    for caps, l in zip(refs, lat["train"]):
        s0, _s1 = l["subject"]
        cnt = per_subj.setdefault(l["subject"], Counter())
        for c in caps:
            assert c[0] == "a"
            t = c[1]
            if t == "person":
                cnt["generic"] += 1
                nxt.setdefault("generic", Counter())[c[2]] += 1
            else:
                assert t in (s0, ALT_PREFIX2[s0]), (t, s0)
                cnt[t] += 1
                nxt.setdefault("specific", Counter())[c[2]] += 1
    ok = 0
    for subj, cnt in per_subj.items():
        s0 = subj[0]
        g, fa, fb = cnt["generic"], cnt[s0], cnt[ALT_PREFIX2[s0]]
        if g > fa and g > fb and g < fa + fb:
            ok += 1
    # the trap precondition must hold for the vast majority of
    # subjects (finite-sample ref noise allows a straggler)
    assert ok >= len(per_subj) - 2, (ok, len(per_subj))

    def entropy(cnt):
        n = sum(cnt.values())
        ps = np.array([v / n for v in cnt.values()])
        return float(-(ps * np.log(ps)).sum())

    # the generic branch must spread continuation probability; the
    # specific branch continues (conditionally) deterministically —
    # dataset-aggregate: specific next token is the subject head noun
    h_gen = entropy(nxt["generic"])
    assert h_gen > 0.8, h_gen
    # conditional on the video, the specific continuation is exact:
    # every specific next-token is one of the 12 subject head nouns
    heads = {s1 for _s0, s1 in SUBJECTS2}
    assert set(nxt["specific"]) <= heads
