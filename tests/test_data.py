"""Data-layer tests: vocab, caption encoding, feature banks, batching.

Covers the reference behaviors of data_engine.py (SURVEY.md §2 row 5)
rebuilt as static-shape TPU-friendly equivalents.
"""

import numpy as np
import pytest

from stvd.data.bank import (FeatureBank, pack_bank, subsample_frames,
                            synthetic_bank)
from stvd.data.batching import BatchIterator, build_caption_set, synthetic_dataset
from stvd.data.text import EOS_ID, UNK_ID, Vocab, encode_captions, tokenize


def test_vocab_conventions():
    v = Vocab.build([["a", "b", "a"], ["a", "c"]])
    assert v.word_to_id["<eos>"] == EOS_ID
    assert v.word_to_id["UNK"] == UNK_ID
    assert v.word_to_id["a"] == 2  # most frequent first
    assert v.decode(v.encode(["a", "b", "zzz"], len(v))) == ["a", "b", "UNK"]


def test_vocab_pickle_roundtrip(tmp_path):
    v = Vocab.build([["x", "y"]])
    p = str(tmp_path / "worddict.pkl")
    v.save_pickle(p)
    v2 = Vocab.load_pickle(p)
    assert v2.word_to_id == v.word_to_id


def test_encode_captions_mask_covers_eos():
    v = Vocab.build([["a", "b"]])
    toks, mask = encode_captions([["a", "b"], ["a"] * 50], v, maxlen=6,
                                 n_words=len(v))
    # row 0: [a, b, EOS, 0, 0, 0], mask over 3 (words + EOS supervised)
    assert toks[0].tolist()[:3] == [2, 3, EOS_ID]
    assert mask[0].tolist() == [1, 1, 1, 0, 0, 0]
    # row 1: truncated to maxlen-1 words, mask covers all 6
    assert mask[1].sum() == 6


def test_subsample_frames():
    f = np.arange(10)[:, None].astype(np.float32)
    s = subsample_frames(f, 4)
    assert s.shape == (4, 1)
    assert s[0, 0] == 0 and s[-1, 0] == 9
    assert np.array_equal(subsample_frames(f, 20), f)  # keep-all when short


def test_pack_bank_masks_and_order():
    feats = {"b": np.ones((3, 4), np.float32), "a": 2 * np.ones((6, 4), np.float32)}
    bank = pack_bank(feats, k=5)
    assert bank.ids == ["a", "b"]
    assert bank.frames.shape == (2, 5, 4)
    assert bank.frame_mask[0].tolist() == [1, 1, 1, 1, 1]
    assert bank.frame_mask[1].tolist() == [1, 1, 1, 0, 0]
    assert np.all(bank.frames[1, 3:] == 0)


def test_bank_save_load_roundtrip(tmp_path):
    bank = synthetic_bank(4, k=6, d=8, n_regions=2, region_dim=4,
                          motion_dim=8, seed=3)
    p = str(tmp_path / "bank.npz")
    bank.save(p)
    b2 = FeatureBank.load(p)
    assert b2.ids == list(bank.ids)
    np.testing.assert_array_equal(b2.frames, bank.frames)
    np.testing.assert_array_equal(b2.regions, bank.regions)
    np.testing.assert_array_equal(b2.motion, bank.motion)


def test_batch_iterator_static_shapes_and_weights():
    it = BatchIterator(10, 4, seed=0)
    batches = list(it.epoch())
    assert len(batches) == 3
    for idx, w in batches:
        assert idx.shape == (4,) and w.shape == (4,)
    # last batch: 2 real + 2 wrapped
    assert batches[-1][1].tolist() == [1, 1, 0, 0]
    # all real examples covered exactly once with weight 1
    seen = np.concatenate([i[w > 0] for i, w in batches])
    assert sorted(seen.tolist()) == list(range(10))


def test_synthetic_dataset_consistency():
    ds = synthetic_dataset(n_videos=4, captions_per_video=3, k=6, d=16,
                           maxlen=12, seed=1)
    assert ds.captions.n == 12
    assert ds.bank.n_videos == 4
    assert len(ds.references) == 4
    # every caption's video index is valid
    assert ds.captions.video_idx.max() < 4
    # references decode consistently with encoded tokens
    row = ds.captions.video_idx[0]
    dec = ds.vocab.decode(ds.captions.tokens[0])
    assert dec in ds.references[row]


def test_tokenize():
    assert tokenize("A man, IS running!") == ["a", "man", "is", "running"]
