"""Fabricate a REAL-FORMAT legacy dataset (synthetic content) for a recipe.

The reference operates on downloaded MSVD/MSR-VTT artifacts: Py2 feature
pickles (vid -> (F, D) float32), worddict.pkl, CAP.pkl, split id lists
(reference ``data_engine.py`` — SURVEY.md §2 row 5).  No real banks exist
on this machine, so this tool writes the SAME file formats — true
Python-2 pickle byte streams (SHORT_BINSTRING/BINSTRING opcodes, raw
array buffers as Py2 str) — filled with structured synthetic content a
model can actually learn, enabling the full reference workflow:

    python tools/make_synthetic_corpus.py --recipe recipes/msvd.json
    python -m stvd.cli.convert --features data/msvd/FEAT.pkl \
        [--regions data/msvd/REGIONS.pkl] [--motion data/msvd/MOTION.pkl] \
        --frames 28 --out data/msvd/bank.npz
    python -m stvd.cli.train --config recipes/msvd.json ...
    python -m stvd.cli.sample --run-dir runs/msvd --split test

Captions follow a (subject, verb, object) schema and the features carry
linear projections of that schema (object signal placed in a few regions
per frame so spatial attention has something to find; verb signal in the
motion stream), so short training runs reduce NLL honestly.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "fixtures", "gen_py2_fixture.py")
spec = importlib.util.spec_from_file_location("gen_py2_fixture", _FIX)
py2 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(py2)

SUBJECTS = ["man", "woman", "boy", "girl", "dog", "cat", "chef", "band",
            "player", "monkey", "baby", "group"]
VERBS = ["playing", "riding", "cooking", "slicing", "throwing", "kicking",
         "driving", "eating", "dancing", "washing", "drawing", "singing"]
OBJECTS = ["guitar", "bicycle", "onion", "ball", "car", "piano", "bread",
           "horse", "drum", "potato", "boat", "phone"]
ADJS = ["young", "small", "large", "happy"]


def make_caps(rng, vid_triples):
    """2-3 caption variants per video, all consistent with its triple."""
    caps = {}
    for vid, (s, v, o) in vid_triples.items():
        variants = [
            f"a {SUBJECTS[s]} is {VERBS[v]} a {OBJECTS[o]}",
            f"the {SUBJECTS[s]} is {VERBS[v]} the {OBJECTS[o]}",
            f"a {ADJS[rng.randint(len(ADJS))]} {SUBJECTS[s]} is "
            f"{VERBS[v]} a {OBJECTS[o]}",
        ]
        caps[vid] = variants[: 2 + rng.randint(2)]
    return caps


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--recipe", required=True)
    ap.add_argument("--videos", type=int, default=48)
    ap.add_argument("--vocab-size", type=int, default=0,
                    help="pad worddict to this many entries "
                         "(0 = recipe model.n_words)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    with open(args.recipe) as f:
        r = json.load(f)
    m, d = r["model"], r["data"]
    data_dir = d["data_dir"]
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.RandomState(args.seed)

    n = args.videos
    vids = [f"vid{i:04d}" for i in range(n)]
    triples = {v: (rng.randint(len(SUBJECTS)), rng.randint(len(VERBS)),
                   rng.randint(len(OBJECTS))) for v in vids}
    caps = make_caps(rng, triples)

    # --- worddict.pkl: real words at low ids (after 0=EOS, 1=UNK),
    #     padded with filler entries to a realistic vocabulary size ---
    words = sorted({w for cs in caps.values() for c in cs
                    for w in c.split()})
    vocab_size = args.vocab_size or int(m["n_words"])
    pairs = [(py2.p2_str(w.encode("latin1")), py2.p2_int(i + 2))
             for i, w in enumerate(words)]
    for j in range(len(words) + 2, vocab_size):
        pairs.append((py2.p2_str(f"w{j:05d}".encode()), py2.p2_int(j)))
    with open(os.path.join(data_dir, "worddict.pkl"), "wb") as f:
        f.write(py2.pickle_bytes(py2.p2_dict(pairs)))

    # --- CAP.pkl: {vid: [{'caption','tokenized','image_id'}]} ---
    cap_pairs = []
    for v in vids:
        recs = [py2.p2_dict([
            (py2.p2_str(b"caption"), py2.p2_str((c + " .").encode())),
            (py2.p2_str(b"tokenized"), py2.p2_str(c.encode())),
            (py2.p2_str(b"image_id"), py2.p2_str(v.encode())),
        ]) for c in caps[v]]
        cap_pairs.append((py2.p2_str(v.encode()), py2.p2_list(recs)))
    with open(os.path.join(data_dir, "CAP.pkl"), "wb") as f:
        f.write(py2.pickle_bytes(py2.p2_dict(cap_pairs)))

    # --- feature pickles: linear projections of the schema + noise ---
    # appearance features are (F, ctx_dim); motion is a separate stream
    # fused by a learned linear map (model/decoder.py:encode_context)
    app_dim = int(m["ctx_dim"])
    use_motion = bool(m.get("use_motion"))
    Ws = rng.randn(len(SUBJECTS), app_dim).astype("<f4")
    Wv = rng.randn(len(VERBS), app_dim).astype("<f4")
    Wo = rng.randn(len(OBJECTS), app_dim).astype("<f4")

    feat_pairs, reg_pairs, mot_pairs = [], [], []
    use_spatial = bool(m.get("use_spatial"))
    R, Dr = int(m.get("n_regions", 0)), int(m.get("region_dim", 0))
    if use_spatial:
        Wor = rng.randn(len(OBJECTS), Dr).astype("<f4")
    if use_motion:
        Dm = int(m["motion_dim"])
        Wvm = rng.randn(len(VERBS), Dm).astype("<f4")

    for v in vids:
        s, vb, o = triples[v]
        F = rng.randint(20, 41)        # ragged frame counts (subsampling)
        base = (Ws[s] + Wv[vb] + Wo[o])[None, :]
        arr = (base + 0.3 * rng.randn(F, app_dim)).astype("<f4")
        feat_pairs.append((py2.p2_str(v.encode()),
                           py2.p2_ndarray(arr.tobytes(), arr.shape)))
        if use_spatial:
            reg = 0.3 * rng.randn(F, R, Dr).astype("<f4")
            hot = rng.randint(0, R, size=F)   # object lives in one region
            reg[np.arange(F), hot] += Wor[o]
            reg = reg.astype("<f4")
            reg_pairs.append((py2.p2_str(v.encode()),
                              py2.p2_ndarray(reg.tobytes(), reg.shape)))
        if use_motion:
            mot = (Wvm[vb][None, :] + 0.3 * rng.randn(F, Dm)).astype("<f4")
            mot_pairs.append((py2.p2_str(v.encode()),
                              py2.p2_ndarray(mot.tobytes(), mot.shape)))

    with open(os.path.join(data_dir, "FEAT.pkl"), "wb") as f:
        f.write(py2.pickle_bytes(py2.p2_dict(feat_pairs)))
    made = ["worddict.pkl", "CAP.pkl", "FEAT.pkl"]
    if use_spatial:
        with open(os.path.join(data_dir, "REGIONS.pkl"), "wb") as f:
            f.write(py2.pickle_bytes(py2.p2_dict(reg_pairs)))
        made.append("REGIONS.pkl")
    if use_motion:
        with open(os.path.join(data_dir, "MOTION.pkl"), "wb") as f:
            f.write(py2.pickle_bytes(py2.p2_dict(mot_pairs)))
        made.append("MOTION.pkl")

    # --- split id lists (the reference ships explicit lists) ---
    order = list(vids)
    rng.shuffle(order)
    n_tr, n_va = int(0.8 * n), int(0.1 * n)
    for split, sl in (("train", order[:n_tr]),
                      ("valid", order[n_tr:n_tr + n_va]),
                      ("test", order[n_tr + n_va:])):
        with open(os.path.join(data_dir, f"{split}_ids.txt"), "w") as f:
            f.write("\n".join(sorted(sl)) + "\n")
        made.append(f"{split}_ids.txt")

    # provenance marker: every downstream scores artifact embeds this
    # record so synthetic-corpus numbers can never be read as paper
    # quality (stvd/data/corpus.py:corpus_provenance)
    with open(os.path.join(data_dir, "PROVENANCE.json"), "w") as f:
        json.dump({
            "synthetic": True,
            "generator": "tools/make_synthetic_corpus.py",
            "seed": args.seed, "videos": n, "vocab_size": vocab_size,
            "note": "fabricated template-grammar corpus — scores on it "
                    "are harness pins, NOT paper-comparable quality",
        }, f, indent=1)
    made.append("PROVENANCE.json")

    print(f"wrote {', '.join(made)} -> {data_dir} "
          f"({n} videos, vocab {vocab_size})")
    conv = (f"python -m stvd.cli.convert --features {data_dir}/FEAT.pkl "
            + (f"--regions {data_dir}/REGIONS.pkl " if use_spatial else "")
            + (f"--motion {data_dir}/MOTION.pkl " if use_motion else "")
            + f"--frames {m['n_frames']} --out {data_dir}/bank.npz")
    print("next:", conv)
    return 0


if __name__ == "__main__":
    sys.exit(main())
