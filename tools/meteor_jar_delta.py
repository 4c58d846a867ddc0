"""Bound the METEOR jar delta empirically (VERDICT r4 next #6).

The one data-absent stage of the METEOR-1.5 profile is the synonym
stage (jar: WordNet-derived DB; this box: none — metrics/meteor.py
jar-delta class 4).  This tool measures HOW MUCH that stage can move a
corpus score on an MSVD-scale distribution, so the repo can state a
bound instead of an unknown:

  1. builds an MSVD-scale corpus (default 1,970 segments x 40 refs —
     the real MSVD test-split shape) from the v2 discriminative
     grammar;
  2. generates model-like hypotheses at controlled synonym-substitution
     rates q (a fraction of content words replaced by synonyms of the
     reference wording — the only mechanism through which the synonym
     stage can matter);
  3. scores exact+stem vs exact+stem+synonym with the committed
     synonym table (tests/fixtures/synonyms_v2.json, derived from the
     corpus vocabulary) and reports the delta per q, for both the
     meteor15-en and meteor2005 profiles;
  4. corpus-scale native-vs-pure-Python fuzz: the full corpus scored
     through the C++ core and through the Python fallback must agree
     (the per-pair fuzz pins in tests/test_native.py, now at corpus
     aggregation scale).

Real MSVD hypotheses from a captioning model rarely paraphrase outside
the training vocabulary (the decoder can only emit trained words), so
the measured q=0.05-0.20 band brackets realistic behavior; q=0 is the
no-synonym floor where the stage provably moves nothing.

Usage: python tools/meteor_jar_delta.py [--n 1970] [--refs 40]
       [--qs 0,0.05,0.1,0.2] [--out runs/meteor_delta]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from stvd.data.synthetic import (ADJECTIVES2, SCENES2, SUBJECTS2,  # noqa
                                 VERBS2, _v2_captions)
from stvd.metrics import meteor as M  # noqa: E402

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "synonyms_v2.json")


def build_corpus(n: int, n_refs: int, seed: int = 0):
    """{id: [ref tokens]*n_refs} over the v2 grammar, MSVD-shaped."""
    rng = np.random.RandomState(seed)
    gts = {}
    lat = {}
    for i in range(n):
        si = rng.randint(len(SUBJECTS2))
        s0, s1 = SUBJECTS2[si]
        v = VERBS2[rng.randint(len(VERBS2))]
        p = SCENES2[rng.randint(len(SCENES2))]
        a = ADJECTIVES2[rng.randint(len(ADJECTIVES2))]
        vid = f"vid{i:04d}"
        gts[vid] = _v2_captions(s0, s1, v, p, a, rng, n_refs=n_refs)
        lat[vid] = (s0, s1, v, p, a)
    return gts, lat


def make_hyps(gts, syn_table, q: float, seed: int = 1):
    """Model-like hypotheses: a random reference with content words
    synonym-substituted at rate q (ref wording -> table variant), plus
    occasional scene dropping — the shape of real near-miss captions."""
    rng = np.random.RandomState(seed)
    res = {}
    for vid, refs in gts.items():
        hyp = list(refs[rng.randint(len(refs))])
        out = []
        for w in hyp:
            if w in syn_table and rng.rand() < q:
                out.append(syn_table[w][rng.randint(len(syn_table[w]))])
            else:
                out.append(w)
        res[vid] = [out]
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1970)
    ap.add_argument("--refs", type=int, default=40)
    ap.add_argument("--qs", default="0,0.05,0.1,0.2")
    ap.add_argument("--out", default="runs/meteor_delta")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    qs = [float(x) for x in args.qs.split(",")]

    with open(FIXTURE) as f:
        table = json.load(f)
    gts, _ = build_corpus(args.n, args.refs)
    report = {"n": args.n, "refs": args.refs, "table": FIXTURE,
              "rows": []}

    for q in qs:
        res = make_hyps(gts, table, q)
        row = {"q": q}
        for prof in ("meteor15-en", "meteor2005"):
            M.set_synonym_table(None)
            base, _ = M.meteor_score(gts, res, profile=prof)
            M.set_synonym_table(table)
            syn, _ = M.meteor_score(gts, res, profile=prof)
            M.set_synonym_table(None)
            row[prof] = {"exact_stem": round(base, 6),
                         "with_synonyms": round(syn, 6),
                         "delta": round(syn - base, 6)}
        report["rows"].append(row)
        print(json.dumps(row), flush=True)

    # corpus-scale native-vs-Python fuzz (synonyms off so the native
    # path engages; meteor2005 is the native-aligned profile)
    from stvd.metrics import _native
    res = make_hyps(gts, table, 0.1)
    t0 = time.time()
    with_native, _ = M.meteor_score(gts, res, profile="meteor2005")
    t_nat = time.time() - t0
    lib = _native.get_lib
    try:
        _native.get_lib = lambda: None
        t0 = time.time()
        pure, _ = M.meteor_score(gts, res, profile="meteor2005")
        t_py = time.time() - t0
    finally:
        _native.get_lib = lib
    fuzz = {"native": round(with_native, 10), "python": round(pure, 10),
            "abs_diff": abs(with_native - pure),
            "native_s": round(t_nat, 2), "python_s": round(t_py, 2)}
    assert fuzz["abs_diff"] < 1e-9, fuzz
    report["corpus_fuzz"] = fuzz
    print(json.dumps({"corpus_fuzz": fuzz}), flush=True)

    deltas = [abs(r["meteor15-en"]["delta"]) for r in report["rows"]]
    report["bound"] = {
        "max_abs_delta_meteor15": max(deltas),
        "statement": (
            "on this MSVD-scale distribution the synonym stage moves "
            f"corpus METEOR-1.5 by <= {max(deltas):.4f} across "
            f"substitution rates {qs}")}
    with open(os.path.join(args.out, "meteor_delta.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["bound"]))


if __name__ == "__main__":
    main()
