"""Native C++ metrics core vs pure-Python parity (fuzzed).

The native library (native/metrics_core.cpp) must be a bit-exact
drop-in: every function is fuzzed against an independent Python
implementation here, and the end-to-end scorer is compared with the
native path disabled.
"""

import json
import os
import subprocess
import sys
from collections import Counter

import numpy as np
import pytest

from stvd.metrics import _native as nat
from stvd.metrics.meteor import _align, _count_chunks
from stvd.metrics.scorer import score_all

pytestmark = pytest.mark.skipif(nat.get_lib() is None,
                                reason="native lib not built")


def _py_lcs(a, b):
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def test_lcs_fuzz():
    rng = np.random.RandomState(0)
    for _ in range(300):
        a = rng.randint(0, 6, rng.randint(0, 20)).tolist()
        b = rng.randint(0, 6, rng.randint(0, 20)).tolist()
        if not a or not b:
            continue
        assert nat.lcs_len(a, b) == _py_lcs(a, b), (a, b)


def test_meteor_align_fuzz():
    """Native aligner == Python _align on exact+stem stages (words used
    directly as their own 'stems' here; stage mechanics identical)."""
    rng = np.random.RandomState(1)
    vocab = [f"w{i}" for i in range(8)]
    for _ in range(300):
        hyp = [vocab[i] for i in rng.randint(0, 8, rng.randint(1, 12))]
        ref = [vocab[i] for i in rng.randint(0, 8, rng.randint(1, 12))]
        matches = _align(hyp, ref)
        want = (len(matches), _count_chunks(matches))
        intern = nat.Interner()
        # stems == surface so only exact+stem stages are exercised, same
        # as the python path with the Porter stemmer on single letters
        got = nat.meteor_align(intern(hyp), intern(hyp), None,
                               intern(ref), intern(ref), None)
        assert got == want, (hyp, ref, got, want)


def _py_bleu_stats(hyp, refs):
    match = []
    for n in range(1, 5):
        hc = Counter(tuple(hyp[i:i + n]) for i in range(len(hyp) - n + 1))
        mr = Counter()
        for r in refs:
            c = Counter(tuple(r[i:i + n]) for i in range(len(r) - n + 1))
            for g, v in c.items():
                mr[g] = max(mr[g], v)
        match.append(sum(min(v, mr[g]) for g, v in hc.items()))
    return match


def test_bleu_stats_fuzz():
    rng = np.random.RandomState(2)
    for _ in range(300):
        hyp = rng.randint(0, 9, rng.randint(1, 16)).tolist()
        refs = [rng.randint(0, 9, rng.randint(1, 16)).tolist()
                for _ in range(rng.randint(1, 4))]
        m, t, cl = nat.bleu_stats(np.array(hyp),
                                  [np.array(r) for r in refs])
        assert m.tolist() == _py_bleu_stats(hyp, refs), (hyp, refs)
        assert cl == min((len(r) for r in refs),
                         key=lambda rl: (abs(rl - len(hyp)), rl))


def test_bleu_stats_many_long_refs_terminates():
    """MSVD-scale reference sets (40 refs/video): the global table must
    not be grown by reference-side n-grams (regression: overflow wedged
    the linear probe into an infinite loop)."""
    rng = np.random.RandomState(3)
    hyp = rng.randint(0, 50, 6).tolist()        # short hypothesis
    refs = [rng.randint(0, 50, 18).tolist() for _ in range(40)]
    m, t, cl = nat.bleu_stats(np.array(hyp), [np.array(r) for r in refs])
    assert m.tolist() == _py_bleu_stats(hyp, refs)


def test_meteor_corpus_native_vs_python_fuzz():
    """The one-call native METEOR corpus driver must match the Python
    per-segment driver (best-ref selection + stat aggregation)."""
    from stvd.metrics.meteor import (_score_from_stats, _segment_stats,
                                     meteor_score)
    rng = np.random.RandomState(9)
    vocab = [f"t{i}" for i in range(25)]
    for _ in range(8):
        n_vid = rng.randint(2, 10)
        gts = {f"v{i}": [[vocab[j] for j in
                          rng.randint(0, 25, rng.randint(2, 10))]
                         for _ in range(rng.randint(1, 6))]
               for i in range(n_vid)}
        res = {k: [[vocab[j] for j in rng.randint(0, 25, rng.randint(2, 10))]]
               for k in gts}
        got, _ = meteor_score(gts, res)
        tm = th = tr = tc = 0
        for i in sorted(gts):
            m, h, r, c = _segment_stats(res[i][0], gts[i])
            tm, th, tr, tc = tm + m, th + h, tr + r, tc + c
        want = _score_from_stats(tm, th, tr, tc)
        assert abs(got - want) < 1e-12, (got, want)


def test_cider_native_vs_python_fuzz():
    """Native CIDEr == pure-Python CIDEr on random corpora."""
    from stvd.metrics.cider import (SIGMA, _compute_doc_freq, _ngram_counts,
                                    _tfidf_vec)
    import math

    def py_cider(gts, res):
        ids = sorted(gts)
        df = _compute_doc_freq({i: gts[i] for i in ids})
        log_n = math.log(max(len(ids), 1))
        scores = []
        for i in ids:
            hv, hnorm, hlen = _tfidf_vec(_ngram_counts(res[i][0]), df, log_n)
            per_ref = []
            for r in gts[i]:
                rv, rnorm, rlen = _tfidf_vec(_ngram_counts(r), df, log_n)
                tot = 0.0
                for n in range(4):
                    dot = sum(min(w, rv[n][g]) * rv[n][g]
                              for g, w in hv[n].items() if g in rv[n])
                    sim = (dot / (hnorm[n] * rnorm[n])
                           if hnorm[n] > 0 and rnorm[n] > 0 else 0.0)
                    sim *= math.exp(-((hlen - rlen) ** 2) / (2 * SIGMA ** 2))
                    tot += sim
                per_ref.append(tot / 4)
            scores.append(10.0 * sum(per_ref) / max(len(per_ref), 1))
        return sum(scores) / len(scores)

    rng = np.random.RandomState(7)
    vocab = [f"t{i}" for i in range(30)]
    for _ in range(10):
        n_vid = rng.randint(2, 12)
        gts = {f"v{i}": [[vocab[j] for j in
                          rng.randint(0, 30, rng.randint(2, 12))]
                         for _ in range(rng.randint(1, 5))]
               for i in range(n_vid)}
        res = {k: [[vocab[j] for j in rng.randint(0, 30, rng.randint(2, 12))]]
               for k in gts}
        from stvd.metrics.cider import cider_score
        native_avg, _ = cider_score(gts, res)
        assert abs(native_avg - py_cider(gts, res)) < 1e-9


def test_score_all_native_vs_python_subprocess():
    """End-to-end scorer parity with the native path disabled."""
    gts = {"a": ["a man is playing a guitar loudly",
                 "someone plays the guitar"],
           "b": ["a dog is running in a park"],
           "c": ["two people are cooking food in a kitchen"]}
    res = {"a": ["a man plays a guitar"],
           "b": ["a dog runs in the park"],
           "c": ["people cook food"]}
    with_native = score_all(gts, res)
    code = (
        "import json,sys; sys.path.insert(0,'/root/repo');"
        "from stvd.metrics.scorer import score_all;"
        f"print(json.dumps(score_all({gts!r}, {res!r})))")
    env = dict(os.environ, STVD_NO_NATIVE="1", JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-500:]
    without = json.loads(out.stdout.strip().splitlines()[-1])
    for k, v in with_native.items():
        assert abs(v - without[k]) < 1e-9, (k, v, without[k])


def test_meteor_align_pairs_fuzz_native_vs_python():
    """stvd_meteor_align_pairs (the C++ parent-walk reconstruction)
    must emit EXACTLY the pure-Python resolver's (i, j, stage) triples
    — _align_staged is deliberately pure Python (see its docstring),
    so the native entry point is driven directly here."""
    import random

    import stvd.metrics._native as nat
    from stvd.metrics import meteor as mmod

    if nat.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = random.Random(7)
    vocab = [f"w{k}" for k in range(12)]
    for _ in range(150):
        hyp = [rng.choice(vocab) for _ in range(rng.randint(0, 14))]
        ref = [rng.choice(vocab) for _ in range(rng.randint(1, 14))]
        intern = nat.Interner()
        native = nat.meteor_align_pairs(
            intern(hyp), intern([mmod._stem(w) for w in hyp]), None,
            intern(ref), intern([mmod._stem(w) for w in ref]), None)
        assert native is not None
        pure = mmod._align_staged(hyp, ref)
        assert sorted(native) == pure, (hyp, ref)
        # stats parity against the stats-only native entry too
        m, c = nat.meteor_align(
            intern(hyp), intern([mmod._stem(w) for w in hyp]), None,
            intern(ref), intern([mmod._stem(w) for w in ref]), None)
        assert m == len(pure)
        assert c == mmod._count_chunks([(i, j) for i, j, _ in pure])
