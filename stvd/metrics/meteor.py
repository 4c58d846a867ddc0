"""METEOR, pure Python.

Replaces the Java METEOR-1.5 jar the reference's scorer pipes to
(reference ``cocoeval.py`` -> coco-caption ``meteor/meteor-1.5.jar`` —
SURVEY.md §2 row 11; no Java in this environment).  Implements the
METEOR algorithm (Banerjee & Lavie / Denkowski & Lavie) with the English
defaults alpha=0.85, beta=0.2, gamma=0.6 used by METEOR 1.5:

  * staged unigram alignment: exact -> Porter stem -> WordNet synonym
    (the synonym stage activates only if the WordNet corpus is present;
    this machine has no nltk_data, so exact+stem run — noted in README),
  * F_mean = P*R / (alpha*P + (1-alpha)*R),
  * fragmentation penalty gamma * (chunks / matches)^beta,
  * score = F_mean * (1 - penalty), best reference taken per segment,
  * corpus score aggregates the per-segment statistics of the best
    alignments (as the jar does), not the mean of segment scores.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

ALPHA = 0.9    # recall weight in F_mean: F = P*R / (a*P + (1-a)*R)
BETA = 3.0    # fragmentation exponent
GAMMA = 0.5    # fragmentation weight

# NOTE on parameters: defaults are the classic, unambiguously documented
# METEOR parameters (Banerjee & Lavie 2005: F = 10PR/(R+9P), penalty =
# 0.5*(chunks/matches)^3), under which an exact match scores ~1.0.  The
# METEOR-1.5 jar the reference uses ships retuned English weights; they
# cannot be verified from this machine (no network, empty reference
# mount — SURVEY.md §0), so the tuple is exposed as arguments on every
# scoring function for exact-jar replication later.

_stemmer = None
_stem_cache: Dict[str, str] = {}


def _stem(w: str) -> str:
    """Memoized Porter stem (the stemmer is pure Python and dominates
    corpus-scale METEOR cost otherwise — vocab is small, captions
    repeat words constantly)."""
    s = _stem_cache.get(w)
    if s is None:
        global _stemmer
        if _stemmer is None:
            from nltk.stem.porter import PorterStemmer
            _stemmer = PorterStemmer()
        s = _stemmer.stem(w)
        _stem_cache[w] = s
    return s


_wordnet_checked = False
_wordnet = None


def _get_wordnet():
    """WordNet if its data is installed, else None (graceful stage skip)."""
    global _wordnet_checked, _wordnet
    if not _wordnet_checked:
        _wordnet_checked = True
        try:
            from nltk.corpus import wordnet as wn
            wn.synsets("dog")  # force-load; raises if data missing
            _wordnet = wn
        except Exception:
            _wordnet = None
    return _wordnet


def _synonyms(w: str) -> set:
    wn = _get_wordnet()
    if wn is None:
        return set()
    syns = set()
    for s in wn.synsets(w):
        for l in s.lemmas():
            syns.add(l.name().lower())
    return syns


def _align(hyp: List[str], ref: List[str]) -> List[Tuple[int, int]]:
    """Staged unigram alignment; returns (hyp_pos, ref_pos) pairs.

    Within each stage, candidates matching are resolved to minimize
    positional distance (a chunk-minimizing heuristic standing in for
    the jar's exhaustive beam search over alignments).
    """
    matches: List[Tuple[int, int]] = []
    hyp_used = [False] * len(hyp)
    ref_used = [False] * len(ref)

    def run_stage(eq) -> None:
        for i, hw in enumerate(hyp):
            if hyp_used[i]:
                continue
            best_j = -1
            for j, rw in enumerate(ref):
                if ref_used[j]:
                    continue
                if eq(hw, rw):
                    if best_j < 0 or abs(j - i) < abs(best_j - i):
                        best_j = j
            if best_j >= 0:
                hyp_used[i] = True
                ref_used[best_j] = True
                matches.append((i, best_j))

    run_stage(lambda a, b: a == b)
    run_stage(lambda a, b: _stem(a) == _stem(b))
    if _get_wordnet() is not None:
        run_stage(lambda a, b: a in _synonyms(b) or b in _synonyms(a))
    return sorted(matches)


def _count_chunks(matches: List[Tuple[int, int]]) -> int:
    if not matches:
        return 0
    chunks = 1
    for (h0, r0), (h1, r1) in zip(matches, matches[1:]):
        if h1 != h0 + 1 or r1 != r0 + 1:
            chunks += 1
    return chunks


def _align_stats(hyp: List[str], ref: List[str]) -> Tuple[int, int]:
    """(matches, chunks) for one hypothesis/reference pair.

    Uses the native C++ aligner (native/metrics_core.cpp:
    stvd_meteor_align) when built and the WordNet synonym stage is
    inactive (the native core takes equivalence-class ids, which can't
    express WordNet's asymmetric synonymy); identical results to the
    Python path are pinned by tests/test_native.py.
    """
    from . import _native
    if _get_wordnet() is None and _native.get_lib() is not None:
        intern = _native.Interner()
        out = _native.meteor_align(
            intern(hyp), intern([_stem(w) for w in hyp]), None,
            intern(ref), intern([_stem(w) for w in ref]), None)
        if out is not None:
            return out
    m = _align(hyp, ref)
    return len(m), _count_chunks(m)


def _segment_stats(hyp: List[str], refs: Sequence[List[str]],
                   alpha: float = ALPHA, beta: float = BETA,
                   gamma: float = GAMMA) -> Tuple[int, int, int, int]:
    """Best-reference (matches, hyp_len, ref_len, chunks) for a segment.

    'Best' = highest segment METEOR score, ties to fewer chunks (what
    the jar optimizes per segment before corpus aggregation).
    """
    from . import _native
    use_native = _get_wordnet() is None and _native.get_lib() is not None
    if use_native:
        # hoist hypothesis interning/stemming out of the reference loop
        intern = _native.Interner()
        h_ids = intern(hyp)
        h_stems = intern([_stem(w) for w in hyp])
    best = None
    best_score = -1.0
    for r in refs:
        if use_native:
            nm, nchunks = _native.meteor_align(
                h_ids, h_stems, None, intern(r),
                intern([_stem(w) for w in r]), None)
        else:
            nm, nchunks = _align_stats(hyp, r)
        stats = (nm, len(hyp), len(r), nchunks)
        s = _score_from_stats(*stats, alpha=alpha, beta=beta, gamma=gamma)
        if s > best_score or (s == best_score and best is not None
                              and stats[3] < best[3]):
            best_score = s
            best = stats
    return best if best is not None else (0, len(hyp), 0, 0)


def _score_from_stats(m: int, hlen: int, rlen: int, chunks: int,
                      alpha: float = ALPHA, beta: float = BETA,
                      gamma: float = GAMMA) -> float:
    if m == 0 or hlen == 0 or rlen == 0:
        return 0.0
    p = m / hlen
    r = m / rlen
    f_mean = p * r / (alpha * p + (1 - alpha) * r)
    frag = chunks / m
    penalty = gamma * (frag ** beta) if chunks > 0 else 0.0
    return f_mean * (1.0 - penalty)


def meteor_sentence(hyp: List[str], refs: Sequence[List[str]],
                    alpha: float = ALPHA, beta: float = BETA,
                    gamma: float = GAMMA) -> float:
    return _score_from_stats(*_segment_stats(hyp, refs, alpha, beta, gamma),
                             alpha=alpha, beta=beta, gamma=gamma)


def meteor_score(gts: Dict[str, List[List[str]]],
                 res: Dict[str, List[List[str]]],
                 alpha: float = ALPHA, beta: float = BETA,
                 gamma: float = GAMMA) -> Tuple[float, Dict[str, float]]:
    """Corpus METEOR on tokenized {id: [tokens...]} dicts (aggregated
    statistics, matching the jar's corpus-level final score)."""
    ids = sorted(gts)
    from . import _native
    if _get_wordnet() is None and _native.get_lib() is not None:
        # one native call for the whole corpus (per-pair ctypes overhead
        # dominates otherwise)
        intern = _native.Interner()
        hyp_ids = [intern(res[i][0]) for i in ids]
        hyp_stems = [intern([_stem(w) for w in res[i][0]]) for i in ids]
        refs_ids = [[intern(r) for r in gts[i]] for i in ids]
        refs_stems = [[intern([_stem(w) for w in r]) for r in gts[i]]
                      for i in ids]
        stats = _native.meteor_corpus(hyp_ids, hyp_stems, refs_ids,
                                      refs_stems, alpha, beta, gamma)
        if stats is not None:
            tm, th, tr, tc = (int(stats[:, 0].sum()), int(stats[:, 1].sum()),
                              int(stats[:, 2].sum()), int(stats[:, 3].sum()))
            score = _score_from_stats(tm, th, tr, tc, alpha=alpha,
                                      beta=beta, gamma=gamma)
            return score, {"METEOR": score}
    tm = th = tr = tc = 0
    for i in ids:
        m, h, r, c = _segment_stats(res[i][0], gts[i], alpha, beta, gamma)
        tm += m
        th += h
        tr += r
        tc += c
    score = _score_from_stats(tm, th, tr, tc, alpha=alpha, beta=beta,
                              gamma=gamma)
    return score, {"METEOR": score}
