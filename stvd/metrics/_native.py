"""ctypes loader for the native metrics core (native/metrics_core.cpp).

Builds are optional: every caller falls back to the pure-Python
implementation when the shared library is absent (set STVD_NO_NATIVE=1
to force the fallback).  ``python -m stvd.metrics._native`` builds it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libstvd_native.so")

_lib = None
_checked = False


def build(quiet: bool = True) -> bool:
    """Build the shared library with make; returns success."""
    try:
        r = subprocess.run(["make", "-C", _NATIVE_DIR],
                           capture_output=quiet, timeout=120)
        return r.returncode == 0 and os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    if os.environ.get("STVD_NO_NATIVE"):
        return None
    # ALWAYS invoke make: its dependency rule makes this a cheap no-op
    # when the .so is newer than the sources, and it guarantees edits to
    # metrics_core.cpp can never be shadowed by a stale binary.
    if not build() or not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.stvd_lcs_len.argtypes = [i32p, ctypes.c_int32, i32p, ctypes.c_int32]
    lib.stvd_lcs_len.restype = ctypes.c_int32
    lib.stvd_meteor_align.argtypes = [i32p, i32p, i32p, ctypes.c_int32,
                                      i32p, i32p, i32p, ctypes.c_int32,
                                      i32p, i32p]
    lib.stvd_meteor_align.restype = None
    lib.stvd_meteor_align_pairs.argtypes = [
        i32p, i32p, i32p, ctypes.c_int32,
        i32p, i32p, i32p, ctypes.c_int32,
        i32p, i32p, i32p, i32p]
    lib.stvd_meteor_align_pairs.restype = None
    lib.stvd_bleu_stats.argtypes = [i32p, ctypes.c_int32, i32p, i32p,
                                    ctypes.c_int32, i64p, i64p, i32p]
    lib.stvd_bleu_stats.restype = None
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.stvd_cider.argtypes = [i32p, i32p, i32p, i32p, i32p,
                               ctypes.c_int32, ctypes.c_double, f64p]
    lib.stvd_cider.restype = None
    lib.stvd_meteor_corpus.argtypes = [i32p, i32p, i32p, i32p, i32p, i32p,
                                       i32p, ctypes.c_int32,
                                       ctypes.c_double, ctypes.c_double,
                                       ctypes.c_double, i32p]
    lib.stvd_meteor_corpus.restype = None
    lib.stvd_lcs_batch.argtypes = [i32p, i32p, i32p, i32p, ctypes.c_int32,
                                   i32p, i32p, i32p]
    lib.stvd_lcs_batch.restype = None
    _lib = lib
    return _lib


def _as_i32(x: Sequence[int]) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.int32))


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class Interner:
    """string -> contiguous int32 ids (tokens cross the C ABI as ids)."""

    def __init__(self):
        self._d: Dict[str, int] = {}

    def __call__(self, toks: Sequence[str]) -> np.ndarray:
        d = self._d
        out = np.empty(len(toks), np.int32)
        for i, t in enumerate(toks):
            v = d.get(t)
            if v is None:
                v = len(d)
                d[t] = v
            out[i] = v
        return out


def lcs_len(a_ids: np.ndarray, b_ids: np.ndarray) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    a = _as_i32(a_ids)
    b = _as_i32(b_ids)
    return int(lib.stvd_lcs_len(_ptr(a), len(a), _ptr(b), len(b)))


def meteor_align(hyp, hyp_stem, hyp_syn, ref, ref_stem, ref_syn
                 ) -> Optional[Tuple[int, int]]:
    """Returns (matches, chunks) or None if native lib unavailable.

    References longer than 62 tokens return None (the native beam
    resolver tracks used ref positions in a 64-bit mask); the caller's
    pure-Python resolver has no such limit."""
    lib = get_lib()
    if lib is None or len(ref) > 62:
        return None
    h, hs = _as_i32(hyp), _as_i32(hyp_stem)
    r, rs = _as_i32(ref), _as_i32(ref_stem)
    if hyp_syn is None or ref_syn is None:
        hy = ry = None
        hyp_ptr = syn_null = ctypes.cast(None, ctypes.POINTER(ctypes.c_int32))
        rp = syn_null
    else:
        hy, ry = _as_i32(hyp_syn), _as_i32(ref_syn)
        hyp_ptr, rp = _ptr(hy), _ptr(ry)
    m = ctypes.c_int32(0)
    c = ctypes.c_int32(0)
    lib.stvd_meteor_align(_ptr(h), _ptr(hs), hyp_ptr, len(h),
                          _ptr(r), _ptr(rs), rp, len(r),
                          ctypes.byref(m), ctypes.byref(c))
    return int(m.value), int(c.value)


def meteor_align_pairs(hyp, hyp_stem, hyp_syn, ref, ref_stem, ref_syn
                       ) -> Optional[List[Tuple[int, int, int]]]:
    """Chosen alignment as (hyp_pos, ref_pos, stage) triples in hyp
    order, or None if the native lib is absent / ref exceeds the
    native 62-token mask."""
    lib = get_lib()
    if lib is None or len(ref) > 62:
        return None
    h, hs = _as_i32(hyp), _as_i32(hyp_stem)
    r, rs = _as_i32(ref), _as_i32(ref_stem)
    if hyp_syn is None or ref_syn is None:
        null = ctypes.cast(None, ctypes.POINTER(ctypes.c_int32))
        hp = rp = null
    else:
        hy, ry = _as_i32(hyp_syn), _as_i32(ref_syn)
        hp, rp = _ptr(hy), _ptr(ry)
    pairs = np.zeros(max(1, len(h)) * 3, np.int32)
    n = ctypes.c_int32(0)
    m = ctypes.c_int32(0)
    c = ctypes.c_int32(0)
    lib.stvd_meteor_align_pairs(_ptr(h), _ptr(hs), hp, len(h),
                                _ptr(r), _ptr(rs), rp, len(r),
                                _ptr(pairs), ctypes.byref(n),
                                ctypes.byref(m), ctypes.byref(c))
    if n.value < 0:
        return None
    out = pairs[:n.value * 3].reshape(-1, 3)
    return [(int(a), int(b), int(s)) for a, b, s in out]


def bleu_stats(hyp_ids: np.ndarray, refs_ids: List[np.ndarray]
               ) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    """Returns (match[4], total[4], closest_ref_len) or None."""
    lib = get_lib()
    if lib is None:
        return None
    h = _as_i32(hyp_ids)
    off = np.zeros(len(refs_ids) + 1, np.int32)
    for i, r in enumerate(refs_ids):
        off[i + 1] = off[i] + len(r)
    flat = (np.concatenate([_as_i32(r) for r in refs_ids])
            if refs_ids else np.zeros(0, np.int32))
    flat = np.ascontiguousarray(flat)
    off = np.ascontiguousarray(off)
    match = np.zeros(4, np.int64)
    total = np.zeros(4, np.int64)
    closest = ctypes.c_int32(0)
    lib.stvd_bleu_stats(
        _ptr(h), len(h), _ptr(flat), _ptr(off), len(refs_ids),
        match.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        total.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(closest))
    return match, total, int(closest.value)


def cider(hyp_ids: List[np.ndarray], refs_ids: List[List[np.ndarray]],
          sigma: float = 6.0) -> Optional[np.ndarray]:
    """Per-video CIDEr-D scores, or None if the native lib is absent.

    ``hyp_ids[v]`` is the hypothesis id array of video v; ``refs_ids[v]``
    its list of reference id arrays.
    """
    lib = get_lib()
    if lib is None:
        return None
    n_vid = len(hyp_ids)
    hyp_off = np.zeros(n_vid + 1, np.int32)
    for i, h in enumerate(hyp_ids):
        hyp_off[i + 1] = hyp_off[i] + len(h)
    hyp_flat = (np.concatenate([_as_i32(h) for h in hyp_ids])
                if n_vid else np.zeros(0, np.int32))
    flat_refs: List[np.ndarray] = []
    vid_ref_off = np.zeros(n_vid + 1, np.int32)
    for v, refs in enumerate(refs_ids):
        flat_refs.extend(_as_i32(r) for r in refs)
        vid_ref_off[v + 1] = vid_ref_off[v] + len(refs)
    ref_off = np.zeros(len(flat_refs) + 1, np.int32)
    for i, r in enumerate(flat_refs):
        ref_off[i + 1] = ref_off[i] + len(r)
    ref_flat = (np.concatenate(flat_refs) if flat_refs
                else np.zeros(0, np.int32))
    hyp_flat = np.ascontiguousarray(hyp_flat)
    ref_flat = np.ascontiguousarray(ref_flat)
    out = np.zeros(n_vid, np.float64)
    lib.stvd_cider(_ptr(hyp_flat), _ptr(np.ascontiguousarray(hyp_off)),
                   _ptr(ref_flat), _ptr(np.ascontiguousarray(ref_off)),
                   _ptr(np.ascontiguousarray(vid_ref_off)),
                   np.int32(n_vid), float(sigma),
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def lcs_batch(hyp_ids, refs_ids) -> Optional[np.ndarray]:
    """LCS lengths for every (video hyp, video ref) pair in one call.

    Returns a flat int32 array ordered video-major (all of video 0's
    refs, then video 1's, ...), or None without the native lib.
    """
    lib = get_lib()
    if lib is None:
        return None

    def csr(items):
        off = np.zeros(len(items) + 1, np.int32)
        for i, x in enumerate(items):
            off[i + 1] = off[i] + len(x)
        flat = (np.concatenate([_as_i32(x) for x in items])
                if items else np.zeros(0, np.int32))
        return np.ascontiguousarray(flat), np.ascontiguousarray(off)

    h_flat, h_off = csr(hyp_ids)
    all_refs = [r for refs in refs_ids for r in refs]
    r_flat, r_off = csr(all_refs)
    pair_h, pair_r = [], []
    ri = 0
    for v, refs in enumerate(refs_ids):
        for _ in refs:
            pair_h.append(v)
            pair_r.append(ri)
            ri += 1
    ph = _as_i32(pair_h)
    pr = _as_i32(pair_r)
    out = np.zeros(len(pair_h), np.int32)
    lib.stvd_lcs_batch(_ptr(h_flat), _ptr(h_off), _ptr(r_flat), _ptr(r_off),
                       np.int32(len(pair_h)), _ptr(ph), _ptr(pr), _ptr(out))
    return out


def meteor_corpus(hyp_ids, hyp_stems, refs_ids, refs_stems,
                  alpha: float, beta: float, gamma: float
                  ) -> Optional[np.ndarray]:
    """Per-video best-ref (m, hlen, rlen, chunks), or None.

    ``hyp_ids[v]`` / ``hyp_stems[v]``: id arrays; ``refs_ids[v]`` /
    ``refs_stems[v]``: lists of id arrays.
    """
    lib = get_lib()
    if lib is None:
        return None
    n_vid = len(hyp_ids)

    def csr(items):
        off = np.zeros(len(items) + 1, np.int32)
        for i, x in enumerate(items):
            off[i + 1] = off[i] + len(x)
        flat = (np.concatenate([_as_i32(x) for x in items])
                if items else np.zeros(0, np.int32))
        return np.ascontiguousarray(flat), np.ascontiguousarray(off)

    h_flat, h_off = csr(hyp_ids)
    hs_flat, _ = csr(hyp_stems)
    all_refs = [r for refs in refs_ids for r in refs]
    all_stems = [r for refs in refs_stems for r in refs]
    r_flat, r_off = csr(all_refs)
    rs_flat, _ = csr(all_stems)
    vid_off = np.zeros(n_vid + 1, np.int32)
    for v, refs in enumerate(refs_ids):
        vid_off[v + 1] = vid_off[v] + len(refs)
    out = np.zeros(n_vid * 4, np.int32)
    lib.stvd_meteor_corpus(
        _ptr(h_flat), _ptr(hs_flat), _ptr(h_off),
        _ptr(r_flat), _ptr(rs_flat), _ptr(r_off),
        _ptr(np.ascontiguousarray(vid_off)), np.int32(n_vid),
        float(alpha), float(beta), float(gamma), _ptr(out))
    return out.reshape(n_vid, 4)


if __name__ == "__main__":
    ok = build(quiet=False)
    print("native build:", "ok" if ok else "FAILED", "->", _LIB_PATH)
