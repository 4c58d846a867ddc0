"""Generate TRUE Python-2 pickle byte streams for the legacy-ingestion
tests — without a Python 2 interpreter.

The reference's artifacts (worddict.pkl / CAP.pkl / FEAT pickles,
reference ``data_engine.py`` — SURVEY.md §2 row 5) were written by
Python 2, whose pickles differ from anything Python 3 can emit
directly: Py2 ``str`` pickles as SHORT_BINSTRING/BINSTRING (raw bytes),
and Py2 numpy arrays carry their raw buffer as such a string.  That is
exactly why ``pickle.load(..., encoding='latin1')`` exists — and what
round 1's tests (protocol-2 pickles written FROM Py3) never exercised.

This module hand-assembles the opcode stream Python 2's pickle
(protocol 2) emits for dicts/lists/str/int/numpy arrays.  Run as a
script to (re)generate the committed ``py2_*.pkl`` fixtures:

    python tests/fixtures/gen_py2_fixture.py [outdir]
"""

from __future__ import annotations

import struct
import sys

PROTO = b"\x80\x02"
STOP = b"."


def p2_str(b: bytes) -> bytes:
    """A Python-2 ``str`` (raw bytes): SHORT_BINSTRING / BINSTRING."""
    if len(b) < 256:
        return b"U" + bytes([len(b)]) + b
    return b"T" + struct.pack("<i", len(b)) + b


def p2_int(n: int) -> bytes:
    if 0 <= n < 256:
        return b"K" + bytes([n])
    if 0 <= n < 65536:
        return b"M" + struct.pack("<H", n)
    return b"J" + struct.pack("<i", n)


def p2_none() -> bytes:
    return b"N"


def p2_bool(v: bool) -> bytes:
    return b"\x88" if v else b"\x89"


def p2_tuple(*items: bytes) -> bytes:
    if not items:
        return b")"
    if len(items) == 1:
        return items[0] + b"\x85"
    if len(items) == 2:
        return items[0] + items[1] + b"\x86"
    if len(items) == 3:
        return items[0] + items[1] + items[2] + b"\x87"
    return b"(" + b"".join(items) + b"t"


def p2_list(items) -> bytes:
    return b"]" + (b"(" + b"".join(items) + b"e" if items else b"")


def p2_dict(pairs) -> bytes:
    return b"}" + (b"(" + b"".join(k + v for k, v in pairs) + b"u"
                   if pairs else b"")


def p2_global(module: bytes, name: bytes) -> bytes:
    return b"c" + module + b"\n" + name + b"\n"


def p2_dtype(descr: bytes, byteorder: bytes = b"<") -> bytes:
    """numpy dtype exactly as Py2 numpy pickled it:
    dtype('f4', 0, 1) REDUCE then BUILD with the 8-tuple state."""
    call = (p2_global(b"numpy", b"dtype")
            + p2_tuple(p2_str(descr), p2_int(0), p2_int(1)) + b"R")
    state = p2_tuple(p2_int(3), p2_str(byteorder), p2_none(), p2_none(),
                     p2_none(), b"J\xff\xff\xff\xff", b"J\xff\xff\xff\xff",
                     p2_int(0))
    return call + state + b"b"


def p2_ndarray(data: bytes, shape, descr: bytes = b"f4") -> bytes:
    """numpy array as Py2 numpy's __reduce__ emitted it:
    _reconstruct(ndarray, (0,), 'b') then BUILD with
    (1, shape, dtype, fortran=False, raw-data-as-py2-str)."""
    call = (p2_global(b"numpy.core.multiarray", b"_reconstruct")
            + p2_tuple(p2_global(b"numpy", b"ndarray"),
                       p2_tuple(p2_int(0)), p2_str(b"b")) + b"R")
    state = p2_tuple(p2_int(1),
                     p2_tuple(*[p2_int(s) for s in shape]),
                     p2_dtype(descr), p2_bool(False), p2_str(data))
    return call + state + b"b"


def pickle_bytes(body: bytes) -> bytes:
    return PROTO + body + STOP


# ---------------------------------------------------------------------------
# The fixtures
# ---------------------------------------------------------------------------

def worddict_fixture() -> bytes:
    """worddict.pkl: {py2 str: int} with the reference's 0=EOS 1=UNK
    convention implied (real words start at 2).  Includes a latin1
    byte (0xe9 = 'é') to prove the latin1 decode path."""
    pairs = [(p2_str(b"a"), p2_int(2)),
             (p2_str(b"man"), p2_int(3)),
             (p2_str(b"is"), p2_int(4)),
             (p2_str(b"playing"), p2_int(5)),
             (p2_str(b"guitar"), p2_int(6)),
             (p2_str(b"caf\xe9"), p2_int(7))]
    return pickle_bytes(p2_dict(pairs))


def cap_fixture() -> bytes:
    """CAP.pkl: {vid: [{'caption': str, 'tokenized': str, ...}]}."""
    def rec(caption: bytes, tokenized: bytes) -> bytes:
        return p2_dict([(p2_str(b"caption"), p2_str(caption)),
                        (p2_str(b"tokenized"), p2_str(tokenized)),
                        (p2_str(b"image_id"), p2_str(b"vid1"))])

    return pickle_bytes(p2_dict([
        (p2_str(b"vid1"),
         p2_list([rec(b"A man is playing guitar.",
                      b"a man is playing guitar"),
                  rec(b"a man plays guitar", b"a man plays guitar")])),
        (p2_str(b"vid2"),
         p2_list([rec(b"a man is playing caf\xe9 music",
                      b"a man is playing caf\xe9 music")])),
        (p2_str(b"vid3"),
         p2_list([rec(b"a man is playing", b"a man is playing")])),
    ]))


def feat_fixture() -> bytes:
    """FEAT.pkl: {vid: (F, D) float32} with raw buffers full of
    bytes > 127 (any real float has them) — the latin1 round-trip is
    load-bearing here, not decorative."""
    import numpy as np
    rng = np.random.RandomState(0)
    vids = [b"vid1", b"vid2", b"vid3"]
    pairs = []
    for i, v in enumerate(vids):
        arr = rng.randn(4 + i, 6).astype("<f4")  # ragged frame counts
        pairs.append((p2_str(v),
                      p2_ndarray(arr.tobytes(), arr.shape, b"f4")))
    return pickle_bytes(p2_dict(pairs))


def expected_feats():
    """The numpy arrays feat_fixture() encodes (for assertions)."""
    import numpy as np
    rng = np.random.RandomState(0)
    return {f"vid{i + 1}": rng.randn(4 + i, 6).astype("<f4")
            for i in range(3)}


FIXTURES = {"py2_worddict.pkl": worddict_fixture,
            "py2_CAP.pkl": cap_fixture,
            "py2_FEAT.pkl": feat_fixture}


def main(outdir: str) -> None:
    import os
    os.makedirs(outdir, exist_ok=True)
    for name, fn in FIXTURES.items():
        path = os.path.join(outdir, name)
        with open(path, "wb") as f:
            f.write(fn())
        print("wrote", path)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         __import__("os").path.dirname(__import__("os").path.abspath(__file__)))
