"""Feature-bank converter: legacy pickles -> packed .npz
(SURVEY.md §2 row 12: 'a feature-bank converter (pkl/npz -> packed
arrays) is a first-class component').

Usage:
    python -m stvd.cli.convert --features FEAT.pkl [--regions REG.pkl]
        [--motion C3D.pkl] --frames 28 --out bank.npz
"""

from __future__ import annotations

import argparse
import sys

from ..data.bank import load_legacy_pickle, pack_bank


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--features", required=True,
                    help="legacy pkl: vid -> (F, D) frame features")
    ap.add_argument("--regions", help="legacy pkl: vid -> (F, R, Dr)")
    ap.add_argument("--motion", help="legacy pkl: vid -> (F, Dm)")
    ap.add_argument("--frames", type=int, default=28,
                    help="K frames to subsample/pad to")
    ap.add_argument("--out", required=True, help="output .npz path")
    args = ap.parse_args(argv)

    feats = load_legacy_pickle(args.features)
    regions = load_legacy_pickle(args.regions) if args.regions else None
    motion = load_legacy_pickle(args.motion) if args.motion else None
    bank = pack_bank(feats, args.frames, regions=regions, motion=motion)
    bank.save(args.out)
    print(f"packed {bank.n_videos} videos x {bank.n_frames} frames -> "
          f"{args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
