"""Batch golden-image diffing: the analog of the reference's
``timing-benchmarks/ppm_diff.sh:50-117``, which pairs two directories of
PPM renders (by mtime order) and diffs each pair.

This version pairs by filename when names match (more robust than mtime)
and falls back to sorted order otherwise; it uses the native tools/bin
binaries when built, else the pure-python reader.

Usage: python benchmarks/batch_diff.py dirA dirB [--outdir diffs]
       [--scaled] [--tolerance N]
Exit code 1 if any pair exceeds --tolerance max abs diff (CI gate).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import glob
import subprocess

import numpy as np

from raytracingincuda_tpu.utils.ppm import read_ppm

TOOLS_BIN = os.path.join(os.path.dirname(__file__), "..", "tools", "bin")


def pair_files(dir_a: str, dir_b: str):
    a = sorted(glob.glob(os.path.join(dir_a, "*.ppm")))
    b = sorted(glob.glob(os.path.join(dir_b, "*.ppm")))
    by_name_b = {os.path.basename(p): p for p in b}
    pairs = []
    for pa in a:
        name = os.path.basename(pa)
        if name in by_name_b:
            pairs.append((pa, by_name_b[name]))
    if not pairs:  # fall back to positional pairing (reference behavior)
        pairs = list(zip(a, b))
    return pairs


def diff_pair(pa: str, pb: str, out: str, scaled: bool) -> int:
    tool = os.path.join(TOOLS_BIN,
                        "scaled_ppm_diff" if scaled else "ppm_diff")
    if os.path.exists(tool):
        r = subprocess.run([tool, pa, pb, out], capture_output=True,
                           text=True)
        if r.returncode != 0:
            raise RuntimeError(r.stderr.strip())
        for tokpair in r.stdout.split():
            if tokpair.startswith("max_abs_diff="):
                return int(tokpair.split("=")[1])
        # scaled tool prints raw_max
        for tokpair in r.stdout.split():
            if tokpair.startswith("raw_max="):
                return int(tokpair.split("=")[1])
        return 0
    ia, _ = read_ppm(pa)
    ib, _ = read_ppm(pb)
    return int(np.abs(ia.astype(int) - ib.astype(int)).max())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dir_a")
    ap.add_argument("dir_b")
    ap.add_argument("--outdir", default="diffs")
    ap.add_argument("--scaled", action="store_true")
    ap.add_argument("--tolerance", type=int, default=255,
                    help="fail if any pair's max abs diff exceeds this")
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    pairs = pair_files(args.dir_a, args.dir_b)
    if not pairs:
        print("no ppm pairs found", file=sys.stderr)
        return 2

    worst = 0
    for pa, pb in pairs:
        out = os.path.join(args.outdir,
                           "diff_" + os.path.basename(pa))
        m = diff_pair(pa, pb, out, args.scaled)
        worst = max(worst, m)
        status = "OK " if m <= args.tolerance else "FAIL"
        print(f"{status} max_abs_diff={m:4d}  {os.path.basename(pa)}")

    print(f"{len(pairs)} pairs, worst max_abs_diff={worst}")
    return 0 if worst <= args.tolerance else 1


if __name__ == "__main__":
    sys.exit(main())
