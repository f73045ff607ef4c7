"""CSV aggregation: the analog of the reference's
``timing-benchmarks/process.py:16-30`` — group repeated runs by config and
average the timing columns.

Usage: python benchmarks/aggregate.py timing.csv [-o avg_timing.csv]
"""
from __future__ import annotations

import argparse
import sys

import pandas as pd

GROUP_COLS = [
    "scene_id", "width", "height", "samples", "bounces", "threads",
    "impl", "dtype", "layout", "chips", "hosts",
]
VALUE_COLS = ["render_only_time_ms", "end_to_end_time_ms"]


def aggregate(df: pd.DataFrame) -> pd.DataFrame:
    group = [c for c in GROUP_COLS if c in df.columns]
    return df.groupby(group, as_index=False)[VALUE_COLS].mean()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()

    df = pd.read_csv(args.csv, comment="#")  # skip the in-CSV calibration
    avg = aggregate(df)
    out = args.out or f"avg_{args.csv}"
    avg.to_csv(out, index=False)
    print(avg.to_string(index=False), file=sys.stderr)
    print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
