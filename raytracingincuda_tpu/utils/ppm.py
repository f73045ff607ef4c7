"""PPM image I/O, byte-compatible with the reference's tooling.

Writer reproduces the reference's P3 output exactly (``main.cu:368-379``):
header ``P3\\n<W> <H>\\n255\\n`` then one ``r g b\\n`` line per pixel, row
major top-down, each channel ``int(256 * clamp(x, 0.000, 0.999))``.

Reader handles both P3 and P6 with comment lines, like the reference's
diff tools (``src/ppm_diff/ppm_diff.cpp:37-97``).
"""
from __future__ import annotations

import io
from typing import Tuple

import numpy as np


def quantize(img: np.ndarray) -> np.ndarray:
    """float (H, W, 3) -> uint8-range ints via the reference's clamp rule."""
    img = np.asarray(img, np.float64)
    clamped = np.clip(img, 0.000, 0.999)
    return (256.0 * clamped).astype(np.int32)


def write_ppm(path: str, img: np.ndarray) -> None:
    """Write float (H, W, 3) image as P3 PPM (values already gamma-encoded)."""
    q = quantize(img)
    h, w, _ = q.shape
    buf = io.StringIO()
    buf.write(f"P3\n{w} {h}\n255\n")
    flat = q.reshape(-1, 3)
    # join-based formatting: ~30x faster than a python loop at 1280x768
    lines = "\n".join(f"{r} {g} {b}" for r, g, b in flat)
    buf.write(lines)
    buf.write("\n")
    with open(path, "w") as f:
        f.write(buf.getvalue())


def _read_tokens(data: bytes):
    """Token stream over PPM header, skipping '#' comments."""
    i = 0
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c.isspace():
            i += 1
            continue
        if c == b"#":
            while i < n and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not data[j : j + 1].isspace():
            j += 1
        yield data[i:j], j
        i = j


def read_ppm(path: str) -> Tuple[np.ndarray, int]:
    """Read P3 or P6 PPM. Returns (uint16 array (H, W, 3), maxval)."""
    with open(path, "rb") as f:
        data = f.read()

    toks = _read_tokens(data)
    magic, _ = next(toks)
    if magic not in (b"P3", b"P6"):
        raise ValueError(f"not a P3/P6 PPM: magic={magic!r}")
    w, _ = next(toks)
    h, _ = next(toks)
    maxval, end = next(toks)
    w, h, maxval = int(w), int(h), int(maxval)

    if magic == b"P6":
        if maxval > 255:
            # 2-byte big-endian samples; slicing 1 byte/sample would
            # silently return garbage values
            raise NotImplementedError(
                f"P6 with maxval {maxval} > 255 (16-bit) is not supported"
            )
        raw = data[end + 1 : end + 1 + w * h * 3]
        if len(raw) != w * h * 3:
            raise ValueError("truncated P6 payload")
        arr = np.frombuffer(raw, np.uint8).astype(np.uint16)
    else:
        # strip plain-PPM comment lines from the raster too (the header
        # tokenizer already skips them)
        lines = [
            ln.split(b"#", 1)[0] for ln in data[end:].splitlines()
        ]
        vals = np.array(b" ".join(lines).split(), dtype=np.uint16)
        if vals.size != w * h * 3:
            raise ValueError(
                f"P3 payload has {vals.size} values, expected {w * h * 3}"
            )
        arr = vals
    return arr.reshape(h, w, 3), maxval
