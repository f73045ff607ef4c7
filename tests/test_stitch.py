"""Multi-host PPM assembly: per-host parts stitch bit-identically."""
import numpy as np
import pytest

from raytracingincuda_tpu.utils.ppm import read_ppm, write_ppm
from raytracingincuda_tpu.utils.stitch import (
    main as stitch_main, save_image_part, stitch_parts,
)


def _img(h=24, w=40):
    rng = np.random.default_rng(3)
    return rng.uniform(0, 1, (h, w, 3)).astype(np.float32)


def test_stitch_roundtrip(tmp_path):
    img = _img()
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    # uneven, non-row-aligned split across 3 "hosts"
    cuts = [0, 333, 700, h * w]
    paths = []
    for k in range(3):
        p = str(tmp_path / f"out.part{k}.npz")
        save_image_part(p, flat[cuts[k]:cuts[k + 1]], cuts[k], (h, w))
        paths.append(p)
    out = stitch_parts(paths)
    np.testing.assert_array_equal(out, img)


def test_stitch_cli_writes_identical_ppm(tmp_path):
    img = _img()
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    parts = []
    half = (h * w) // 2
    for k, (a, b) in enumerate([(0, half), (half, h * w)]):
        p = str(tmp_path / f"x.part{k}.npz")
        save_image_part(p, flat[a:b], a, (h, w))
        parts.append(p)
    out_ppm = str(tmp_path / "stitched.ppm")
    ref_ppm = str(tmp_path / "direct.ppm")
    stitch_main(parts + ["-o", out_ppm])
    write_ppm(ref_ppm, img.astype(np.float64))
    assert open(out_ppm).read() == open(ref_ppm).read()


def test_stitch_detects_gap(tmp_path):
    img = _img()
    h, w, _ = img.shape
    p = str(tmp_path / "only.npz")
    save_image_part(p, img.reshape(-1, 3)[: h * w - 5], 0, (h, w))
    with pytest.raises(ValueError, match="uncovered"):
        stitch_parts([p])


def test_stitch_trims_padding(tmp_path):
    """Trailing shard padding beyond the image is trimmed, as produced by
    padded pixel shards on the mesh."""
    img = _img()
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    padded = np.concatenate([flat, np.zeros((64, 3), np.float32)])
    p = str(tmp_path / "pad.npz")
    save_image_part(p, padded, 0, (h, w))
    out = stitch_parts([p])
    np.testing.assert_array_equal(out, img)
