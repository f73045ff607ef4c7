"""Native C++ diff tool tests: build with make, verify against numpy."""
import os
import shutil
import subprocess

import numpy as np
import pytest

from raytracingincuda_tpu.utils.ppm import quantize, read_ppm, write_ppm

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


@pytest.fixture(scope="module")
def built_tools():
    if shutil.which("make") is None or shutil.which("g++") is None:
        pytest.skip("no native toolchain")
    subprocess.run(["make", "-C", TOOLS], check=True, capture_output=True)
    return {
        "ppm_diff": os.path.join(TOOLS, "bin", "ppm_diff"),
        "scaled_ppm_diff": os.path.join(TOOLS, "bin", "scaled_ppm_diff"),
    }


@pytest.fixture
def two_images(tmp_path):
    rng = np.random.default_rng(3)
    a = rng.random((8, 6, 3))
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1)
    pa, pb = str(tmp_path / "a.ppm"), str(tmp_path / "b.ppm")
    write_ppm(pa, a)
    write_ppm(pb, b)
    return pa, pb, quantize(a), quantize(b)


def test_ppm_diff_matches_numpy(built_tools, two_images, tmp_path):
    pa, pb, qa, qb = two_images
    out = str(tmp_path / "d.ppm")
    r = subprocess.run([built_tools["ppm_diff"], pa, pb, out],
                       capture_output=True, text=True, check=True)
    arr, _ = read_ppm(out)
    np.testing.assert_array_equal(arr, np.abs(qa - qb))
    assert f"max_abs_diff={np.abs(qa - qb).max()}" in r.stdout


def test_scaled_ppm_diff(built_tools, two_images, tmp_path):
    pa, pb, qa, qb = two_images
    out = str(tmp_path / "s.ppm")
    subprocess.run([built_tools["scaled_ppm_diff"], pa, pb, out],
                   capture_output=True, check=True)
    arr, _ = read_ppm(out)
    d = np.abs(qa - qb)
    lo, hi = d.min(), d.max()
    expected = (d - lo) * 255 // (hi - lo) if hi > lo else np.zeros_like(d)
    np.testing.assert_array_equal(arr, expected)
    assert arr.max() == 255  # rescaled to full range


def test_identical_images_black(built_tools, two_images, tmp_path):
    pa, _, _, _ = two_images
    out = str(tmp_path / "z.ppm")
    subprocess.run([built_tools["scaled_ppm_diff"], pa, pa, out],
                   capture_output=True, check=True)
    arr, _ = read_ppm(out)
    assert arr.max() == 0


def test_dimension_mismatch_rejected(built_tools, tmp_path):
    a = np.zeros((4, 4, 3))
    b = np.zeros((4, 5, 3))
    pa, pb = str(tmp_path / "a.ppm"), str(tmp_path / "b.ppm")
    write_ppm(pa, a)
    write_ppm(pb, b)
    r = subprocess.run(
        [built_tools["ppm_diff"], pa, pb, str(tmp_path / "o.ppm")],
        capture_output=True, text=True,
    )
    assert r.returncode != 0
    assert "mismatch" in r.stderr
