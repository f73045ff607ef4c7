"""CLI contract tests: the reference's flags, stdout timing format and
output filename convention (main.cu:38-77, 342-343, 349-358, 397-398)."""
import os
import re
import subprocess
import sys

import numpy as np
import pytest

from raytracingincuda_tpu.config import RenderConfig
from raytracingincuda_tpu.utils.ppm import read_ppm

REPO = os.path.join(os.path.dirname(__file__), "..")


def run_cli(*extra, cwd):
    return subprocess.run(
        [sys.executable, "-m", "raytracingincuda_tpu.cli",
         "--platform", "cpu", *extra],
        capture_output=True, text=True, cwd=str(cwd),
        env={**os.environ, "PYTHONPATH": REPO + os.pathsep
             + os.environ.get("PYTHONPATH", "")},
        timeout=540,
    )


def test_scene_id_required(tmp_path):
    r = run_cli(cwd=tmp_path)
    assert r.returncode == 1
    assert "scene_id (or --scene_file) is required" in r.stderr


@pytest.mark.slow
def test_render_contract(tmp_path):
    r = run_cli("--scene_id", "2", "--width", "40", "--height", "24",
                "--samples", "2", "--bounces", "4", cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    # stdout timing contract: "render_ms,e2e_ms" as two 15-wide fixed fields
    line = r.stdout.strip().splitlines()[-1]
    m = re.match(r"^\s*(\d+\.\d{8}),\s*(\d+\.\d{8})$", line)
    assert m, f"bad timing line: {line!r}"
    assert float(m.group(1)) <= float(m.group(2))
    # output file follows the reference naming convention
    expected = RenderConfig(
        scene_id=2, width=40, height=24, samples=2, bounces=4
    ).output_filename()
    # default layout is vmem (scene VMEM-resident) -> 'const' tag
    assert expected == ("const_float_scene2_40x24_2samples_4bounces_"
                        "8threadsPerBlockRow.ppm")
    path = tmp_path / expected
    assert path.exists()
    arr, maxval = read_ppm(str(path))
    assert maxval == 255
    assert arr.shape == (24, 40, 3)
    assert arr.max() > 100  # sky is bright


@pytest.mark.slow
def test_scene_file_render(tmp_path):
    """--scene_file: render an asset (models/io.py) instead of a built-in
    scene id, exercising save -> CLI load -> render end-to-end."""
    from raytracingincuda_tpu.models.io import save_scene
    from raytracingincuda_tpu.models.scene import build_scene

    asset = tmp_path / "asset.npz"
    save_scene(str(asset), build_scene(2))
    r = run_cli("--scene_file", str(asset), "--width", "40", "--height",
                "24", "--samples", "2", "--bounces", "4", cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    line = r.stdout.strip().splitlines()[-1]
    assert re.match(r"^\s*(\d+\.\d{8}),\s*(\d+\.\d{8})$", line)
    out = tmp_path / RenderConfig(
        scene_id=0, width=40, height=24, samples=2, bounces=4
    ).output_filename()
    assert out.exists()
    arr, _ = read_ppm(str(out))
    assert arr.shape == (24, 40, 3)
    assert arr.max() > 100


@pytest.mark.slow
def test_impl_stream_render(tmp_path):
    """--impl stream: the HBM-streamed path through the public CLI
    surface (interpret mode on CPU), image close to the oracle's."""
    r = run_cli("--scene_id", "2", "--width", "40", "--height", "24",
                "--samples", "2", "--bounces", "4", "--impl", "stream",
                cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    out = tmp_path / RenderConfig(
        scene_id=2, width=40, height=24, samples=2, bounces=4
    ).output_filename()
    assert out.exists()
    arr, _ = read_ppm(str(out))

    ro = run_cli("--scene_id", "2", "--width", "40", "--height", "24",
                 "--samples", "2", "--bounces", "4", "--impl", "oracle",
                 cwd=tmp_path)
    assert ro.returncode == 0, ro.stderr
    arr_o, _ = read_ppm(str(out))
    # Two different PROGRAMS (separate CLI processes): the camera row's
    # cross-program fusion channel (UPSTREAM_ISSUES.md #7) can flip a
    # knife-edge hit on ~0.1% of pixels, changing a whole sample there —
    # never assert bit-equality across programs. In-program bit parity
    # vs the oracle is pinned by test_stream.py; here assert statistical
    # agreement.
    d = np.abs(arr.astype(int) - arr_o.astype(int))
    assert (d > 1).mean() < 0.01 and d.mean() < 1.0, (
        d.max(), (d > 1).mean(), d.mean()
    )


def test_config_validation():
    with pytest.raises(ValueError):
        RenderConfig(scene_id=1, width=0)
    with pytest.raises(ValueError):
        RenderConfig(scene_id=1, dtype="float16")
    with pytest.raises(ValueError):
        RenderConfig(scene_id=1, layout="texture")


def test_filename_axes():
    f = RenderConfig(scene_id=1, dtype="float64", layout="packed",
                     impl="oracle").output_filename()
    assert f.startswith("tex_double_scene1_")
    f = RenderConfig(scene_id=1, dtype="float32", layout="vmem",
                     impl="oracle").output_filename()
    assert f.startswith("const_float_scene1_")


def test_ray_tile_knob():
    from raytracingincuda_tpu.config import RenderConfig

    base = dict(scene_id=1, samples=100, bounces=25)
    # auto: big images get 1024, small get 512
    assert RenderConfig(width=1280, height=768, **base
                        ).effective_ray_tile() == 1024
    assert RenderConfig(width=320, height=192, **base
                        ).effective_ray_tile() == 512
    assert RenderConfig(width=320, height=192, ray_tile=1024, **base
                        ).effective_ray_tile() == 1024
    with pytest.raises(ValueError, match="ray_tile"):
        RenderConfig(width=320, height=192, ray_tile=100, **base)
    # K auto: 16 at high spp (the round-2 production point)
    assert RenderConfig(width=1280, height=768, **base
                        ).effective_pixels_per_lane() == 16
