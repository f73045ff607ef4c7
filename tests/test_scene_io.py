"""Scene asset import/export (models/io.py): npz and csv round-trips."""
import numpy as np
import jax.numpy as jnp
import pytest

from raytracingincuda_tpu.models.io import (
    load_scene, save_scene, scene_from_arrays,
)
from raytracingincuda_tpu.models.scene import (
    DIELECTRIC, LAMBERTIAN, METAL, build_scene,
)


def _active_arrays(scene):
    keep = np.flatnonzero(np.asarray(scene.active))
    p = scene.params
    return {
        "center": np.stack([np.asarray(p.center.x), np.asarray(p.center.y),
                            np.asarray(p.center.z)], 1)[keep],
        "radius": np.asarray(p.radius)[keep],
        "albedo": np.stack([np.asarray(p.albedo.x), np.asarray(p.albedo.y),
                            np.asarray(p.albedo.z)], 1)[keep],
        "fuzz": np.asarray(p.fuzz)[keep],
        "ior": np.asarray(p.ior)[keep],
        "mat": np.asarray(scene.mat_type)[keep],
    }


@pytest.mark.parametrize("ext", ["npz", "csv"])
def test_round_trip(tmp_path, ext):
    scene = build_scene(2)
    path = str(tmp_path / f"scene2.{ext}")
    save_scene(path, scene)
    loaded = load_scene(path)
    a, b = _active_arrays(scene), _active_arrays(loaded)
    assert a["mat"].shape == b["mat"].shape
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-6, atol=0)
    # padding restored to the standard slot multiple
    assert loaded.num_slots % 128 == 0


def test_csv_hand_written(tmp_path):
    path = tmp_path / "tiny.csv"
    path.write_text(
        "# a comment\n"
        "\n"
        "0,-1000,0,1000,lambertian,0.5,0.5,0.5,0,1\n"
        "0,1,0,1,dielectric,0,0,0,0,1.5\n"
        "4,1,0,1,metal,0.7,0.6,0.5,0.1,1\n"
        "2,1,0,1,1,0.9,0.9,0.9,0.2,1\n"     # integer mat id
    )
    scene = load_scene(str(path))
    a = _active_arrays(scene)
    assert a["mat"].tolist() == [LAMBERTIAN, DIELECTRIC, METAL, METAL]
    np.testing.assert_allclose(a["ior"], [1.0, 1.5, 1.0, 1.0])
    np.testing.assert_allclose(a["fuzz"], [0.0, 0.0, 0.1, 0.2])


def test_csv_errors(tmp_path):
    bad = tmp_path / "bad.csv"
    bad.write_text("1,2,3\n")
    with pytest.raises(ValueError, match="expected 10 fields"):
        load_scene(str(bad))
    empty = tmp_path / "empty.csv"
    empty.write_text("# nothing\n")
    with pytest.raises(ValueError, match="no spheres"):
        load_scene(str(empty))
    with pytest.raises(ValueError, match="unsupported scene format"):
        load_scene(str(tmp_path / "scene.obj"))


def test_scene_from_arrays_defaults_and_validation():
    s = scene_from_arrays(
        center=[[0, 0, -1]], radius=[0.5], mat_type=[LAMBERTIAN],
        pad_to_multiple=8,
    )
    assert s.num_slots == 8
    assert int(np.asarray(s.active).sum()) == 1
    # parked padding never hits: far below the world
    assert float(np.asarray(s.params.center.y)[-1]) == -1.0e6
    with pytest.raises(ValueError, match="mat_type"):
        scene_from_arrays([[0, 0, 0]], [1.0], [7])


def test_loaded_scene_renders_identically(tmp_path):
    """A saved+loaded scene is the same pytree content -> same render
    (same program, same arrays; float32 storage is exact)."""
    from raytracingincuda_tpu.models.camera import CameraConfig
    from raytracingincuda_tpu.ops.tracer import render

    scene = build_scene(2)
    path = str(tmp_path / "s.npz")
    save_scene(path, scene)
    loaded = load_scene(path)
    cam = CameraConfig.reference_default()
    img_a = render(scene, cam, 32, 20, 2, 4)
    img_b = render(loaded, cam, 32, 20, 2, 4)
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
