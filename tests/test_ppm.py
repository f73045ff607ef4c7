"""PPM writer/reader parity with the reference format (main.cu:368-379)."""
import numpy as np

from raytracingincuda_tpu.utils.ppm import quantize, read_ppm, write_ppm


def test_quantize_matches_reference_rule():
    # int(256 * clamp(x, 0, 0.999))
    img = np.array([[[0.0, 0.5, 1.0]]])
    q = quantize(img)
    assert q.tolist() == [[[0, 128, 255]]]
    # 0.999 clamp prevents 256
    assert quantize(np.array([[[0.9999]]])).max() == 255


def test_write_exact_format(tmp_path):
    img = np.array(
        [[[1.0, 0.0, 0.0], [0.0, 0.5, 0.0]],
         [[0.0, 0.0, 0.25], [1.0, 1.0, 1.0]]]
    )
    p = tmp_path / "t.ppm"
    write_ppm(str(p), img)
    text = p.read_text()
    assert text == "P3\n2 2\n255\n255 0 0\n0 128 0\n0 0 64\n255 255 255\n"


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((6, 5, 3))
    p = tmp_path / "r.ppm"
    write_ppm(str(p), img)
    arr, maxval = read_ppm(str(p))
    assert maxval == 255
    assert arr.shape == (6, 5, 3)
    np.testing.assert_array_equal(arr, quantize(img))


def test_read_p6(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, (4, 3, 3), dtype=np.uint8)
    p = tmp_path / "b.ppm"
    with open(p, "wb") as f:
        f.write(b"P6\n# comment line\n3 4\n255\n")
        f.write(data.tobytes())
    arr, maxval = read_ppm(str(p))
    np.testing.assert_array_equal(arr, data)


def test_read_rejects_garbage(tmp_path):
    p = tmp_path / "bad.ppm"
    p.write_text("NOTPPM")
    try:
        read_ppm(str(p))
        assert False, "expected ValueError"
    except ValueError:
        pass
