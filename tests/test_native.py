"""Native C++ feeder kernels: correctness vs NumPy/SciPy golden values."""
import numpy as np
import pytest
import scipy.ndimage

from glimpse_tpu import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native feeder library not built")


def test_gray_f32(lib_available) -> None:
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 80, 3)).astype(np.uint8)
    got = native.gray_f32(img)
    np.testing.assert_allclose(got, img.astype(np.float32).mean(axis=2), atol=1e-3)
    # Grayscale input passes through.
    mono = rng.integers(0, 255, (64, 80)).astype(np.uint8)
    np.testing.assert_allclose(native.gray_f32(mono), mono.astype(np.float32))


def test_extract_tiles_f32(lib_available) -> None:
    rng = np.random.default_rng(1)
    img = rng.normal(size=(100, 120)).astype(np.float32)
    corners = np.array([[0, 0], [50, 60], [95, 115], [-5, 200]], dtype=np.int32)
    tiles = native.extract_tiles_f32(img, corners, (10, 12))
    np.testing.assert_array_equal(tiles[0], img[0:10, 0:12])
    np.testing.assert_array_equal(tiles[1], img[50:60, 60:72])
    # Out-of-bounds corners clamp.
    np.testing.assert_array_equal(tiles[2], img[90:100, 108:120])
    np.testing.assert_array_equal(tiles[3], img[0:10, 108:120])


def test_normalize_tiles_f32(lib_available) -> None:
    rng = np.random.default_rng(2)
    tiles = rng.normal(3, 5, size=(8, 15, 15)).astype(np.float32)
    out = native.normalize_tiles_f32(tiles.copy())
    for t in out:
        assert abs(t.mean()) < 1e-4
        assert abs(t.std() - 1) < 1e-3


def test_median_highpass_matches_scipy(lib_available) -> None:
    rng = np.random.default_rng(3)
    tiles = rng.normal(size=(5, 31, 33)).astype(np.float32)
    got = native.median_highpass_f32(tiles, (5, 5))
    expected = tiles - np.stack(
        [scipy.ndimage.median_filter(t, size=(5, 5)) for t in tiles]
    )
    np.testing.assert_allclose(got, expected, atol=1e-5)
