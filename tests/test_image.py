"""Image class tests (contracts from /root/reference/tests/test_image.py)."""
import datetime
from datetime import datetime as _dt
from pathlib import Path

import numpy as np

from glimpse_tpu.image import Image

PATH = Path(__file__).parent / "assets" / "AK10b_20141013_020336.JPG"


def test_initializes_with_attributes_from_file() -> None:
    img = Image(PATH)
    assert img.path == str(PATH)
    assert img.datetime == img.exif.datetime
    np.testing.assert_equal(img.cam.imgsz, img.exif.imgsz)
    np.testing.assert_allclose(
        img.cam.f, img.exif.fmm * np.divide(img.exif.imgsz, img.exif.sensorsz)
    )
    np.testing.assert_equal(img.size, img.cam.imgsz)


def test_initializes_with_custom_attributes() -> None:
    args = {
        "cam": {"imgsz": (100, 100), "sensorsz": (10, 10)},
        "datetime": datetime.datetime(2010, 1, 1),
    }
    img = Image(PATH, **args)
    assert img.datetime == args["datetime"]
    np.testing.assert_equal(img.cam.imgsz, args["cam"]["imgsz"])
    np.testing.assert_allclose(
        img.cam.f,
        img.exif.fmm * np.divide(args["cam"]["imgsz"], args["cam"]["sensorsz"]),
    )
    np.testing.assert_equal(img.size, args["cam"]["imgsz"])


def test_skips_exif_when_fully_specified() -> None:
    img = Image(
        PATH,
        cam={"imgsz": (800, 536), "sensorsz": (23.6, 15.8), "fmm": 20},
        datetime=datetime.datetime(2014, 10, 13, 2, 3, 36, 280000),
    )
    assert img.exif is None


def test_reads_data_from_file() -> None:
    img = Image(PATH)
    A = img.read()
    np.testing.assert_equal(A.shape[0:2][::-1], img.cam.imgsz)
    x, y, w, h = 0, 5, 100, 94
    box = x, y, x + w, y + h
    a = img.read(box, cache=True)
    assert a.shape[0:2][::-1] == (w, h)
    np.testing.assert_equal(a, A[y : (y + h), x : (x + w)])
    img = Image(PATH)
    a_nc = img.read(box, cache=False)
    np.testing.assert_equal(a, a_nc)
    img.cam.resize(0.5)
    A = img.read()
    np.testing.assert_equal(A.shape[0:2][::-1], img.cam.imgsz)


def test_projects_into_camera() -> None:
    img = Image(PATH)
    img.cam.resize(0.1)
    A = img.project(img.cam, method="nearest")
    original = img.read()
    finite = ~np.isnan(A[1:, :, 0])
    np.testing.assert_equal(A[1:][finite], original[1:][finite].astype(float))


def test_projects_into_rotated_camera() -> None:
    img = Image(PATH)
    img.cam.resize(0.2)
    cam = img.cam.copy()
    cam.viewdir = (3, 2, 0)
    A = img.project(cam)
    assert A.shape[0:2] == tuple(img.cam.imgsz[::-1])
    # Rotating right/up pushes content to lower-left; upper-right is empty.
    assert np.isnan(A[0, -1]).all()
    assert np.isfinite(A[-1, 0]).all()


def test_concurrent_first_read_decodes_once(tmp_path):
    """Parallel first reads share one decode and one cached array."""
    import threading

    from PIL import Image as PILImage

    path = tmp_path / "img.png"
    PILImage.fromarray(np.arange(60 * 40, dtype=np.uint8).reshape(60, 40) % 255).save(
        path
    )
    img = Image(path, cam={"imgsz": (40, 60), "f": 100}, datetime=_dt.now())

    decodes = []
    original_open = PILImage.open

    def counting_open(*args, **kwargs):
        decodes.append(1)
        return original_open(*args, **kwargs)

    results = []
    PILImage.open = counting_open
    try:
        threads = [
            threading.Thread(target=lambda: results.append(img.read(cache=True)))
            for _ in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        PILImage.open = original_open
    assert len(results) == 8
    for r in results[1:]:
        assert r is results[0]  # all threads share the cached array
    assert len(decodes) == 1  # the file was decoded exactly once


def test_image_pickles_without_lock(tmp_path):
    import pickle

    from PIL import Image as PILImage

    path = tmp_path / "img.png"
    PILImage.fromarray(np.zeros((8, 8), dtype=np.uint8)).save(path)
    img = Image(path, cam={"imgsz": (8, 8), "f": 10}, datetime=_dt.now())
    clone = pickle.loads(pickle.dumps(img))
    assert clone.read(cache=False).shape == (8, 8)
