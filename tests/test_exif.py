"""EXIF codec tests (contracts from /root/reference/tests/test_exif.py)."""
import datetime
from pathlib import Path

from glimpse_tpu.exif import Exif

PATH = Path(__file__).parent / "assets" / "AK10b_20141013_020336.JPG"


def test_parses_known_fixture_values() -> None:
    exif = Exif(PATH)
    assert exif.imgsz == (800, 536)
    assert exif.fmm == 20.0
    assert exif.aperture == 8.0
    assert exif.exposure == 0.0125
    assert exif.iso == 200
    assert exif.datetime == datetime.datetime(2014, 10, 13, 2, 3, 36, 280000)
    assert exif.make == "NIKON CORPORATION"
    assert exif.model == "NIKON D200"
    assert exif.sensorsz == (23.6, 15.8)


def test_drops_thumbnail() -> None:
    exif = Exif(PATH)
    assert "thumbnail" not in exif.tags
    assert "1st" not in exif.tags


def test_retains_thumbnail() -> None:
    exif = Exif(PATH, thumbnail=True)
    assert "thumbnail" in exif.tags
    assert "1st" in exif.tags


def test_returns_empty_properties() -> None:
    exif = Exif(PATH)
    exif.tags = {}
    assert exif.datetime is None
    assert exif.exposure is None
    assert exif.fmm is None
    assert exif.imgsz is None
    assert exif.iso is None
    assert exif.make is None
    assert exif.model is None
    assert exif.sensorsz is None


def test_returns_datetime_without_subsec() -> None:
    exif = Exif(PATH)
    exif.tags["Exif"]["SubSecTimeOriginal"] = None
    assert exif.datetime == datetime.datetime(2014, 10, 13, 2, 3, 36)


def test_dumps() -> None:
    exif = Exif(PATH)
    blob = exif.dump()
    assert blob.startswith(b"Exif\x00\x00")


def test_insert_roundtrip(tmp_path) -> None:
    import shutil

    p = tmp_path / "copy.jpg"
    shutil.copy(PATH, p)
    exif = Exif(p)
    exif.tags["Exif"]["ISOSpeedRatings"] = 100
    exif.insert(p)
    new = Exif(p)
    assert new.iso == 100
    assert new.datetime == datetime.datetime(2014, 10, 13, 2, 3, 36, 280000)
    assert new.fmm == 20.0
    assert new.make == "NIKON CORPORATION"
    # Image data still decodable.
    from PIL import Image

    assert Image.open(p).size == (800, 536)
