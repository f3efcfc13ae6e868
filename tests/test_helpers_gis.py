"""GDAL-free CRS → WKT conversion (reference helpers.py:616-676)."""
import pytest

from glimpse_tpu import helpers


def test_epsg_geographic_wkt():
    wkt = helpers.crs_to_wkt(4326)
    assert wkt.startswith('GEOGCS["WGS 84"')
    assert 'SPHEROID["WGS 84",6378137,298.257223563' in wkt
    assert 'AUTHORITY["EPSG","4326"]' in wkt


def test_epsg_utm_wkt():
    # Columbia Glacier sits in UTM zone 6N: central meridian -147.
    wkt = helpers.crs_to_wkt(32606)
    assert wkt.startswith('PROJCS["WGS 84 / UTM zone 6N"')
    assert 'PROJECTION["Transverse_Mercator"]' in wkt
    assert 'PARAMETER["central_meridian",-147]' in wkt
    assert 'PARAMETER["scale_factor",0.9996]' in wkt
    assert 'AUTHORITY["EPSG","32606"]' in wkt
    south = helpers.crs_to_wkt(32706)
    assert 'PARAMETER["false_northing",10000000]' in south


def test_epsg_alaska_albers_wkt():
    wkt = helpers.crs_to_wkt(3338)
    assert 'PROJECTION["Albers_Conic_Equal_Area"]' in wkt
    assert 'GEOGCS["NAD83"' in wkt
    assert 'PARAMETER["standard_parallel_2",65]' in wkt


def test_epsg_string_designation():
    assert helpers.crs_to_wkt("EPSG:4326") == helpers.crs_to_wkt(4326)


def test_unknown_epsg_falls_back_to_identifier():
    assert helpers.crs_to_wkt(2193) == "EPSG:2193"


def test_wkt_and_proj4_pass_through():
    wkt = helpers.crs_to_wkt(32606)
    assert helpers.crs_to_wkt(wkt) == wkt
    proj4 = "+proj=utm +zone=6 +datum=WGS84"
    assert helpers.crs_to_wkt(proj4) == proj4


def test_malformed_raises():
    with pytest.raises(ValueError):
        helpers.crs_to_wkt("EPSG:abc")
    with pytest.raises(ValueError):
        helpers.crs_to_wkt("not a crs")
    with pytest.raises(ValueError):
        helpers.crs_to_wkt(3.5)
