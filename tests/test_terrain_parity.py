"""Terrain parity: polar viewshed/horizon vs reference-exact goldens.

``tests/golden_terrain.py`` holds independently written reference-semantics
implementations (ring sweep, Bresenham ray walk). These tests (a) verify the
package's ``method='rings'`` viewshed is equivalent to the golden, and
(b) bound the dense polar formulations' disagreement on random smooth DEMs,
classifying where the differences sit (grazing visibility boundaries).
"""
import numpy as np
import pytest
import scipy.ndimage

from glimpse_tpu.raster import Raster

from golden_terrain import ray_walk_horizon, ring_sweep_viewshed


def _random_dem(seed: int, size: int = 72, nan_hole: bool = False) -> Raster:
    rng = np.random.default_rng(seed)
    z = scipy.ndimage.gaussian_filter(rng.normal(size=(size, size)), 5) * 150
    if nan_hole:
        z[8:14, 20:30] = np.nan
    return Raster(z, x=(0, size * 10.0), y=(size * 10.0, 0))


def _origin(raster: Raster, fx: float, fy: float, up: float = 15.0):
    x = float(raster.xlim[1]) * fx
    y = float(raster.ylim[0]) * fy
    z = float(raster.sample(np.array([[x, y]]))[0]) + up
    return (x, y, z)


@pytest.mark.parametrize("seed,fx,fy", [(0, 0.45, 0.55), (1, 0.3, 0.6), (2, 0.65, 0.35)])
def test_rings_method_matches_golden(seed, fx, fy) -> None:
    dem = _random_dem(seed)
    origin = _origin(dem, fx, fy)
    got = dem.viewshed(origin, method="rings")
    want = ring_sweep_viewshed(dem, origin)
    np.testing.assert_array_equal(got, want)


def test_rings_method_matches_golden_with_nans_and_correction() -> None:
    dem = _random_dem(3, nan_hole=True)
    origin = _origin(dem, 0.5, 0.5)
    got = dem.viewshed(origin, method="rings", correction=True)
    want = ring_sweep_viewshed(dem, origin, correction=True)
    np.testing.assert_array_equal(got, want)


def test_polar_viewshed_agreement_bound() -> None:
    """The polar viewshed agrees with the reference on >=98% of cells, and
    every disagreeing cell sits on a visibility boundary (has an opposite-
    class neighbor in the reference solution)."""
    agreements = []
    for seed, fx, fy in [(0, 0.45, 0.55), (1, 0.3, 0.6), (2, 0.65, 0.35)]:
        dem = _random_dem(seed)
        origin = _origin(dem, fx, fy)
        polar = dem.viewshed(origin, oversample=4.0)
        exact = ring_sweep_viewshed(dem, origin)
        agree = (polar == exact).mean()
        agreements.append(agree)
        assert agree >= 0.98, f"seed {seed}: agreement {agree:.4f}"
        # Classify: disagreements must hug the reference's class boundary.
        diff = polar != exact
        boundary = np.zeros_like(exact)
        boundary[:-1] |= exact[:-1] != exact[1:]
        boundary[1:] |= exact[:-1] != exact[1:]
        boundary[:, :-1] |= exact[:, :-1] != exact[:, 1:]
        boundary[:, 1:] |= exact[:, :-1] != exact[:, 1:]
        near_boundary = scipy.ndimage.binary_dilation(boundary, iterations=2)
        interior_misses = diff & ~near_boundary
        assert interior_misses.mean() < 0.002, (
            f"seed {seed}: {interior_misses.sum()} disagreements away from "
            "visibility boundaries"
        )
    assert np.mean(agreements) >= 0.98


def test_polar_horizon_matches_ray_walk() -> None:
    """Polar horizon points land within one ray step of the golden's."""
    dem = _random_dem(4)
    origin = _origin(dem, 0.5, 0.5, up=25.0)
    golden = ray_walk_horizon(dem, origin, headings=range(0, 360, 5))
    segments = dem.horizon(origin, headings=range(0, 360, 5))
    mine = np.vstack(segments) if segments else np.zeros((0, 3))
    # Compare per-heading horizon elevation angles (robust to the exact
    # cell/sample the maximum lands on).
    def angles(points):
        d = np.linalg.norm(points[:, 0:2] - np.asarray(origin[0:2]), axis=1)
        return (points[:, 2] - origin[2]) / d

    golden_valid = golden[~np.isnan(golden[:, 0])]
    assert len(golden_valid) and len(mine)
    g = np.sort(angles(golden_valid))
    m = np.sort(angles(mine))
    # Angle distributions agree closely (same count within a few headings).
    assert abs(len(g) - len(m)) <= len(golden) * 0.1
    k = min(len(g), len(m))
    # Compare matching quantiles of the two angle sets.
    qs = np.linspace(0, 1, 19)
    gq = np.quantile(g, qs)
    mq = np.quantile(m, qs)
    np.testing.assert_allclose(mq, gq, atol=0.01)
