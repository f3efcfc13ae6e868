"""Grid/Raster tests: reference numerical contracts
(/root/reference/tests/test_raster.py) plus terrain-op validation."""
import datetime
import itertools
from pathlib import Path

import numpy as np
import pytest

from glimpse_tpu.raster import Grid, Raster, RasterInterpolant

ASSETS = Path(__file__).parent / "assets"


def test_initializes_default_raster() -> None:
    Z = np.zeros((4, 3))
    dem = Raster(Z)
    assert all(dem.xlim == (0, Z.shape[1]))
    assert all(dem.ylim == (0, Z.shape[0]))
    assert all(dem.zlim == (Z.min(), Z.max()))
    assert all(dem.size == Z.shape[::-1])
    assert all(dem.d == (1, 1))
    assert all(dem.min == (0, 0))
    assert all(dem.max == Z.shape[::-1])
    assert all(dem.x == (0.5, 1.5, 2.5))
    assert all(dem.y == (0.5, 1.5, 2.5, 3.5))
    assert (dem.X == [dem.x] * Z.shape[0]).all()
    assert (dem.Y.T == [dem.y] * Z.shape[1]).all()


def test_initializes_custom_raster() -> None:
    xlim = (0, 3)
    ylim = (3, 0)
    x = (0.5, 1.5, 2.5)
    y = (2.5, 1.5, 0.5)
    X = (x, x, x)
    Y = np.asarray((y, y, y)).T
    Z = np.zeros((3, 3))
    dem = Raster(Z, x=xlim, y=ylim)
    assert all(dem.xlim == xlim)
    assert all(dem.ylim == ylim)
    assert all(dem.x == x)
    assert all(dem.y == y)
    assert (dem.X == X).all()
    assert (dem.Y == Y).all()
    dem = Raster(Z, x=x, y=y)
    assert all(dem.xlim == xlim)
    assert all(dem.ylim == ylim)
    dem = Raster(Z, x=X, y=Y)
    assert all(dem.xlim == xlim)
    assert all(dem.ylim == ylim)
    assert all(dem.x == x)
    assert all(dem.y == y)


def test_samples_raster(tol: float = 1e-13) -> None:
    Z = np.arange(16).reshape(4, 4).astype(float)
    dem = Raster(Z, (-0.5, 3.5), (-0.5, 3.5))
    xy_diagonal = np.column_stack((dem.x, dem.y))
    dz_points = dem.sample(xy_diagonal) - dem.array.diagonal()
    assert all(dz_points < tol)


def test_crops_raster_with_ascending_y() -> None:
    Z = np.arange(9).reshape(3, 3)
    dem = Raster(Z, (0, 3), (0, 3))
    with pytest.raises(Exception):
        dem.crop(xlim=(3, 5))
    cdem = dem.copy()
    cdem.crop(xlim=(0, 3), ylim=(0, 3))
    assert (dem.array == cdem.array).all()
    cdem = dem.copy()
    cdem.crop(xlim=(0, 2))
    assert all(cdem.xlim == (0, 2))
    assert (cdem.array == Z[:, 0:2]).all()
    cdem = dem.copy()
    cdem.crop(xlim=(2, 4))
    assert all(cdem.xlim == (2, 3))
    assert (cdem.array == Z[:, 2:3]).all()
    cdem = dem.copy()
    cdem.crop(ylim=(0, 2))
    assert all(cdem.ylim == (0, 2))
    assert (cdem.array == Z[0:2, :]).all()
    cdem = dem.copy()
    cdem.crop(ylim=(2, 4))
    assert all(cdem.ylim == (2, 3))
    assert (cdem.array == Z[2:3, :]).all()
    cdem = dem.copy()
    cdem.crop(xlim=(1, 2), ylim=(1, 2))
    assert all(cdem.xlim == (1, 2))
    assert all(cdem.ylim == (1, 2))
    assert (cdem.array == Z[1:2, 1:2]).all()
    cdem = dem.copy()
    cdem.crop(xlim=(1.5, 1.9), ylim=(1, 1.9))
    assert all(cdem.xlim == (1, 2))
    assert all(cdem.ylim == (1, 2))
    assert (cdem.array == Z[1:2, 1:2]).all()


def test_crops_raster_with_descending_y() -> None:
    Z = np.arange(9).reshape(3, 3)
    dem = Raster(Z, (3, 0), (3, 0))
    cdem = dem.copy()
    cdem.crop(xlim=(0, 3), ylim=(0, 3))
    assert all(dem.xlim == cdem.xlim)
    assert (dem.array == cdem.array).all()
    cdem = dem.copy()
    cdem.crop(xlim=(1.5, 1.9), ylim=(1, 1.9))
    assert all(cdem.xlim == (2, 1))
    assert all(cdem.ylim == (2, 1))
    assert (cdem.array == Z[1:2, 1:2]).all()


def test_resizes_raster() -> None:
    Z = np.zeros((10, 10))
    dem = Raster(Z)
    rdem = dem.copy()
    rdem.resize(0.5)
    assert all(rdem.d == dem.d * 2)
    assert all(rdem.xlim == dem.xlim)
    rdem = dem.copy()
    rdem.resize(2)
    assert all(rdem.d == dem.d / 2)
    assert all(rdem.xlim == dem.xlim)


def test_writes_and_reads_raster(tmp_path) -> None:
    old = Raster(
        np.array([(0, 0, 0), (0, np.nan, 0), (1, 1, 1)], dtype=float),
        x=np.array((1, 2, 3), dtype=float),
        y=np.array((3, 2, 1), dtype=float),
        crs="+init=epsg:4326",
    )
    tempfile = tmp_path / "temp.tif"
    old.write(tempfile)
    new = Raster.open(tempfile)
    np.testing.assert_equal(old.array, new.array)
    np.testing.assert_equal(old.x, new.x)
    np.testing.assert_equal(old.y, new.y)
    assert new.crs is not None and "4326" in new.crs


def test_opens_reference_fixture() -> None:
    raster = Raster.open(ASSETS / "000nan.tif")
    a = raster.read()
    assert a.shape == (2, 2)
    assert np.isnan(a[1, 1])
    assert (a.ravel()[:3] == 0).all()
    # Explicit nan value overrides the file's nodata.
    raster = Raster.open(ASSETS / "000nan.tif", nan=0)
    a = raster.read()
    assert np.isnan(a[0, 0])
    assert a[1, 1] == -9999
    # Windowed uncached read equals cached subset.
    raster = Raster.open(ASSETS / "000nan.tif")
    tile = raster.read(box=[0, 0, 1, 1], cache=False)
    assert tile.shape == (1, 1) and tile[0, 0] == 0


def test_interpolates_rasters() -> None:
    mean_paths = [ASSETS / "000nan.tif", ASSETS / "11-1nan.tif"]
    means = [Raster.open(path) for path in mean_paths]
    Zs = [mean.array for mean in means]
    sigma_paths = mean_paths
    sigmas = means
    xs = [
        (0, 1),
        (datetime.datetime(2000, 1, 1), datetime.datetime(2000, 1, 3)),
        (0.0, 1.0),
    ]
    means_sigmas = [
        (means, sigmas),
        (means, None),
        (means, [0] * len(means)),
        (mean_paths, sigma_paths),
        (mean_paths, None),
        (mean_paths, [0] * len(means)),
    ]
    samples = [(0.5, False), (1.5, True)]
    for x, (m, s), (scale, extrapolate) in itertools.product(
        xs, means_sigmas, samples
    ):
        interpolant = RasterInterpolant(means=m, sigmas=s, x=x)
        xi = x[0] + (x[1] - x[0]) * scale
        imean, isigma = interpolant(xi, extrapolate=extrapolate, return_sigma=True)
        expected = Zs[0] + (Zs[1] - Zs[0]) * scale
        np.testing.assert_equal(imean.array, expected)
        if isinstance(xi, datetime.datetime):
            assert imean.datetime == xi
            assert isigma.datetime == xi


def test_snap_box_and_tiles() -> None:
    grid = Grid((10, 10))
    box = grid.snap_box((5.2, 4.8), (2, 2), centers=False, edges=True)
    np.testing.assert_allclose(box, [4, 4, 6, 6])
    with pytest.raises(IndexError):
        grid.snap_box((0.5, 0.5), (4, 4))
    tiles = grid.tile_indices(size=(5, 5), overlap=(1, 1))
    assert len(tiles) == 4
    assert tiles[0][0] == slice(0, 5)


def test_getitem_subset() -> None:
    Z = np.arange(16).reshape(4, 4).astype(float)
    dem = Raster(Z, (0, 4), (4, 0))
    sub = dem[1:3, 2:4]
    assert (sub.array == Z[1:3, 2:4]).all()
    np.testing.assert_allclose(sub.xlim, (2, 4))
    np.testing.assert_allclose(sub.ylim, (3, 1))


def test_sample_with_fill_and_extrapolation() -> None:
    Z = np.arange(16, dtype=float).reshape(4, 4)
    dem = Raster(Z, (0, 4), (0, 4))
    pts = np.array([(2.0, 2.0), (10.0, 10.0)])
    with pytest.raises(ValueError):
        dem.sample(pts)
    out = dem.sample(pts, bounds_error=False, fill_value=-1)
    assert out[1] == -1
    out = dem.sample(pts, bounds_error=False, fill_value=None)
    assert np.isfinite(out[1])  # extrapolated


def test_gradient_and_hillshade() -> None:
    x, y = np.meshgrid(np.arange(10.0), np.arange(10.0))
    dem = Raster(2 * x + 3 * y, (0, 10), (0, 10))
    dzdx, dzdy = dem.gradient()
    np.testing.assert_allclose(dzdx, 2.0)
    np.testing.assert_allclose(dzdy, 3.0)
    hs = dem.hillshade()
    assert hs.shape == dem.array.shape
    assert np.nanmin(hs) >= 0 and np.nanmax(hs) <= 1


def brute_force_viewshed(Z, origin_xy, origin_z, grid):
    """Exact line-of-sight check per cell (reference semantics)."""
    H, W = Z.shape
    vis = np.zeros((H, W), dtype=bool)
    rc0 = grid.xy_to_rowcol(np.atleast_2d(origin_xy))[0]
    for r in range(H):
        for c in range(W):
            if np.isnan(Z[r, c]):
                continue
            xy = grid.rowcol_to_xy(np.array([[r, c]]))[0]
            d = np.hypot(xy[0] - origin_xy[0], xy[1] - origin_xy[1])
            if d == 0:
                vis[r, c] = True
                continue
            angle = (Z[r, c] - origin_z) / d
            # Walk the sight line at fine steps.
            n = max(int(d / abs(grid.d[0]) * 4), 1)
            ts = np.linspace(0, 1, n, endpoint=False)[1:]
            blocked = False
            for t in ts:
                px = origin_xy[0] + t * (xy[0] - origin_xy[0])
                py = origin_xy[1] + t * (xy[1] - origin_xy[1])
                rr, cc = grid.xy_to_rowcol(np.array([[px, py]]))[0]
                ri, ci = int(round(rr)), int(round(cc))
                ri = min(max(ri, 0), H - 1)
                ci = min(max(ci, 0), W - 1)
                if [ri, ci] == [int(rc0[0]), int(rc0[1])] or (ri == r and ci == c):
                    continue
                z = Z[ri, ci]
                if np.isnan(z):
                    continue
                if (z - origin_z) / (t * d) > angle + 1e-9:
                    blocked = True
                    break
            vis[r, c] = not blocked
    return vis


def test_viewshed_against_brute_force() -> None:
    rng = np.random.default_rng(0)
    H = W = 21
    x, y = np.meshgrid(np.arange(W, dtype=float), np.arange(H, dtype=float))
    # A hill blocking part of the view plus noise.
    Z = 5 * np.exp(-((x - 14) ** 2 + (y - 10) ** 2) / 8) + rng.normal(0, 0.05, (H, W))
    dem = Raster(Z, (0, W), (H, 0))
    origin = (3.5, 10.5, Z[10, 3] + 2.0)
    got = dem.viewshed(origin)
    expected = brute_force_viewshed(Z, origin[0:2], origin[2], dem.grid)
    agreement = (got == expected).mean()
    assert agreement > 0.93, agreement


def test_horizon_segments() -> None:
    H = W = 31
    x, y = np.meshgrid(np.arange(W, dtype=float), np.arange(H, dtype=float))
    Z = 10 * np.exp(-((x - 22) ** 2 + (y - 15) ** 2) / 10)
    dem = Raster(Z, (0, W), (H, 0))
    origin = (5.5, 15.5, 1.0)
    segments = dem.horizon(origin)
    assert len(segments) >= 1
    pts = np.vstack(segments)
    # Horizon points towards the hill should be on the hill's near flank.
    east = pts[np.abs(pts[:, 1] - 15.5) < 3]
    assert (east[:, 0] > 10).any()


def test_fill_crevasses_smooths() -> None:
    Z = np.ones((20, 20))
    Z[10, 10] = -10  # crevasse
    dem = Raster(Z.copy())
    dem.fill_crevasses(maximum={"size": 3}, gaussian={"sigma": 1})
    assert dem.array[10, 10] > 0


def test_rasterize_points_and_polygons() -> None:
    dem = Raster(np.full((5, 5), np.nan), (0, 5), (5, 0))
    out = dem.rasterize(np.array([(0.5, 4.5), (0.5, 4.5)]), np.array([2.0, 4.0]))
    assert out[0, 0] == 3.0
    mask = dem.rasterize_polygons([[(0.9, 4.9), (3.1, 4.9), (3.1, 2.1), (0.9, 2.1)]])
    assert mask[1, 2]
    assert not mask[4, 4]


def test_data_extent_and_crop_to_data() -> None:
    Z = np.full((5, 6), np.nan)
    Z[1:4, 2:5] = 1.0
    dem = Raster(Z, (0, 6), (5, 0))
    rows, cols = dem.data_extent()
    assert (rows.start, rows.stop) == (1, 4)
    assert (cols.start, cols.stop) == (2, 5)
    dem.crop_to_data()
    assert dem.array.shape == (3, 3)
    np.testing.assert_allclose(dem.xlim, (2, 5))


def test_project_dem_nadir_identity() -> None:
    """Reference doctest contract (camera.py:1016-1031): a nadir camera over
    a matched 3x3 grid reproduces values and depth exactly."""
    from glimpse_tpu import Camera

    rng = np.random.default_rng(0)
    cam = Camera(imgsz=3, f=3, xyz=(0, 0, 3), viewdir=(0, -90, 0))
    Z = np.array([(0.1, 0.2, 0.3), (0.4, 0.5, 0.6), (0.7, 0.8, 0.9)])
    values = rng.normal(size=(3, 3))
    dem = Raster(Z, x=(-1.5, 1.5), y=(1.5, -1.5))
    img = cam.project_dem(dem, values=values, return_depth=True)
    np.testing.assert_allclose(img[:, :, 0], values)
    np.testing.assert_allclose(img[:, :, 1], cam.xyz[2] - Z)


def test_viewshed_jax_matches_numpy() -> None:
    import jax
    import jax.numpy as jnp

    from glimpse_tpu.ops import terrain

    rng = np.random.default_rng(1)
    x, y = np.meshgrid(np.arange(17.0), np.arange(17.0))
    Z = 4 * np.exp(-((x - 11) ** 2 + (y - 8) ** 2) / 6) + rng.normal(0, 0.02, (17, 17))
    args = ((8.0, 3.0), float(Z[8, 3] + 2), 1.0)
    vis_np = terrain.viewshed(Z, *args, xp=np)
    vis_jax = np.asarray(
        jax.jit(lambda a: terrain.viewshed(a, *args, xp=jnp))(jnp.asarray(Z))
    )
    assert (vis_np == vis_jax).mean() > 0.99


def test_horizon_angles_jax_matches_numpy() -> None:
    import jax
    import jax.numpy as jnp

    from glimpse_tpu.ops import terrain

    rng = np.random.default_rng(2)
    Z = rng.normal(size=(21, 21)).cumsum(axis=0)
    thetas = np.linspace(-np.pi, np.pi, 36, endpoint=False)
    out_np = terrain.horizon_angles(Z, (10.0, 10.0), 1.0, 1.0, thetas, xp=np)
    out_jax = jax.jit(
        lambda a, t: terrain.horizon_angles(a, (10.0, 10.0), 1.0, 1.0, t, xp=jnp)
    )(jnp.asarray(Z), jnp.asarray(thetas))
    np.testing.assert_allclose(
        np.asarray(out_jax[0]), out_np[0], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(out_jax[3]), out_np[3])


def test_geotiff_multiband_roundtrip(tmp_path) -> None:
    """Multi-band float GeoTIFFs round-trip (one band per TIFF page)."""
    from glimpse_tpu.io import geotiff

    a = np.random.default_rng(0).random((5, 7, 3)).astype(np.float32)
    path = tmp_path / "mb.tif"
    geotiff.write(path, a, transform=(10.0, 2.0, 0, 20.0, 0, -2.0))
    np.testing.assert_allclose(geotiff.read(path), a)
    np.testing.assert_allclose(geotiff.read(path, band=2), a[:, :, 1])
    np.testing.assert_allclose(
        geotiff.read(path, window=(1, 1, 4, 3)), a[1:3, 1:4]
    )
    info = geotiff.read_info(path)
    assert info.n_bands == 3
    assert info.transform == (10.0, 2.0, 0.0, 20.0, 0.0, -2.0)
