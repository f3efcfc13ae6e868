"""Interpolation op tests against SciPy golden values."""
import numpy as np
import scipy.interpolate
import scipy.ndimage

from glimpse_tpu.ops import sampling


def test_bilinear_matches_regular_grid_interpolator() -> None:
    rng = np.random.default_rng(0)
    Z = rng.normal(size=(12, 17))
    f = scipy.interpolate.RegularGridInterpolator(
        (np.arange(12), np.arange(17)), Z, method="linear"
    )
    pts = rng.uniform([0, 0], [11, 16], size=(200, 2))
    expected = f(pts)
    got = sampling.bilinear_sample(Z, pts[:, 0], pts[:, 1], xp=np)
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_nearest_matches_round() -> None:
    rng = np.random.default_rng(1)
    Z = rng.normal(size=(8, 9))
    pts = rng.uniform([0, 0], [7, 8], size=(50, 2))
    got = sampling.nearest_sample(Z, pts[:, 0], pts[:, 1], xp=np)
    expected = Z[np.round(pts[:, 0]).astype(int), np.round(pts[:, 1]).astype(int)]
    np.testing.assert_array_equal(got, expected)


def test_bspline_interpolates_nodes_exactly() -> None:
    rng = np.random.default_rng(2)
    Z = rng.normal(size=(15, 15))
    rr, cc = np.meshgrid(np.arange(15.0), np.arange(15.0), indexing="ij")
    got = sampling.sample_grid(Z, rr, cc, order=3, xp=np)
    np.testing.assert_allclose(got, Z, atol=1e-10)


def test_bspline_interior_matches_rectbivariatespline() -> None:
    """Away from boundaries, our natural cubic spline tracks scipy's
    not-a-knot RectBivariateSpline closely (same interpolant family)."""
    rng = np.random.default_rng(3)
    Z = rng.normal(size=(20, 22)).cumsum(axis=0).cumsum(axis=1)  # smooth-ish
    f = scipy.interpolate.RectBivariateSpline(
        np.arange(20), np.arange(22), Z, kx=3, ky=3
    )
    pts = rng.uniform([4, 4], [15, 17], size=(300, 2))
    expected = f(pts[:, 0], pts[:, 1], grid=False)
    got = sampling.sample_grid(Z, pts[:, 0], pts[:, 1], order=3, xp=np)
    np.testing.assert_allclose(got, expected, atol=2e-3 * np.abs(Z).max())


def test_bspline_jax_matches_numpy() -> None:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    Z = rng.normal(size=(16, 16))
    pts = rng.uniform([0, 0], [15, 15], size=(64, 2))
    got_np = sampling.sample_grid(Z, pts[:, 0], pts[:, 1], order=3, xp=np)
    fn = jax.jit(
        lambda z, r, c: sampling.sample_grid(z, r, c, order=3, xp=jnp)
    )
    got_jax = np.asarray(fn(jnp.asarray(Z), jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1])))
    np.testing.assert_allclose(got_jax, got_np, atol=1e-5)
