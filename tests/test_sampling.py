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


def test_bspline_padded_matches_exact() -> None:
    rng = np.random.default_rng(5)
    Z = rng.normal(size=(27, 27))
    coeffs = sampling.bspline_prefilter_2d(Z, xp=np)
    pts = rng.uniform([0, 0], [26, 26], size=(500, 2))
    exact = sampling.bspline_sample(coeffs, pts[:, 0], pts[:, 1], xp=np)
    padded = sampling.bspline_pad_coeffs(coeffs, xp=np)
    fast = sampling.bspline_sample_padded(padded, pts[:, 0], pts[:, 1], xp=np)
    np.testing.assert_allclose(fast, exact, atol=1e-12)


def test_bspline_upsample_matches_exact_on_fine_grid() -> None:
    rng = np.random.default_rng(6)
    Z = rng.normal(size=(20, 22))
    coeffs = sampling.bspline_prefilter_2d(Z, xp=np)
    factor = 4
    fine = sampling.bspline_upsample(coeffs, factor, xp=np)
    assert fine.shape == (80, 88)
    # Fine cell (i, j) centers at coarse ((i+0.5)/f - 0.5, (j+0.5)/f - 0.5).
    ii, jj = np.meshgrid(np.arange(80), np.arange(88), indexing="ij")
    rr = (ii + 0.5) / factor - 0.5
    cc = (jj + 0.5) / factor - 0.5
    exact = sampling.bspline_sample(coeffs, rr, cc, xp=np)
    np.testing.assert_allclose(fine, exact, atol=1e-10)


def test_upsample_bilinear_approximates_cubic() -> None:
    """The fast likelihood path (4x upsample + bilinear) stays within
    ~1e-3 of the exact cubic spline on smooth surfaces."""
    x, y = np.meshgrid(np.linspace(0, 3, 27), np.linspace(0, 3, 27))
    Z = np.sin(x) * np.cos(y)  # smooth like an SSE surface
    coeffs = sampling.bspline_prefilter_2d(Z, xp=np)
    rng = np.random.default_rng(7)
    pts = rng.uniform([1, 1], [25, 25], size=(500, 2))
    exact = sampling.bspline_sample(coeffs, pts[:, 0], pts[:, 1], xp=np)
    factor = 4
    fine = sampling.bspline_upsample(coeffs, factor, xp=np)
    fr = (pts[:, 0] + 0.5) * factor - 0.5
    fc = (pts[:, 1] + 0.5) * factor - 0.5
    approx = sampling.bilinear_sample(fine, fr, fc, xp=np)
    assert np.abs(approx - exact).max() < 2e-3


def test_bspline_basis_dense_matches_exact() -> None:
    """The gather-free dense-basis contraction equals direct evaluation,
    including at clamped edges where ghost folds engage."""
    rng = np.random.default_rng(7)
    Z = rng.normal(size=(27, 25))
    coeffs = sampling.bspline_prefilter_2d(Z, xp=np)
    pts = rng.uniform([0, 0], [26, 24], size=(500, 2))
    # Force edge coverage (q = 0 and q = n - 1 reach the ghost folds).
    pts[:4] = [[0.0, 0.0], [26.0, 24.0], [0.0, 24.0], [26.0, 0.0]]
    exact = sampling.bspline_sample(coeffs, pts[:, 0], pts[:, 1], xp=np)
    Br = sampling.bspline_basis_dense(pts[:, 0], 27, xp=np)  # (Q, 27)
    Bc = sampling.bspline_basis_dense(pts[:, 1], 25, xp=np)  # (Q, 25)
    got = np.einsum("qh,hw,qw->q", Br, coeffs, Bc)
    np.testing.assert_allclose(got, exact, atol=1e-12)


def test_bspline_basis_dense_rows_sum_to_one() -> None:
    """Partition of unity (with natural ghost folds) on [0, n-1]."""
    q = np.linspace(0.0, 9.0, 101)
    B = sampling.bspline_basis_dense(q, 10, xp=np)
    np.testing.assert_allclose(B.sum(axis=-1), 1.0, atol=1e-12)


def test_grid_sample_nearest_dense_bit_equal() -> None:
    """The gather-free dense path is bit-identical to the index gather."""
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    A = rng.normal(size=(37, 53)).astype(np.float32) * 1e3
    ri = rng.integers(0, 37, size=(40, 17)).astype(np.int32)
    ci = rng.integers(0, 53, size=(40, 17)).astype(np.int32)
    got = np.asarray(
        sampling.grid_sample_nearest_dense(jnp.asarray(A), jnp.asarray(ri),
                                           jnp.asarray(ci), chunk=256)
    )
    np.testing.assert_array_equal(got, A[ri, ci])


def test_grid_sample_bilinear_dense_bit_equal() -> None:
    """Dense bilinear == gather bilinear: corner selections bit-exact,
    total result to FMA-contraction level, incl. edge extrapolation
    (out-of-bounds fractional indices)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(10)
    A = rng.normal(size=(21, 19)).astype(np.float32) * 1e3
    rows = rng.uniform(-2.0, 22.0, size=(1000,)).astype(np.float32)
    cols = rng.uniform(-2.0, 21.0, size=(1000,)).astype(np.float32)
    expect = np.asarray(
        sampling.bilinear_sample(jnp.asarray(A), jnp.asarray(rows),
                                 jnp.asarray(cols), xp=jnp)
    )
    got = np.asarray(
        sampling.grid_sample_bilinear_dense(jnp.asarray(A),
                                            jnp.asarray(rows),
                                            jnp.asarray(cols), chunk=128)
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-2)


def test_device_raster_constant_broadcast() -> None:
    """A (1, 1) DeviceRaster samples to its value everywhere, both orders."""
    import jax.numpy as jnp

    from glimpse_tpu.track.batch import DeviceRaster

    r = DeviceRaster.constant(7.25)
    xy = jnp.asarray(np.random.default_rng(0).normal(size=(5, 6, 2)) * 100)
    np.testing.assert_array_equal(np.asarray(r.sample(xy)), 7.25)
    np.testing.assert_array_equal(np.asarray(r.sample_nearest(xy)), 7.25)
