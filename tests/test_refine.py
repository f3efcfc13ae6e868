"""Correlation match refinement (ops/refine.py).

The stage's contract: given matched coordinates that are only
integer-accurate (or subpixel-biased), the refined pair displacement must
recover the TRUE inter-image displacement to well under the detector's
pixel-locking bias (~0.05 px), because the displacement is measured
directly on the image pair rather than composed from two independent
localizations. No reference counterpart (the reference relies on host
SIFT localization alone, /root/reference/src/glimpse/optimize.py:2194).
"""
import numpy as np
import pytest

from glimpse_tpu.ops import refine, sampling


def _texture(H=96, W=96, seed=0):
    """Smooth band-limited texture with rich gradient structure."""
    rng = np.random.default_rng(seed)
    f = rng.normal(size=(H, W))
    import scipy.ndimage

    t = scipy.ndimage.gaussian_filter(f, 2.0)
    t = 128 + 60 * t / np.abs(t).max()
    return t.astype(np.float32)


def _shift_spline(img, dy, dx):
    """Subpixel shift by exact cubic B-spline resampling."""
    H, W = img.shape
    coeff = sampling.bspline_prefilter_2d(img.astype(np.float64))
    by = sampling.bspline_basis_dense(
        np.clip(np.arange(H, dtype=float) + dy, 0, H - 1), H
    )
    bx = sampling.bspline_basis_dense(
        np.clip(np.arange(W, dtype=float) + dx, 0, W - 1), W
    )
    return (by @ coeff @ bx.T).astype(np.float32)


@pytest.mark.parametrize("dy,dx", [(0.3, -0.4), (-0.17, 0.23), (2.6, -1.4)])
def test_recovers_true_displacement(dy, dx):
    img_a = _texture()
    img_b = _shift_spline(img_a, dy, dx)  # b(y, x) = a(y + dy, x + dx)
    # Matched keypoints: integer-rounded positions with a fake coherent
    # detector bias on both sides (what pixel locking looks like).
    ys, xs = np.meshgrid(np.arange(20, 76, 8), np.arange(20, 76, 8))
    uv_a = np.stack([xs.ravel() + 0.21, ys.ravel() - 0.13], axis=1).astype(float)
    uv_b = uv_a - [dx, dy] + [0.08, -0.06]  # biased match coordinates
    ra, rb = refine.refine_matches(img_a, img_b, uv_a, uv_b)
    duv = rb - ra
    err = duv - [-dx, -dy]
    assert np.abs(np.median(err, axis=0)).max() < 0.03
    assert np.abs(err).mean() < 0.06


def test_border_matches_pass_through():
    img_a = _texture()
    img_b = _shift_spline(img_a, 0.5, 0.5)
    uv_a = np.array([[2.0, 2.0], [48.0, 48.0]])
    uv_b = uv_a - 0.5
    ra, rb = refine.refine_matches(img_a, img_b, uv_a, uv_b)
    np.testing.assert_allclose(ra[0], uv_a[0])  # window would cross border
    np.testing.assert_allclose(rb[0], uv_b[0])
    assert np.all(ra[1] == np.round(uv_a[1]))


def test_batched_pairs_match_single():
    img_a = _texture(seed=1)
    img_b = _shift_spline(img_a, -0.35, 0.15)
    ys, xs = np.meshgrid(np.arange(24, 72, 12), np.arange(24, 72, 12))
    uv = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(float)
    imgs = {0: img_a, 1: img_b, 2: img_a, 3: img_b}
    refiner = refine.MatchRefiner(pad_matches=32, pairs_per_dispatch=2)
    outs = refiner.refine_pairs(
        [(0, 1), (2, 3), (0, 3)],
        [(uv, uv + [-0.15, 0.35])] * 3,
        lambda k: imgs[k],
    )
    single = refine.refine_matches(img_a, img_b, uv, uv + [-0.15, 0.35])
    for out in outs:
        np.testing.assert_allclose(out[0], single[0], atol=1e-5)
        np.testing.assert_allclose(out[1], single[1], atol=1e-4)


def test_empty_and_varied_sizes():
    img = _texture(seed=2)
    refiner = refine.MatchRefiner(pad_matches=8, pairs_per_dispatch=2)
    empty = np.zeros((0, 2))
    uv = np.array([[40.0, 40.0], [52.0, 44.0], [30.0, 60.0]])
    outs = refiner.refine_pairs(
        [(0, 1), (0, 1)],
        [(empty, empty), (uv, uv)],
        lambda k: img,
    )
    assert outs[0][0].shape == (0, 2)
    # Identical images: refined displacement must be ~zero.
    duv = outs[1][1] - outs[1][0]
    assert np.abs(duv).max() < 0.02


def test_precision_highest_survives_lowering():
    """HIGHEST precision must be plumbed into the lowered HLO.

    The fix only changes numerics on the TPU backend (CPU convs/matmuls are
    already f32), so this inspects the lowered program text — CPU CI then
    catches any refactor that drops the precision= arguments from
    _refine_one_pair's prefilter/Newton einsums or the DoG blur ladder.
    """
    import jax
    import jax.numpy as jnp

    img = jnp.zeros((32, 32), jnp.float32)
    corners = jnp.zeros((2, 2), jnp.int32)
    lowered = jax.jit(
        refine._refine_one_pair, static_argnums=(4, 5, 6)
    ).lower(img, img, corners, corners, 8, 12, 2).as_text()
    # One marker per protected site: bspline prefilter + Newton form einsums.
    assert lowered.count("HIGHEST") >= 2, lowered.count("HIGHEST")

    from glimpse_tpu.ops import features

    blurred = jax.jit(
        lambda x: features._blur(x, 1.6)
    ).lower(jnp.zeros((1, 16, 16), jnp.float32)).as_text()
    assert "HIGHEST" in blurred
    # The descriptor-plane call site opts out (DEFAULT) for speed.
    fast = jax.jit(
        lambda x: features._blur(x, 1.6, precision=jax.lax.Precision.DEFAULT)
    ).lower(jnp.zeros((1, 16, 16), jnp.float32)).as_text()
    assert "HIGHEST" not in fast
