"""Device keypoint detector (ops/features) behavioral tests.

The detector replaces host OpenCV SIFT for sequence stabilization
(reference ``optimize.py:2442-2475``); these tests pin the properties the
stabilization pipeline actually relies on — repeatability under shift,
subpixel localization, mask compliance, and end-to-end matchability through
the device descriptor matcher — rather than SIFT bit-parity.
"""
import numpy as np
import pytest
import scipy.ndimage

from glimpse_tpu.ops import features
from glimpse_tpu.ops.matching import DescriptorMatcher


@pytest.fixture(scope="module")
def texture_field():
    rng = np.random.default_rng(7)
    field = scipy.ndimage.gaussian_filter(rng.normal(size=(300, 300)), 1.5)
    return (field - field.min()) / np.ptp(field) * 255.0


def render(field, dy, dx, size=200, origin=40):
    yy, xx = np.mgrid[0:size, 0:size]
    return scipy.ndimage.map_coordinates(
        field, [yy + origin + dy, xx + origin + dx], order=3
    ).astype(np.uint8)


@pytest.mark.slow
def test_fixed_budget_and_descriptor_contract(texture_field):
    img = render(texture_field, 0, 0)
    (pts, desc), = features.detect_and_describe([img], nfeatures=128, batch=1)
    assert len(pts) <= 128
    assert len(pts) == len(desc) >= 32
    assert desc.shape[1] == 128
    norms = np.linalg.norm(desc, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    assert desc.min() >= 0.0  # gradient-magnitude bins are nonnegative
    assert pts.min() >= 0
    assert pts.max() < 200


@pytest.mark.slow
def test_integer_shift_repeatability(texture_field):
    a = render(texture_field, 0, 0)
    b = np.roll(np.roll(a, 3, axis=0), 5, axis=1)
    (pa, da), (pb, db) = features.detect_and_describe(
        [a, b], nfeatures=512, batch=2
    )
    m = DescriptorMatcher(pad_step=512)
    pairs, _ = m.match(da, db, max_ratio=0.8, cross_check=True)
    assert len(pairs) >= 100
    duv = pb[pairs[:, 1]] - pa[pairs[:, 0]]
    med = np.median(duv, axis=0)
    np.testing.assert_allclose(med, [5, 3], atol=0.05)
    inliers = np.linalg.norm(duv - med, axis=1) < 1.0
    assert inliers.mean() > 0.9


def test_subpixel_shift_recovery(texture_field):
    a = render(texture_field, 0.0, 0.0)
    b = render(texture_field, 0.37, -0.61)
    (pa, da), (pb, db) = features.detect_and_describe(
        [a, b], nfeatures=512, batch=2
    )
    m = DescriptorMatcher(pad_step=512)
    pairs, _ = m.match(da, db, max_ratio=0.8, cross_check=True)
    assert len(pairs) >= 100
    # b sampled at +d means features move by -d: pa - pb == (dx, dy).
    duv = pa[pairs[:, 0]] - pb[pairs[:, 1]]
    med = np.median(duv, axis=0)
    np.testing.assert_allclose(med, [-0.61, 0.37], atol=0.08)


@pytest.mark.slow
def test_blob_localization():
    size = 96
    yy, xx = np.mgrid[0:size, 0:size].astype(float)
    rng = np.random.default_rng(2)
    img = np.zeros((size, size))
    truth = []
    for cy in range(16, 90, 24):
        for cx in range(16, 90, 24):
            ty = cy + rng.uniform(-0.5, 0.5)
            tx = cx + rng.uniform(-0.5, 0.5)
            truth.append((tx, ty))
            img += 200 * np.exp(
                -(((yy - ty) ** 2 + (xx - tx) ** 2) / (2 * 3.2 ** 2))
            )
    img = np.clip(img, 0, 255).astype(np.uint8)
    (pts, _), = features.detect_and_describe([img], nfeatures=64, batch=1)
    hits = 0
    errs = []
    for t in truth:
        dist = np.linalg.norm(pts - t, axis=1)
        j = int(dist.argmin())
        if dist[j] < 3:
            hits += 1
            errs.append(pts[j] - t)
    assert hits >= 8
    assert np.abs(np.asarray(errs)).max() < 0.1


@pytest.mark.slow
def test_mask_is_respected(texture_field):
    img = render(texture_field, 0, 0)
    mask = np.zeros_like(img)
    mask[:100, :] = 255
    (pts, _), = features.detect_and_describe(
        [img], masks=[mask], nfeatures=256, batch=1
    )
    assert len(pts) > 10
    assert pts[:, 1].max() < 108  # mask edge + descriptor-support slack


@pytest.mark.slow
def test_batch_padding_last_chunk(texture_field):
    imgs = [render(texture_field, i, 0) for i in range(3)]
    out = features.detect_and_describe(imgs, nfeatures=64, batch=2)
    assert len(out) == 3
    for pts, desc in out:
        assert len(pts) == len(desc) > 0


@pytest.mark.slow
def test_detect_keypoints_device_cv2_kwargs(texture_field):
    from glimpse_tpu import optimize

    img = render(texture_field, 0, 0)
    out = optimize.detect_keypoints_device(
        [img], nfeatures=64, contrastThreshold=0.01, sigma=1.6
    )
    pts, desc = out[0]
    assert len(pts) > 0 and desc.shape[1] == 128


@pytest.mark.slow
def test_matcher_interop_with_host_flann(texture_field):
    """Device keypoints flow through the host FLANN matcher too."""
    cv2 = pytest.importorskip("cv2")
    from glimpse_tpu import optimize

    a = render(texture_field, 0, 0)
    b = np.roll(a, 4, axis=1)
    (ka, kb) = features.detect_and_describe([a, b], nfeatures=256, batch=2)
    uva, uvb = optimize.match_keypoints(
        ka, kb, max_ratio=0.8, matcher=cv2.BFMatcher()
    )
    assert len(uva) >= 50
    med = np.median(uvb - uva, axis=0)
    np.testing.assert_allclose(med, [4, 0], atol=0.05)
