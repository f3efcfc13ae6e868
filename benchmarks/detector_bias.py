"""Coherent subpixel-bias probe for the device keypoint detector.

The stabilization chain is sensitive to the MEAN (not median) keypoint
localization residual under subpixel image shifts: a texture-phase-
dependent bias that is coherent across a frame reads as apparent
rotation in the ObserverCameras fit (validation.md "Detector-quality
attribution"). This probe renders one texture at a grid of subpixel
shifts, matches keypoints back to the unshifted frame through the device
matcher, and reports the mean residual (p_a - p_b) - (-shift) per shift
plus the worst |mean| over the grid — the direct scalar the detector
work optimizes.

Usage: python benchmarks/detector_bias.py  (CPU by default; fast)
"""
import os
import sys

import numpy as np
import scipy.ndimage

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("BIAS_CPU", "1") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

from glimpse_tpu.ops import features  # noqa: E402
from glimpse_tpu.ops.matching import DescriptorMatcher  # noqa: E402


def render(field, dy, dx, size=320, origin=48):
    yy, xx = np.mgrid[0:size, 0:size]
    return scipy.ndimage.map_coordinates(
        field, [yy + origin + dy, xx + origin + dx], order=3
    ).astype(np.uint8)


def main():
    rng = np.random.default_rng(7)
    field = scipy.ndimage.gaussian_filter(rng.normal(size=(460, 460)), 1.5)
    field = (field - field.min()) / np.ptp(field) * 255.0

    shifts = [
        (0.13, 0.41), (0.37, -0.61), (-0.25, 0.25), (0.5, 0.5),
        (-0.49, 0.07), (0.73, -0.11),
    ]
    a = render(field, 0.0, 0.0)
    imgs = [a] + [render(field, dy, dx) for dy, dx in shifts]
    kp = features.detect_and_describe(imgs, nfeatures=768, batch=1)
    pa, da = kp[0]
    m = DescriptorMatcher(pad_step=1024)
    worst = 0.0
    for (dy, dx), (pb, db) in zip(shifts, kp[1:]):
        pairs, _ = m.match(da, db, max_ratio=0.8, cross_check=True)
        duv = pa[pairs[:, 0]] - pb[pairs[:, 1]]  # expected (dx, dy)
        res = duv - np.array([dx, dy])
        keep = np.linalg.norm(res, axis=1) < 0.5  # inliers only
        mean = res[keep].mean(axis=0)
        rms = np.sqrt((res[keep] ** 2).mean())
        worst = max(worst, float(np.abs(mean).max()))
        print(
            f"shift ({dy:+.2f},{dx:+.2f}): n={keep.sum():4d} "
            f"mean residual ({mean[0]:+.4f},{mean[1]:+.4f}) px rms {rms:.4f}"
        )
    print(f"worst |mean| component over shifts: {worst:.4f} px")


if __name__ == "__main__":
    main()
