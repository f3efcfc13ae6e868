"""NumPy/SciPy/OpenCV-faithful particle-filter baseline for benchmarking.

Reproduces the reference's per-point hot loop (one point per process,
Python time loop; ``/root/reference/src/glimpse/track/tracker.py:225-417``)
with the same native backends the reference binds (cv2.matchTemplate for
SSE, scipy.interpolate.RectBivariateSpline for subpixel sampling,
scipy.ndimage.median_filter for the high-pass). Used to measure baseline
point-timesteps/sec on this machine's CPU, since the reference publishes no
benchmark numbers (BASELINE.md).
"""
import time
from typing import Tuple

import numpy as np
import scipy.interpolate
import scipy.ndimage

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _normalize(a: np.ndarray) -> np.ndarray:
    return (a - a.mean()) / a.std()


def _compute_cdf(a: np.ndarray):
    values, counts = np.unique(a, return_counts=True)
    return values, np.cumsum(counts) / a.size


def _match_cdf(a: np.ndarray, cdf) -> np.ndarray:
    vals, inv, counts = np.unique(a, return_inverse=True, return_counts=True)
    q = np.cumsum(counts) / a.size
    out = np.interp(q, cdf[1], cdf[0])[inv]
    return out.reshape(a.shape)


def _prepare(tile: np.ndarray, cdf=None, return_cdf: bool = False):
    t = _normalize(tile.astype(float))
    if cdf is not None:
        t = _match_cdf(t, cdf)
    own = _compute_cdf(t) if return_cdf else None
    t = t - scipy.ndimage.median_filter(t, size=(5, 5))
    return (t, own) if return_cdf else t


def _sse(search: np.ndarray, template: np.ndarray) -> np.ndarray:
    if cv2 is not None:
        return cv2.matchTemplate(
            search.astype(np.float32), templ=template.astype(np.float32),
            method=cv2.TM_SQDIFF,
        )
    windows = np.lib.stride_tricks.sliding_window_view(search, template.shape)
    diff = windows - template
    return np.einsum("uvij,uvij->uv", diff, diff)


def run_baseline_point(
    frames: np.ndarray,
    start_rc: Tuple[float, float],
    velocity_px: Tuple[float, float],
    n_particles: int = 500,
    template_size: int = 15,
    sigma: float = 0.3,
    seed: int = 0,
) -> Tuple[float, np.ndarray]:
    """Track one point through ``frames`` ((T, H, W) grayscale, pixel frame).

    Returns (elapsed seconds for the T-1 update steps, final mean state).
    """
    rng = np.random.default_rng(seed)
    T, H, W = frames.shape
    half = template_size // 2
    # Initialize particles in pixel coordinates (col, row, vcol, vrow).
    particles = np.zeros((n_particles, 4))
    particles[:, 0] = start_rc[1] + rng.standard_normal(n_particles) * 1.5
    particles[:, 1] = start_rc[0] + rng.standard_normal(n_particles) * 1.5
    particles[:, 2:4] = rng.standard_normal((n_particles, 2)) * 3.0
    weights = np.ones(n_particles)
    # Template from frame 0 around the mean.
    mean = np.average(particles, weights=weights, axis=0)
    c0, r0 = int(round(mean[0])) - half, int(round(mean[1])) - half
    template, cdf = _prepare(
        frames[0, r0 : r0 + template_size, c0 : c0 + template_size],
        return_cdf=True,
    )
    start = time.perf_counter()
    for t in range(1, T):
        # Evolve.
        particles[:, 0:2] += particles[:, 2:4]
        particles[:, 2:4] += rng.standard_normal((n_particles, 2)) * 0.2
        # Search box covering all particles plus template margin.
        lo = np.floor(particles[:, 0:2].min(axis=0) - template_size).astype(int)
        hi = np.ceil(particles[:, 0:2].max(axis=0) + template_size).astype(int)
        lo = np.maximum(lo, 0)
        hi = np.minimum(hi, [W, H])
        search = _prepare(frames[t, lo[1] : hi[1], lo[0] : hi[0]], cdf=cdf)
        sse = _sse(search, template) / template.size
        # Subpixel spline sampling at particle positions.
        oh, ow = sse.shape
        fun = scipy.interpolate.RectBivariateSpline(
            np.arange(oh), np.arange(ow), sse, kx=3, ky=3
        )
        cols = np.clip(particles[:, 0] - lo[0] - half, 0, ow - 1)
        rows = np.clip(particles[:, 1] - lo[1] - half, 0, oh - 1)
        ll = fun(rows, cols, grid=False) / (2 * sigma ** 2)
        weights = np.exp(-(ll - ll.min())) + 1e-300
        # Systematic resampling.
        w = weights / weights.sum()
        positions = (np.arange(n_particles) + rng.random()) / n_particles
        idx = np.searchsorted(np.cumsum(w), positions)
        particles = particles[idx]
        weights = weights[idx]
    elapsed = time.perf_counter() - start
    return elapsed, np.average(particles, weights=weights, axis=0)


def measure_baseline_throughput(
    n_steps: int = 10, n_particles: int = 500, image_size: int = 512, seed: int = 0
) -> float:
    """Baseline point-timesteps/sec for the reference-style per-point loop."""
    rng = np.random.default_rng(seed)
    base = scipy.ndimage.gaussian_filter(
        rng.normal(size=(image_size, image_size)), 0.8
    )
    frames = np.stack(
        [
            scipy.ndimage.shift(base, (i * 1.0, i * 2.0), order=1, mode="nearest")
            for i in range(n_steps + 1)
        ]
    )
    center = image_size / 2
    elapsed, _ = run_baseline_point(
        frames, (center, center), (2.0, 1.0), n_particles=n_particles, seed=seed
    )
    return n_steps / elapsed
