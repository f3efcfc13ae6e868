"""Image/tile processing ops: normalization, histogram matching, filters.

Dual-backend (numpy / jax.numpy) equivalents of the reference's tile
pipeline (``/root/reference/src/glimpse/helpers.py:324-520`` and
``tracker.py:494-534``): grayscale reduction, mean-0/var-1 normalization,
sort-based CDF computation and histogram matching, and a median high-pass
filter. All fixed-shape and fully vectorized so they fuse into the jitted
tracker step; batched variants operate on stacks of tiles.
"""
from typing import Tuple

import numpy as np


def grayscale(tile, xp=np):
    """Mean-reduce a trailing channel axis if present."""
    if tile.ndim > 2:
        return xp.mean(tile, axis=-1)
    return tile


def normalize(tile, xp=np, axis=None, eps: float = 0.0):
    """Normalize to mean 0, variance 1 (over ``axis`` or the whole array)."""
    mean = xp.mean(tile, axis=axis, keepdims=axis is not None)
    centered = tile - mean
    std = xp.sqrt(xp.mean(centered * centered, axis=axis, keepdims=axis is not None))
    return centered / (std + eps)


def sorted_cdf(a, xp=np):
    """CDF of an array as (sorted values, P(x <= value)).

    Vectorized equivalent of unique+cumsum (helpers.py:433-464): ties all
    receive the quantile of their last occurrence, so interpolating against
    the result reproduces the unique-collapsed CDF.
    """
    flat = xp.ravel(a)
    values = xp.sort(flat)
    n = flat.shape[0]
    quantiles = xp.searchsorted(values, values, side="right") / n
    return values, quantiles


def match_cdf(a, cdf, xp=np):
    """Transform ``a`` so its CDF matches ``cdf`` (values, quantiles).

    Sort-free per element: each element's own quantile is looked up by
    binary search, then inverse-interpolated through the target CDF.
    """
    values, quantiles = cdf
    flat = xp.ravel(a)
    own_sorted = xp.sort(flat)
    n = flat.shape[0]
    own_q = xp.searchsorted(own_sorted, flat, side="right") / n
    matched = xp.interp(own_q, quantiles, values)
    return matched.reshape(a.shape)


def median_filter(tile, size: Tuple[int, int] = (5, 5), xp=np):
    """Median filter with reflect ('symmetric') boundary, matching
    scipy.ndimage.median_filter defaults. Works on (..., H, W) stacks.

    Small windows (<= 25 taps) use an odd-even transposition min/max network
    — pure elementwise VPU work, much faster on TPU than a sort and exactly
    equal to it.
    """
    ky, kx = size
    py, px = ky // 2, kx // 2
    pad = [(0, 0)] * (tile.ndim - 2) + [(py, ky - 1 - py), (px, kx - 1 - px)]
    padded = xp.pad(tile, pad, mode="symmetric")
    H, W = tile.shape[-2], tile.shape[-1]
    shifts = []
    for dy in range(ky):
        for dx in range(kx):
            shifts.append(padded[..., dy : dy + H, dx : dx + W])
    if xp is np and len(shifts) <= 25:
        # Odd-even network beats numpy's sort for small windows; on the JAX
        # path the single sort HLO compiles far faster than ~600 unrolled
        # min/max ops (XLA-TPU compile time is superlinear in op count).
        return median_network(shifts, xp=xp)
    stacked = xp.stack(shifts, axis=0)
    return xp.median(stacked, axis=0)


def median_network(values, xp=np):
    """Median of a list of equal-shape arrays via odd-even transposition.

    O(k^2) min/max compare-exchanges; exact (including the even-k mean
    convention) and free of sorts/gathers.
    """
    vals = list(values)
    k = len(vals)
    for pass_ in range(k):
        for i in range(pass_ % 2, k - 1, 2):
            lo = xp.minimum(vals[i], vals[i + 1])
            hi = xp.maximum(vals[i], vals[i + 1])
            vals[i], vals[i + 1] = lo, hi
    if k % 2:
        return vals[k // 2]
    return 0.5 * (vals[k // 2 - 1] + vals[k // 2])


def highpass(tile, size: Tuple[int, int] = (5, 5), xp=np):
    """Median high-pass: tile minus its median-filtered low-pass."""
    return tile - median_filter(tile, size=size, xp=xp)


def prepare_tile(tile, cdf=None, highpass_size: Tuple[int, int] = (5, 5), xp=np):
    """Full reference tile pipeline (tracker.py:494-534): grayscale ->
    normalize -> optional histogram match -> median high-pass.

    Returns (processed tile, CDF of the tile before high-pass).
    """
    t = grayscale(tile, xp=xp)
    t = normalize(t, xp=xp)
    if cdf is not None:
        t = match_cdf(t, cdf, xp=xp)
    own_cdf = sorted_cdf(t, xp=xp)
    t = highpass(t, size=highpass_size, xp=xp)
    return t, own_cdf
