"""Fused Pallas kernel: median high-pass + SSE template matching.

The particle filter's observation hot loop runs, per point: median
high-pass the (histogram-matched) search tile, then compute the SSE map
against the high-passed template (``cv2.matchTemplate(TM_SQDIFF)`` in the
reference, ``tracker.py:609-614``). Composed in XLA this writes the
high-passed tile back to HBM between the two stages; this kernel keeps a
block of points' tiles resident in VMEM, computes the 5x5 median via an
in-register sorting network, and accumulates the SSE map with shifted
multiply-adds — one HBM read of the tiles, one HBM write of the SSE maps.
"""
import functools
from typing import Tuple

import numpy as np

try:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except ImportError:  # pragma: no cover
    HAS_PALLAS = False


def _median_highpass_block(tiles, ky: int, kx: int):
    """Median high-pass of an (H, W) tile with symmetric boundary.

    jnp ops only (VPU-friendly): explicit slice-concatenation padding
    (jnp.pad's 'symmetric' mode lowers through `rev`, unsupported in Pallas
    TPU), shifted views, and a min/max sorting network for the median
    (`sort` is likewise unsupported).
    """
    H, W = tiles.shape
    py, px = ky // 2, kx // 2
    top = [tiles[py - 1 - i : py - i, :] for i in range(py)]
    bot = [tiles[H - 1 - i : H - i, :] for i in range(ky - 1 - py)]
    padded = jnp.concatenate(top + [tiles] + bot, axis=0)
    left = [padded[:, px - 1 - j : px - j] for j in range(px)]
    right = [padded[:, W - 1 - j : W - j] for j in range(kx - 1 - px)]
    padded = jnp.concatenate(left + [padded] + right, axis=1)
    shifts = [
        padded[dy : dy + H, dx : dx + W]
        for dy in range(ky)
        for dx in range(kx)
    ]
    return tiles - _median_network(shifts)


def _median_network(values):
    """Median of a list of equal-shape arrays via an odd-even transposition
    sorting network — pure jnp.minimum/maximum (VPU) ops, since Pallas TPU
    cannot lower `sort`."""
    vals = list(values)
    k = len(vals)
    for pass_ in range(k):
        start = pass_ % 2
        for i in range(start, k - 1, 2):
            lo = jnp.minimum(vals[i], vals[i + 1])
            hi = jnp.maximum(vals[i], vals[i + 1])
            vals[i], vals[i + 1] = lo, hi
    if k % 2:
        return vals[k // 2]
    return 0.5 * (vals[k // 2 - 1] + vals[k // 2])


def _kernel(search_ref, template_ref, out_ref, *, th, tw, highpass):
    search = search_ref[0]  # (sh, sw)
    template = template_ref[0]  # (th, tw)
    sh, sw = search.shape
    oh, ow = sh - th + 1, sw - tw + 1
    hp_search = _median_highpass_block(search, highpass[0], highpass[1])
    # SSE(u, v) = sum S^2 (local) - 2 corr + sum T^2, accumulated with
    # shifted multiply-adds over the template footprint (all VPU work on
    # VMEM-resident data). Templates arrive pre-high-passed.
    s2 = jnp.zeros((oh, ow), dtype=search.dtype)
    corr = jnp.zeros((oh, ow), dtype=search.dtype)
    for i in range(th):
        for j in range(tw):
            window = hp_search[i : i + oh, j : j + ow]
            s2 = s2 + window * window
            corr = corr + window * template[i, j]
    t2 = jnp.sum(template * template)
    out_ref[0] = s2 - 2 * corr + t2


def fused_highpass_sse(
    search,
    templates,
    highpass: Tuple[int, int] = (5, 5),
    block_points: int = 1,
    interpret: bool = False,
):
    """Median high-pass the search tiles and compute SSE maps, fused.

    Arguments:
        search: Normalized, histogram-matched search tiles (N, sh, sw).
        templates: High-passed template tiles (N, th, tw).
        highpass: Median filter window (ky, kx).
        block_points: Points per Pallas grid cell (VMEM budget knob).
        interpret: Run in interpreter mode (debugging / CPU tests).

    Returns:
        SSE maps (N, sh-th+1, sw-tw+1), area-unnormalized.
    """
    N, sh, sw = search.shape
    th, tw = templates.shape[-2:]
    oh, ow = sh - th + 1, sw - tw + 1
    grid = (N,)
    kernel = functools.partial(_kernel, th=th, tw=tw, highpass=highpass)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, sh, sw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, oh, ow), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, oh, ow), search.dtype),
        interpret=interpret,
    )(search, templates)
