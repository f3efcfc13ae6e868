"""Fused Pallas kernel: median high-pass + SSE template matching.

The particle filter's observation hot loop runs, per point: median
high-pass the (histogram-matched) search tile, then compute the SSE map
against the high-passed template (``cv2.matchTemplate(TM_SQDIFF)`` in the
reference, ``tracker.py:609-614``). Composed in XLA this writes the
high-passed tile back to HBM between the two stages; this kernel keeps a
block of points' tiles resident in VMEM, computes the 5x5 median via an
in-register min/max network, and accumulates the SSE map with shifted
multiply-adds — one HBM read of the tiles, one HBM write of the SSE maps.

Mosaic rules (learned the hard way): ``sort``/``rev`` do not lower (use
min/max networks and slice-concatenation), and block shapes must be
lane-aligned — outputs padded to multiples of (8, 128) — or the Mosaic
compiler SIGABRTs.

Measured on a real chip (1024 tiles, 41x41 search, 15x15 template): this
fused kernel is CORRECT but ~2.7x slower than the production path (the
225-tap shifted-MAC correlation is VPU work, while XLA lowers the same
correlation onto the convolution units). Production uses the XLA conv SSE
(:mod:`glimpse_tpu.ops.ncc`) plus the dedicated Pallas high-pass
(:mod:`glimpse_tpu.kernels.highpass_pallas`); this kernel remains as the
fully-fused reference implementation.
"""
import functools
from typing import Tuple

import numpy as np

try:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    HAS_PALLAS = True
except ImportError:  # pragma: no cover
    HAS_PALLAS = False


def _median_network(values):
    """Median of equal-shape arrays via odd-even transposition — pure
    jnp.minimum/maximum (VPU) ops, since Pallas TPU cannot lower `sort`."""
    vals = list(values)
    k = len(vals)
    for pass_ in range(k):
        for i in range(pass_ % 2, k - 1, 2):
            lo = jnp.minimum(vals[i], vals[i + 1])
            hi = jnp.maximum(vals[i], vals[i + 1])
            vals[i], vals[i + 1] = lo, hi
    if k % 2:
        return vals[k // 2]
    return 0.5 * (vals[k // 2 - 1] + vals[k // 2])


def _kernel(hh, hw, oh, ow, th, tw, ky, kx, search_ref, template_ref, out_ref):
    """search_ref: symmetric-padded tile (hh + ky - 1, hw + kx - 1);
    template_ref: (th_pad, tw_pad) zero-padded beyond (th, tw);
    out_ref: (oh_pad, ow_pad), valid in [:oh, :ow]."""
    x = search_ref[...]
    # Median high-pass over the (hh, hw) region feeding the SSE windows.
    taps = [
        jax.lax.slice(x, (dy, dx), (dy + hh, dx + hw))
        for dy in range(ky)
        for dx in range(kx)
    ]
    center = jax.lax.slice(x, (ky // 2, kx // 2), (ky // 2 + hh, kx // 2 + hw))
    hp = center - _median_network(taps)
    template = template_ref[...]
    oh_pad, ow_pad = out_ref.shape[-2], out_ref.shape[-1]
    s2 = jnp.zeros((oh_pad, ow_pad), dtype=x.dtype)
    corr = jnp.zeros((oh_pad, ow_pad), dtype=x.dtype)
    t2 = jnp.zeros((), dtype=x.dtype)
    for i in range(th):
        for j in range(tw):
            window = jax.lax.slice(hp, (i, j), (i + oh_pad, j + ow_pad))
            tij = template[i, j]
            s2 = s2 + window * window
            corr = corr + window * tij
            t2 = t2 + tij * tij
    out_ref[...] = s2 - 2.0 * corr + t2


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fused_highpass_sse(
    search,
    templates,
    highpass: Tuple[int, int] = (5, 5),
    interpret: bool = False,
):
    """Median high-pass the search tiles and compute SSE maps, fused.

    Arguments:
        search: Normalized, histogram-matched search tiles (N, sh, sw).
        templates: High-passed template tiles (N, th, tw).
        highpass: Median filter window (ky, kx), odd taps.
        interpret: Run in interpreter mode (debugging / CPU tests).

    Returns:
        SSE maps (N, sh-th+1, sw-tw+1), area-unnormalized. Equals
        ``sse_map_batched(highpass(search), templates)``.
    """
    N, sh, sw = search.shape
    th, tw = templates.shape[-2:]
    ky, kx = highpass
    oh, ow = sh - th + 1, sw - tw + 1
    # Aligned output block; the high-passed region must cover every shifted
    # window: (oh_pad + th - 1, ow_pad + tw - 1).
    oh_pad = _round_up(oh, 8)
    ow_pad = _round_up(ow, 128)
    hh, hw = oh_pad + th - 1, ow_pad + tw - 1
    # Host-side symmetric pad for the median + edge-replication out to the
    # aligned compute region (values beyond the true tile only influence
    # out-of-range outputs, cropped below).
    py, px = ky // 2, kx // 2
    padded = jnp.concatenate(
        [search[:, py - 1 :: -1, :], search, search[:, : sh - py - 1 : -1, :]],
        axis=1,
    )
    padded = jnp.concatenate(
        [padded[:, :, px - 1 :: -1], padded, padded[:, :, : sw - px - 1 : -1]],
        axis=2,
    )
    ih, iw = hh + ky - 1, hw + kx - 1
    padded = jnp.pad(
        padded,
        ((0, 0), (0, ih - padded.shape[1]), (0, iw - padded.shape[2])),
        mode="edge",
    )
    th_pad = _round_up(th, 8)
    tw_pad = _round_up(tw, 128)
    templates_padded = jnp.pad(
        templates, ((0, 0), (0, th_pad - th), (0, tw_pad - tw))
    )
    kernel = functools.partial(_kernel, hh, hw, oh, ow, th, tw, ky, kx)
    out = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((None, ih, iw), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, th_pad, tw_pad), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, oh_pad, ow_pad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, oh_pad, ow_pad), search.dtype),
        interpret=interpret,
    )(padded, templates_padded)
    return out[:, :oh, :ow]
