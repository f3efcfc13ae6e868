"""Pallas TPU kernel: fused 5x5 median high-pass over a stack of tiles.

Replaces the sort-based ``jnp.median`` path of :func:`ops.imageproc.highpass`
(the reference's ``scipy.ndimage.median_filter`` high-pass,
tracker.py:536-561) with an odd-even transposition network evaluated on
whole vector registers in VMEM — no sorts, no gathers, one HBM round trip.

Mosaic lowers min/max networks but not ``sort``; block shapes must be
lane-aligned (the last axis is padded to a multiple of 128 and the
second-to-last to a multiple of 8 — unaligned blocks SIGABRT the Mosaic
compiler on some versions).
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _median_hp_kernel(oh: int, ow: int, kh: int, kw: int, x_ref, o_ref):
    x = x_ref[...]
    taps = [
        jax.lax.slice(x, (dr, dc), (dr + oh, dc + ow))
        for dr in range(kh)
        for dc in range(kw)
    ]
    vals = list(taps)
    n = len(vals)
    # Odd-even transposition network: after n rounds vals is fully sorted.
    for rnd in range(n):
        for i in range(rnd % 2, n - 1, 2):
            lo = jnp.minimum(vals[i], vals[i + 1])
            hi = jnp.maximum(vals[i], vals[i + 1])
            vals[i], vals[i + 1] = lo, hi
    med = vals[n // 2]
    center = jax.lax.slice(
        x, (kh // 2, kw // 2), (kh // 2 + oh, kw // 2 + ow)
    )
    o_ref[...] = center - med


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("size", "interpret"))
def median_highpass(tiles, size=(5, 5), interpret: bool = False):
    """tile - median_filter(tile) over a stack (N, h, w), TPU Pallas kernel.

    Matches :func:`ops.imageproc.highpass` (symmetric/reflect padding)
    exactly; odd ``size`` only. ``interpret=True`` runs the kernel in the
    Pallas interpreter (CPU tests).
    """
    N, h, w = tiles.shape
    kh, kw = size
    ph, pw = kh // 2, kw // 2
    # Symmetric pad (reflect-including-edge), then embed in an aligned block.
    padded = jnp.concatenate(
        [tiles[:, ph - 1 :: -1, :], tiles, tiles[:, : h - ph - 1 : -1, :]],
        axis=1,
    )
    padded = jnp.concatenate(
        [padded[:, :, pw - 1 :: -1], padded, padded[:, :, : w - pw - 1 : -1]],
        axis=2,
    )
    oh_a = _round_up(h, 8)
    ow_a = _round_up(w, 128)
    ih_a, iw_a = oh_a + kh - 1, ow_a + kw - 1
    padded = jnp.pad(
        padded,
        ((0, 0), (0, ih_a - (h + kh - 1)), (0, iw_a - (w + kw - 1))),
        mode="edge",
    )
    out = pl.pallas_call(
        functools.partial(_median_hp_kernel, oh_a, ow_a, kh, kw),
        grid=(N,),
        in_specs=[pl.BlockSpec((None, ih_a, iw_a), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((None, oh_a, ow_a), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, oh_a, ow_a), tiles.dtype),
        interpret=interpret,
    )(padded)
    return out[:, :h, :w]
