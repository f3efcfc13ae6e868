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
    x = x_ref[...]  # (G, ih, iw): G tiles per grid step
    G = x.shape[0]
    taps = [
        jax.lax.slice(x, (0, dr, dc), (G, dr + oh, dc + ow))
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
        x, (0, kh // 2, kw // 2), (G, kh // 2 + oh, kw // 2 + ow)
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
    ih, iw = h + kh - 1, w + kw - 1
    # Lane packing: a lone tile occupies iw of 128 lanes (a 31x31 search
    # tile wastes 3/4 of every vector register on pad). Stripe `npack`
    # tiles side by side with pitch iw; the kernel's static tap slices
    # shift all stripes together, and the up-to-(kw-1)-lane bleed from the
    # next stripe only lands on each stripe's own pad columns, which the
    # unpack below discards. Tiles are also batched G-deep on the leading
    # block dim. Together: ~3-4x fewer vector ops AND fewer grid steps
    # (the 300-stage 5x5 median network is pure VPU work).
    npack = max(1, 128 // iw)
    G = 8
    per_block = G * npack
    Ng = -(-N // per_block) * per_block
    padded = jnp.pad(padded, ((0, Ng - N), (0, 0), (0, 0)), mode="edge")
    oh_a = _round_up(h, 8)
    ih_a = oh_a + kh - 1
    padded = jnp.pad(
        padded, ((0, 0), (0, ih_a - ih), (0, 0)), mode="edge"
    )
    # (Ng, ih_a, iw) -> (Ng/npack, ih_a, npack*iw) -> lanes padded to 128.
    packed = jnp.transpose(
        padded.reshape(Ng // npack, npack, ih_a, iw), (0, 2, 1, 3)
    ).reshape(Ng // npack, ih_a, npack * iw)
    iw_a = _round_up(npack * iw, 128)
    packed = jnp.pad(packed, ((0, 0), (0, 0), (0, iw_a - npack * iw)))
    ow_a = iw_a - kw + 1
    out = pl.pallas_call(
        functools.partial(_median_hp_kernel, oh_a, ow_a, kh, kw),
        grid=(Ng // per_block,),
        in_specs=[pl.BlockSpec((G, ih_a, iw_a), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((G, oh_a, ow_a), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Ng // npack, oh_a, ow_a), tiles.dtype),
        interpret=interpret,
    )(packed)
    # Unpack stripes: output column j of stripe p sits at lane p*iw + j.
    out = out[:, :h, : npack * iw]
    out = jnp.pad(out, ((0, 0), (0, 0), (0, npack * iw - out.shape[2])))
    out = out.reshape(Ng // npack, h, npack, iw).transpose(0, 2, 1, 3)
    return out.reshape(Ng, h, iw)[:N, :, :w]
