"""Correlation refinement of keypoint matches (pixel-locking removal).

SIFT-style detectors localize keypoints independently per image, and every
subpixel estimator retains a small texture-phase-coherent localization bias
("pixel locking"). The bias largely cancels between overlapping views, but
the residual acts as a multiplicative shrinkage of the measured inter-frame
displacement (a few percent), and at 1,000-frame stabilization scale it
integrates into the dominant rotation error (docs/validation.md; measured
with benchmarks/pair_bias.py).

This stage makes detector bias second-order by re-measuring each MATCH
displacement directly: the A-side patch is anchored on the integer pixel
grid (so A carries no subpixel estimate at all), correlated against a
search window around the B keypoint, and the SSE minimum is refined to
subpixel on the exact bicubic B-spline of the SSE surface with damped
Newton iterations. All per-match work is batched and device-resident:
patch/window extraction is two one-hot matmuls per axis (MXU; TPU gathers
are ~1000x slower per element), the SSE maps use the particle filter's
reduce_window + grouped-conv kernel (:func:`ops.ncc.sse_map_batched`), and
the spline refinement is dense-basis matmuls.

No reference counterpart: /root/reference/src/glimpse/optimize.py relies on
cv2 SIFT's per-keypoint localization alone (optimize.py:2194-2231). The
stage exists because the TPU-native detector (ops/features.py) must match
host SIFT's *stabilization* accuracy, and measuring displacement at the
match level is cheaper and less biased than perfecting per-keypoint
localization in isolation.
"""
import functools
from typing import Callable, Dict, Tuple

import numpy as np

try:
    import jax
    import jax.numpy as jnp
except ImportError:  # pragma: no cover
    jax = None
    jnp = None

from . import ncc, sampling


def _extract_tiles_onehot(image, corners, size: int, dtype):
    """(N,) fixed-size square tiles as two one-hot matmuls (MXU).

    ``corners`` are integer (row, col) upper-left corners (N, 2), already
    clamped inside the image. Same trick as the tracker's tile extraction
    (track/batch.py:_extract_tiles_matmul): out[n] = R_n @ image @ C_n^T.
    """
    H, W = image.shape
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, 1, H), 2)
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (1, size, 1), 1)
    rows_onehot = (corners[:, 0][:, None, None] + iota_t == iota_h).astype(dtype)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    cols_onehot = (corners[:, 1][:, None, None] + iota_t == iota_w).astype(dtype)
    rows = jnp.einsum(
        "nih,hw->niw", rows_onehot, image.astype(dtype),
        preferred_element_type=dtype,
    )
    return jnp.einsum(
        "niw,njw->nij", rows, cols_onehot, preferred_element_type=dtype
    )


def _basis_with_derivs(q, n: int):
    """Cubic B-spline basis rows and their first/second derivatives.

    ``q`` (N,) query coordinates -> three (N, n) matrices. Derivatives come
    from elementwise jvp chains through the dense natural-BC basis
    (:func:`ops.sampling.bspline_basis_dense`), so spline value, gradient
    and Hessian are all bilinear forms B_y @ C @ B_x — matmuls, no gathers.
    """

    def b(qq):
        return sampling.bspline_basis_dense(qq, n, xp=jnp, dtype=jnp.float32)

    ones = jnp.ones_like(q)
    b0, b1 = jax.jvp(b, (q,), (ones,))
    _, b2 = jax.jvp(lambda qq: jax.jvp(b, (qq,), (ones,))[1], (q,), (ones,))
    return b0, b1, b2


def _newton_peak_2d(coeff, y0, x0, iters: int):
    """Damped Newton minimization on a bicubic spline surface.

    ``coeff`` (N, o, o) B-spline coefficients, (y0, x0) (N,) start
    positions (the integer argmin). Steps are clipped to +-1 cell and
    positions to the grid; a non-positive-definite 2x2 Hessian falls back
    to a small gradient-descent step, so saddle starts cannot diverge.
    """
    o = coeff.shape[-1]

    def body(_, yx):
        y, x = yx
        by0, by1, by2 = _basis_with_derivs(y, o)
        bx0, bx1, bx2 = _basis_with_derivs(x, o)

        def form(by, bx):
            # HIGHEST is required: the TPU einsum default truncates the
            # basis rows and spline coefficients to bf16, and the Newton
            # gradient/Hessian near a peak are small differences of large
            # SSE values — bf16 noise there swamps the local curvature.
            return jnp.einsum(
                "ni,nij,nj->n", by, coeff, bx,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        gy = form(by1, bx0)
        gx = form(by0, bx1)
        hyy = form(by2, bx0)
        hxx = form(by0, bx2)
        hxy = form(by1, bx1)
        det = hyy * hxx - hxy * hxy
        pd = (det > 1e-12) & (hyy > 0)
        det_safe = jnp.where(pd, det, 1.0)
        sy = jnp.where(pd, (hxx * gy - hxy * gx) / det_safe, 0.25 * gy)
        sx = jnp.where(pd, (hyy * gx - hxy * gy) / det_safe, 0.25 * gx)
        y = jnp.clip(y - jnp.clip(sy, -1.0, 1.0), 0.0, o - 1.0)
        x = jnp.clip(x - jnp.clip(sx, -1.0, 1.0), 0.0, o - 1.0)
        return y, x

    return jax.lax.fori_loop(0, iters, body, (y0, x0))


def _refine_one_pair(img_a, img_b, ca, cb, template: int, search: int,
                     iters: int):
    """Refined peak positions for one image pair (traced shape-static).

    ``ca``/``cb`` (N, 2) integer (row, col) UPPER-LEFT corners of the
    A-template and B-window, pre-clamped inside the images. Returns (y, x)
    (N,) subpixel peak positions in window coordinates.
    """
    # uint8-valued images are exact in bfloat16 (integers <= 255 need 8
    # mantissa bits), and one-hot selection sums exactly one element per
    # output — extraction in bf16 doubles MXU throughput losslessly.
    ta = _extract_tiles_onehot(img_a, ca, template, jnp.bfloat16).astype(
        jnp.float32
    )
    sb = _extract_tiles_onehot(img_b, cb, search, jnp.bfloat16).astype(
        jnp.float32
    )
    sse = ncc.sse_map_batched(sb, ta, xp=jnp, method="shift")  # (N, o, o)
    o = sse.shape[-1]
    flat = sse.reshape(sse.shape[0], -1)
    idx = jnp.argmin(flat, axis=1)
    iy = (idx // o).astype(jnp.float32)
    ix = (idx % o).astype(jnp.float32)
    coeff = sampling.bspline_prefilter_2d(
        sse, xp=jnp, dtype=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return _newton_peak_2d(coeff, iy, ix, iters)


class MatchRefiner:
    """Device-batched correlation refinement over a match sequence.

    Matches are processed in fixed-shape chunks of ``pairs_per_dispatch``
    image pairs x ``pad_matches`` matches (one compiled program, one RPC
    per chunk — per-dispatch overhead on the tunneled TPU backend is
    ~30 ms, so single-pair dispatches would dominate). Decoded images are
    cached device-side in an LRU keyed by the caller's image index, sized
    to the matching window (seq=(1, 8, 64) revisits an image for up to 64
    subsequent pairs).
    """

    def __init__(self, template: int = 11, search: int = 25,
                 iters: int = 4, pad_matches: int = 3072,
                 pairs_per_dispatch: int = 8, cache_images: int = 192):
        if template % 2 == 0 or search % 2 == 0 or search <= template:
            raise ValueError("template/search must be odd, search > template")
        self.template = int(template)
        self.search = int(search)
        self.iters = int(iters)
        self.pad_matches = int(pad_matches)
        self.pairs_per_dispatch = int(pairs_per_dispatch)
        self._cache_images = int(cache_images)
        self._images: Dict[int, object] = {}  # insertion-ordered LRU
        self._jit = {}

    def _device_image(self, key: int, read: Callable[[int], np.ndarray]):
        img = self._images.pop(key, None)
        if img is None:
            img = jnp.asarray(np.asarray(read(key), dtype=np.float32))
        self._images[key] = img
        while len(self._images) > self._cache_images:
            self._images.pop(next(iter(self._images)))
        return img

    def _compiled(self, shape: Tuple[int, int]):
        fn = self._jit.get(shape)
        if fn is None:
            pair = functools.partial(
                _refine_one_pair, template=self.template, search=self.search,
                iters=self.iters,
            )
            fn = jax.jit(jax.vmap(pair))
            self._jit[shape] = fn
        return fn

    def refine_pairs(self, pairs, uvs, read_image):
        """Refine matched coordinates for a sequence of image pairs.

        Arguments:
            pairs: Iterable of (i, j) image-index pairs.
            uvs: Parallel iterable of (uv_a, uv_b) float (n, 2) arrays
                (column = x, row = y; variable n per pair).
            read_image: Callable index -> 2D grayscale array (uint8 value
                range; any float cast is taken as-is).

        Returns:
            List of (uv_a', uv_b') refined arrays. Matches whose template
            or window would cross an image border keep their original
            coordinates; refined A-coordinates are the integer-anchored
            template centers, refined B-coordinates carry the measured
            subpixel displacement.
        """
        pairs = [tuple(map(int, p)) for p in pairs]
        uvs = [(np.asarray(a, float), np.asarray(b, float)) for a, b in uvs]
        th = self.template // 2
        sh = self.search // 2
        center = (self.search - self.template) / 2.0
        out = [None] * len(pairs)
        order = sorted(range(len(pairs)), key=lambda k: pairs[k])
        C = self.pairs_per_dispatch
        for start in range(0, len(order), C):
            chunk = order[start:start + C]
            n_pad = self.pad_matches
            over = [
                k for k in chunk if len(uvs[k][0]) > n_pad
            ]
            if over:
                n_pad = int(max(len(uvs[k][0]) for k in over))
            imgs_a, imgs_b, cas, cbs = [], [], [], []
            valids, metas = [], []
            for k in chunk:
                i, j = pairs[k]
                uv_a, uv_b = uvs[k]
                img_a = self._device_image(i, read_image)
                img_b = self._device_image(j, read_image)
                H, W = img_a.shape
                pa = np.round(uv_a).astype(np.int64)
                pb = np.round(uv_b).astype(np.int64)
                valid = (
                    (pa[:, 0] >= th) & (pa[:, 0] < W - th)
                    & (pa[:, 1] >= th) & (pa[:, 1] < H - th)
                    & (pb[:, 0] >= sh) & (pb[:, 0] < W - sh)
                    & (pb[:, 1] >= sh) & (pb[:, 1] < H - sh)
                ) if len(pa) else np.zeros(0, bool)
                n = len(pa)
                ca = np.zeros((n_pad, 2), np.int32)
                cb = np.zeros((n_pad, 2), np.int32)
                if n:
                    # (row, col) corners, clamped so padding rows stay legal.
                    ca[:n] = np.clip(
                        pa[:, ::-1] - th, 0, [H - self.template, W - self.template]
                    )
                    cb[:n] = np.clip(
                        pb[:, ::-1] - sh, 0, [H - self.search, W - self.search]
                    )
                imgs_a.append(img_a)
                imgs_b.append(img_b)
                cas.append(ca)
                cbs.append(cb)
                valids.append(valid)
                metas.append((k, n, pa, pb))
            while len(imgs_a) < C:  # pad the chunk to a fixed pair count
                imgs_a.append(imgs_a[-1])
                imgs_b.append(imgs_b[-1])
                cas.append(cas[-1])
                cbs.append(cbs[-1])
            fn = self._compiled((C, n_pad) + imgs_a[0].shape)
            y, x = fn(
                jnp.stack(imgs_a), jnp.stack(imgs_b),
                jnp.asarray(np.stack(cas)), jnp.asarray(np.stack(cbs)),
            )
            y = np.asarray(y)
            x = np.asarray(x)
            for row, (valid, (k, n, pa, pb)) in enumerate(zip(valids, metas)):
                uv_a, uv_b = uvs[k]
                if n == 0:
                    out[k] = (uv_a, uv_b)
                    continue
                duv = np.stack(
                    [x[row, :n] - center, y[row, :n] - center], axis=1
                ) + (pb - pa)
                ra = np.where(valid[:, None], pa.astype(float), uv_a)
                rb = np.where(valid[:, None], pa + duv, uv_b)
                out[k] = (ra, rb)
        return out


def refine_matches(img_a, img_b, uv_a, uv_b, template: int = 11,
                   search: int = 25, iters: int = 4):
    """One-pair convenience wrapper around :class:`MatchRefiner`."""
    refiner = MatchRefiner(
        template=template, search=search, iters=iters,
        pad_matches=max(len(np.atleast_2d(uv_a)), 1),
        pairs_per_dispatch=1, cache_images=2,
    )
    imgs = {0: img_a, 1: img_b}
    (out,) = refiner.refine_pairs(
        [(0, 1)], [(uv_a, uv_b)], lambda k: imgs[k]
    )
    return out
