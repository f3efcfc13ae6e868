"""Device keypoint detection + description (TPU-native SIFT replacement).

The reference pipeline detects keypoints with host OpenCV SIFT, one process
per image (``/root/reference/src/glimpse/optimize.py:2442-2445``); on this
target the host has a single core, so the round-3 rebuild moves detection
onto the device. The design is dense-first (TPU-friendly), not a port of
the SIFT scanline algorithm:

- **Scale space as convolutions.** Per octave, an incremental separable
  Gaussian ladder and difference-of-Gaussian (DoG) levels — all static
  shapes, all on the conv units.
- **Extrema as reduce_window.** A 3x3x3 (scale, y, x) max/min pool over
  the DoG stack; a pixel is a candidate where it equals the pooled
  extremum, passes the contrast threshold, and passes the Hessian edge
  test (tr^2/det bound, computed densely with finite differences).
- **Selection as top_k.** Scores are flattened per octave and the best
  ``quota`` survive via ``lax.top_k`` — fixed K keeps every downstream
  shape static. Invalid slots carry score 0 and a validity flag.
- **Subpixel as dense maps.** The quadratic-fit offsets ``-D'/D''`` are
  computed densely (elementwise on the DoG stack) and *sampled* at the
  selected keypoints, instead of gathering 3x3x3 neighborhoods per point.
- **Descriptors as blurred bin maps.** Gradient magnitude is soft-binned
  into 8 orientation planes; a Gaussian blur provides the descriptor cell
  weighting; the 4x4 cell grid is then read with ONE fused 8-channel
  bilinear gather per octave (TPU gathers are row-cost-dominated, so the
  8 channels ride along free — see CLAUDE.md). L2-normalize, clip 0.2,
  renormalize (SIFT's illumination contract).

Descriptors are **upright** (no rotation normalization): the time-lapse
stabilization workload this feeds (ObserverCameras) sees sub-degree
inter-frame roll, where orientation estimation only adds noise. The
128-float descriptor layout (4x4 cells x 8 bins) matches SIFT's, so the
device matcher (:mod:`glimpse_tpu.ops.matching`) is shared unchanged.

Keypoint coordinates follow the cv2 convention used by the host path
(array indices, subpixel; ``KeyPoint.pt`` interchangeable).
"""
import functools
import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import jax
    import jax.numpy as jnp
except ImportError:  # pragma: no cover
    jax = None
    jnp = None


import os as _os

_GAUSS_RADIUS = float(_os.environ.get("GLIMPSE_GAUSS_RADIUS", "3.0"))


def _gauss_kernel(sigma: float) -> np.ndarray:
    radius = max(1, int(math.ceil(_GAUSS_RADIUS * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur(x, sigma: float, precision=jax.lax.Precision.HIGHEST):
    """Separable Gaussian blur of (B, H, W), SAME padding.

    precision=HIGHEST default is load-bearing for the Gaussian LADDER: the
    TPU conv default truncates inputs to bf16 (8 mantissa bits). The DoG is
    a *difference* of adjacent blurs at ~1-5% of image magnitude, so bf16
    truncation of the ladder becomes a deterministic, texture-phase-coherent
    5-20% relative error in the DoG — exactly the coherent subpixel
    localization bias seen only on-chip (CPU convs are f32, which is why
    the CPU stabilization probe could not reproduce it). Descriptor
    orientation-plane smoothing does NOT need this (the planes feed a
    normalized 128-vector, not a small difference) and passes DEFAULT to
    avoid HIGHEST's ~3-6x conv slowdown there.
    """
    k = _gauss_kernel(sigma)
    r = len(k) // 2
    kx = jnp.asarray(k).reshape(1, 1, 1, -1)
    ky = jnp.asarray(k).reshape(1, 1, -1, 1)
    y = jax.lax.conv_general_dilated(
        x[:, None], kx, (1, 1), [(0, 0), (r, r)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=precision,
    )
    y = jax.lax.conv_general_dilated(
        y, ky, (1, 1), [(r, r), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=precision,
    )
    return y[:, 0]


def _shift(x, dy: int, dx: int):
    """Shift (..., H, W) by (dy, dx) with edge replication."""
    H, W = x.shape[-2], x.shape[-1]
    y0, x0 = max(-dy, 0), max(-dx, 0)
    core = jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(x, y0, y0 + H - abs(dy), axis=-2),
        x0, x0 + W - abs(dx), axis=-1,
    )
    pad = [(0, 0)] * (x.ndim - 2) + [
        (max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))
    ]
    return jnp.pad(core, pad, mode="edge")


def _fused_bilinear_rows(maps_flat, W: int, H: int, yy, xx):
    """Bilinear sample (H*W, C) maps at float (..., ) coords.

    One ``take`` per corner moves all C channels together (fused row
    gather); returns (..., C).
    """
    x0 = jnp.clip(jnp.floor(xx), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(yy), 0, H - 2).astype(jnp.int32)
    fx = jnp.clip(xx - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(yy - y0, 0.0, 1.0)[..., None]
    base = y0 * W + x0
    g00 = jnp.take(maps_flat, base, axis=0)
    g01 = jnp.take(maps_flat, base + 1, axis=0)
    g10 = jnp.take(maps_flat, base + W, axis=0)
    g11 = jnp.take(maps_flat, base + W + 1, axis=0)
    top = g00 * (1 - fx) + g01 * fx
    bot = g10 * (1 - fx) + g11 * fx
    return top * (1 - fy) + bot * fy


def _octave_detect(
    gauss,
    mask,
    quota: int,
    n_scales: int,
    sigma0: float,
    contrast_threshold: float,
    edge_ratio: float,
    border: int,
    refine: str = "lattice",
):
    """Detect + describe within one octave.

    ``gauss``: (B, L, H, W) Gaussian ladder (L = n_scales + 3);
    ``mask``: (B, H, W) float validity (already eroded) or None.
    Returns per-image arrays (all length ``quota``): y, x (octave coords,
    subpixel), level (int), score, desc (quota, 128), valid.
    """
    B, L, H, W = gauss.shape
    dog = gauss[:, 1:] - gauss[:, :-1]  # (B, L-1, H, W)
    # 3x3x3 extrema over (scale, y, x).
    mx = jax.lax.reduce_window(
        dog, -jnp.inf, jax.lax.max, (1, 3, 3, 3), (1, 1, 1, 1), "SAME"
    )
    mn = jax.lax.reduce_window(
        dog, jnp.inf, jax.lax.min, (1, 3, 3, 3), (1, 1, 1, 1), "SAME"
    )
    center = dog[:, 1:-1]  # levels 1..n_scales
    is_ext = ((center >= mx[:, 1:-1]) & (center > 0)) | (
        (center <= mn[:, 1:-1]) & (center < 0)
    )
    # Dense spatial derivatives of the DoG (for edge test + subpixel).
    dxx = _shift(center, 0, 1) + _shift(center, 0, -1) - 2 * center
    dyy = _shift(center, 1, 0) + _shift(center, -1, 0) - 2 * center
    dxy = 0.25 * (
        _shift(center, 1, 1) + _shift(center, -1, -1)
        - _shift(center, 1, -1) - _shift(center, -1, 1)
    )
    # _shift(x, 0, 1) carries x[i-1] to i, so the forward sample is the
    # NEGATIVE shift.
    dx = 0.5 * (_shift(center, 0, -1) - _shift(center, 0, 1))
    dy = 0.5 * (_shift(center, -1, 0) - _shift(center, 1, 0))
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_ratio
    edge_ok = (det > 0) & (tr * tr * r < det * (r + 1) ** 2)
    score = jnp.where(
        is_ext & edge_ok & (jnp.abs(center) >= contrast_threshold),
        jnp.abs(center),
        0.0,
    )
    # Border + mask suppression.
    yy_i = jnp.arange(H)
    xx_i = jnp.arange(W)
    in_border = (
        (yy_i >= border)[None, None, :, None]
        & (yy_i < H - border)[None, None, :, None]
        & (xx_i >= border)[None, None, None, :]
        & (xx_i < W - border)[None, None, None, :]
    )
    score = jnp.where(in_border, score, 0.0)
    if mask is not None:
        score = score * mask[:, None]
    # Scale-axis derivatives for the FULL 3x3 (x, y, scale) Newton fit.
    # The scale axis is load-bearing: under small anisotropic scale
    # changes (pitch-induced foreshortening between frames) the extremum
    # drifts along scale, and a spatial-only fit converts that drift
    # into a coherent position bias across the whole frame — which a
    # rotation fit then reads as apparent roll (measured ~2e-3 deg; the
    # 3D solve is what brings it to SIFT's level).
    up, down = dog[:, 2:], dog[:, :-2]

    def _dx_of(a):
        return 0.5 * (_shift(a, 0, -1) - _shift(a, 0, 1))

    def _dy_of(a):
        return 0.5 * (_shift(a, -1, 0) - _shift(a, 1, 0))

    ds = 0.5 * (up - down)
    dss = up + down - 2 * center
    dxs = 0.5 * (_dx_of(up) - _dx_of(down))
    dys = 0.5 * (_dy_of(up) - _dy_of(down))

    def _newton3(gr, hs):
        """-H^-1 g for the symmetric 3x3 (x, y, s) system, clipped."""
        (gdx, gdy, gds) = gr
        (hxx, hyy, hss, hxy, hxs, hys) = hs
        a11 = hyy * hss - hys * hys
        a12 = hxs * hys - hxy * hss
        a13 = hxy * hys - hyy * hxs
        a22 = hxx * hss - hxs * hxs
        a23 = hxy * hxs - hxx * hys
        a33 = hxx * hyy - hxy * hxy
        det3 = hxx * a11 + hxy * a12 + hxs * a13
        safe = jnp.where(jnp.abs(det3) > 1e-12, det3, 1e-12)
        ox = jnp.clip(-(a11 * gdx + a12 * gdy + a13 * gds) / safe, -0.6, 0.6)
        oy = jnp.clip(-(a12 * gdx + a22 * gdy + a23 * gds) / safe, -0.6, 0.6)
        os_ = jnp.clip(-(a13 * gdx + a23 * gdy + a33 * gds) / safe, -0.6, 0.6)
        return ox, oy, os_

    flat = score.reshape(B, -1)
    top_scores, top_idx = jax.lax.top_k(flat, quota)  # (B, quota)
    valid = top_scores > 0
    lvl = top_idx // (H * W)
    rem = top_idx - lvl * (H * W)
    iy = rem // W
    ix = rem - iy * W
    deriv = jnp.stack(
        [dx, dy, ds, dxx, dyy, dss, dxy, dxs, dys, center], axis=-1
    )  # (B, S, H, W, 10); channel 9 = D (for the contrast recheck)
    dflat = deriv.reshape(B, n_scales * H * W, 10)

    def _resampled_step(fx0, fy0, lv):
        """One Newton iteration with the nine derivative maps bilinearly
        resampled at (fx0, fy0) on level ``lv`` — the DoG is not a
        quadratic, so iterating on interpolated derivatives removes the
        texture-phase bias a single lattice fit retains. The level stack
        is addressed as one tall (S*H, W) image; the inner y-clip keeps
        the bilinear support inside the keypoint's own level."""
        d9 = jax.vmap(
            lambda df, lv2, yy2, xx2: _fused_bilinear_rows(
                df, W, n_scales * H, lv2 * H + jnp.clip(yy2, 1.0, H - 2.0),
                jnp.clip(xx2, 1.0, W - 2.0),
            )
        )(dflat[..., :9], lv.astype(jnp.float32), fy0, fx0)  # (B, quota, 9)
        step_x, step_y, _ = _newton3(
            tuple(d9[..., i] for i in range(3)),
            tuple(d9[..., i] for i in range(3, 9)),
        )
        return (
            fx0 + jnp.clip(step_x, -0.5, 0.5),
            fy0 + jnp.clip(step_y, -0.5, 0.5),
        )

    def _dense_refine():
        """'bilinear' refinement: dense one-step 3D Newton (-H^-1 grad,
        exactly SIFT's quadratic fit but computed densely and sampled at
        the selected keypoints) + one resampled second iteration."""
        off_x, off_y, _ = _newton3(
            (dx, dy, ds), (dxx, dyy, dss, dxy, dxs, dys)
        )
        off = jnp.stack([off_x, off_y], axis=-1).reshape(B, -1, 2)
        off_sel = jnp.take_along_axis(off, top_idx[..., None], axis=1)
        return _resampled_step(ix + off_sel[..., 0], iy + off_sel[..., 1], lvl)

    if refine == "lattice":
        # Iterated LATTICE Newton (cv2 SIFT's adjustLocalExtrema
        # semantics): fit the 3D quadratic from EXACT grid derivatives at
        # the current lattice point; while the fitted extremum falls
        # outside the center cell, move to the rounded neighbor and
        # refit. No interpolation of the derivative maps at all, plus
        # cv2's interpolated-contrast recheck.
        px, py, ps = ix, iy, lvl  # current lattice point (int32)
        off_xyz = None
        for _ in range(5):  # cv2 SIFT_MAX_INTERP_STEPS
            lin = (ps * H + py) * W + px
            d10 = jax.vmap(lambda df, i: jnp.take(df, i, axis=0))(
                dflat, lin
            )  # (B, quota, 10) — exact lattice derivatives, one row gather
            ox, oy, os_ = _newton3(
                tuple(d10[..., i] for i in range(3)),
                tuple(d10[..., i] for i in range(3, 9)),
            )
            inside = (
                (jnp.abs(ox) < 0.5)
                & (jnp.abs(oy) < 0.5)
                & (jnp.abs(os_) < 0.5)
            )
            off_xyz = (ox, oy, os_, d10)
            # Move unconverged keypoints to the rounded neighbor, clamped
            # to the valid interior; converged ones stay put.
            step = lambda o: jnp.clip(jnp.round(o), -1, 1).astype(jnp.int32)
            px = jnp.where(
                inside, px, jnp.clip(px + step(ox), border, W - 1 - border)
            )
            py = jnp.where(
                inside, py, jnp.clip(py + step(oy), border, H - 1 - border)
            )
            ps = jnp.where(
                inside, ps, jnp.clip(ps + step(os_), 0, n_scales - 1)
            )
        ox, oy, os_, d10 = off_xyz
        # cv2 discards keypoints whose final fit still leaves the cell
        # (adjustLocalExtrema returns false after SIFT_MAX_INTERP_STEPS
        # with any |offset| >= 0.5). The strict 0.5 matters: a broad
        # extremum can OSCILLATE between two lattice cells, ending with
        # |offset| ~ 0.55 — accepting it mislocalizes by half a cell
        # (x 2^octave image pixels). Instead of discarding oscillators
        # (cv2's recall loss), unconverged keypoints fall back to the
        # dense+resampled refinement from the ORIGINAL candidate, which
        # localizes broad extrema to <0.01 px where the walk cannot
        # settle (tests/test_features.py::test_blob_localization).
        converged = (
            (jnp.abs(ox) < 0.5) & (jnp.abs(oy) < 0.5) & (jnp.abs(os_) < 0.5)
        )
        # cv2's interpolated-contrast recheck:
        # |D + 0.5 * g . x| >= contrast_threshold.
        d_hat = d10[..., 9] + 0.5 * (
            d10[..., 0] * ox + d10[..., 1] * oy + d10[..., 2] * os_
        )
        valid = valid & (jnp.abs(d_hat) >= contrast_threshold)
        top_scores = jnp.where(valid, jnp.abs(d_hat), 0.0)
        fx_b, fy_b = _dense_refine()
        fx = jnp.where(
            converged, px.astype(jnp.float32) + jnp.clip(ox, -0.5, 0.5), fx_b
        )
        fy = jnp.where(
            converged, py.astype(jnp.float32) + jnp.clip(oy, -0.5, 0.5), fy_b
        )
        lvl = jnp.where(converged, ps, lvl)
    else:  # "bilinear": dense one-step Newton + resampled second iteration
        # With the SIFT base-blur top-up in place, the lattice walk
        # measures LOWER stabilization bias than this mode
        # (stabilize_probe.py: 0.0011 vs 0.0021 deg max at 24 frames,
        # host SIFT 0.0015) — bilinear resampling of the derivative maps
        # smooths texture phase coherently, which is the residual
        # accumulating roll bias; 'lattice' is the default.
        fx, fy = _dense_refine()

    # ---- Descriptors: blurred orientation-bin maps per center level ----
    k_geo = 2.0 ** (1.0 / n_scales)
    descs = []
    for lev in range(n_scales):
        g = gauss[:, lev + 1]  # Gaussian at the center level's sigma
        gx = 0.5 * (_shift(g, 0, -1) - _shift(g, 0, 1))
        gy = 0.5 * (_shift(g, -1, 0) - _shift(g, 1, 0))
        mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
        theta = jnp.arctan2(gy, gx)  # (-pi, pi]
        # Soft-assign into 8 bins (linear interpolation between the two
        # nearest bin centers), then blur each bin plane: the blur IS the
        # descriptor cell weighting.
        tb = (theta / (2 * np.pi) * 8.0) % 8.0
        b0 = jnp.floor(tb)
        frac = tb - b0
        b0 = b0.astype(jnp.int32) % 8
        b1 = (b0 + 1) % 8
        bins = jnp.arange(8).reshape(1, 8, 1, 1)
        planes = mag[:, None] * (
            (b0[:, None] == bins) * (1 - frac[:, None])
            + (b1[:, None] == bins) * frac[:, None]
        )  # (B, 8, H, W)
        sigma_lev = sigma0 * (k_geo ** lev)
        cell = 3.0 * sigma_lev  # descriptor cell spacing, octave pixels
        planes = _blur(
            planes.reshape(B * 8, H, W), cell * 0.5,
            precision=jax.lax.Precision.DEFAULT,
        ).reshape(B, 8, H, W)
        maps_flat = planes.transpose(0, 2, 3, 1).reshape(B, H * W, 8)
        # 4x4 cell grid around each keypoint.
        grid = (jnp.arange(4) - 1.5) * cell  # (4,)
        gyy = fy[..., None, None] + grid[None, None, :, None]
        gxx = fx[..., None, None] + grid[None, None, None, :]
        samp = jax.vmap(
            lambda mf, yy2, xx2: _fused_bilinear_rows(mf, W, H, yy2, xx2)
        )(maps_flat, gyy, gxx)  # (B, quota, 4, 4, 8)
        descs.append(samp.reshape(B, quota, 128))
    desc = jnp.stack(descs, axis=2)  # (B, quota, n_scales, 128)
    desc = jnp.take_along_axis(
        desc, lvl[..., None, None], axis=2
    )[:, :, 0]
    # SIFT illumination contract: L2 norm, clip 0.2, renorm.
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    desc = jnp.minimum(desc, 0.2)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    return fy, fx, lvl, top_scores, desc, valid


@functools.partial(
    jax.jit,
    static_argnames=(
        "nfeatures", "n_octaves", "n_scales", "sigma0",
        "contrast_threshold", "edge_ratio", "border", "has_mask",
        "upsample", "refine",
    ),
)
def _detect_batch(
    images,
    mask,
    nfeatures: int = 2048,
    n_octaves: int = 4,
    n_scales: int = 3,
    sigma0: float = 1.6,
    contrast_threshold: float = 0.006,
    edge_ratio: float = 10.0,
    border: int = 8,
    has_mask: bool = False,
    upsample: bool = True,
    refine: str = "lattice",
):
    """Detect + describe on a batch: (B, H, W) uint8/float -> fixed-K arrays.

    Returns (pts (B, K, 2) float32 cv2-convention [x, y], size (B, K),
    score (B, K), desc (B, K, 128), valid (B, K) bool), K = nfeatures.
    Slots are ordered octave-major by score; invalid slots have valid
    False.

    ``upsample`` prepends SIFT's "-1" octave (2x bilinear upsampling):
    on natural textures most extrema live below the input resolution's
    sigma floor — without it the detector finds ~10x fewer keypoints
    (measured against cv2 SIFT, whose default does the same).
    """
    x = images.astype(jnp.float32) / 255.0
    B, H, W = x.shape
    m = mask.astype(jnp.float32) if has_mask else None
    coord_scale = 1.0
    if upsample:
        x = jax.image.resize(x, (B, 2 * H, 2 * W), "linear")
        if m is not None:
            m = jax.image.resize(m, (B, 2 * H, 2 * W), "nearest")
        coord_scale = 0.5
    # Octave quotas: halving, remainder to octave 0.
    quotas = []
    rest = nfeatures
    for o in range(n_octaves):
        q = nfeatures // (2 ** (o + 1)) if o < n_octaves - 1 else rest
        q = max(min(q, rest), 1)
        quotas.append(q)
        rest -= q
    quotas[0] += rest
    k_geo = 2.0 ** (1.0 / n_scales)
    outs = []
    # SIFT's input-blur assumption (Lowe 2004 sec. 3.3, cv2 createInitialImage):
    # the camera image already carries sigma ~0.5; after 2x upsampling that
    # becomes 1.0, and the base level tops UP to sigma0 rather than adding
    # the full sigma0 (which would over-blur the whole ladder to an
    # effective base of sqrt(1 + sigma0^2) ~ 1.89 and shift every scale
    # label).
    sigma_in = 1.0 if upsample else 0.5
    base = _blur(x, math.sqrt(max(sigma0**2 - sigma_in**2, 0.01)))
    for o in range(n_octaves):
        Ho, Wo = base.shape[-2:]
        ladder = [base]
        for s in range(1, n_scales + 3):
            prev_sigma = sigma0 * (k_geo ** (s - 1))
            inc = prev_sigma * math.sqrt(k_geo * k_geo - 1.0)
            ladder.append(_blur(ladder[-1], inc))
        gauss = jnp.stack(ladder, axis=1)  # (B, L, Ho, Wo)
        mo = None
        if m is not None:
            # Erode the mask by the border radius via a min-pool so no
            # descriptor support leaks across the mask edge.
            mo = -jax.lax.reduce_window(
                -m, -jnp.inf, jax.lax.max,
                (1, 2 * border + 1, 2 * border + 1), (1, 1, 1), "SAME",
            )
            mo = (mo > 0.5).astype(jnp.float32)
        fy, fx, lvl, score, desc, valid = _octave_detect(
            gauss, mo, quotas[o], n_scales, sigma0,
            contrast_threshold, edge_ratio, border, refine=refine,
        )
        scale_mult = float(2 ** o) * coord_scale
        # resize uses half-pixel centers: upsampled coordinate u lies at
        # original (u + 0.5) / 2 - 0.5, a constant -0.25 px after the
        # exact 2^o decimation chain.
        shift = -0.25 if upsample else 0.0
        pts = jnp.stack(
            [fx * scale_mult + shift, fy * scale_mult + shift], axis=-1
        )
        size = sigma0 * (k_geo ** (lvl + 1)) * scale_mult * 2.0
        outs.append((pts, size, score, desc, valid))
        if o < n_octaves - 1:
            base = gauss[:, n_scales][:, ::2, ::2]
            if m is not None:
                m = m[:, ::2, ::2]
    pts = jnp.concatenate([o[0] for o in outs], axis=1)
    size = jnp.concatenate([o[1] for o in outs], axis=1)
    score = jnp.concatenate([o[2] for o in outs], axis=1)
    desc = jnp.concatenate([o[3] for o in outs], axis=1)
    valid = jnp.concatenate([o[4] for o in outs], axis=1)
    return pts, size, score, desc, valid


def detect_and_describe(
    arrays: Sequence[np.ndarray],
    masks: Optional[Sequence[Optional[np.ndarray]]] = None,
    nfeatures: int = 2048,
    batch: int = 16,
    **kwargs,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Device keypoints for a list of images; drop-in for host SIFT output.

    Arguments:
        arrays: grayscale images (H, W), uint8 or float. All images in a
            batch chunk must share a shape (pipeline images do).
        masks: optional per-image masks (nonzero = detect here). The
            compiled program is specialized on mask presence only; the
            mask VALUES are a traced input, so per-image masks reuse one
            executable.
        nfeatures: fixed keypoint budget per image (static).
        batch: images per device dispatch.

    Returns:
        List of ``(pts, descriptors)`` per image: ``pts`` (n, 2) float32
        cv2-convention coordinates (n <= nfeatures, score-ordered within
        each octave block), ``descriptors`` (n, 128) float32. The tuple
        is interchangeable with ``detect_keypoints`` output for matching
        (:func:`glimpse_tpu.optimize.match_keypoints_device`).
    """
    out: List[Tuple[np.ndarray, np.ndarray]] = []
    n = len(arrays)
    for start in range(0, n, batch):
        chunk = [np.asarray(a) for a in arrays[start : start + batch]]
        rows = len(chunk)
        if rows < batch:
            chunk = chunk + [chunk[-1]] * (batch - rows)
        imgs = np.stack(chunk).astype(np.uint8)
        mrows = None
        has_mask = False
        if masks is not None:
            sub = list(masks[start : start + rows])
            if any(mk is not None for mk in sub):
                has_mask = True
                full = np.ones_like(imgs, dtype=np.uint8)
                for i, mk in enumerate(sub):
                    if mk is not None:
                        full[i] = (np.asarray(mk) > 0).astype(np.uint8)
                mrows = jnp.asarray(full)
        pts, size, score, desc, valid = _detect_batch(
            jnp.asarray(imgs), mrows, nfeatures=nfeatures,
            has_mask=has_mask, **kwargs,
        )
        pts = np.asarray(pts)
        desc = np.asarray(desc)
        valid = np.asarray(valid)
        for i in range(rows):
            keep = np.flatnonzero(valid[i])
            out.append(
                (
                    pts[i][keep].astype(np.float32),
                    np.ascontiguousarray(desc[i][keep], dtype=np.float32),
                )
            )
    return out
