"""Terrain visibility ops: viewshed and horizon via dense polar resampling.

The reference computes viewsheds with a sequential ring sweep over sorted
cells (``/root/reference/src/glimpse/raster.py:1293-1389``) and horizons by
per-heading Bresenham walks (``raster.py:1391-1463``) — both serial,
host-bound algorithms. The TPU-native formulation here is dense and
parallel:

1. Resample the DEM onto a polar grid centered on the viewpoint
   (headings x radii) with bilinear interpolation — one big gather.
2. Convert to elevation angles (dz + curvature/refraction correction) / r.
3. Running maximum along the radius axis (a parallel prefix scan) gives the
   blocking envelope at every polar sample.
4. Visibility of each raster cell is a single comparison of its own
   elevation angle against the envelope just inside its radius; the horizon
   is the argmax of elevation angle along each heading.

Everything is fixed-shape, vectorized, and dual-backend (numpy / jax.numpy).
"""
import math
from typing import Optional, Tuple

import numpy as np

from .sampling import bilinear_sample

NEG_INF = -1e30


def _cummax(a, axis, xp):
    if xp is np:
        return np.maximum.accumulate(a, axis=axis)
    import jax

    return jax.lax.associative_scan(jax.numpy.maximum, a, axis=axis)


def _polar_elevation_angles(
    array,
    origin_rc: Tuple[float, float],
    origin_z: float,
    cellsize: float,
    n_headings: int,
    n_radii: int,
    dr_cells: float,
    correction: Optional[Tuple[float, float]],
    xp,
    sample_mode: str = "bilinear",
    distance_mode: str = "polar",
):
    """Sample elevation angles on a polar grid (headings, radii).

    ``origin_rc`` is the viewpoint in fractional (row, col) index space;
    radii are in cells. Angles at NaN samples are NEG_INF (no blocking).
    ``sample_mode='nearest'`` takes cell-center values (the reference's ring
    sweep interpolates between cell centers, raster.py:1327-1340) and
    ``distance_mode='cell'`` measures distance to the sampled cell's center
    rather than to the polar sample. Returns (angles, radii_cells, thetas).
    """
    thetas = xp.arange(n_headings) * (2 * math.pi / n_headings) - math.pi
    radii = (xp.arange(n_radii) + 1.0) * dr_cells
    # Polar sample positions in index space (rows/cols).
    dx = xp.cos(thetas)[:, None] * radii[None, :]
    dy = xp.sin(thetas)[:, None] * radii[None, :]
    rows = origin_rc[0] + dy
    cols = origin_rc[1] + dx
    H, W = array.shape
    inside = (rows >= 0) & (rows <= H - 1) & (cols >= 0) & (cols <= W - 1)
    rows_c = xp.clip(rows, 0, H - 1)
    cols_c = xp.clip(cols, 0, W - 1)
    if sample_mode == "nearest":
        ri = xp.round(rows_c).astype(int)
        ci = xp.round(cols_c).astype(int)
        z = array[ri, ci]
    else:
        z = bilinear_sample(array, rows_c, cols_c, xp=xp)
    if distance_mode == "cell" and sample_mode == "nearest":
        # Distance to the sampled cell's center (reference semantics).
        dr_ = ri - origin_rc[0]
        dc_ = ci - origin_rc[1]
        dist = xp.sqrt(dr_ * dr_ + dc_ * dc_) * cellsize
        dist = xp.where(dist > 0, dist, 1e-9)
    else:
        dist = radii[None, :] * cellsize
    dz = z - origin_z
    if correction is not None:
        radius_e, refraction = correction
        dz = dz + (refraction - 1) * (dist * dist) / (2 * radius_e)
    angles = dz / dist
    angles = xp.where(inside & ~xp.isnan(angles), angles, NEG_INF)
    return angles, radii, thetas


def viewshed(
    array,
    origin_rc: Tuple[float, float],
    origin_z: float,
    cellsize: float,
    correction: Optional[Tuple[float, float]] = None,
    oversample: float = 2.0,
    backoff: float = 1.0,
    sample_mode: str = "bilinear",
    distance_mode: str = "polar",
    xp=np,
):
    """Binary viewshed of a DEM from a viewpoint.

    Arguments:
        array: DEM elevations (H, W); NaN cells are never visible and never
            block.
        origin_rc: Viewpoint in fractional (row, col) index space.
        origin_z: Viewpoint elevation (world units).
        cellsize: Cell size in world units (cells assumed square).
        correction: None or (radius, refraction) for curvature/refraction.
        oversample: Polar sampling density relative to the cell size
            (radial step = cellsize / oversample; one heading per
            ~cell-width arc at the outermost radius).

    Returns:
        Boolean (H, W) visibility mask.
    """
    H, W = array.shape
    r0, c0 = origin_rc
    # Maximum radius: distance to farthest corner, in cells.
    corners = np.array(
        [[0.0, 0.0], [0.0, W - 1.0], [H - 1.0, 0.0], [H - 1.0, W - 1.0]]
    )
    r_max = float(
        np.sqrt(((corners - np.array([float(r0), float(c0)])) ** 2).sum(axis=1)).max()
    ) + 1.0
    dr_cells = 1.0 / oversample
    n_radii = int(math.ceil(r_max / dr_cells))
    n_headings = int(min(max(int(math.ceil(2 * math.pi * r_max * oversample)), 64), 8192))
    angles, radii, thetas = _polar_elevation_angles(
        array, origin_rc, origin_z, cellsize, n_headings, n_radii, dr_cells,
        correction, xp, sample_mode=sample_mode, distance_mode=distance_mode,
    )
    # Blocking envelope: max elevation angle over strictly smaller radii.
    cmax = _cummax(angles, axis=1, xp=xp)
    env = xp.concatenate(
        [xp.full((n_headings, 1), NEG_INF, dtype=cmax.dtype), cmax[:, :-1]], axis=1
    )
    # Per-cell query.
    rr = xp.arange(H)[:, None] - r0
    cc = xp.arange(W)[None, :] - c0
    cell_r = xp.sqrt(rr * rr + cc * cc)  # (H, W) in cells
    cell_theta = xp.arctan2(
        xp.broadcast_to(rr, (H, W)), xp.broadcast_to(cc, (H, W))
    )
    dist = cell_r * cellsize
    dz = array - origin_z
    if correction is not None:
        radius_e, refraction = correction
        dz = dz + (refraction - 1) * (dist * dist) / (2 * radius_e)
    safe_dist = xp.where(dist > 0, dist, 1.0)
    cell_angle = dz / safe_dist
    # Envelope lookup just inside the cell's own radius: back off by
    # ``backoff`` cell radii so same-cell polar samples cannot self-block
    # (1.0 is safe; ~0.5 matches the reference's ring granularity).
    j = xp.floor((cell_r - backoff) / dr_cells).astype(int)
    j = xp.clip(j, 0, n_radii - 1)
    k = xp.round((cell_theta + math.pi) / (2 * math.pi / n_headings)).astype(int)
    k = k % n_headings
    blocked = cell_angle < env[k, j]
    visible = ~blocked & ~xp.isnan(array)
    # The origin cell itself is visible (if not NaN).
    at_origin = cell_r < 0.5
    visible = visible | (at_origin & ~xp.isnan(array))
    return visible


def viewshed_rings(
    array,
    origin_rc: Tuple[float, float],
    origin_z: float,
    cellsize: float,
    correction: Optional[Tuple[float, float]] = None,
) -> np.ndarray:
    """Reference-semantics ring-sweep viewshed (host-only, NumPy).

    Reproduces the reference algorithm exactly (raster.py:1293-1389): cells
    are bucketed into integer-radius rings, swept outward with a
    max-elevation-angle envelope linearly interpolated over heading
    (period 2*pi). Sequential over rings, vectorized within each — use for
    bit-parity with the reference; the polar :func:`viewshed` is the
    device-friendly formulation.
    """
    H, W = array.shape
    r0, c0 = origin_rc
    drow = np.arange(H)[:, None] - r0
    dcol = np.arange(W)[None, :] - c0
    dist = np.sqrt(drow * drow + dcol * dcol).ravel() * cellsize
    dz = array.ravel() - origin_z
    if correction is not None:
        radius_e, refraction = correction
        dz = dz + (refraction - 1) * dist * dist / (2 * radius_e)
    # Heading convention is irrelevant as long as it is continuous: use
    # atan2 over index offsets.
    heading = np.arctan2(
        np.broadcast_to(drow, (H, W)), np.broadcast_to(dcol, (H, W))
    ).ravel()
    ring = np.floor(dist / cellsize + 0.5).astype(int)
    with np.errstate(divide="ignore", invalid="ignore"):
        angle = dz / dist

    visible = np.zeros(H * W, dtype=bool)
    order = np.lexsort((heading, ring))
    sorted_rings = ring[order]
    boundaries = np.searchsorted(
        sorted_rings, np.arange(sorted_rings[-1] + 2)
    )
    env_h = env_a = None
    for k in range(len(boundaries) - 1):
        members = order[boundaries[k]: boundaries[k + 1]]
        if members.size == 0 or (k == 0 and len(boundaries) > 2):
            continue  # the viewpoint's own ring is never marked
        if k == 0:
            return np.ones((H, W), dtype=bool)  # single co-located ring
        h = heading[members]
        a = angle[members]
        if env_h is None:
            vis = ~np.isnan(a)
            merged = a
        else:
            base = np.interp(h, env_h, env_a, period=2 * np.pi)
            with np.errstate(invalid="ignore"):
                vis = a > base
            vis |= np.isnan(base) & ~np.isnan(a)
            merged = np.where(vis, a, base)
        visible[members] = vis
        env_h, env_a = h, merged
    return visible.reshape(H, W)


def horizon_angles(
    array,
    origin_rc: Tuple[float, float],
    origin_z: float,
    cellsize: float,
    headings_rad,
    correction: Optional[Tuple[float, float]] = None,
    oversample: float = 2.0,
    xp=np,
):
    """Per-heading horizon: max elevation angle and its polar position.

    ``headings_rad`` are math-convention angles (CCW from +col axis) in the
    *index* frame (rows increase downward). Returns (max_angle, r_at_max,
    valid) per heading, where r is in cells and ``valid`` marks headings
    whose maximum is not the last non-NaN sample along the ray (reference
    semantics: a cell that is the last non-missing cell along a sighting is
    not part of the horizon, raster.py:1391-1463).
    """
    H, W = array.shape
    r0, c0 = origin_rc
    corners = np.array(
        [[0.0, 0.0], [0.0, W - 1.0], [H - 1.0, 0.0], [H - 1.0, W - 1.0]]
    )
    r_max = float(
        np.sqrt(((corners - np.array([float(r0), float(c0)])) ** 2).sum(axis=1)).max()
    ) + 1.0
    dr_cells = 1.0 / oversample
    n_radii = int(math.ceil(r_max / dr_cells))
    n_headings = len(headings_rad)
    thetas = xp.asarray(headings_rad)
    radii = (xp.arange(n_radii) + 1.0) * dr_cells
    dx = xp.cos(thetas)[:, None] * radii[None, :]
    dy = xp.sin(thetas)[:, None] * radii[None, :]
    rows = r0 + dy
    cols = c0 + dx
    inside = (rows >= 0) & (rows <= H - 1) & (cols >= 0) & (cols <= W - 1)
    z = bilinear_sample(array, xp.clip(rows, 0, H - 1), xp.clip(cols, 0, W - 1), xp=xp)
    valid_sample = inside & ~xp.isnan(z)
    dist = radii[None, :] * cellsize
    dz = z - origin_z
    if correction is not None:
        radius_e, refraction = correction
        dz = dz + (refraction - 1) * (dist * dist) / (2 * radius_e)
    angles = xp.where(valid_sample, dz / dist, NEG_INF)
    imax = xp.argmax(angles, axis=1)
    max_angle = xp.take_along_axis(angles, imax[:, None], axis=1)[:, 0]
    r_at_max = (imax + 1.0) * dr_cells
    z_at_max = xp.take_along_axis(z, imax[:, None], axis=1)[:, 0]
    any_valid = valid_sample.any(axis=1)
    # Valid horizon: some non-NaN sample lies beyond the maximum.
    idx = xp.arange(n_radii)[None, :]
    beyond = valid_sample & (idx > imax[:, None])
    valid = any_valid & beyond.any(axis=1)
    return max_angle, r_at_max, z_at_max, valid
