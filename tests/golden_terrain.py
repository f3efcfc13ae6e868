"""Slow NumPy goldens for the reference terrain algorithms.

Re-derived from the reference's documented behavior (ring-sweep viewshed,
``/root/reference/src/glimpse/raster.py:1293-1389``; per-heading ray-walk
horizon, ``raster.py:1391-1463``) with an original structure: these exist to
*bound* the disagreement of the package's dense polar formulations
(:mod:`glimpse_tpu.ops.terrain`), not to ship.

Semantics reproduced exactly:
- cells are grouped into integer-radius rings (``round(dist / cellsize)``);
- rings are swept outward, carrying a max-elevation-angle envelope sampled
  at the previous ring's headings and linearly interpolated (period 2*pi);
- a cell is visible iff its elevation angle exceeds the envelope; ring-0
  (the viewpoint's own cell) is never marked;
- NaN cells are invisible and transparent (do not block);
- the horizon along a heading is the cell maximizing the (corrected)
  elevation angle on a Bresenham walk to the DEM edge, dropped when it is
  the last non-missing cell of the walk.
"""
import numpy as np

from glimpse_tpu import helpers


def ring_sweep_viewshed(raster, origin, correction=False) -> np.ndarray:
    """Reference-exact viewshed (slow, sequential)."""
    z = raster.array
    H, W = z.shape
    cell = abs(float(raster.d[0]))
    dx = np.tile(raster.x - origin[0], H)
    dy = np.repeat(raster.y - origin[1], W)
    dz = z.ravel() - origin[2]
    d2 = dx * dx + dy * dy
    if correction is True:
        correction = {}
    if isinstance(correction, dict):
        dz = dz + helpers.elevation_corrections(d2, **correction)
    dist = np.sqrt(d2)
    ring = np.floor(dist / cell + 0.5).astype(int)  # round half up
    heading = np.arctan2(dy, dx)

    with np.errstate(divide="ignore", invalid="ignore"):
        elev = dz / dist  # inf/nan at the viewpoint cell; ring 0 is skipped

    visible = np.zeros(H * W, dtype=bool)
    order = np.lexsort((heading, ring))
    ring_ids, ring_starts = np.unique(ring[order], return_index=True)
    groups = np.split(order, ring_starts[1:])
    if ring_ids[0] == 0:
        if len(ring_ids) == 1:
            # Degenerate one-cell raster: everything co-located is visible.
            return np.ones((H, W), dtype=bool)
        groups = groups[1:]  # the viewpoint's own ring is never marked

    env_headings = None
    env_angles = None
    for members in groups:
        h = heading[members]
        e = elev[members]
        if env_headings is None:
            vis = ~np.isnan(e)
            env = e
        else:
            env = np.interp(h, env_headings, env_angles, period=2 * np.pi)
            with np.errstate(invalid="ignore"):
                vis = e > env
            vis |= np.isnan(env) & ~np.isnan(e)
        visible[members] = vis
        env_headings = h
        env_angles = np.where(vis, e, env)
    return visible.reshape(H, W)


def ray_walk_horizon(raster, origin, headings=range(360), correction=False):
    """Reference-exact horizon points, one (x, y, z) row per heading.

    Rows are NaN where the heading has no horizon (all-NaN ray, or the
    maximum falls on the ray's last non-missing cell).
    """
    if correction is True:
        correction = {}
    headings = np.asarray(headings, dtype=float)
    n = len(headings)
    # Rays in world coordinates (headings are degrees CW from north).
    thetas = np.deg2rad(90.0 - headings)
    rays = np.column_stack((np.cos(thetas), np.sin(thetas)))
    box = np.concatenate((raster.min[0:2], raster.max[0:2]))
    entries, exits = helpers.intersect_rays_box(origin[0:2], rays, box)
    inside = bool(raster.inbounds_xy(np.atleast_2d(origin[0:2]))[0])
    if inside:
        start_cell = raster.xy_to_rowcol(
            np.atleast_2d(origin[0:2]), snap=True
        )[0, ::-1]
        start_cells = np.tile(start_cell, (n, 1))
    else:
        start_cells = raster.xy_to_rowcol(entries)[:, ::-1]
    end_cells = raster.xy_to_rowcol(exits, snap=True)[:, ::-1]
    # Box exits can overshoot the outer edge by one float ulp; clamp.
    H, W = raster.shape
    end_cells = np.clip(end_cells, [0, 0], [W - 1, H - 1])
    start_cells = np.clip(start_cells, [0, 0], [W - 1, H - 1])

    points = np.full((n, 3), np.nan)
    for i in range(n):
        walk = helpers.bresenham_line(start_cells[i], end_cells[i])[:, ::-1]
        if inside:
            walk = walk[1:]  # never sight the viewpoint's own cell
        flat = raster.rowcol_to_idx(walk)
        dz = raster.array.flat[flat] - origin[2]
        if np.isnan(dz).all():
            continue
        xy = raster.rowcol_to_xy(walk)
        d2 = ((xy - origin[0:2]) ** 2).sum(axis=1)
        if isinstance(correction, dict):
            dz = dz + helpers.elevation_corrections(d2, **correction)
        angles = dz / np.sqrt(d2)
        best = int(np.nanargmax(angles))
        beyond = ~np.isnan(dz[best + 1:])
        if beyond.any():
            points[i, 0:2] = xy[best]
            points[i, 2] = raster.array.flat[flat[best]]
    return points
