"""Distorted-camera projection math as pure functions over a 20-float vector.

Camera parameter vector layout (matches the reference camera model,
``/root/reference/src/glimpse/camera.py:101-198``):

====== =========== ==========================================================
Index  Name        Meaning
====== =========== ==========================================================
0:3    xyz         Camera position in world coordinates
3:6    viewdir     (yaw, pitch, roll) in degrees
6:8    imgsz       Image size in pixels (nx, ny)
8:10   f           Focal length in pixels (fx, fy)
10:12  c           Principal point offset from image center in pixels
12:18  k           Radial distortion coefficients (k1..k6, rational model)
18:20  p           Tangential distortion coefficients (p1, p2)
====== =========== ==========================================================

Every function is dual-backend: pass ``xp=numpy`` for float64 host math (the
object API and its 1e-12 px round-trip contract,
``/root/reference/tests/test_camera.py:42-89``) or ``xp=jax.numpy`` for
jit/vmap/shard_map device paths. Iterative solvers use Python loops on the
NumPy path and ``lax``-compatible fixed-point loops on the JAX path.

Behavior parity notes (reference ``camera.py``):

- Forward projection (``camera.py:1435-1470``): optional earth-curvature +
  atmospheric-refraction correction of dz, rotation, perspective divide,
  points at or behind the camera plane mapped to NaN.
- Distortion (``camera.py:1138-1196``): 6-coefficient rational radial model
  plus 2-coefficient tangential model.
- Undistortion (``camera.py:1198-1389``): closed-form cubic when only k1 is
  nonzero, else iterative Oulu or vectorized regula falsi.
"""
import math
from typing import Optional, Tuple

import numpy as np

Array = "Array"  # documentation alias; functions accept numpy or jax arrays

# Slices into the camera parameter vector.
XYZ = slice(0, 3)
VIEWDIR = slice(3, 6)
IMGSZ = slice(6, 8)
F = slice(8, 10)
C = slice(10, 12)
K = slice(12, 18)
P = slice(18, 20)

# Default elevation correction constants (camera.py:121).
EARTH_RADIUS = 6.3781e6
REFRACTION = 0.13


def _is_numpy(xp) -> bool:
    return xp is np


# ---- Rotation ---- #


def rotation_matrix(viewdir, xp=np):
    """Rotation matrix (3, 3) from (yaw, pitch, roll) in degrees.

    Initial camera frame: +z up, +x east, +y north; the matrix maps world
    offsets into camera coordinates (x right, y down, z forward).
    Composition: roll @ pitch @ yaw @ initial (camera.py:239-280).
    """
    radians = viewdir * (math.pi / 180)
    C_, S_ = xp.cos(radians), xp.sin(radians)
    c0, c1, c2 = C_[..., 0], C_[..., 1], C_[..., 2]
    s0, s1, s2 = S_[..., 0], S_[..., 1], S_[..., 2]
    row0 = xp.stack([c0 * c2 + s0 * s1 * s2, c0 * s1 * s2 - c2 * s0, -c1 * s2], axis=-1)
    row1 = xp.stack([c2 * s0 * s1 - c0 * s2, s0 * s2 + c0 * c2 * s1, -c1 * c2], axis=-1)
    row2 = xp.stack([c1 * s0, c0 * c1, s1], axis=-1)
    return xp.stack([row0, row1, row2], axis=-2)


def viewdir_from_rotation(R, xp=np):
    """(yaw, pitch, roll) in degrees from a :func:`rotation_matrix` output.

    Exact inverse for pitch in (-90, 90): the matrix entries give
    ``R[2] = (c1 s0, c0 c1, s1)`` and ``(R[0,2], R[1,2]) = (-c1 s2,
    -c1 c2)``, so yaw/roll follow from atan2 and pitch from asin.
    Supports batched (..., 3, 3) input.
    """
    pitch = xp.arcsin(xp.clip(R[..., 2, 2], -1.0, 1.0))
    yaw = xp.arctan2(R[..., 2, 0], R[..., 2, 1])
    roll = xp.arctan2(-R[..., 0, 2], -R[..., 1, 2])
    return xp.stack([yaw, pitch, roll], axis=-1) * (180.0 / math.pi)


def rotation_matrix_gradient(viewdir, xp=np):
    """Derivative of :func:`rotation_matrix` w.r.t. viewdir, shape (3, 3, 3).

    Axis 0 indexes the viewdir component (yaw, pitch, roll), so
    ``result[i] == dR/dviewdir[i]`` (verified against finite differences).
    Equivalent information to the reference's analytic gradient
    (camera.py:282-329, which stores the transposed blocks); device paths
    use ``jax.jacfwd`` instead.
    """
    radians = viewdir * (math.pi / 180)
    C_, S_ = xp.cos(radians), xp.sin(radians)
    c0, c1, c2 = C_[..., 0], C_[..., 1], C_[..., 2]
    s0, s1, s2 = S_[..., 0], S_[..., 1], S_[..., 2]
    zero = xp.zeros_like(c0)
    d_yaw = xp.stack(
        [
            xp.stack([c0 * s1 * s2 - s0 * c2, s0 * s2 + c0 * s1 * c2, c0 * c1], -1),
            xp.stack([-s0 * s1 * s2 - c0 * c2, c0 * s2 - s0 * s1 * c2, -s0 * c1], -1),
            xp.stack([zero, zero, zero], -1),
        ],
        -2,
    )
    d_pitch = xp.stack(
        [
            xp.stack([s0 * c1 * s2, s0 * c1 * c2, -s0 * s1], -1),
            xp.stack([c0 * c1 * s2, c0 * c1 * c2, -c0 * s1], -1),
            xp.stack([s1 * s2, s1 * c2, c1], -1),
        ],
        -2,
    )
    d_roll = xp.stack(
        [
            xp.stack([s0 * s1 * c2 - c0 * s2, -s0 * s1 * s2 - c0 * c2, zero], -1),
            xp.stack([s0 * s2 + c0 * s1 * c2, s0 * c2 - c0 * s1 * s2, zero], -1),
            xp.stack([-c1 * c2, c1 * s2, zero], -1),
        ],
        -2,
    )
    stacked = xp.stack([d_yaw, d_pitch, d_roll], axis=-3)
    return xp.swapaxes(stacked, -1, -2) * (math.pi / 180)


# ---- Distortion ---- #


def radial_distortion_factor(r2, k, xp=np):
    """Rational radial distortion multiplier dr(r^2) (camera.py:1138-1163).

    dr = (1 + k1 r2 + k2 r4 + k3 r6) / (1 + k4 r2 + k5 r4 + k6 r6).
    Branchless: with zero coefficients both polynomials are exactly 1.
    """
    r4 = r2 * r2
    r6 = r4 * r2
    num = 1 + k[..., 0] * r2 + k[..., 1] * r4 + k[..., 2] * r6
    den = 1 + k[..., 3] * r2 + k[..., 4] * r4 + k[..., 5] * r6
    return num / den


def tangential_distortion(xy, r2, p, xp=np):
    """Tangential distortion additive [dtx, dty] (camera.py:1165-1178)."""
    x, y = xy[..., 0], xy[..., 1]
    xty = x * y
    dtx = 2 * xty * p[..., 0] + p[..., 1] * (r2 + 2 * x * x)
    dty = p[..., 0] * (r2 + 2 * y * y) + 2 * xty * p[..., 1]
    return xp.stack([dtx, dty], axis=-1)


def distort(xy, k, p, xp=np):
    """Apply radial + tangential distortion to normalized camera coordinates."""
    r2 = xp.sum(xy * xy, axis=-1)
    dr = radial_distortion_factor(r2, k, xp)
    return xy * dr[..., None] + tangential_distortion(xy, r2, p, xp)


# ---- Undistortion solvers ---- #


def undistort_k1(xy, k1, xp=np):
    """Closed-form undistortion when only k1 is nonzero (camera.py:1232-1264).

    Solves the cubic r^3 + r/k1 - r'/k1 = 0 in polar coordinates using the
    trigonometric/Cardano branches.
    """
    phi = xp.arctan2(xy[..., 1], xy[..., 0])
    Q = -1 / (3 * k1)
    cos_phi = xp.cos(phi)
    sin_phi = xp.sin(phi)
    R = -xy[..., 0] / (2 * k1 * cos_phi)
    three_roots = (R * R) < (Q * Q * Q)
    # Trigonometric branch (three real roots): guard arccos input.
    Qsafe = xp.where(xp.asarray(Q > 0), Q, 1.0)
    tharg = xp.clip(R * Qsafe ** -1.5, -1.0, 1.0)
    th = xp.arccos(tharg)
    r_three = -2 * xp.sqrt(xp.abs(Q)) * xp.cos((th - 2 * math.pi) / 3)
    # Cardano branch (one real root): guard sqrt input.
    disc = xp.maximum(R * R - Q * Q * Q, 0.0)
    A = -xp.sign(R) * (xp.abs(R) + xp.sqrt(disc)) ** (1.0 / 3)
    B = xp.where(A != 0, Q / xp.where(A != 0, A, 1.0), 0.0)
    r_one = A + B
    r = xp.where(three_roots, r_three, r_one)
    return xp.stack([cos_phi, sin_phi], axis=-1) * r[..., None]


def undistort_oulu(xy, k, p, iterations: int = 20, xp=np):
    """Iterative undistortion (Oulu / Bouguet fixed point, camera.py:1305-1337).

    uxy <- (xy - tangential(uxy)) / radial(|uxy|^2). Converges quickly for
    moderate distortion; use regula falsi for extreme distortion.
    """

    def step(uxy):
        r2 = xp.sum(uxy * uxy, axis=-1)
        return (xy - tangential_distortion(uxy, r2, p, xp)) / (
            radial_distortion_factor(r2, k, xp)[..., None]
        )

    if _is_numpy(xp):
        uxy = xy
        for _ in range(iterations):
            uxy = step(uxy)
        return uxy
    import jax

    return jax.lax.fori_loop(0, iterations, lambda i, u: step(u), xy)


def undistort_regulafalsi(xy, k, p, iterations: int = 100, xp=np):
    """Vectorized elementwise regula falsi undistortion (camera.py:1339-1389).

    Starts the bracket at the image center (distortion-free) and halfway to
    the distorted coordinate; robust under extreme distortion. Converged
    elements (dy == 0 on both coordinates) are frozen.
    """

    # Shared iteration written explicitly for both backends.
    def iterate(x1, y1, x2, y2, uxy, frozen):
        dy = y2 - y1
        newly = xp.all(dy == 0, axis=-1) & ~frozen
        uxy = xp.where(newly[..., None], x2, uxy)
        frozen2 = frozen | newly
        dy_safe = xp.where(dy == 0, 1.0, dy)
        x3 = (x1 * y2 - x2 * y1) / dy_safe
        x3 = xp.where(frozen2[..., None], x2, x3)
        y3 = distort(x3, k, p, xp) - xy
        return x2, y2, x3, y3, uxy, frozen2

    x1 = xp.zeros_like(xy)
    y1 = -xy
    x2 = xy / 2
    y2 = distort(x2, k, p, xp) - xy
    uxy = xp.full_like(xy, np.nan)
    frozen = xp.zeros(xy.shape[:-1], dtype=bool)
    if _is_numpy(xp):
        for _ in range(iterations):
            x1, y1, x2, y2, uxy, frozen = iterate(x1, y1, x2, y2, uxy, frozen)
            if frozen.all():
                break
    else:
        import jax

        def cond(state):
            i, x1, y1, x2, y2, uxy, frozen = state
            return (i < iterations) & ~xp.all(frozen)

        def body(state):
            i, x1, y1, x2, y2, uxy, frozen = state
            x1, y1, x2, y2, uxy, frozen = iterate(x1, y1, x2, y2, uxy, frozen)
            return (i + 1, x1, y1, x2, y2, uxy, frozen)

        state = (0, x1, y1, x2, y2, uxy, frozen)
        _, x1, y1, x2, y2, uxy, frozen = jax.lax.while_loop(cond, body, state)
    # Unconverged elements take the final bracket estimate.
    return xp.where(frozen[..., None], uxy, x2)


def undistort_lookup(xy, k, p, imgsz, f, c, density: float = 1.0):
    """Undistortion by scattered-data lookup (host-only, camera.py:1266-1303).

    Distorts a regular grid of normalized coordinates covering the frame and
    interpolates the inverse mapping at the query points. Stable under
    extreme distortion; slower than the iterative solvers and NumPy-only
    (the device paths use the jit-safe iterative solvers).
    """
    import scipy.interpolate

    corners = np.array(
        [[0, 0], [0.5, 0], [1, 0], [1, 0.5], [1, 1], [0.5, 1], [0, 1], [0, 0.5]]
    )
    uv_edges = imgsz * corners
    xyu_edges = (uv_edges - (imgsz / 2 + c)) / f
    xyd_edges = distort(xyu_edges, k, p, np)
    ux = np.linspace(
        min(xyu_edges[:, 0].min(), xyd_edges[:, 0].min()),
        max(xyu_edges[:, 0].max(), xyd_edges[:, 0].max()),
        int(density * imgsz[0]),
    )
    uy = np.linspace(
        min(xyu_edges[:, 1].min(), xyd_edges[:, 1].min()),
        max(xyu_edges[:, 1].max(), xyd_edges[:, 1].max()),
        int(density * imgsz[1]),
    )
    UX, UY = np.meshgrid(ux, uy)
    uxy = np.column_stack((UX.ravel(), UY.ravel()))
    # Keep only the principal (monotone) branch of the radial map: beyond the
    # fold the distorted->undistorted relation is multivalued and scattered
    # interpolation would blend branches (improves on reference
    # camera.py:1266-1303, which samples the full frame).
    radii = np.linspace(0, np.hypot(uxy[:, 0], uxy[:, 1]).max(), 2048)
    probe = np.column_stack((radii, np.zeros_like(radii)))
    distorted_radii = distort(probe, k, p, np)[:, 0]
    folds = np.flatnonzero(np.diff(distorted_radii) <= 0)
    if folds.size:
        r_max = radii[folds[0]]
        uxy = uxy[uxy[:, 0] ** 2 + uxy[:, 1] ** 2 <= r_max ** 2]
    dxy = distort(uxy, k, p, np)
    return scipy.interpolate.griddata(dxy, uxy, xy, method="linear")


def undistort(xy, k, p, method: str = "oulu", xp=np, **kwargs):
    """Remove distortion from normalized camera coordinates.

    With concrete NumPy coefficients, specializes like the reference
    (camera.py:1198-1230): identity when distortion-free, closed-form cubic
    when only k1 is nonzero, otherwise the requested iterative method. On the
    JAX path with traced coefficients, dispatches directly to the requested
    iterative method (which is exact for the identity case as well).
    """
    concrete = _is_numpy(xp) and isinstance(k, np.ndarray) and not hasattr(k, "aval")
    if concrete:
        if not k.any() and not p.any():
            return xy
        if k[0] and not k[1:].any() and not p.any():
            return undistort_k1(xy, k[0], xp)
    if method == "k1":
        return undistort_k1(xy, k[..., 0], xp)
    if method == "oulu":
        return undistort_oulu(xy, k, p, xp=xp, **kwargs)
    if method == "regulafalsi":
        return undistort_regulafalsi(xy, k, p, xp=xp, **kwargs)
    if method == "lookup":
        if not _is_numpy(xp):
            raise ValueError("Lookup undistortion is host-only (use xp=numpy)")
        return undistort_lookup(xy, k, p, **kwargs)
    raise ValueError(f"Undistort method not supported: {method}")


# ---- World <-> camera frame ---- #


def elevation_correction(squared_distances, radius=EARTH_RADIUS, refraction=REFRACTION):
    """Elevation correction for earth curvature + refraction (helpers.py:1771)."""
    return (refraction - 1) * squared_distances / (2 * radius)


def world_to_camera(
    xyz,
    cam_xyz,
    R,
    directions: bool = False,
    correction: Optional[Tuple[float, float]] = None,
    return_depth: bool = False,
    xp=np,
):
    """Project world points (..., 3) to normalized camera coordinates (..., 2).

    Points at or behind the camera plane (depth <= 0) map to NaN
    (camera.py:1435-1470).

    Arguments:
        correction: None to skip, or (radius, refraction) constants.
    """
    if directions:
        dxyz = xyz
    else:
        dxyz = xyz - cam_xyz
        if correction is not None:
            radius, refraction = correction
            d2 = dxyz[..., 0] ** 2 + dxyz[..., 1] ** 2
            dz = dxyz[..., 2] + elevation_correction(d2, radius, refraction)
            dxyz = xp.concatenate([dxyz[..., 0:2], dz[..., None]], axis=-1)
    xyz_c = xp.matmul(dxyz, xp.swapaxes(R, -1, -2))
    depth = xyz_c[..., 2]
    behind = depth <= 0
    safe_depth = xp.where(behind, 1.0, depth)
    xy = xyz_c[..., 0:2] / safe_depth[..., None]
    xy = xp.where(behind[..., None], xp.asarray(np.nan, dtype=xy.dtype), xy)
    if return_depth:
        return xy, depth
    return xy


def camera_to_world(
    xy, R, cam_xyz=None, directions: bool = True, depth=1, xp=np
):
    """Project normalized camera coordinates out into world space (camera.py:1472-1497).

    Returns rays at unit optical-axis depth (times ``depth``), relative to the
    camera (``directions=True``) or absolute (``directions=False``).
    """
    xyz = xp.matmul(xy, R[..., 0:2, :]) + R[..., 2, :]
    if not (isinstance(depth, (int, float)) and depth == 1):
        depth_arr = xp.asarray(depth)
        if getattr(depth_arr, "ndim", 0):
            depth_arr = depth_arr[..., None]
        xyz = xyz * depth_arr
    if not directions:
        xyz = xyz + cam_xyz
    return xyz


# ---- Camera frame <-> image ---- #


def camera_to_image(xy, imgsz, f, c, k, p, xp=np):
    """Distort and scale camera coordinates to pixels (camera.py:1499-1508)."""
    dxy = distort(xy, k, p, xp)
    return dxy * f + (imgsz / 2 + c)


def image_to_camera(uv, imgsz, f, c, k, p, method: str = "oulu", xp=np, **kwargs):
    """Normalize pixels to camera coordinates and undistort (camera.py:1510-1519)."""
    xy = (uv - (imgsz * 0.5 + c)) * (1 / f)
    if method == "lookup":
        kwargs = {"imgsz": imgsz, "f": f, "c": c, **kwargs}
    return undistort(xy, k, p, method=method, xp=xp, **kwargs)


# ---- Full projections over the 20-vector ---- #


def project(
    vector,
    xyz,
    directions: bool = False,
    correction: Optional[Tuple[float, float]] = None,
    return_depth: bool = False,
    xp=np,
):
    """World coordinates (..., 3) -> image coordinates (..., 2).

    Equivalent of ``Camera.xyz_to_uv`` (camera.py:591-628) as a pure function.
    """
    R = rotation_matrix(vector[..., VIEWDIR], xp)
    out = world_to_camera(
        xyz,
        vector[..., XYZ],
        R,
        directions=directions,
        correction=correction,
        return_depth=return_depth,
        xp=xp,
    )
    if return_depth:
        xy, depth = out
    else:
        xy = out
    uv = camera_to_image(
        xy, vector[..., IMGSZ], vector[..., F], vector[..., C], vector[..., K],
        vector[..., P], xp,
    )
    if return_depth:
        return uv, depth
    return uv


def project_planes(
    vector,
    x,
    y,
    z,
    directions: bool = False,
    correction: Optional[Tuple[float, float]] = None,
    xp=np,
):
    """Forward projection on separate coordinate PLANES -> (u, v) planes.

    Identical math to :func:`project` (camera.py:591-628) but operating on
    (...,)-shaped x/y/z component planes instead of a packed (..., 3)
    array. On TPU the packed layout puts the 3-wide minor axis in the
    128-lane dimension, so the whole elementwise projection chain runs at
    <3% lane utilization; the plane form keeps the huge particle axis in
    lanes (measured ~5x on the tracker's projection stage). The rotation
    is applied as an explicit multiply-add chain, so f32 rounding can
    differ from the packed path's matmul by ~1 ulp.
    """
    R = rotation_matrix(vector[..., VIEWDIR], xp)
    if directions:
        dx, dy, dz = x, y, z
    else:
        cam = vector[..., XYZ]
        dx = x - cam[..., 0]
        dy = y - cam[..., 1]
        dz = z - cam[..., 2]
        if correction is not None:
            radius, refraction = correction
            d2 = dx * dx + dy * dy
            dz = dz + elevation_correction(d2, radius, refraction)
    xc = R[..., 0, 0] * dx + R[..., 0, 1] * dy + R[..., 0, 2] * dz
    yc = R[..., 1, 0] * dx + R[..., 1, 1] * dy + R[..., 1, 2] * dz
    zc = R[..., 2, 0] * dx + R[..., 2, 1] * dy + R[..., 2, 2] * dz
    behind = zc <= 0
    safe = xp.where(behind, xp.ones_like(zc), zc)
    nan = xp.asarray(np.nan, dtype=xc.dtype)
    xn = xp.where(behind, nan, xc / safe)
    yn = xp.where(behind, nan, yc / safe)
    k = vector[..., K]
    p = vector[..., P]
    r2 = xn * xn + yn * yn
    dr = radial_distortion_factor(r2, k, xp)
    xty = xn * yn
    dtx = 2 * xty * p[..., 0] + p[..., 1] * (r2 + 2 * xn * xn)
    dty = p[..., 0] * (r2 + 2 * yn * yn) + 2 * xty * p[..., 1]
    dxn = xn * dr + dtx
    dyn = yn * dr + dty
    f = vector[..., F]
    c = vector[..., C]
    imgsz = vector[..., IMGSZ]
    u = dxn * f[..., 0] + (imgsz[..., 0] * 0.5 + c[..., 0])
    v = dyn * f[..., 1] + (imgsz[..., 1] * 0.5 + c[..., 1])
    return u, v


def unproject(
    vector,
    uv,
    directions: bool = True,
    depth=1,
    method: str = "oulu",
    xp=np,
    **kwargs,
):
    """Image coordinates (..., 2) -> world rays or coordinates (..., 3).

    Equivalent of ``Camera.uv_to_xyz`` (camera.py:630-663) as a pure function.
    """
    xy = image_to_camera(
        uv, vector[..., IMGSZ], vector[..., F], vector[..., C], vector[..., K],
        vector[..., P], method=method, xp=xp, **kwargs,
    )
    R = rotation_matrix(vector[..., VIEWDIR], xp)
    return camera_to_world(
        xy, R, cam_xyz=vector[..., XYZ], directions=directions, depth=depth, xp=xp
    )


def infront(vector, xyz, directions: bool = False, xp=np):
    """Test whether world points are in front of the camera (camera.py:665-698)."""
    R = rotation_matrix(vector[..., VIEWDIR], xp)
    dxyz = xyz if directions else xyz - vector[..., XYZ]
    z = xp.sum(dxyz * R[..., 2, :], axis=-1)
    return z > 0


def inframe(vector, uv, xp=np):
    """Test whether image coordinates are in (or on) the frame (camera.py:700-718)."""
    imgsz = vector[..., IMGSZ]
    ok = (uv >= 0) & (uv <= imgsz)
    return ok[..., 0] & ok[..., 1]


# ---- Spherical coordinates ---- #


def spherical_to_xyz(cam_xyz, angles, xp=np):
    """Spherical (azimuth CW from north, altitude, [distance]) -> world (camera.py:885)."""
    azimuth_iso = (math.pi / 2 - angles[..., 0] * math.pi / 180) % (2 * math.pi)
    altitude_iso = (math.pi / 2 - angles[..., 1] * math.pi / 180) % (2 * math.pi)
    xyz = xp.stack(
        [
            xp.sin(altitude_iso) * xp.cos(azimuth_iso),
            xp.sin(altitude_iso) * xp.sin(azimuth_iso),
            xp.cos(altitude_iso),
        ],
        axis=-1,
    )
    if angles.shape[-1] > 2:
        xyz = xyz * angles[..., 2:3] + cam_xyz
    return xyz


def xyz_to_spherical(cam_xyz, xyz, directions: bool = False, xp=np):
    """World -> spherical (azimuth CW from north, altitude, [distance]) (camera.py:928)."""
    if not directions:
        xyz = xyz - cam_xyz
    r = xp.sqrt(xp.sum(xyz * xyz, axis=-1))
    azimuth_iso = xp.arctan2(xyz[..., 1], xyz[..., 0])
    altitude_iso = xp.arccos(xyz[..., 2] / r)
    angles = xp.stack(
        [
            (90 - azimuth_iso * (180 / math.pi)) % 360,
            90 - altitude_iso * (180 / math.pi),
        ],
        axis=-1,
    )
    if not directions:
        angles = xp.concatenate([angles, r[..., None]], axis=-1)
    return angles
