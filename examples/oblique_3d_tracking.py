"""3-D tracking from an oblique camera with DEM uncertainty + fusion.

The Welty (2018) configuration (BASELINE ladder config 4 geometry): a
time-lapse camera looks obliquely across terrain; surface points move in
3-D, heights are constrained by a DEM with uncertainty; tracking runs
forward AND backward and the two passes fuse by inverse-variance weighting
(`Tracks.from_multiple`). Frames are rendered from the DEM itself with
``render.project_dem`` — the same machinery used for real-world camera
model validation.

Run: python examples/oblique_3d_tracking.py  (CPU by default, ~2 min)
"""
import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("OBLIQUE_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import scipy.ndimage

from glimpse_tpu import Camera, Raster, render
from glimpse_tpu.track.batch import (
    BatchConfig,
    BatchMotion,
    BatchTracker,
    DeviceRaster,
    to_tracks,
)


def main() -> None:
    rng = np.random.default_rng(7)
    # Gently undulating DEM (z in meters) with a sharp ortho texture on top.
    z = scipy.ndimage.gaussian_filter(rng.normal(size=(320, 320)), 12.0) * 60
    dem = Raster(z, x=(-200, 600), y=(600, -200))
    texture = scipy.ndimage.gaussian_filter(
        rng.normal(size=(320, 320)), 0.8
    ) * 100
    cam = Camera(imgsz=(320, 240), f=400, xyz=(200, -150, 260),
                 viewdir=(0, -35, 0))

    # Render frames by advecting the texture across the (fixed) DEM.
    velocity = (1.2, 0.8)  # m/day in world x, y
    n_frames = 10
    frames = []
    for i in range(n_frames):
        shifted = scipy.ndimage.shift(
            texture,
            (velocity[1] * i / dem.d[1], velocity[0] * i / dem.d[0]),
            order=1, mode="nearest",
        )
        img = render.project_dem(
            cam, dem, values=shifted[..., None], scale_limits=(1, 8)
        )[..., 0]
        # Inpaint holes (sky, occlusion streaks) from the nearest rendered
        # pixel: smooth continuation, not a static speckle landmark.
        holes = np.isnan(img)
        idx = scipy.ndimage.distance_transform_edt(
            holes, return_distances=False, return_indices=True
        )
        img = img[tuple(idx)]
        frames.append(img)
    frames = np.stack(frames).astype(np.float32)

    # Points on the surface; DEM prior with 0.5 m uncertainty.
    points_xy = rng.uniform([120, 150], [280, 280], size=(16, 2))
    N = len(points_xy)
    motion = BatchMotion(
        kind="cartesian",
        xy=jnp.asarray(points_xy, jnp.float32),
        xy_sigma=jnp.full((N, 2), 1.0, jnp.float32),
        v_mean=jnp.zeros((N, 3), jnp.float32),
        v_sigma=jnp.full((N, 3), 1.5, jnp.float32).at[:, 2].set(0.05),
        a_mean=jnp.zeros((N, 3), jnp.float32),
        a_sigma=jnp.full((N, 3), 0.1, jnp.float32).at[:, 2].set(0.01),
        slope_sigma=jnp.zeros((N,), jnp.float32),
        dem=DeviceRaster.from_raster(dem),
        dem_sigma=DeviceRaster.constant(0.5),
        use_dem_sigma=True,
    )
    cfg = BatchConfig(n_particles=512, search_size=(41, 41))
    tracker = BatchTracker(
        camera_vectors=cam.to_array()[None], corrections=[None], sigmas=[0.2],
        motion=motion, config=cfg,
    )

    t0 = datetime.datetime(2020, 1, 1)
    day = datetime.timedelta(days=1)
    datetimes = [t0 + i * day for i in range(n_frames)]
    dts = np.ones(n_frames - 1, np.float32)

    # Forward and backward passes, fused by inverse variance.
    runs = []
    for label, seq in (("forward", frames), ("backward", frames[::-1])):
        _, out = tracker.track(jax.random.PRNGKey(11), seq[:, None], dts)
        run_times = datetimes if label == "forward" else datetimes[::-1]
        tracks = to_tracks(run_times, day, out)
        if label == "backward":
            tracks.reverse()  # restore forward temporal order for fusion
        runs.append(tracks)
        v = tracks.vxyz[:, -1 if label == "forward" else 0, 0:2]
        # Backward runs estimate -v (temporal reversal flips apparent motion;
        # reverse() reorders time but, like the reference, keeps the sign).
        sign = 1 if label == "forward" else -1
        print(f"{label}: median velocity = {np.median(sign * v, axis=0).round(2)}"
              f" (true {velocity})")
    from glimpse_tpu.track.tracks import Tracks

    fused = Tracks.from_multiple(runs, ignore_nan=True)
    err = np.nanmedian(
        np.abs(fused.xyz[:, -1, 0:2] - (points_xy + np.multiply(velocity, n_frames - 1)))
    )
    print(f"fused: median final position error = {err:.2f} m")
    xy_final = np.nan_to_num(fused.xyz[:, -1, 0:2], nan=200.0)
    zerr = np.nanmedian(
        np.abs(fused.xyz[:, -1, 2] - dem.sample(xy_final, bounds_error=False))
    )
    print(f"fused: median |z - DEM| = {zerr:.2f} m (prior sigma 0.5)")
    assert err < 0.5, "position error too large"


if __name__ == "__main__":
    main()
