"""End-to-end glimpse_tpu workflow on synthetic data.

1. Build a world texture and render a time-lapse sequence through a camera.
2. Re-calibrate the camera's view direction from keypoint-free synthetic
   matches with RANSAC-capable bundle adjustment.
3. Track a grid of points with the batched on-device particle filter and
   summarize velocities (with uncertainty) as Tracks.

Runs on any JAX backend:  JAX_PLATFORMS=cpu python examples/end_to_end.py
"""
import datetime
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
import scipy.ndimage

import glimpse_tpu as gt
from glimpse_tpu import optimize
from glimpse_tpu.track.batch import (
    BatchConfig,
    BatchMotion,
    BatchTracker,
    DeviceRaster,
    to_tracks,
)

DAY = datetime.timedelta(days=1)
T0 = datetime.datetime(2020, 1, 1)


def make_scene(n_frames=6, velocity=(2.0, 1.0), imgsz=256, seed=0):
    """Nadir camera over a drifting ground texture."""
    rng = np.random.default_rng(seed)
    world = scipy.ndimage.gaussian_filter(rng.normal(size=(500, 500)), 0.8) * 100
    texture = gt.Raster(world, x=(0, 500), y=(500, 0))
    cam = gt.Camera(imgsz=imgsz, f=300, xyz=(250, 250, 300), viewdir=(0, -90, 0))
    uv = cam.grid(step=1, mode="points")
    rays = cam.uv_to_xyz(uv)
    ground = cam.xyz + rays * (-cam.xyz[2] / rays[:, 2])[:, None]
    frames = []
    for i in range(n_frames):
        shifted = ground[:, 0:2] - np.asarray(velocity) * i
        frames.append(
            texture.sample(shifted, bounds_error=False, fill_value=0.0).reshape(
                imgsz, imgsz
            )
        )
    return cam, np.stack(frames)


def main():
    velocity = (2.0, 1.0)
    cam, frames = make_scene(velocity=velocity)

    # --- Calibration: recover an unknown second-camera rotation -----------
    rotation = np.array([0.5, -0.3, 0.2])
    cam_true = cam.copy()
    cam_true.viewdir = np.array(cam.viewdir) + rotation
    rng = np.random.default_rng(1)
    uvA = rng.uniform(40, 216, size=(60, 2))
    uvB = cam_true.xyz_to_uv(cam.uv_to_xyz(uvA), directions=True)
    keep = np.isfinite(uvB).all(axis=1)
    cam_guess = cam.copy()  # starts at the unrotated view direction
    matches = optimize.Matches(cams=(cam, cam_guess), uvs=[uvA[keep], uvB[keep]])
    model = optimize.Cameras(
        cams=[cam_guess], controls=[matches], cam_params=[{"viewdir": True}]
    )
    model.set_cameras(model.fit())
    print("calibration: viewdir error =",
          np.abs(cam_guess.viewdir - cam_true.viewdir).max(), "deg")

    # --- Tracking: batched on-device particle filter ----------------------
    n_points = 64
    points_xy = rng.uniform(180, 320, size=(n_points, 2)).astype(np.float32)
    motion = BatchMotion(
        kind="cartesian",
        xy=jnp.asarray(points_xy),
        xy_sigma=jnp.full((n_points, 2), 1.5, jnp.float32),
        v_mean=jnp.zeros((n_points, 3), jnp.float32),
        v_sigma=jnp.full((n_points, 3), 3.0, jnp.float32).at[:, 2].set(0.0),
        a_mean=jnp.zeros((n_points, 3), jnp.float32),
        a_sigma=jnp.full((n_points, 3), 0.2, jnp.float32).at[:, 2].set(0.0),
        slope_sigma=jnp.zeros((n_points,), jnp.float32),
        dem=DeviceRaster.constant(0.0),
        dem_sigma=DeviceRaster.constant(0.0),
        use_dem_sigma=False,
    )
    tracker = BatchTracker(
        camera_vectors=cam.to_array()[None],
        corrections=[None],
        sigmas=[0.15],
        motion=motion,
        config=BatchConfig(n_particles=512, search_size=(41, 41)),
    )
    n_frames = frames.shape[0]
    state, outputs = tracker.track(
        jax.random.PRNGKey(0), frames[:, None], np.ones(n_frames - 1)
    )
    datetimes = [T0 + i * DAY for i in range(n_frames)]
    tracks = to_tracks(datetimes, DAY, outputs)
    v = tracks.vxyz[:, -1, 0:2]
    err = np.abs(v - np.asarray(velocity))
    print(f"tracking: {n_points} points x 512 particles x {n_frames - 1} steps")
    print("tracking: median velocity error =", np.median(err, axis=0), "px/day")
    print("tracking: median position sigma =",
          float(np.median(tracks.xyz_sigma[:, -1, 0])), "px")


if __name__ == "__main__":
    main()
