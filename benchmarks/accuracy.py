"""Accuracy ladder: device BatchTracker vs host (reference-faithful) Tracker.

BASELINE.md ladder config (3): a 2-D particle filter over 100 points x 500
particles x 20 frames of rigidly translating synthetic texture. Both trackers
see identical frames (a nadir camera at height h with f = h images the z=0
plane 1:1, so rendered frames double as world-grid rasters for the host
tracker). Prints one JSON line with px-RMSE of each tracker against ground
truth and against each other — evidence for the "trajectories within 0.1 px"
north-star criterion.

Run on CPU by default (deterministic, no TPU contention):
    python benchmarks/accuracy.py
"""
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import scipy.ndimage

    if os.environ.get("ACCURACY_PLATFORM", "cpu") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from glimpse_tpu import Camera
    from glimpse_tpu.raster import Raster
    from glimpse_tpu.track import CartesianMotion, Observer, Tracker
    from glimpse_tpu.track.batch import (
        BatchConfig,
        BatchMotion,
        BatchTracker,
        DeviceRaster,
    )

    n_points = int(os.environ.get("ACCURACY_POINTS", 100))
    n_particles = int(os.environ.get("ACCURACY_PARTICLES", 500))
    n_frames = int(os.environ.get("ACCURACY_FRAMES", 20))
    imgsz = 384
    velocity = (1.2, -0.7)  # px/frame, constant rigid shift

    rng = np.random.default_rng(3)
    base = scipy.ndimage.gaussian_filter(
        rng.normal(size=(imgsz, imgsz)), 0.8
    ).astype(np.float64) * 100
    frames = np.stack(
        [
            scipy.ndimage.shift(
                base, (-velocity[1] * i, velocity[0] * i), order=3, mode="nearest"
            )
            for i in range(n_frames)
        ]
    ).astype(np.float32)

    cam = Camera(
        imgsz=imgsz, f=imgsz, xyz=(imgsz / 2, imgsz / 2, imgsz), viewdir=(0, -90, 0)
    )
    cx, cy = cam.xyz[0], cam.xyz[1]
    margin = 80
    starts = rng.uniform(margin, imgsz - margin, size=(n_points, 2))

    t0 = datetime.datetime(2020, 1, 1)
    day = datetime.timedelta(days=1)
    rasters = [
        Raster(
            f,
            x=(cx - imgsz / 2, cx + imgsz / 2),
            y=(cy + imgsz / 2, cy - imgsz / 2),
            datetime=t0 + i * day,
        )
        for i, f in enumerate(frames)
    ]

    # ---- Host (reference-faithful) tracker, one motion model per point ----
    host_motions = [
        CartesianMotion(
            xy=tuple(p), time_unit=day, dem=0.0, dem_sigma=None, n=n_particles,
            xy_sigma=(1.5, 1.5), vxyz_sigma=(2, 2, 0), axyz_sigma=(0.2, 0.2, 0),
            seed=int(1000 + i),
        )
        for i, p in enumerate(starts)
    ]
    host = Tracker([Observer(rasters, sigma=0.15)], seed=11)
    host_tracks = host.track(host_motions, tile_size=(15, 15), parallel=4)
    host_final = host_tracks.xyz[:, -1, 0:2]  # (N, 2)

    # ---- Device batch tracker on the same frames through the camera ----
    motion = BatchMotion(
        kind="cartesian",
        xy=jnp.asarray(starts, jnp.float32),
        xy_sigma=jnp.full((n_points, 2), 1.5, jnp.float32),
        v_mean=jnp.zeros((n_points, 3), jnp.float32),
        v_sigma=jnp.full((n_points, 3), 2.0, jnp.float32).at[:, 2].set(0.0),
        a_mean=jnp.zeros((n_points, 3), jnp.float32),
        a_sigma=jnp.full((n_points, 3), 0.2, jnp.float32).at[:, 2].set(0.0),
        slope_sigma=jnp.zeros((n_points,), jnp.float32),
        dem=DeviceRaster.constant(0.0),
        dem_sigma=DeviceRaster.constant(0.0),
        use_dem_sigma=False,
    )
    cfg = BatchConfig(
        n_particles=n_particles, template_size=(15, 15), search_size=(41, 41)
    )
    batch = BatchTracker(
        camera_vectors=cam.to_array()[None], corrections=[None], sigmas=[0.15],
        motion=motion, config=cfg,
    )
    _, outputs = batch.track(
        jax.random.PRNGKey(11), frames[:, None], np.ones(n_frames - 1, np.float32)
    )
    batch_final = np.asarray(outputs["mean"])[-1, :, 0:2]  # (N, 2)

    truth = starts + np.asarray(velocity) * (n_frames - 1)

    def rmse(a, b):
        return float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=-1))))

    print(
        json.dumps(
            {
                "config": f"{n_points} points x {n_particles} particles x "
                          f"{n_frames} frames",
                "rmse_host_vs_truth_px": round(rmse(host_final, truth), 4),
                "rmse_batch_vs_truth_px": round(rmse(batch_final, truth), 4),
                "rmse_batch_vs_host_px": round(rmse(batch_final, host_final), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
