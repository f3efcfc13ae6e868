"""Accuracy ladder: device BatchTracker vs host (reference-faithful) Tracker.

BASELINE.md ladder config (3): a 2-D particle filter over 100 points x 500
particles x 20 frames of rigidly translating synthetic texture. Both trackers
see identical frames (a nadir camera at height h with f = h images the z=0
plane 1:1, so rendered frames double as world-grid rasters for the host
tracker) and run the full bidirectional workflow: a forward pass, a backward
pass seeded at the forward endpoints, and inverse-variance fusion
(``Tracks.from_multiple`` semantics) — the reference's own recipe for
long-sequence accuracy.

Prints one JSON line with:
- forward-only and fused px-RMSE of each tracker against ground truth;
- the lockstep device-vs-host divergence (both trackers driven by identical
  random draws; see ``benchmarks/lockstep.py``) — the direct measurement of
  the "trajectories within 0.1 px of the reference" north star.

Run on CPU by default (deterministic, no TPU contention):
    python benchmarks/accuracy.py
"""
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VELOCITY = (1.2, -0.7)  # px/frame, constant rigid shift
PRIOR_V = (1.0, -0.5)  # coarse prior velocity (deliberately offset)
SIGMA = 0.35  # observation sigma (per-pixel residual std after matching)
XY_SIGMA, V_SIGMA, A_SIGMA = 1.5, 0.5, 0.2
IMGSZ = 384


def make_frames(n_frames: int, rng) -> np.ndarray:
    import scipy.ndimage

    base = scipy.ndimage.gaussian_filter(
        rng.normal(size=(IMGSZ, IMGSZ)), 0.8
    ).astype(np.float64) * 100
    return np.stack(
        [
            scipy.ndimage.shift(
                base, (-VELOCITY[1] * i, VELOCITY[0] * i), order=3, mode="nearest"
            )
            for i in range(n_frames)
        ]
    ).astype(np.float32)


def run_device(cam, frames, starts, n_particles, prior_v, seed):
    """One BatchTracker pass; returns (means, sigmas) of shape (T-1,N,6).

    ``prior_v`` is a scalar pair applied to all points or an (N, 2) array of
    per-point velocity priors (tight sigma), e.g. from a previous pass.
    """
    import jax
    import jax.numpy as jnp

    from glimpse_tpu.track.batch import (
        BatchConfig, BatchMotion, BatchTracker, DeviceRaster,
    )

    n_points = len(starts)
    prior_v = np.asarray(prior_v, np.float32)
    informed = prior_v.ndim == 2
    if not informed:
        prior_v = np.tile(prior_v, (n_points, 1))
    v_mean = np.concatenate([prior_v, np.zeros((n_points, 1), np.float32)], axis=1)
    v_sigma = 0.2 if informed else V_SIGMA
    motion = BatchMotion(
        kind="cartesian",
        xy=jnp.asarray(starts, jnp.float32),
        xy_sigma=jnp.full((n_points, 2), XY_SIGMA, jnp.float32),
        v_mean=jnp.asarray(v_mean),
        v_sigma=jnp.full((n_points, 3), v_sigma, jnp.float32).at[:, 2].set(0.0),
        a_mean=jnp.zeros((n_points, 3), jnp.float32),
        a_sigma=jnp.full((n_points, 3), A_SIGMA, jnp.float32).at[:, 2].set(0.0),
        slope_sigma=jnp.zeros((n_points,), jnp.float32),
        dem=DeviceRaster.constant(0.0),
        dem_sigma=DeviceRaster.constant(0.0),
        use_dem_sigma=False,
    )
    cfg = BatchConfig(
        n_particles=n_particles, template_size=(15, 15), search_size=(41, 41),
        return_covariances=True,
    )
    tracker = BatchTracker(
        camera_vectors=cam.to_array()[None], corrections=[None], sigmas=[SIGMA],
        motion=motion, config=cfg,
    )
    _, out = tracker.track(
        jax.random.PRNGKey(seed), frames[:, None],
        np.ones(len(frames) - 1, np.float32),
    )
    return (
        np.asarray(out["mean"]),
        np.asarray(out["sigma"]),
        np.asarray(out["covariance"]),
    )


def run_host(cam, frames, starts, n_particles, prior_v, seed):
    """One host Tracker pass; returns (means (T-1,N,2), sigmas (T-1,N,2))."""
    from glimpse_tpu.raster import Raster
    from glimpse_tpu.track import CartesianMotion, Observer, Tracker

    cx, cy = cam.xyz[0], cam.xyz[1]
    t0 = datetime.datetime(2020, 1, 1)
    day = datetime.timedelta(days=1)
    rasters = [
        Raster(
            f,
            x=(cx - IMGSZ / 2, cx + IMGSZ / 2),
            y=(cy + IMGSZ / 2, cy - IMGSZ / 2),
            datetime=t0 + i * day,
        )
        for i, f in enumerate(frames)
    ]
    prior_v = np.asarray(prior_v, float)
    informed = prior_v.ndim == 2
    if not informed:
        prior_v = np.tile(prior_v, (len(starts), 1))
    v_sigma = 0.2 if informed else V_SIGMA
    motions = [
        CartesianMotion(
            xy=tuple(p), time_unit=day, dem=0.0, dem_sigma=None, n=n_particles,
            xy_sigma=(XY_SIGMA, XY_SIGMA),
            vxyz=(prior_v[i][0], prior_v[i][1], 0),
            vxyz_sigma=(v_sigma, v_sigma, 0),
            axyz_sigma=(A_SIGMA, A_SIGMA, 0),
            seed=int(seed * 1000 + i),
        )
        for i, p in enumerate(starts)
    ]
    tracker = Tracker(
        [Observer(rasters, sigma=SIGMA)], seed=seed, record="posterior"
    )
    tracks = tracker.track(
        motions, tile_size=(15, 15), parallel=4, return_covariances=True
    )
    covs = np.moveaxis(tracks.covariances[:, 1:], 0, 1)
    sigmas = np.sqrt(np.diagonal(covs, axis1=-2, axis2=-1))
    return np.moveaxis(tracks.means[:, 1:], 0, 1), sigmas, covs


def smooth_forward(run, frames, starts, n_particles, n_frames):
    """Forward filtering pass + RTS smoothing of its moment trajectory.

    The cartesian motion model is linear-Gaussian, so fixed-interval
    smoothing over the filtered (mean, covariance) outputs is exact on the
    dynamics side (``glimpse_tpu.track.smooth``). Returns (smoothed,
    forward-only) xy means (T-1, N, 2).
    """
    from glimpse_tpu.track.smooth import rts_smooth

    fwd_mean, fwd_sigma, fwd_cov = run(frames, starts, PRIOR_V, seed=11)
    smoothed, _ = rts_smooth(
        fwd_mean, fwd_cov, np.ones(n_frames - 2), (A_SIGMA, A_SIGMA, 0.0)
    )
    return smoothed[..., 0:2], fwd_mean[..., 0:2]


def main() -> None:
    if os.environ.get("ACCURACY_PLATFORM", "cpu") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from glimpse_tpu import Camera

    from lockstep import run_lockstep

    n_points = int(os.environ.get("ACCURACY_POINTS", 100))
    n_particles = int(os.environ.get("ACCURACY_PARTICLES", 500))
    n_frames = int(os.environ.get("ACCURACY_FRAMES", 20))

    rng = np.random.default_rng(3)
    frames = make_frames(n_frames, rng)
    cam = Camera(
        imgsz=IMGSZ, f=IMGSZ, xyz=(IMGSZ / 2, IMGSZ / 2, IMGSZ), viewdir=(0, -90, 0)
    )
    starts = rng.uniform(80, IMGSZ - 80, size=(n_points, 2))
    truth = starts[None] + np.asarray(VELOCITY) * np.arange(1, n_frames).reshape(
        -1, 1, 1
    )

    def rmse(a, b):
        return round(float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=-1)))), 4)

    results = {
        "config": f"{n_points} points x {n_particles} particles x "
                  f"{n_frames} frames",
    }
    for name, runner in [("device", run_device), ("host", run_host)]:
        smoothed, forward = smooth_forward(
            lambda f, s, v, seed: runner(cam, f, s, n_particles, v, seed),
            frames, starts, n_particles, n_frames,
        )
        results[f"rmse_{name}_forward_px"] = rmse(forward, truth)
        results[f"rmse_{name}_smoothed_px"] = rmse(smoothed, truth)
        # Steady state: frames after the velocity prior has converged.
        results[f"rmse_{name}_smoothed_steady_px"] = rmse(smoothed[4:], truth[4:])
        results[f"rmse_{name}_final_px"] = rmse(forward[-1], truth[-1])
    lock = run_lockstep(
        n_points=min(n_points, 50), n_particles=n_particles, n_frames=n_frames
    )
    results["rmse_device_vs_host_lockstep_px"] = lock["rmse_device_vs_host_px"]
    results["max_device_vs_host_lockstep_px"] = lock["max_device_vs_host_px"]
    print(json.dumps(results))


if __name__ == "__main__":
    main()
