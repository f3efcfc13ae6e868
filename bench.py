"""Benchmark: batched on-device particle filter vs reference-style CPU loop.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: point-timesteps/sec/chip for the full PF update (projection through
a distorted camera, search-tile extraction, normalize + histogram match +
median high-pass, SSE template matching, cubic-spline likelihood sampling,
systematic resampling) — BASELINE.json's headline metric. The baseline is a
faithful NumPy/SciPy/OpenCV re-creation of the reference's per-point loop
(benchmarks/reference_baseline.py), measured on this machine.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main() -> None:
    import scipy.ndimage

    import jax
    import jax.numpy as jnp

    from benchmarks.reference_baseline import measure_baseline_throughput
    from glimpse_tpu import Camera
    from glimpse_tpu.track.batch import (
        BatchConfig,
        BatchMotion,
        BatchTracker,
        DeviceRaster,
    )

    # ---- Workload (BASELINE.json config 4 scale, trimmed for bench time) --
    N_POINTS = int(os.environ.get("BENCH_POINTS", 1024))
    N_PARTICLES = int(os.environ.get("BENCH_PARTICLES", 1024))
    N_STEPS = int(os.environ.get("BENCH_STEPS", 50))
    IMG = int(os.environ.get("BENCH_IMGSZ", 512))
    N_OBSERVERS = int(os.environ.get("BENCH_OBSERVERS", 1))

    rng = np.random.default_rng(0)
    base = scipy.ndimage.gaussian_filter(rng.normal(size=(IMG, IMG)), 0.8) * 100
    frames = np.stack(
        [
            scipy.ndimage.shift(base, (i * 1.0, i * 2.0), order=1, mode="nearest")
            for i in range(N_STEPS + 1)
        ]
    ).astype(np.float32)

    cam = Camera(imgsz=IMG, f=IMG, xyz=(IMG / 2, IMG / 2, IMG), viewdir=(0, -90, 0))
    margin = IMG // 4
    points_xy = rng.uniform(margin, IMG - margin, size=(N_POINTS, 2))
    motion = BatchMotion(
        kind="cartesian",
        xy=jnp.asarray(points_xy, jnp.float32),
        xy_sigma=jnp.full((N_POINTS, 2), 1.5, jnp.float32),
        v_mean=jnp.zeros((N_POINTS, 3), jnp.float32),
        v_sigma=jnp.full((N_POINTS, 3), 3.0, jnp.float32).at[:, 2].set(0.0),
        a_mean=jnp.zeros((N_POINTS, 3), jnp.float32),
        a_sigma=jnp.full((N_POINTS, 3), 0.2, jnp.float32).at[:, 2].set(0.0),
        slope_sigma=jnp.zeros((N_POINTS,), jnp.float32),
        dem=DeviceRaster.constant(0.0),
        dem_sigma=DeviceRaster.constant(0.0),
        use_dem_sigma=False,
    )
    cfg = BatchConfig(
        n_particles=N_PARTICLES, template_size=(15, 15), search_size=(41, 41)
    )
    tracker = BatchTracker(
        camera_vectors=np.tile(cam.to_array()[None], (N_OBSERVERS, 1)),
        corrections=[None] * N_OBSERVERS,
        sigmas=[0.3] * N_OBSERVERS,
        motion=motion,
        config=cfg,
    )
    images = jnp.asarray(np.repeat(frames[:, None], N_OBSERVERS, axis=1))
    dts = jnp.ones(N_STEPS, jnp.float32)

    # Compile + warm up. NOTE: on the tunneled TPU backend
    # block_until_ready does not synchronize, so completion is forced by
    # fetching the outputs.
    state, outputs = tracker.track(jax.random.PRNGKey(0), images, dts)
    _ = np.asarray(outputs["mean"][-1])
    # Timed runs (best of 2).
    elapsed = float("inf")
    for rep in range(2):
        start = time.perf_counter()
        state, outputs = tracker.track(jax.random.PRNGKey(1 + rep), images, dts)
        _ = np.asarray(outputs["mean"][-1])
        elapsed = min(elapsed, time.perf_counter() - start)
    throughput = N_POINTS * N_STEPS / elapsed

    # Baseline: reference-style per-point CPU loop at the same particle
    # count. The PINNED value (benchmarks/pinned_baseline.json, median of 5
    # on an idle host) keeps vs_baseline comparable across rounds; a fresh
    # measurement is reported alongside for drift detection.
    pinned = None
    pin_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "pinned_baseline.json",
    )
    if os.path.exists(pin_path):
        with open(pin_path) as fp:
            pins = json.load(fp)
        entry = pins.get("by_particles", {}).get(str(N_PARTICLES))
        if entry and pins.get("image_size") == IMG:
            pinned = entry["median"]
    fresh = measure_baseline_throughput(
        n_steps=5, n_particles=N_PARTICLES, image_size=IMG
    )
    baseline = pinned if pinned is not None else fresh

    print(
        json.dumps(
            {
                "metric": "point-timesteps/sec/chip (PF+NCC)",
                "value": round(throughput, 2),
                "unit": "point-steps/s",
                "vs_baseline": round(throughput / baseline, 2),
                "vs_baseline_fresh": round(throughput / fresh, 2),
                "baseline_pinned": pinned is not None,
            }
        )
    )


if __name__ == "__main__":
    main()
