"""Benchmark: batched on-device particle filter vs reference-style CPU loop.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: point-timesteps/sec/chip for the full PF update (projection through
a distorted camera, search-tile extraction, normalize + histogram match +
median high-pass, SSE template matching, cubic-spline likelihood sampling,
systematic resampling) — BASELINE.json's headline metric. The baseline is a
faithful NumPy/SciPy/OpenCV re-creation of the reference's per-point loop
(benchmarks/reference_baseline.py), measured on this machine.

Resilience: the tracker passes cameras/motion as jit ARGUMENTS (nothing is
fetched at lowering time), and the measurement body retries once on a
transient backend error (JaxRuntimeError) so one RPC hiccup through the TPU
tunnel cannot turn the scoreboard entry into a stack trace.
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def measure(n_points, n_particles, n_steps, img, n_observers):
    import scipy.ndimage

    import jax
    import jax.numpy as jnp

    from glimpse_tpu import Camera
    from glimpse_tpu.track.batch import (
        BatchConfig,
        BatchMotion,
        BatchTracker,
        DeviceRaster,
    )

    rng = np.random.default_rng(0)
    base = scipy.ndimage.gaussian_filter(rng.normal(size=(img, img)), 0.8) * 100
    frames = np.stack(
        [
            scipy.ndimage.shift(base, (i * 1.0, i * 2.0), order=1, mode="nearest")
            for i in range(n_steps + 1)
        ]
    ).astype(np.float32)

    cam = Camera(imgsz=img, f=img, xyz=(img / 2, img / 2, img), viewdir=(0, -90, 0))
    margin = img // 4
    points_xy = rng.uniform(margin, img - margin, size=(n_points, 2))
    # Motion parameters stay host NumPy: BatchTracker passes them to the
    # jitted step as arguments, never as closed-over device constants.
    motion = BatchMotion(
        kind="cartesian",
        xy=np.asarray(points_xy, np.float32),
        xy_sigma=np.full((n_points, 2), 1.5, np.float32),
        v_mean=np.zeros((n_points, 3), np.float32),
        v_sigma=np.stack(
            [np.full(n_points, 3.0), np.full(n_points, 3.0), np.zeros(n_points)],
            axis=1,
        ).astype(np.float32),
        a_mean=np.zeros((n_points, 3), np.float32),
        a_sigma=np.stack(
            [np.full(n_points, 0.2), np.full(n_points, 0.2), np.zeros(n_points)],
            axis=1,
        ).astype(np.float32),
        slope_sigma=np.zeros((n_points,), np.float32),
        dem=DeviceRaster.constant(0.0),
        dem_sigma=DeviceRaster.constant(0.0),
        use_dem_sigma=False,
    )
    cfg = BatchConfig(
        n_particles=n_particles, template_size=(15, 15), search_size=(41, 41)
    )
    tracker = BatchTracker(
        camera_vectors=np.tile(cam.to_array()[None], (n_observers, 1)),
        corrections=[None] * n_observers,
        sigmas=[0.3] * n_observers,
        motion=motion,
        config=cfg,
    )
    images = jnp.asarray(np.repeat(frames[:, None], n_observers, axis=1))
    dts = jnp.ones(n_steps, jnp.float32)

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
    return n_points * n_steps / elapsed


def main() -> None:
    import jax

    # ---- Workload (BASELINE.json config 4 scale, trimmed for bench time) --
    N_POINTS = int(os.environ.get("BENCH_POINTS", 1024))
    N_PARTICLES = int(os.environ.get("BENCH_PARTICLES", 1024))
    N_STEPS = int(os.environ.get("BENCH_STEPS", 50))
    IMG = int(os.environ.get("BENCH_IMGSZ", 512))
    N_OBSERVERS = int(os.environ.get("BENCH_OBSERVERS", 1))

    # One retry on transient backend errors (the round-2 BENCH capture was
    # lost to a FailedPrecondition raised during a lowering-time fetch).
    throughput = None
    for attempt in range(2):
        try:
            throughput = measure(N_POINTS, N_PARTICLES, N_STEPS, IMG, N_OBSERVERS)
            break
        except jax.errors.JaxRuntimeError:
            if attempt == 0:
                traceback.print_exc(file=sys.stderr)
                print("transient backend error; retrying once", file=sys.stderr)
                time.sleep(5.0)
            else:
                raise

    # Baseline: reference-style per-point CPU loop at the same particle
    # count. The PINNED value (benchmarks/pinned_baseline.json, median of 5
    # on an idle host) keeps vs_baseline comparable across rounds; a fresh
    # measurement is attempted for drift detection but is load-sensitive
    # and must never sink the capture.
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
    fresh = None
    try:
        from benchmarks.reference_baseline import measure_baseline_throughput

        fresh = measure_baseline_throughput(
            n_steps=5, n_particles=N_PARTICLES, image_size=IMG
        )
    except Exception:
        traceback.print_exc(file=sys.stderr)
    baseline = pinned if pinned is not None else fresh

    result = {
        "metric": "point-timesteps/sec/chip (PF+NCC)",
        "value": round(throughput, 2),
        "unit": "point-steps/s",
        "vs_baseline": round(throughput / baseline, 2) if baseline else None,
        "baseline_pinned": pinned is not None,
    }
    if fresh is not None:
        # Unpinned and load-sensitive: for drift detection only.
        result["vs_baseline_fresh_unpinned"] = round(throughput / fresh, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
