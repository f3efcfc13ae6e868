"""Weak scaling of the sharded tracking step over a virtual device mesh.

VERDICT round-2 item 7: measure the scaling the README claims instead of
asserting it. Constant work per device (points/device fixed), growing the
mesh 1 -> 8 virtual CPU devices. On this host every virtual device shares
the physical cores, so ideal weak scaling shows wall time growing linearly
with the device count while per-device overhead stays flat; efficiency is
reported as ``n * t(1) / t(n)`` (1.0 = no sharding overhead, no collectives,
no recompute). The companion guarantee — that the compiled sharded step
contains NO cross-device collectives — is asserted by
``tests/test_parallel.py::test_sharded_step_has_no_collectives``.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python benchmarks/scaling.py
Env: SCALING_POINTS_PER_DEV (1280), SCALING_PARTICLES (512),
     SCALING_STEPS (10), SCALING_IMGSZ (512).
     SCALING_MODE: 'weak' (default) scans on-device via ``track``;
     'stream' weak-scales the chunked host-fed ``track_stream`` pipeline
     (SCALING_CHUNK, default 4) and asserts the per-point mesh sharding
     survives the chunk program; 'control' runs the oversubscription
     control (same total work on 1 device vs the full mesh).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(n_points, n_particles, imgsz, mesh):
    import jax.numpy as jnp

    from glimpse_tpu import Camera
    from glimpse_tpu.track.batch import (
        BatchConfig, BatchMotion, BatchTracker, DeviceRaster,
    )

    rng = np.random.default_rng(0)
    cam = Camera(
        imgsz=imgsz, f=imgsz, xyz=(imgsz / 2, imgsz / 2, imgsz),
        viewdir=(0, -90, 0),
    )
    motion = BatchMotion(
        kind="cartesian",
        xy=rng.uniform(imgsz * 0.3, imgsz * 0.7, (n_points, 2)).astype(
            np.float32
        ),
        xy_sigma=np.full((n_points, 2), 1.5, np.float32),
        v_mean=np.zeros((n_points, 3), np.float32),
        v_sigma=np.full((n_points, 3), 3.0, np.float32),
        a_mean=np.zeros((n_points, 3), np.float32),
        a_sigma=np.full((n_points, 3), 0.2, np.float32),
        slope_sigma=np.zeros((n_points,), np.float32),
        dem=DeviceRaster.constant(0.0),
        dem_sigma=DeviceRaster.constant(0.0),
        use_dem_sigma=False,
    )
    cfg = BatchConfig(
        n_particles=n_particles, template_size=(15, 15), search_size=(41, 41)
    )
    return BatchTracker(
        camera_vectors=cam.to_array()[None], corrections=[None], sigmas=[0.3],
        motion=motion, config=cfg, mesh=mesh,
    )


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import scipy.ndimage

    from glimpse_tpu.parallel import get_mesh

    per_dev = int(os.environ.get("SCALING_POINTS_PER_DEV", 1280))
    particles = int(os.environ.get("SCALING_PARTICLES", 512))
    steps = int(os.environ.get("SCALING_STEPS", 10))
    reps = int(os.environ.get("SCALING_REPS", 2))
    imgsz = int(os.environ.get("SCALING_IMGSZ", 512))
    max_dev = len(jax.devices())

    rng = np.random.default_rng(0)
    base = scipy.ndimage.gaussian_filter(
        rng.normal(size=(imgsz, imgsz)), 0.8
    ) * 100
    frames = np.stack(
        [
            scipy.ndimage.shift(base, (i, 2 * i), order=1, mode="nearest")
            for i in range(steps + 1)
        ]
    ).astype(np.float32)[:, None]
    dts = np.ones(steps, np.float32)

    mode = os.environ.get("SCALING_MODE", "weak")

    def run_one(n_dev, n_points):
        tracker = build(n_points, particles, imgsz, get_mesh(n_dev))
        import jax.random

        print(f"[scaling] {n_dev} devices: compiling", file=sys.stderr,
              flush=True)
        _, out = tracker.track(jax.random.PRNGKey(0), frames, dts)
        np.asarray(out["mean"][-1])
        elapsed = float("inf")
        for rep in range(reps):
            t0 = time.perf_counter()
            _, out = tracker.track(jax.random.PRNGKey(rep + 1), frames, dts)
            np.asarray(out["mean"][-1])
            elapsed = min(elapsed, time.perf_counter() - t0)
        print(f"[scaling] {n_dev} devices: {elapsed:.2f}s", file=sys.stderr,
              flush=True)
        return elapsed

    if mode == "control":
        # Oversubscription control: the SAME total work on 1 device and on
        # the full mesh. On a single-physical-core host both should take
        # equal wall time if (and only if) sharding adds no overhead —
        # this separates sharding cost from the thread-oversubscription
        # cost that the weak-scaling numbers conflate with it.
        n_points = per_dev * max_dev
        t_single = run_one(1, n_points)
        t_sharded = run_one(max_dev, n_points)
        print(
            json.dumps(
                {
                    "config": f"{n_points} total points x {particles} "
                              f"particles x {steps} steps, img {imgsz}",
                    "host_physical_cpus": os.cpu_count(),
                    "control": {
                        "single_device_wall_s": round(t_single, 3),
                        f"sharded_{max_dev}dev_wall_s": round(t_sharded, 3),
                        "sharding_overhead": round(
                            t_sharded / t_single - 1.0, 4
                        ),
                    },
                }
            )
        )
        return

    if mode == "stream":
        # Sharded STREAMED pipeline (round-4 chunked host-fed scan): weak
        # scaling of ``track_stream(chunk=n)`` under the mesh, asserting the
        # per-point sharding survives the chunk program (the scan-path table
        # above cannot see a resharding bug in the streamed path).
        chunk = int(os.environ.get("SCALING_CHUNK", 4))
        import jax.random
        from jax.sharding import NamedSharding

        rows = []
        t1 = None
        n_dev = 1
        while n_dev <= max_dev:
            n_points = per_dev * n_dev
            mesh = get_mesh(n_dev)
            tracker = build(n_points, particles, imgsz, mesh)

            def run_stream(seed):
                state, outputs = tracker.track_stream(
                    jax.random.PRNGKey(seed), frames[0],
                    iter(frames[1:]), dts, chunk=chunk,
                )
                np.asarray(outputs[-1]["mean"])
                return state

            print(f"[scaling/stream] {n_dev} devices: compiling",
                  file=sys.stderr, flush=True)
            state = run_stream(0)
            sh = state.particles.sharding
            assert isinstance(sh, NamedSharding) and sh.mesh.shape == dict(
                mesh.shape
            ), f"streamed state lost its mesh sharding: {sh}"
            if n_dev > 1:
                spec0 = sh.spec[0] if len(sh.spec) else None
                assert spec0 == mesh.axis_names[0], (
                    f"streamed particles not sharded over points: {sh.spec}"
                )
            elapsed = float("inf")
            for rep in range(reps):
                t0 = time.perf_counter()
                run_stream(rep + 1)
                elapsed = min(elapsed, time.perf_counter() - t0)
            if t1 is None:
                t1 = elapsed
            print(f"[scaling/stream] {n_dev} devices: {elapsed:.2f}s",
                  file=sys.stderr, flush=True)
            rows.append(
                {
                    "devices": n_dev,
                    "points": n_points,
                    "wall_s": round(elapsed, 3),
                    "point_steps_per_s": round(
                        n_points * steps / elapsed, 1
                    ),
                    "efficiency": round(n_dev * t1 / elapsed, 3),
                }
            )
            n_dev *= 2
        print(
            json.dumps(
                {
                    "config": f"{per_dev} points/device x {particles} "
                              f"particles x {steps} streamed steps "
                              f"(chunk={chunk}), img {imgsz}",
                    "host_physical_cpus": os.cpu_count(),
                    "weak_scaling_streamed": rows,
                }
            )
        )
        return

    rows = []
    t1 = None
    n_dev = 1
    while n_dev <= max_dev:
        n_points = per_dev * n_dev
        tracker = build(n_points, particles, imgsz, get_mesh(n_dev))
        import jax.random

        # Warm up (compile), then best of `reps` timed runs.
        print(f"[scaling] {n_dev} devices: compiling", file=sys.stderr, flush=True)
        _, out = tracker.track(jax.random.PRNGKey(0), frames, dts)
        np.asarray(out["mean"][-1])
        elapsed = float("inf")
        for rep in range(reps):
            t0 = time.perf_counter()
            _, out = tracker.track(jax.random.PRNGKey(rep + 1), frames, dts)
            np.asarray(out["mean"][-1])
            elapsed = min(elapsed, time.perf_counter() - t0)
        if t1 is None:
            t1 = elapsed
        print(f"[scaling] {n_dev} devices: {elapsed:.2f}s", file=sys.stderr, flush=True)
        rows.append(
            {
                "devices": n_dev,
                "points": n_points,
                "wall_s": round(elapsed, 3),
                "point_steps_per_s": round(n_points * steps / elapsed, 1),
                # Shared physical cores: ideal weak scaling = wall time
                # growing with n; efficiency folds that back out.
                "efficiency": round(n_dev * t1 / elapsed, 3),
            }
        )
        n_dev *= 2
    print(
        json.dumps(
            {
                "config": f"{per_dev} points/device x {particles} particles "
                          f"x {steps} steps, img {imgsz}",
                "host_physical_cpus": os.cpu_count(),
                "weak_scaling": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
