"""Worker process for the 2-process jax.distributed test.

Each process owns `local_points_slice` of the global points axis, tracks its
slice with the BatchTracker (noise-injected so results are independent of
the partitioning), then participates in one global collective over the
multi-process mesh (a psum of per-host trajectory sums) to exercise the
cross-host data plane.

Usage (spawned by tests/test_parallel.py):
    python multihost_worker.py <process_id> <num_processes> <port> <outdir>
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import numpy as np


def tracking_problem(n_points: int, n_frames: int):
    """Deterministic synthetic tracking problem (identical on every host)."""
    import scipy.ndimage

    imgsz = 192
    velocity = (1.0, -0.5)
    rng = np.random.default_rng(5)
    base = scipy.ndimage.gaussian_filter(
        rng.normal(size=(imgsz, imgsz)), 0.8
    ) * 100
    frames = np.stack(
        [
            scipy.ndimage.shift(
                base, (-velocity[1] * i, velocity[0] * i), order=3,
                mode="nearest",
            )
            for i in range(n_frames)
        ]
    ).astype(np.float32)
    starts = rng.uniform(60, imgsz - 60, size=(n_points, 2))
    # Globally pre-generated noise: slicing it per host makes the local
    # trajectories bit-comparable to the single-process run.
    noise_rng = np.random.default_rng(7)
    n_particles = 64
    noise = {
        "init_xy": noise_rng.standard_normal((n_points, n_particles, 2)),
        "init_v": noise_rng.standard_normal((n_points, n_particles, 3)),
        "a": noise_rng.standard_normal((n_frames - 1, n_points, n_particles, 3)),
        "resample_u": noise_rng.random((n_frames - 1, n_points)),
    }
    return imgsz, velocity, frames, starts, n_particles, noise


def track_slice(frames, starts, n_particles, noise, sl, imgsz):
    """Track points[sl] with injected noise; returns (T-1, n_local, 6)."""
    import jax
    import jax.numpy as jnp

    from glimpse_tpu import Camera
    from glimpse_tpu.track.batch import (
        BatchConfig, BatchMotion, BatchTracker, DeviceRaster,
    )

    cam = Camera(
        imgsz=imgsz, f=imgsz, xyz=(imgsz / 2, imgsz / 2, imgsz),
        viewdir=(0, -90, 0),
    )
    local = starts[sl]
    n_local = len(local)
    motion = BatchMotion(
        kind="cartesian",
        xy=jnp.asarray(local, jnp.float32),
        xy_sigma=jnp.full((n_local, 2), 1.0, jnp.float32),
        v_mean=jnp.zeros((n_local, 3), jnp.float32),
        v_sigma=jnp.full((n_local, 3), 1.0, jnp.float32).at[:, 2].set(0.0),
        a_mean=jnp.zeros((n_local, 3), jnp.float32),
        a_sigma=jnp.full((n_local, 3), 0.2, jnp.float32).at[:, 2].set(0.0),
        slope_sigma=jnp.zeros((n_local,), jnp.float32),
        dem=DeviceRaster.constant(0.0),
        dem_sigma=DeviceRaster.constant(0.0),
        use_dem_sigma=False,
    )
    cfg = BatchConfig(
        n_particles=n_particles, template_size=(11, 11), search_size=(25, 25)
    )
    tracker = BatchTracker(
        camera_vectors=cam.to_array()[None], corrections=[None], sigmas=[0.3],
        motion=motion, config=cfg,
    )
    _, out = tracker.track(
        jax.random.PRNGKey(0), frames[:, None],
        np.ones(len(frames) - 1, np.float32),
        noise={
            "init": {
                "xy": jnp.asarray(noise["init_xy"][sl]),
                "v": jnp.asarray(noise["init_v"][sl]),
            },
            "a": jnp.asarray(noise["a"][:, sl]),
            "resample_u": jnp.asarray(noise["resample_u"][:, sl]),
        },
    )
    return np.asarray(out["mean"])


def main() -> None:
    process_id, num_processes, port, outdir = sys.argv[1:5]
    process_id, num_processes = int(process_id), int(num_processes)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from glimpse_tpu.parallel.mesh import (
        initialize_distributed, local_points_slice,
    )

    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes

    n_points, n_frames = 8, 6
    imgsz, _, frames, starts, n_particles, noise = tracking_problem(
        n_points, n_frames
    )
    sl = local_points_slice(n_points)
    means = track_slice(frames, starts, n_particles, noise, sl, imgsz)

    # One real cross-host collective: global sum of the per-host trajectory
    # sums over the multi-process mesh.
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    mesh = Mesh(np.array(jax.devices()), ("hosts",))
    local_sum = means.sum(axis=(0, 1))  # (6,)
    global_array = jax.make_array_from_process_local_data(
        NamedSharding(mesh, PartitionSpec("hosts")),
        local_sum[None].astype(np.float32),
        (num_processes, 6),
    )
    total = jax.jit(
        lambda a: jnp.sum(a, axis=0),
        out_shardings=NamedSharding(mesh, PartitionSpec()),
    )(global_array)
    total = np.asarray(total)

    np.save(os.path.join(outdir, f"means_{process_id}.npy"), means)
    np.save(os.path.join(outdir, f"total_{process_id}.npy"), total)


if __name__ == "__main__":
    main()
