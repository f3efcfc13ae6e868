"""Mesh/sharding helper tests on the virtual CPU device mesh."""
import os
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from glimpse_tpu import parallel


def test_get_mesh_and_shardings() -> None:
    mesh = parallel.get_mesh()
    assert mesh.devices.size == len(jax.devices())
    sharding = parallel.points_sharding(mesh)
    a = jax.device_put(jnp.zeros((16, 4)), sharding)
    assert a.sharding.is_equivalent_to(sharding, ndim=2)
    r = jax.device_put(jnp.zeros((3, 3)), parallel.replicated_sharding(mesh))
    assert r.sharding.is_fully_replicated


def test_points_sharding_inner_axis() -> None:
    mesh = parallel.get_mesh(n_devices=2)
    sharding = parallel.points_sharding(mesh, points_axis_index=1)
    a = jax.device_put(jnp.zeros((3, 8, 2)), sharding)
    assert not a.sharding.is_fully_replicated


def test_local_points_slice_single_process() -> None:
    s = parallel.mesh.local_points_slice(100)
    assert (s.start, s.stop) == (0, 100)


@pytest.mark.slow
def test_two_process_distributed_tracking(tmp_path):
    """2-process jax.distributed run matches the single-process trajectories.

    Each process tracks its `local_points_slice` of a shared synthetic
    problem (noise-injected, so partitioning cannot change results) and
    participates in one cross-host collective. Skipped when subprocesses
    are unavailable.
    """
    import socket
    import subprocess
    import sys
    from pathlib import Path

    worker = Path(__file__).parent / "multihost_worker.py"
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = str(Path(__file__).parents[1])
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err.decode()[-2000:]

    # Single-process reference over all points.
    sys.path.insert(0, str(worker.parent))
    import multihost_worker as mw

    n_points, n_frames = 8, 6
    imgsz, _, frames, starts, n_particles, noise = mw.tracking_problem(
        n_points, n_frames
    )
    full = mw.track_slice(
        frames, starts, n_particles, noise, slice(0, n_points), imgsz
    )
    part0 = np.load(tmp_path / "means_0.npy")
    part1 = np.load(tmp_path / "means_1.npy")
    stitched = np.concatenate([part0, part1], axis=1)
    np.testing.assert_allclose(stitched, full, atol=1e-4)
    # The collective result must agree across hosts and equal the global sum.
    total0 = np.load(tmp_path / "total_0.npy")
    total1 = np.load(tmp_path / "total_1.npy")
    np.testing.assert_allclose(total0, total1)
    np.testing.assert_allclose(total0, full.sum(axis=(0, 1)), rtol=1e-5)


def test_sharded_step_has_no_collectives() -> None:
    """The compiled sharded tracking step contains no cross-device
    collectives: every per-point array shards over the points axis and all
    math is pointwise over points, so scaling is communication-free (the
    actual content of README's linear-scaling claim)."""
    import re

    import numpy as np

    from glimpse_tpu import Camera
    from glimpse_tpu.track.batch import (
        BatchConfig, BatchMotion, BatchTracker, DeviceRaster,
    )

    mesh = parallel.get_mesh()
    n = 16 * mesh.devices.size
    rng = np.random.default_rng(0)
    cam = Camera(imgsz=128, f=128, xyz=(64, 64, 128), viewdir=(0, -90, 0))
    motion = BatchMotion(
        kind="cartesian",
        xy=rng.uniform(40, 90, size=(n, 2)).astype(np.float32),
        xy_sigma=np.full((n, 2), 1.0, np.float32),
        v_mean=np.zeros((n, 3), np.float32),
        v_sigma=np.full((n, 3), 1.0, np.float32),
        a_mean=np.zeros((n, 3), np.float32),
        a_sigma=np.full((n, 3), 0.1, np.float32),
        slope_sigma=np.zeros((n,), np.float32),
        dem=DeviceRaster.constant(0.0),
        dem_sigma=DeviceRaster.constant(0.0),
        use_dem_sigma=False,
    )
    cfg = BatchConfig(
        n_particles=64, template_size=(7, 7), search_size=(15, 15),
        # The XLA paths are what production TPU meshes run under shard_map
        # anyway; on the CPU mesh the Pallas interpreter would obscure the
        # HLO. Collectives would appear identically in either case.
        highpass_mode="xla", resample_mode="xla",
    )
    tracker = BatchTracker(
        camera_vectors=cam.to_array()[None], corrections=[None], sigmas=[0.3],
        motion=motion, config=cfg, mesh=mesh,
    )
    frame = jnp.zeros((1, 128, 128), jnp.float32)
    state = tracker.initialize(jax.random.PRNGKey(0), frame)
    motion_dev = tracker._device_motion()
    cams_dev = tracker._device_cams()

    def step(state, frame, dt, motion, cams):
        new_state, out = tracker.step(
            state, frame, dt, camera_vectors=cams, motion=motion
        )
        return new_state, out

    lowered = jax.jit(step).lower(
        state, frame, jnp.float32(1.0), motion_dev, cams_dev
    )
    hlo = lowered.compile().as_text()
    found = re.findall(
        r"\b(all-reduce|all-gather|reduce-scatter|collective-permute"
        r"|all-to-all)\b",
        hlo,
    )
    assert not found, f"collectives in sharded step: {set(found)}"
