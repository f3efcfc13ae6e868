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
