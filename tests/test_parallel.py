"""Mesh/sharding helper tests on the virtual CPU device mesh."""
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
