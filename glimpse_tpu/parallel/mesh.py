"""Device mesh construction and sharding specs for the batched tracker.

The reference fans work out over processes with a fork-based MapReduce pool
(``/root/reference/src/glimpse/config.py:4``; SURVEY.md section 2.2). The
TPU-native equivalent: a 1-D :class:`jax.sharding.Mesh` over the *points*
axis. Every per-point array (particles, weights, templates, motion
parameters) is sharded along that axis; images and camera parameters are
replicated. All tracker math is pointwise over points, so XLA compiles the
sharded step without any cross-device collectives on the hot path — the
only communication is the initial scatter and final gather, riding ICI.

Multi-host scaling composes on top: initialize ``jax.distributed``, build
the same mesh over all devices, and feed each host its local point shard.
"""
from typing import Optional

import numpy as np

from .. import config


def get_mesh(n_devices: Optional[int] = None, axis: str = None):
    """A 1-D device mesh over the points axis.

    Arguments:
        n_devices: Number of devices (default: all available).
        axis: Mesh axis name (default: ``config.points_axis``).
    """
    import jax
    from jax.sharding import Mesh

    axis = axis or config.points_axis
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def points_sharding(mesh, points_axis_index: int = 0):
    """NamedSharding that splits array axis ``points_axis_index`` over the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec

    spec = [None] * points_axis_index + [mesh.axis_names[0]]
    return NamedSharding(mesh, PartitionSpec(*spec))


def replicated_sharding(mesh):
    """NamedSharding replicating an array on every device."""
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(mesh, PartitionSpec())


def shard_batch(tree, mesh, points_axes: dict = None):
    """device_put a pytree with per-leaf points-axis annotations.

    ``points_axes`` maps id(leaf) -> axis index; unlisted leaves are
    replicated. Most callers use the convenience wrappers on
    :class:`glimpse_tpu.track.batch.BatchTracker` instead.
    """
    import jax

    if points_axes is None:
        points_axes = {}

    def put(leaf):
        axis = points_axes.get(id(leaf))
        if axis is None:
            return jax.device_put(leaf, replicated_sharding(mesh))
        return jax.device_put(leaf, points_sharding(mesh, axis))

    return jax.tree_util.tree_map(put, tree)


def initialize_distributed(
    coordinator_address: str = None,
    num_processes: int = None,
    process_id: int = None,
) -> None:
    """Initialize multi-host JAX for pod-scale tracking.

    Each host then builds the same :func:`get_mesh` over the global device
    list and feeds its local shard of the points axis (the tracker step has
    no cross-device collectives, so scaling is linear over ICI/DCN; see
    SURVEY.md section 2.2). Arguments default to the standard JAX
    environment variables when None.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def local_points_slice(n_points: int, mesh=None) -> slice:
    """The slice of the global points axis owned by this process.

    Hosts construct their motion parameters and read their images only for
    this slice, then place shards with :func:`points_sharding`.
    """
    import jax

    n_procs = jax.process_count()
    if n_procs == 1:
        return slice(0, n_points)
    per_host = -(-n_points // n_procs)
    start = jax.process_index() * per_host
    return slice(start, min(start + per_host, n_points))
