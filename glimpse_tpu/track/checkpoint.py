"""Checkpoint/resume for the batched tracker's particle-filter state.

The reference cannot snapshot a tracker mid-run — its memoization is
file-granularity only (keypoints/matches pickles; SURVEY.md section 5).
Here the full PF state (particles, weights, templates, PRNG key, step
counter) is an explicit pytree (:class:`glimpse_tpu.track.batch.BatchState`),
so a run can be checkpointed at any step and resumed bit-exactly — the basis
for elastic recovery on long sequences.
"""
from pathlib import Path
from typing import Union

import numpy as np

from .batch import BatchState

#: Snapshot format version. Bump whenever a BatchState field is added so
#: load_state can detect (and refuse or adapt to) stale snapshots instead of
#: silently resurrecting fault-contained points.
FORMAT_VERSION = 2


def save_state(state: BatchState, path: Union[str, Path]) -> None:
    """Write a BatchState snapshot to an .npz file.

    Every ``tree_flatten`` leaf of the state is persisted (the roundtrip
    test asserts leaf-for-leaf equality, so adding a BatchState field
    without extending this function fails loudly).
    """
    import jax

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    key_data = np.asarray(jax.random.key_data(state.key))
    arrays = dict(
        format_version=np.asarray(FORMAT_VERSION),
        particles=np.asarray(state.particles),
        weights=np.asarray(state.weights),
        key_data=key_data,
        templates=np.asarray(state.templates),
        template_table=np.asarray(state.template_table),
        template_duv=np.asarray(state.template_duv),
        step=np.asarray(state.step),
    )
    # `valid` is Optional: None means "not yet initialized" (step() seeds it
    # with all-ones); store a present/absent flag so None round-trips as None
    # rather than as all-ones.
    if state.valid is not None:
        arrays["valid"] = np.asarray(state.valid)
    np.savez_compressed(path, **arrays)


def load_state(path: Union[str, Path]) -> BatchState:
    """Read a BatchState snapshot written by :func:`save_state`.

    Version-1 snapshots (written before per-step particle validity existed)
    load with ``valid=None``; resuming such a run cannot recover
    fault-containment decisions made before the snapshot, so a warning is
    emitted when the snapshot predates the field.
    """
    import jax
    import jax.numpy as jnp

    with np.load(Path(path)) as data:
        version = int(data["format_version"]) if "format_version" in data else 1
        if version > FORMAT_VERSION:
            raise ValueError(
                f"snapshot {path} has format_version={version}, newer than"
                f" this library's {FORMAT_VERSION}; upgrade glimpse_tpu"
            )
        if version < 2:
            import warnings

            warnings.warn(
                f"snapshot {path} predates per-step particle validity"
                " (format_version<2); fault-contained points from before the"
                " snapshot will be resurrected on resume",
                stacklevel=2,
            )
        key = jax.random.wrap_key_data(jnp.asarray(data["key_data"]))
        valid = jnp.asarray(data["valid"]) if "valid" in data else None
        return BatchState(
            particles=jnp.asarray(data["particles"]),
            weights=jnp.asarray(data["weights"]),
            key=key,
            templates=jnp.asarray(data["templates"]),
            template_table=jnp.asarray(data["template_table"]),
            template_duv=jnp.asarray(data["template_duv"]),
            step=jnp.asarray(data["step"]),
            valid=valid,
        )
