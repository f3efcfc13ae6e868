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


def save_state(state: BatchState, path: Union[str, Path]) -> None:
    """Write a BatchState snapshot to an .npz file."""
    import jax

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    key_data = np.asarray(jax.random.key_data(state.key))
    np.savez_compressed(
        path,
        particles=np.asarray(state.particles),
        weights=np.asarray(state.weights),
        key_data=key_data,
        templates=np.asarray(state.templates),
        template_table=np.asarray(state.template_table),
        template_duv=np.asarray(state.template_duv),
        step=np.asarray(state.step),
    )


def load_state(path: Union[str, Path]) -> BatchState:
    """Read a BatchState snapshot written by :func:`save_state`."""
    import jax
    import jax.numpy as jnp

    with np.load(Path(path)) as data:
        key = jax.random.wrap_key_data(jnp.asarray(data["key_data"]))
        return BatchState(
            particles=jnp.asarray(data["particles"]),
            weights=jnp.asarray(data["weights"]),
            key=key,
            templates=jnp.asarray(data["templates"]),
            template_table=jnp.asarray(data["template_table"]),
            template_duv=jnp.asarray(data["template_duv"]),
            step=jnp.asarray(data["step"]),
        )
