"""Pallas fused kernel tests (interpreter mode on the CPU backend)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from glimpse_tpu.ops import imageproc, ncc


def test_median_highpass_pallas_matches_golden() -> None:
    """The aligned-block median network equals ops.imageproc.highpass exactly
    (symmetric padding, 5x5 median) on assorted tile shapes."""
    from glimpse_tpu.kernels.highpass_pallas import median_highpass

    rng = np.random.default_rng(2)
    for shape in [(4, 41, 41), (2, 15, 15), (3, 27, 33)]:
        x = rng.random(shape).astype(np.float32)
        out = np.asarray(median_highpass(jnp.asarray(x), size=(5, 5), interpret=True))
        gold = np.stack([imageproc.highpass(t, size=(5, 5), xp=np) for t in x])
        np.testing.assert_allclose(out, gold, atol=1e-6)
