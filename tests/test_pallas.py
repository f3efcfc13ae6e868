"""Pallas fused kernel tests (interpreter mode on the CPU backend)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from glimpse_tpu.kernels import ncc_pallas
from glimpse_tpu.ops import imageproc, ncc


@pytest.mark.skipif(not ncc_pallas.HAS_PALLAS, reason="pallas unavailable")
def test_fused_highpass_sse_matches_composed_ops() -> None:
    rng = np.random.default_rng(0)
    N, sh, sw, th, tw = 6, 41, 41, 15, 15
    search = jnp.asarray(rng.normal(size=(N, sh, sw)), jnp.float32)
    templates = jnp.asarray(rng.normal(size=(N, th, tw)), jnp.float32)
    fused = np.asarray(
        ncc_pallas.fused_highpass_sse(
            search, templates, interpret=True
        )
    )
    hp = imageproc.highpass(search, size=(5, 5), xp=jnp)
    expected = np.asarray(ncc.sse_map_batched(hp, templates, xp=jnp))
    np.testing.assert_allclose(fused, expected, rtol=1e-4, atol=1e-3)


@pytest.mark.skipif(not ncc_pallas.HAS_PALLAS, reason="pallas unavailable")
def test_fused_highpass_sse_pads_ragged_batches() -> None:
    rng = np.random.default_rng(1)
    search = jnp.asarray(rng.normal(size=(5, 31, 31)), jnp.float32)
    templates = jnp.asarray(rng.normal(size=(5, 11, 11)), jnp.float32)
    out = np.asarray(
        ncc_pallas.fused_highpass_sse(
            search, templates, interpret=True
        )
    )
    assert out.shape == (5, 21, 21)
    assert np.isfinite(out).all()


@pytest.mark.skipif(not ncc_pallas.HAS_PALLAS, reason="pallas unavailable")
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
