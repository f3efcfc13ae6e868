"""Tracking-op tests: golden values vs scipy/cv2 and JAX/NumPy equivalence."""
import numpy as np
import pytest
import scipy.ndimage

from glimpse_tpu import helpers
from glimpse_tpu.ops import imageproc, ncc, resampling


def test_normalize() -> None:
    rng = np.random.default_rng(0)
    a = rng.normal(3, 5, (20, 20))
    out = imageproc.normalize(a, xp=np)
    assert abs(out.mean()) < 1e-12
    assert abs(out.std() - 1) < 1e-12


def test_match_cdf_agrees_with_reference_helpers() -> None:
    rng = np.random.default_rng(1)
    a = rng.normal(size=(16, 16))
    b = rng.gamma(2.0, size=(16, 16))
    expected = helpers.match_cdf(a, b)
    got = imageproc.match_cdf(a, imageproc.sorted_cdf(b, xp=np), xp=np)
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_median_filter_matches_scipy() -> None:
    rng = np.random.default_rng(2)
    a = rng.normal(size=(24, 31))
    expected = scipy.ndimage.median_filter(a, size=(5, 5))
    got = imageproc.median_filter(a, size=(5, 5), xp=np)
    np.testing.assert_allclose(got, expected, atol=1e-14)


def test_sse_map_matches_cv2() -> None:
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    search = rng.normal(size=(40, 50)).astype(np.float32)
    template = rng.normal(size=(15, 13)).astype(np.float32)
    expected = cv2.matchTemplate(search, templ=template, method=cv2.TM_SQDIFF)
    got = ncc.sse_map_numpy(search.astype(float), template.astype(float))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3)


def test_sse_map_batched_jax_matches_numpy() -> None:
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    search = rng.normal(size=(6, 32, 36))
    templates = rng.normal(size=(6, 11, 9))
    expected = ncc.sse_map_batched(search, templates, xp=np)
    got = np.asarray(
        ncc.sse_map_batched(
            jnp.asarray(search, jnp.float32), jnp.asarray(templates, jnp.float32),
            xp=jnp,
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3)
    shifted = np.asarray(
        ncc.sse_map_batched(
            jnp.asarray(search, jnp.float32), jnp.asarray(templates, jnp.float32),
            xp=jnp, method="shift",
        )
    )
    np.testing.assert_allclose(shifted, expected, rtol=1e-4, atol=1e-3)


def test_imageproc_jax_matches_numpy() -> None:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    tile = rng.normal(size=(21, 21))
    ref_tile = rng.gamma(1.5, size=(21, 21))
    cdf_np = imageproc.sorted_cdf(ref_tile, xp=np)
    out_np, _ = imageproc.prepare_tile(tile, cdf=cdf_np, xp=np)

    fn = jax.jit(
        lambda t, c0, c1: imageproc.prepare_tile(t, cdf=(c0, c1), xp=jnp)[0]
    )
    out_jax = np.asarray(
        fn(jnp.asarray(tile), jnp.asarray(cdf_np[0]), jnp.asarray(cdf_np[1]))
    )
    np.testing.assert_allclose(out_jax, out_np, atol=1e-4)


@pytest.mark.parametrize("method", ["systematic", "stratified", "residual", "choice"])
def test_resampling_distribution(method: str) -> None:
    """Resampled index frequencies approach the weights."""
    rng = np.random.default_rng(6)
    weights = np.array([0.05, 0.15, 0.5, 0.3]) * 4  # unnormalized
    counts = np.zeros(4)
    for _ in range(500):
        idx = resampling.resample_np(weights, method=method, rng=rng)
        counts += np.bincount(idx, minlength=4)
    freqs = counts / counts.sum()
    np.testing.assert_allclose(freqs, weights / weights.sum(), atol=0.02)


@pytest.mark.parametrize("method", ["systematic", "stratified", "residual", "choice"])
def test_resampling_jax_distribution(method: str) -> None:
    import jax
    import jax.numpy as jnp

    weights = jnp.array([0.05, 0.15, 0.5, 0.3])
    key = jax.random.PRNGKey(0)
    counts = np.zeros(4)
    fn = jax.jit(lambda k, w: resampling.resample_jax(k, w, method=method))
    for i in range(500):
        key, sub = jax.random.split(key)
        idx = np.asarray(fn(sub, weights))
        counts += np.bincount(idx, minlength=4)
    freqs = counts / counts.sum()
    np.testing.assert_allclose(freqs, np.asarray(weights), atol=0.02)


def test_resampling_jax_batched() -> None:
    import jax
    import jax.numpy as jnp

    weights = jnp.tile(jnp.array([0.0, 0.0, 1.0, 0.0]), (5, 1))
    idx = resampling.resample_jax(jax.random.PRNGKey(1), weights, "systematic")
    assert idx.shape == (5, 4)
    assert (np.asarray(idx) == 2).all()


def test_profiling_timer() -> None:
    from glimpse_tpu import profiling

    timer = profiling.Timer()
    with timer("phase_a"):
        sum(range(1000))
    with timer("phase_a"):
        sum(range(1000))
    with timer("phase_b"):
        pass
    assert timer.counts["phase_a"] == 2
    assert "phase_a" in timer.report()
    d = timer.as_dict()
    assert d["phase_b"]["calls"] == 1


def test_sse_map_host_matches_numpy_golden() -> None:
    """The cv2-accelerated host sse_map equals the pure-NumPy golden."""
    rng = np.random.default_rng(9)
    search = rng.random((41, 41))
    template = rng.random((15, 15))
    fast = ncc.sse_map(search, template, xp=np)
    gold = ncc.sse_map_numpy(search, template)
    np.testing.assert_allclose(fast, gold, rtol=1e-4, atol=1e-4)
