"""Particle-filter resampling ops (systematic, stratified, residual, choice).

Vectorized, fixed-shape equivalents of the reference resamplers
(``/root/reference/src/glimpse/track/tracker.py:151-223``, themselves
vectorized FilterPy ports). The NumPy versions take a ``numpy.random
.Generator``; the JAX versions take a PRNG key and are jit/vmap-safe
(residual resampling is reformulated with static shapes: the deterministic
replication is expressed as a searchsorted over cumulative counts, the
remainder drawn from the residual distribution).
"""
import numpy as np


# ---- NumPy host versions ---- #


def systematic_np(weights: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    n = len(weights)
    w = weights / weights.sum()
    positions = (np.arange(n) + rng.random()) / n
    return np.searchsorted(np.cumsum(w), positions)


def stratified_np(weights: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    n = len(weights)
    w = weights / weights.sum()
    positions = (np.arange(n) + rng.random(n)) / n
    return np.searchsorted(np.cumsum(w), positions)


def residual_np(weights: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    n = len(weights)
    w = weights / weights.sum()
    counts = (n * w).astype(int)
    deterministic = np.repeat(np.arange(n), counts)
    residuals = w * n - counts
    residuals = residuals / residuals.sum()
    extra = np.searchsorted(np.cumsum(residuals), rng.random(n - len(deterministic)))
    return np.concatenate((deterministic, extra))


def choice_np(weights: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    n = len(weights)
    w = weights / weights.sum()
    return rng.choice(np.arange(n), size=n, replace=True, p=w)


def resample_np(
    weights: np.ndarray, method: str = "systematic", rng: np.random.Generator = None
) -> np.ndarray:
    if rng is None:
        rng = np.random.default_rng()
    fn = {
        "systematic": systematic_np,
        "stratified": stratified_np,
        "residual": residual_np,
        "choice": choice_np,
    }[method]
    return fn(weights, rng)


# ---- JAX device versions ---- #


def systematic_jax(key, weights, u=None):
    import jax
    import jax.numpy as jnp

    n = weights.shape[-1]
    w = weights / jnp.sum(weights, axis=-1, keepdims=True)
    if u is None:
        u = jax.random.uniform(key, weights.shape[:-1] + (1,))
    else:
        u = jnp.reshape(u, weights.shape[:-1] + (1,))
    positions = (jnp.arange(n) + u) / n
    cum = jnp.cumsum(w, axis=-1)
    return _batched_searchsorted(cum, positions, queries_sorted=True)


def stratified_jax(key, weights):
    import jax
    import jax.numpy as jnp

    n = weights.shape[-1]
    w = weights / jnp.sum(weights, axis=-1, keepdims=True)
    u = jax.random.uniform(key, weights.shape)
    positions = (jnp.arange(n) + u) / n
    cum = jnp.cumsum(w, axis=-1)
    return _batched_searchsorted(cum, positions, queries_sorted=True)


def residual_jax(key, weights):
    """Residual resampling with static shapes.

    Deterministic replication: particle i is copied floor(n w_i) times; the
    remaining slots are filled by multinomial draws from the residual
    distribution. Slot assignment is a searchsorted over cumulative counts.
    """
    import jax
    import jax.numpy as jnp

    n = weights.shape[-1]
    w = weights / jnp.sum(weights, axis=-1, keepdims=True)
    counts = jnp.floor(n * w)
    total = jnp.sum(counts, axis=-1, keepdims=True)
    cum_counts = jnp.cumsum(counts, axis=-1)
    slots = jnp.arange(n, dtype=weights.dtype)
    # side='right': slot k belongs to the first particle whose cumulative
    # count exceeds k.
    det_idx = _batched_searchsorted(
        cum_counts, jnp.broadcast_to(slots, w.shape), side="right",
        queries_sorted=True,
    )
    residuals = w * n - counts
    res_sum = jnp.sum(residuals, axis=-1, keepdims=True)
    res = residuals / jnp.where(res_sum > 0, res_sum, 1.0)
    u = jax.random.uniform(key, weights.shape)
    extra_idx = _batched_searchsorted(jnp.cumsum(res, axis=-1), u)
    return jnp.where(slots < total, det_idx, extra_idx)


def choice_jax(key, weights):
    import jax
    import jax.numpy as jnp

    n = weights.shape[-1]
    w = weights / jnp.sum(weights, axis=-1, keepdims=True)
    # Resampled particles are exchangeable: sorting the draws is harmless
    # and lets the merge rank skip the query-rank sorts.
    u = jnp.sort(jax.random.uniform(key, weights.shape), axis=-1)
    cum = jnp.cumsum(w, axis=-1)
    return _batched_searchsorted(cum, u, queries_sorted=True)


def _batched_searchsorted(sorted_arrays, values, side: str = "left",
                          queries_sorted: bool = False):
    """searchsorted along the last axis for equally-shaped batches.

    Implemented by merge ranking — concatenate, argsort, take rank
    differences — which costs two sorts instead of the per-element binary
    search gathers that dominate TPU time. With ``queries_sorted`` the two
    query-rank sorts are skipped (systematic/stratified positions are
    ascending by construction). Ties between table and query values resolve
    to ``side='right'`` semantics (measure-zero for continuous weights).

    (A windowed slice-gather formulation was tried and measured 7x SLOWER
    than this on the TPU: batched `dynamic_slice` windows move data through
    the same ~2 GB/s gather engine as `take_along_axis`. The gather-free
    fast path for the default systematic method is the fused Pallas kernel
    in :mod:`glimpse_tpu.kernels.resample_pallas`.)
    """
    import jax
    import jax.numpy as jnp

    values = jnp.broadcast_to(values, sorted_arrays.shape[:-1] + values.shape[-1:])
    P = sorted_arrays.shape[-1]
    Q = values.shape[-1]
    merged = jnp.concatenate([sorted_arrays, values], axis=-1)
    # Stable argsort places table entries before tied queries.
    order = jnp.argsort(merged, axis=-1, stable=True)
    ranks = jnp.argsort(order, axis=-1, stable=True)
    if queries_sorted:
        qranks = jnp.arange(Q)
    else:
        # Insertion index = merged rank minus rank among the queries.
        qorder = jnp.argsort(values, axis=-1, stable=True)
        qranks = jnp.argsort(qorder, axis=-1, stable=True)
    insertion = ranks[..., P:] - qranks
    return jnp.clip(insertion, 0, P - 1)


def resample_jax(key, weights, method: str = "systematic", u=None):
    """Resample indices on device; batched over leading axes.

    ``u`` optionally injects the systematic comb offset (for deterministic
    lockstep validation against the host resampler).
    """
    if u is not None:
        if method != "systematic":
            raise ValueError("Offset injection only supported for 'systematic'")
        return systematic_jax(key, weights, u=u)
    fn = {
        "systematic": systematic_jax,
        "stratified": stratified_jax,
        "residual": residual_jax,
        "choice": choice_jax,
    }[method]
    return fn(key, weights)
