"""Profile the batched PF step's components on the current JAX backend."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from glimpse_tpu.ops import imageproc, ncc, projection, resampling
from glimpse_tpu.ops import sampling as sampling_ops
from glimpse_tpu.track.batch import _extract_tiles, _prepare_search_tiles


def bench(label, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:35s} {dt*1e3:9.2f} ms")
    return out


def main():
    N, P = 1024, 1024
    H = W = 512
    sh = sw = 41
    th = tw = 15
    oh = ow = sh - th + 1
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(H, W)), jnp.float32)
    corners = jnp.asarray(
        rng.integers(0, H - sh, size=(N, 2)), jnp.int32
    )
    templates = jnp.asarray(rng.normal(size=(N, th, tw)), jnp.float32)
    cdf_vals = jnp.sort(jnp.asarray(rng.normal(size=(N, th * tw)), jnp.float32), axis=-1)
    cdf_q = jnp.broadcast_to(jnp.arange(1, th * tw + 1, dtype=jnp.float32) / (th * tw), (N, th * tw))
    particles = jnp.asarray(rng.normal(size=(N, P, 6)), jnp.float32)
    weights = jnp.abs(jnp.asarray(rng.normal(size=(N, P)), jnp.float32)) + 0.1
    vector = jnp.asarray(np.concatenate([[256, 256, 512], [0, -90, 0], [512, 512], [512, 512], [0, 0], np.zeros(8)]), jnp.float32)
    key = jax.random.PRNGKey(0)

    extract = jax.jit(lambda img, c: _extract_tiles(img, c, (sh, sw)))
    search = bench("extract_tiles", extract, image, corners)

    prep = jax.jit(lambda s, v, q: _prepare_search_tiles(s, v, q, (5, 5)))
    prepped = bench("prepare_search_tiles", prep, search, cdf_vals, cdf_q)

    norm_only = jax.jit(lambda s: imageproc.normalize(s, xp=jnp, axis=(-2, -1), eps=1e-12))
    bench("  normalize only", norm_only, search)

    med = jax.jit(lambda s: imageproc.median_filter(s, (5, 5), xp=jnp))
    bench("  median_filter only", med, search)

    def hist_only(tiles, values, quantiles):
        n, h, w = tiles.shape
        flat = tiles.reshape(n, h * w)
        own_sorted = jnp.sort(flat, axis=-1)
        own_q = jax.vmap(lambda s, v: jnp.searchsorted(s, v, side="right"))(own_sorted, flat) / (h * w)
        return jax.vmap(jnp.interp)(own_q, quantiles, values).reshape(n, h, w)
    bench("  hist match only", jax.jit(hist_only), search, cdf_vals, cdf_q)

    sse_fn = jax.jit(lambda s, t: ncc.sse_map_batched(s, t, xp=jnp))
    sse = bench("sse_map (depthwise conv)", sse_fn, prepped, templates)

    proj_fn = jax.jit(lambda v, p: projection.project(v, p[..., 0:3], xp=jnp))
    uv = bench("project particles", proj_fn, vector, particles)

    pref = jax.jit(lambda s: sampling_ops.bspline_prefilter_2d(s, xp=jnp, dtype=jnp.float32))
    coeffs = bench("bspline prefilter", pref, sse)

    rows = jnp.clip(jnp.abs(jnp.asarray(rng.normal(size=(N, P)), jnp.float32)) * 5, 0, oh - 1)
    cols = jnp.clip(jnp.abs(jnp.asarray(rng.normal(size=(N, P)), jnp.float32)) * 5, 0, ow - 1)
    samp = jax.jit(lambda c, r, co: jax.vmap(lambda cc, rr, coco: sampling_ops.bspline_sample(cc, rr, coco, xp=jnp))(c, r, co))
    bench("bspline sample", samp, coeffs, rows, cols)

    res = jax.jit(lambda k, w: resampling.resample_jax(k, w, "systematic"))
    bench("resample (systematic)", res, key, weights)

    take = jax.jit(lambda p, i: jnp.take_along_axis(p, i[..., None], axis=1))
    idx = res(key, weights)
    bench("take_along_axis particles", take, particles, idx)


if __name__ == "__main__":
    main()
