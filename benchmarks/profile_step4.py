"""Post-optimization component profile (fetch-forced timing)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from glimpse_tpu.ops import imageproc, ncc, projection, resampling
from glimpse_tpu.ops import sampling as sampling_ops
from glimpse_tpu.track.batch import (
    BatchConfig, _extract_tiles_matmul, _prepare_search_tiles,
)

def bench(label, fn, *args, reps=3):
    out = fn(*args); _ = float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args); _ = float(np.asarray(out).ravel()[0])
    print(f"{label:40s} {(time.perf_counter()-t0)/reps*1e3:9.1f} ms")

N, P = 1024, 1024
H = W = 512; sh = sw = 41; th = tw = 15; oh = ow = 27
rng = np.random.default_rng(0)
image = jnp.asarray(rng.normal(size=(H, W)), jnp.float32)
corners = jnp.asarray(rng.integers(0, H - sh, size=(N, 2)), jnp.int32)
templates = jnp.asarray(rng.normal(size=(N, th, tw)), jnp.float32)
table = jnp.sort(jnp.asarray(rng.normal(size=(N, 256)), jnp.float32), axis=-1)
search = jnp.asarray(rng.normal(size=(N, sh, sw)), jnp.float32)
sse = jnp.asarray(rng.normal(size=(N, oh, ow)), jnp.float32)
particles = jnp.asarray(rng.normal(size=(N, P, 6)), jnp.float32)
weights = jnp.abs(jnp.asarray(rng.normal(size=(N, P)), jnp.float32)) + 0.1
rows = jnp.clip(jnp.abs(jnp.asarray(rng.normal(size=(N,P)), jnp.float32))*5, 0, oh-1.)
key = jax.random.PRNGKey(0)

bench("extract (matmul)", jax.jit(lambda img, c: _extract_tiles_matmul(img, c, (sh, sw))[0,0,0:1]), image, corners)
bench("prepare_search (rank-match)", jax.jit(lambda s, t: _prepare_search_tiles(s, t, (5,5))[0,0,0:1]), search, table)
bench("sse depthwise", jax.jit(lambda s, t: ncc.sse_map_batched(s, t, xp=jnp)[0,0,0:1]), search, templates)
def like(s, r):
    coeffs = sampling_ops.bspline_prefilter_2d(s, xp=jnp, dtype=jnp.float32)
    fine = sampling_ops.bspline_upsample(coeffs, 4, xp=jnp, dtype=jnp.float32)
    fr = (r + 0.5) * 4 - 0.5
    return jax.vmap(lambda ss, rr: sampling_ops.bilinear_sample(ss, rr, rr, xp=jnp))(fine, fr)[0, 0:1]
bench("prefilter+upsample+bilinear", jax.jit(like), sse, rows)
def like_nearest(s, r):
    coeffs = sampling_ops.bspline_prefilter_2d(s, xp=jnp, dtype=jnp.float32)
    fine = sampling_ops.bspline_upsample(coeffs, 8, xp=jnp, dtype=jnp.float32)
    fr = jnp.clip(jnp.round((r + 0.5) * 8 - 0.5).astype(jnp.int32), 0, 8*oh-1)
    flat = fine.reshape(N, -1)
    return jnp.take_along_axis(flat, fr * (8*ow) + fr, axis=-1)[0, 0:1]
bench("prefilter+upsample8+nearest", jax.jit(like_nearest), sse, rows)
bench("resample (merge-rank)", jax.jit(lambda k, w: resampling.resample_jax(k, w, "systematic")[0, 0:1].astype(jnp.float32)), key, weights)
bench("take_along particles (N,P,6)", jax.jit(lambda p, i: jnp.take_along_axis(p, i[..., None], axis=1)[0,0,0:1]), particles, jnp.clip(jnp.asarray(rng.integers(0, P, (N, P)), jnp.int32), 0, P-1))
bench("project+randn+moments", jax.jit(lambda v, p, w, k: (projection.project(v, p[...,0:3], xp=jnp).sum() + jax.random.normal(k, (N,P,3)).sum() + (p * (w/w.sum(-1,keepdims=True))[...,None]).sum())[None]), jnp.asarray(np.ones(20), jnp.float32), particles, weights, key)
