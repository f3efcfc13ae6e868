"""Component profile with fetch-forced timing (the tunnel's block_until_ready
does not synchronize, so timings must fetch a scalar)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from glimpse_tpu.ops import imageproc, ncc, projection, resampling
from glimpse_tpu.ops import sampling as sampling_ops
from glimpse_tpu.track.batch import _extract_tiles, _prepare_search_tiles

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
cdf_vals = jnp.sort(jnp.asarray(rng.normal(size=(N, th*tw)), jnp.float32), axis=-1)
cdf_q = jnp.broadcast_to(jnp.arange(1, th*tw+1, dtype=jnp.float32)/(th*tw), (N, th*tw)).copy()
search = jnp.asarray(rng.normal(size=(N, sh, sw)), jnp.float32)
sse = jnp.asarray(rng.normal(size=(N, oh, ow)), jnp.float32)
particles = jnp.asarray(rng.normal(size=(N, P, 6)), jnp.float32)
weights = jnp.abs(jnp.asarray(rng.normal(size=(N, P)), jnp.float32)) + 0.1
vec = jnp.asarray(np.concatenate([[256,256,512],[0,-90,0],[512,512],[512,512],[0,0],np.zeros(8)]), jnp.float32)
rows = jnp.clip(jnp.abs(jnp.asarray(rng.normal(size=(N,P)), jnp.float32))*5, 0, oh-1.)
key = jax.random.PRNGKey(0)

bench("extract_tiles", jax.jit(lambda img, c: _extract_tiles(img, c, (sh, sw))[0, 0, 0:1]), image, corners)
bench("normalize", jax.jit(lambda s: imageproc.normalize(s, xp=jnp, axis=(-2,-1), eps=1e-12)[0, 0, 0:1]), search)
bench("median_filter 5x5", jax.jit(lambda s: imageproc.median_filter(s, (5,5), xp=jnp)[0, 0, 0:1]), search)
bench("prepare_search_tiles (full)", jax.jit(lambda s, v, q: _prepare_search_tiles(s, v, q, (5,5))[0, 0, 0:1]), search, cdf_vals, cdf_q)
bench("sse depthwise conv", jax.jit(lambda s, t: ncc.sse_map_batched(s, t, xp=jnp)[0, 0, 0:1]), search, templates)
bench("project particles", jax.jit(lambda v, p: projection.project(v, p[..., 0:3], xp=jnp)[0, 0, 0:1]), vec, particles)
bench("bspline_prefilter", jax.jit(lambda s: sampling_ops.bspline_prefilter_2d(s, xp=jnp, dtype=jnp.float32)[0, 0, 0:1]), sse)
bench("bspline_sample", jax.jit(lambda s, r: jax.vmap(lambda cc, rr: sampling_ops.bspline_sample(cc, rr, rr, xp=jnp))(sampling_ops.bspline_prefilter_2d(s, xp=jnp, dtype=jnp.float32), r)[0, 0:1]), sse, rows)
bench("resample systematic", jax.jit(lambda k, w: resampling.resample_jax(k, w, "systematic")[0, 0:1].astype(jnp.float32)), key, weights)
bench("take_along_axis", jax.jit(lambda p, w: jnp.take_along_axis(p, jnp.argsort(w, axis=-1)[..., None], axis=1)[0, 0, 0:1]), particles, weights)
bench("random normal (N,P,3)", jax.jit(lambda k: jax.random.normal(k, (N, P, 3))[0, 0, 0:1]), key)
