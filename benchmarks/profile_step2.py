"""Profile PF step components with in-jit repetition (tunnel-safe timing)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from glimpse_tpu.ops import imageproc, ncc, projection, resampling
from glimpse_tpu.ops import sampling as sampling_ops
from glimpse_tpu.track.batch import _extract_tiles, _prepare_search_tiles

REPS = 20

def bench(label, make_fn, *args):
    """make_fn(x, i) -> array; loops REPS times inside one jit."""
    @jax.jit
    def run(*a):
        def body(i, acc):
            return acc + make_fn(i, *a)
        return jax.lax.fori_loop(0, REPS, body, make_fn(0, *a))
    out = run(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(*args); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (REPS + 1)
    print(f"{label:38s} {dt*1e3:9.2f} ms/iter")

def main():
    N, P = 1024, 1024
    H = W = 512
    sh = sw = 41; th = tw = 15
    oh = ow = sh - th + 1
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(H, W)), jnp.float32)
    corners = jnp.asarray(rng.integers(0, H - sh, size=(N, 2)), jnp.int32)
    templates = jnp.asarray(rng.normal(size=(N, th, tw)), jnp.float32)
    cdf_vals = jnp.sort(jnp.asarray(rng.normal(size=(N, th*tw)), jnp.float32), axis=-1)
    cdf_q = jnp.broadcast_to(jnp.arange(1, th*tw+1, dtype=jnp.float32)/(th*tw), (N, th*tw))
    search = jnp.asarray(rng.normal(size=(N, sh, sw)), jnp.float32)
    sse = jnp.asarray(rng.normal(size=(N, oh, ow)), jnp.float32)
    particles = jnp.asarray(rng.normal(size=(N, P, 6)), jnp.float32)
    weights = jnp.abs(jnp.asarray(rng.normal(size=(N, P)), jnp.float32)) + 0.1
    vec = jnp.asarray(np.concatenate([[256,256,512],[0,-90,0],[512,512],[512,512],[0,0],np.zeros(8)]), jnp.float32)
    rows = jnp.clip(jnp.abs(jnp.asarray(rng.normal(size=(N,P)), jnp.float32))*5, 0, oh-1)
    key = jax.random.PRNGKey(0)

    bench("extract_tiles", lambda i, img, c: _extract_tiles(img, c + (i % 2), (sh, sw))[:, 0, 0], image, corners)
    bench("normalize", lambda i, s: imageproc.normalize(s + i, xp=jnp, axis=(-2,-1), eps=1e-12)[:, 0, 0], search)
    bench("median_filter", lambda i, s: imageproc.median_filter(s + i, (5,5), xp=jnp)[:, 0, 0], search)
    bench("hist_match(sort+searchsorted+interp)", lambda i, s, v, q: _prepare_search_tiles(s + i, v, q, (5,5))[:, 0, 0], search, cdf_vals, cdf_q)
    bench("sse_map depthwise conv", lambda i, s, t: ncc.sse_map_batched(s + i, t, xp=jnp)[:, 0, 0], search, templates)
    bench("project particles", lambda i, v, p: projection.project(v, p[..., 0:3] + i, xp=jnp)[:, 0, 0], vec, particles)
    bench("bspline_prefilter", lambda i, s: sampling_ops.bspline_prefilter_2d(s + i, xp=jnp, dtype=jnp.float32)[:, 0, 0], sse)
    bench("bspline_sample", lambda i, s, r: jax.vmap(lambda cc, rr: sampling_ops.bspline_sample(cc, rr, rr, xp=jnp))(sampling_ops.bspline_prefilter_2d(s, xp=jnp, dtype=jnp.float32), jnp.clip(r + i*0.01, 0, 26))[:, 0], sse, rows)
    bench("resample systematic", lambda i, k, w: resampling.resample_jax(jax.random.fold_in(k, i), w, "systematic")[:, 0].astype(jnp.float32), key, weights)
    bench("exp/weights/take", lambda i, p, w: jnp.take_along_axis(p, jnp.argsort(w + i, axis=-1)[..., None], axis=1)[:, 0, 0], particles, weights)

if __name__ == "__main__":
    main()
