import time, numpy as np, jax, jax.numpy as jnp
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from glimpse_tpu.track import batch as B
from glimpse_tpu.ops import ncc, resampling, sampling as S, projection

N = int(os.environ.get("PROF_POINTS", 1024))
P = int(os.environ.get("PROF_PARTICLES", 1024))
H = W = int(os.environ.get("PROF_IMGSZ", 512))
cfg = B.BatchConfig(n_particles=P)
th, tw = cfg.template_size
sh, sw = cfg.search_size
oh, ow = sh - th + 1, sw - tw + 1
rng = np.random.default_rng(0)
image = jnp.asarray(rng.random((H, W), np.float32))
cam = jnp.asarray(np.array([256,256,1500,0,-90,0,W,H,600,600,W/2,H/2,0,0,0,0,0,0,0,0], np.float32))
particles = jnp.asarray(np.concatenate([rng.uniform(100,400,(N,P,2)), np.zeros((N,P,1)),
                                        rng.normal(0,1,(N,P,3))], -1).astype(np.float32))
weights = jnp.ones((N, P), jnp.float32)
templates = jnp.asarray(rng.random((N, th, tw), np.float32))
table = jnp.sort(jnp.asarray(rng.random((N, cfg.n_quantiles), np.float32)), -1)
duv = jnp.zeros((N, 2), jnp.float32)
key = jax.random.PRNGKey(0)

def proj(particles):
    uv = projection.project(cam, particles[..., 0:3], correction=None, xp=jnp)
    return jnp.nan_to_num(uv, nan=-1e6)

def stages(upto):
    def fn(particles):
        uv = proj(particles)
        if upto == 1: return uv.sum()
        w_norm = weights / jnp.sum(weights, -1, keepdims=True)
        uv_mean = jnp.sum(uv * w_norm[..., None], 1)
        cc = jnp.clip(jnp.round(uv_mean[:,0]-sw*0.5).astype(jnp.int32), 0, W-sw)
        cr = jnp.clip(jnp.round(uv_mean[:,1]-sh*0.5).astype(jnp.int32), 0, H-sh)
        corners = jnp.stack([cr, cc], -1)
        t = B._extract_tiles_matmul(image, corners, (sh, sw), dtype=cfg.dtype)
        if upto == 2: return t.sum()
        t = B._prepare_search_tiles(t, table, cfg.highpass_size)
        if upto == 3: return t.sum()
        sse = ncc.sse_map_batched(t, templates, xp=jnp)
        if upto == 4: return sse.sum()
        co = S.bspline_prefilter_2d(sse, xp=jnp, dtype=cfg.dtype)
        if upto == 5: return co.sum()
        rows = jnp.clip(uv[...,1] - cr[:,None].astype(cfg.dtype), 0.0, oh-1.0)
        cols = jnp.clip(uv[...,0] - cc[:,None].astype(cfg.dtype), 0.0, ow-1.0)
        Br = S.bspline_basis_dense(rows, oh, xp=jnp, dtype=cfg.dtype)
        Bc = S.bspline_basis_dense(cols, ow, xp=jnp, dtype=cfg.dtype)
        tmp = jnp.einsum("nph,nhw->npw", Br, co, precision=jax.lax.Precision.HIGHEST)
        sampled = jnp.sum(tmp * Bc, -1)
        if upto == 6: return sampled.sum()
        ll = sampled - jnp.min(sampled, -1, keepdims=True)
        w = jnp.exp(-ll) + 1e-30
        u = jax.random.uniform(key, (N, 1))
        p2, w2 = B._fused_resample(particles, w, u)
        wn = w2 / jnp.sum(w2, -1, keepdims=True)
        m = jnp.sum(p2 * wn[..., None], 1)
        return m.sum()
    return fn

def bench(fn, reps=10):
    f = jax.jit(fn); np.asarray(f(particles))
    t0 = time.perf_counter()
    for _ in range(reps): out = f(particles)
    np.asarray(out)
    return (time.perf_counter()-t0)/reps*1e3

prev = 0.0
for i, name in enumerate(["project","extract","hist+hp","sse","prefilter","basis-einsum","resample+moments"], 1):
    t = bench(stages(i))
    print("%-17s cum %7.2f   delta %7.2f ms" % (name, t, t-prev)); prev = t
