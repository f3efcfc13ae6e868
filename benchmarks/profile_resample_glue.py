"""Attribute the resample stage's non-kernel glue at a given shape.

The round-5 kernel sweep put the fused resample kernel at 18.9 ms
(10,240 x 2,048) but the stage profiler's resample+moments delta is
~41 ms; this isolates the remainder: the weights/exp + threshold-table
cumsum, the (N, P, 6) -> 7 x (N, P) column slicing feeding the kernel,
the stack-back, and the post-resample moments.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from glimpse_tpu.track import batch as B  # noqa: E402
from glimpse_tpu.kernels.resample_pallas import (  # noqa: E402
    systematic_resample_gather,
)

N = int(os.environ.get("PROF_POINTS", 10240))
P = int(os.environ.get("PROF_PARTICLES", 2048))
rng = np.random.default_rng(0)
particles = jnp.asarray(rng.normal(size=(N, P, 6)).astype(np.float32))
ll = jnp.asarray(rng.random((N, P)).astype(np.float32))
w = jnp.exp(-(ll - jnp.min(ll, -1, keepdims=True))) + 1e-30
u = jnp.asarray(rng.random((N, 1)).astype(np.float32))
t_pre = P * jnp.cumsum(w / jnp.sum(w, -1, keepdims=True), -1) - u
cols_pre = [jnp.asarray(np.asarray(particles[..., k])) for k in range(6)]
cols_pre.append(jnp.asarray(np.asarray(w)))


def bench(fn, *args, reps=10):
    f = jax.jit(fn)
    np.asarray(jax.tree_util.tree_leaves(f(*args))[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps * 1e3


def kernel_only(t, cols):
    outs = systematic_resample_gather(t, cols)
    return sum(o.sum() for o in outs)


def table_build(ll, u):
    w = jnp.exp(-(ll - jnp.min(ll, -1, keepdims=True))) + 1e-30
    wn = w / jnp.sum(w, -1, keepdims=True)
    return (P * jnp.cumsum(wn, -1) - u).sum()


def fused(particles, w, u):
    p2, w2 = B._fused_resample(particles, w, u)
    return p2.sum() + w2.sum()


def fused_moments(particles, w, u):
    p2, w2 = B._fused_resample(particles, w, u)
    wn = w2 / jnp.sum(w2, -1, keepdims=True)
    m = jnp.sum(p2 * wn[..., None], 1)
    d = p2 - m[:, None, :]
    var = jnp.sum(d * d * wn[..., None], 1)
    return m.sum() + var.sum()


def moments_only(particles, w):
    wn = w / jnp.sum(w, -1, keepdims=True)
    m = jnp.sum(particles * wn[..., None], 1)
    d = particles - m[:, None, :]
    var = jnp.sum(d * d * wn[..., None], 1)
    return m.sum() + var.sum()


for name, fn, args in [
    ("kernel only (pre-sliced)", kernel_only, (t_pre, cols_pre)),
    ("t-table build (exp+cumsum)", table_build, (ll, u)),
    ("_fused_resample (slice+kernel+stack)", fused, (particles, w, u)),
    ("_fused_resample + moments", fused_moments, (particles, w, u)),
    ("moments only", moments_only, (particles, w)),
]:
    print("%-38s %8.2f ms" % (name, bench(fn, *args)), flush=True)
