"""Fine-grained profile of the resample+moments stage at a given shape.

The stage profiler showed resample+moments dominating the north-star step;
this splits it into weights/exp, resample indices (merge-rank sorts), the
particle gather, and the moment reductions, plus raw-primitive probes
(one lax.sort, one take_along_axis) to attribute time.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from glimpse_tpu.ops import resampling  # noqa: E402

N = int(os.environ.get("PROF_POINTS", 10240))
P = int(os.environ.get("PROF_PARTICLES", 2048))
rng = np.random.default_rng(0)
particles = jnp.asarray(rng.normal(size=(N, P, 6)).astype(np.float32))
ll = jnp.asarray(rng.random((N, P)).astype(np.float32))
key = jax.random.PRNGKey(0)


def bench(fn, *args, reps=10):
    f = jax.jit(fn)
    np.asarray(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps * 1e3


def s1(ll):
    w = jnp.exp(-(ll - jnp.min(ll, -1, keepdims=True))) + 1e-30
    return w.sum()


def s2(ll):
    w = jnp.exp(-(ll - jnp.min(ll, -1, keepdims=True))) + 1e-30
    idx = resampling.resample_jax(key, w, "systematic")
    return idx.sum()


def s3(ll, particles):
    w = jnp.exp(-(ll - jnp.min(ll, -1, keepdims=True))) + 1e-30
    idx = resampling.resample_jax(key, w, "systematic")
    pw = jnp.concatenate([particles, w[..., None]], -1)
    pw = jnp.take_along_axis(pw, idx[..., None], 1)
    return pw.sum()


def s4(ll, particles):
    w = jnp.exp(-(ll - jnp.min(ll, -1, keepdims=True))) + 1e-30
    wn = w / jnp.sum(w, -1, keepdims=True)
    m = jnp.sum(particles * wn[..., None], 1)
    d = particles - m[:, None, :]
    var = jnp.sum(d * d * wn[..., None], 1)
    idx = resampling.resample_jax(key, w, "systematic")
    pw = jnp.concatenate([particles, w[..., None]], -1)
    pw = jnp.take_along_axis(pw, idx[..., None], 1)
    return pw.sum() + m.sum() + var.sum()


if not os.environ.get("PROF_KERNEL_ONLY"):
    prev = 0.0
    for name, fn, args in [
        ("exp/weights", s1, (ll,)),
        ("+resample idx", s2, (ll,)),
        ("+gather", s3, (ll, particles)),
        ("+moments", s4, (ll, particles)),
    ]:
        t = bench(fn, *args)
        print("%-15s cum %8.2f   delta %8.2f ms" % (name, t, t - prev))
        prev = t

    # Raw primitive probes.
    vals = jnp.asarray(rng.random((N, 2 * P)).astype(np.float32))
    iota = jax.lax.broadcasted_iota(jnp.int32, (N, 2 * P), 1)
    print("raw lax.sort (N,2P) f32+i32 payload: %8.2f ms" % bench(
        lambda v: jax.lax.sort((v, iota), dimension=-1, num_keys=1)[1].sum(), vals))
    print("raw argsort (N,2P):                  %8.2f ms" % bench(
        lambda v: jnp.argsort(v, axis=-1, stable=True).sum(), vals))
    idxs = jnp.asarray(rng.integers(0, P, size=(N, P)).astype(np.int32))
    pw7 = jnp.asarray(rng.normal(size=(N, P, 7)).astype(np.float32))
    print("raw take_along_axis (N,P,7):         %8.2f ms" % bench(
        lambda x, i: jnp.take_along_axis(x, i[..., None], 1).sum(), pw7, idxs))
    print("raw cumsum (N,P):                    %8.2f ms" % bench(
        lambda v: jnp.cumsum(v[:, :P], -1).sum(), vals))


# ---- Fused-kernel variant sweep (PROF_KERNEL=1) ---- #
if os.environ.get("PROF_KERNEL"):
    from glimpse_tpu.kernels.resample_pallas import systematic_resample_gather

    w = np.exp(-(np.asarray(ll) - np.asarray(ll).min(-1, keepdims=True)))
    t_tab = jnp.asarray(
        P * np.cumsum(w / w.sum(-1, keepdims=True), -1)
        - rng.random((N, 1)).astype(np.float32)
    )
    cols = [jnp.asarray(np.asarray(particles[..., k])) for k in range(6)]
    cols.append(jnp.asarray(w))

    def run(layout, window, chunk, pb):
        def f(t, cs):
            outs = systematic_resample_gather(
                t, cs, window=window, chunk=chunk, layout=layout,
                points_block=pb,
            )
            return sum(o.sum() for o in outs)
        return bench(f, t_tab, cols, reps=5)

    default_configs = [
        ("mxu_rows", 256, 128, 8),    # round-3 production default
        ("mxu_shared", 256, 128, 8),
        ("mxu_shared", 256, 128, 16),
        ("mxu_shared", 256, 128, 32),
        ("mxu_shared", 384, 128, 16),
        ("mxu_shared", 384, 256, 16),
        ("mxu_shared", 512, 256, 32),
        ("mxu_rows", 256, 128, 16),
        ("mxu_rows", 256, 128, 32),
        ("mxu_rows", 384, 256, 8),
        ("mxu_rows", 512, 256, 8),
        ("mxu_rows", 384, 256, 16),
        ("mxu_rows", 512, 256, 16),
        ("mxu_rows", 512, 256, 32),
        ("mxu_rows", 512, 384, 16),
        ("mxu_rows", 768, 384, 16),
        ("direct", 256, 128, 8),
    ]
    # Round-5 focused sweep around the round-4 winner (mxu_shared W=384
    # C=128 G=16), with the 3-pass exact select in place of HIGHEST.
    round5_configs = [
        ("mxu_rows", 256, 128, 8),    # old production default, new select
        ("mxu_shared", 384, 128, 32),  # stacked-matmul sweep winner
        ("mxu_shared", 384, 128, 16),
        ("mxu_shared", 384, 128, 48),
        ("mxu_shared", 384, 128, 64),
        ("mxu_shared", 256, 128, 32),
        ("mxu_shared", 256, 128, 64),
        ("mxu_shared", 512, 128, 64),
        ("mxu_shared", 512, 256, 32),
    ]
    configs = (
        round5_configs if os.environ.get("PROF_ROUND5") else default_configs
    )
    limit = int(os.environ.get("PROF_MAX_CONFIGS", len(configs)))
    base = None
    for layout, window, chunk, pb in configs[:limit]:
        try:
            t = run(layout, window, chunk, pb)
        except Exception as e:  # Mosaic limits at some shapes
            print(f"kernel {layout} W={window} C={chunk} G={pb}: FAILED {type(e).__name__}")
            continue
        if base is None:
            base = t
        print(f"kernel {layout} W={window} C={chunk} G={pb}: {t:8.2f} ms "
              f"({base / t:.2f}x vs default)", flush=True)
