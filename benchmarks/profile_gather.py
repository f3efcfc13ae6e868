"""Probe resample-gather lowerings at the north-star shape (scalar outputs —
full-array outputs would measure the host fetch through the tunnel, not the
op; see CLAUDE.md)."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from glimpse_tpu.ops import resampling  # noqa: E402
from glimpse_tpu.ops.sorted_gather import take_rows_sorted  # noqa: E402

N = int(os.environ.get("PROF_POINTS", 10240))
P = int(os.environ.get("PROF_PARTICLES", 2048))
rng = np.random.default_rng(0)
pw7 = jnp.asarray(rng.normal(size=(N, P, 7)).astype(np.float32))
# Realistic systematic-resample indices: sorted, from mildly concentrated
# weights (post-likelihood).
w_host = rng.random((N, P)).astype(np.float32) ** 4 + 1e-6
w = jnp.asarray(w_host)
key = jax.random.PRNGKey(0)
idx_host = np.empty((N, P), np.int32)
for n in range(min(N, 64)):
    cum = np.cumsum(w_host[n] / w_host[n].sum())
    idx_host[n] = np.searchsorted(cum, (np.arange(P) + 0.5) / P)
idx_host[64:] = idx_host[np.arange(64, N) % 64]
idx = jnp.asarray(np.clip(idx_host, 0, P - 1))


def bench(fn, *args, reps=10):
    f = jax.jit(fn)
    np.asarray(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps * 1e3


probes = [("take_along_axis", lambda x, i: jnp.take_along_axis(
    x, i[..., None], 1).sum(), (pw7, idx))]
for il in (True, False):
    for C, W in [(128, 256), (256, 384), (128, 128)]:
        probes.append((
            "sorted il=%d C=%d W=%d" % (il, C, W),
            (lambda C, W, il: lambda x, i: take_rows_sorted(
                x, i, chunk=C, window=W, interleaved=il).sum())(C, W, il),
            (pw7, idx),
        ))
probes.append(("merge-rank systematic idx", lambda w: resampling.resample_jax(
    key, w, "systematic").sum(), (w,)))
probes.append((
    "windowed systematic idx",
    lambda w: resampling.systematic_jax(key, w).sum(), (w,)))

for name, fn, args in probes:
    try:
        t = bench(fn, *args)
        print("%-28s %8.2f ms" % (name, t))
    except Exception as e:  # noqa: BLE001
        print("%-28s FAILED: %s" % (name, str(e)[:120]))

got = np.asarray(jax.jit(
    lambda x, i: take_rows_sorted(x, i))(pw7[:32], idx[:32]))
want = np.asarray(jax.jit(lambda x, i: jnp.take_along_axis(
    x, i[..., None], 1))(pw7[:32], idx[:32]))
print("sorted-chunk gather bit-exact:", bool((got == want).all()))
