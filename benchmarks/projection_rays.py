"""BASELINE metric: projected rays/sec on one chip.

Forward-projects (xyz -> uv, with the full distortion model and
earth-curvature/refraction correction) and inverse-projects (uv -> rays,
iterative Oulu undistort) a large batch of points through a distorted
camera, on device, and reports rays/sec for each direction plus the NumPy
host-path rate for scale. Mirrors the reference's projection engine
(``/root/reference/src/glimpse/camera.py:591,630``).

Run: python benchmarks/projection_rays.py   (real TPU)
Env: RAYS_N (16,777,216), RAYS_REPS (20), RAYS_PLATFORM (e.g. "cpu" —
the sitecustomize pins the axon TPU backend, so the override goes through
jax.config, not JAX_PLATFORMS).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    if os.environ.get("RAYS_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["RAYS_PLATFORM"])
    import jax.numpy as jnp

    from glimpse_tpu import Camera
    from glimpse_tpu.ops import projection

    N = int(os.environ.get("RAYS_N", 1 << 24))
    REPS = int(os.environ.get("RAYS_REPS", 20))
    cam = Camera(
        imgsz=(4288, 2848), f=(4000, 4000), c=(8.0, -6.0),
        k=(-0.1, 0.05, -0.01), p=(1e-3, -5e-4),
        xyz=(0.0, 0.0, 1200.0), viewdir=(15.0, -10.0, 2.0),
    )
    vec = jnp.asarray(cam.to_array(), jnp.float32)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(
        np.column_stack(
            [
                rng.uniform(-3000, 3000, N),
                rng.uniform(2000, 9000, N),
                rng.uniform(-200, 800, N),
            ]
        ).astype(np.float32)
    )
    correction = (6.3781e6, 0.13)

    @jax.jit
    def forward(xyz):
        return projection.project(vec, xyz, correction=correction, xp=jnp)

    uv = forward(xyz)
    np.asarray(uv[0])

    @jax.jit
    def inverse(uv):
        return projection.unproject(vec, uv, xp=jnp)

    rays = inverse(uv)
    np.asarray(rays[0])

    t0 = time.perf_counter()
    for _ in range(REPS):
        out = forward(xyz)
    np.asarray(out[0])
    fwd = N * REPS / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    for _ in range(REPS):
        out = inverse(uv)
    np.asarray(out[0])
    inv = N * REPS / (time.perf_counter() - t0)

    # Host NumPy reference-path rate for scale (single-threaded float64).
    M = min(N, 1 << 20)
    xyz_h = np.asarray(xyz[:M], np.float64)
    t0 = time.perf_counter()
    cam.xyz_to_uv(xyz_h)
    host = M / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "projected rays/sec/chip",
                "forward_rays_per_s": round(fwd),
                "inverse_rays_per_s": round(inv),
                "host_numpy_rays_per_s": round(host),
                "n_rays": N,
                "camera": "full radial+tangential distortion, curvature+refraction",
            }
        )
    )


if __name__ == "__main__":
    main()
