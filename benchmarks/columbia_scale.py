"""BASELINE ladder config (5): Columbia-Glacier scale on one chip.

10,240 points x 512 particles tracked through 1,000 streamed frames —
sequence length far beyond device memory, fed frame-by-frame from the host
(``BatchTracker.track_stream``) while the jitted step runs, the same shape
as a multi-year time-lapse campaign. Frames are procedurally generated
(a rigidly translating crop of one large texture), so the run also has
ground truth: the script reports throughput AND the final px-RMSE.

The reference's scale statement for this workload is "13 years of
multi-camera Columbia Glacier imagery" processed on a workstation
(README.md:30-32); stabilization for real imagery is demonstrated
separately in examples/stabilize_sequence.py.

Run: python benchmarks/columbia_scale.py   (real TPU, ~5-10 min)
Env: COLUMBIA_POINTS (10240), COLUMBIA_PARTICLES (512), COLUMBIA_FRAMES (1000),
     COLUMBIA_CHUNK (8) — frames uploaded per device dispatch; chunk>1 runs
     one jitted ``lax.scan`` per chunk, amortizing the ~30 ms per-dispatch
     RPC tax of the tunneled backend (measured 12% of the step at the
     north-star shape). The north star itself (BASELINE.md: 10k points x 2k
     particles x 1,000 frames) is this script with COLUMBIA_PARTICLES=2048.
     COLUMBIA_OBSERVERS (1): 2 adds a second camera of the same scene (its
     frames crop the canvas at a constant offset; its camera's principal
     point absorbs the offset, so both observers constrain the same world
     track). COLUMBIA_VIEWSHED (0): 1 runs the per-step particle viewshed
     validity test against an all-visible raster (full test cost, no
     trajectory change) — together the full BASELINE.md north-star recipe.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import scipy.ndimage

    import jax
    import jax.numpy as jnp

    from glimpse_tpu import Camera
    from glimpse_tpu.track.batch import (
        BatchConfig,
        BatchMotion,
        BatchTracker,
        DeviceRaster,
    )

    N = int(os.environ.get("COLUMBIA_POINTS", 10240))
    P = int(os.environ.get("COLUMBIA_PARTICLES", 512))
    T = int(os.environ.get("COLUMBIA_FRAMES", 1000))
    CHUNK = int(os.environ.get("COLUMBIA_CHUNK", 8))
    OBS = int(os.environ.get("COLUMBIA_OBSERVERS", 1))
    USE_VIEWSHED = bool(int(os.environ.get("COLUMBIA_VIEWSHED", 0)))
    IMG = 512
    # px/frame: total drift over T frames must stay inside the start margin
    # (IMG/4) or tracked features exit the camera frame.
    velocity = (0.06, 0.04)

    rng = np.random.default_rng(0)
    pad = int(np.ceil(max(abs(velocity[0]), abs(velocity[1])) * T)) + 8
    canvas = scipy.ndimage.gaussian_filter(
        rng.normal(size=(IMG + pad, IMG + pad)), 0.8
    ).astype(np.float32) * 100

    # Observer o crops the canvas at a constant extra offset; its camera's
    # principal point absorbs the offset so both constrain the same track.
    obs_off = [(0, 0), (5, 3)][:OBS] if OBS <= 2 else [
        (o * 5, o * 3) for o in range(OBS)
    ]

    def crop(r0: float, c0: float) -> np.ndarray:
        ri, ci = int(np.floor(r0)), int(np.floor(c0))
        fr, fc = r0 - ri, c0 - ci
        win = canvas[ri : ri + IMG + 1, ci : ci + IMG + 1]
        top = win[:-1, :-1] * (1 - fc) + win[:-1, 1:] * fc
        bot = win[1:, :-1] * (1 - fc) + win[1:, 1:] * fc
        return top * (1 - fr) + bot * fr

    def frame(i: int) -> np.ndarray:
        # Rigid translation by bilinear crop of the big canvas.
        r0 = velocity[1] * i
        c0 = velocity[0] * i
        return np.stack(
            [crop(r0 + dr, c0 + dc) for dr, dc in obs_off]
        )  # (O, H, W)

    cams = [
        Camera(
            imgsz=IMG, f=IMG, c=(-dc, -dr),
            xyz=(IMG / 2, IMG / 2, IMG), viewdir=(0, -90, 0),
        )
        for dr, dc in obs_off
    ]
    cam = cams[0]
    margin = IMG // 4
    starts = rng.uniform(margin, IMG - margin, size=(N, 2))
    motion = BatchMotion(
        kind="cartesian",
        xy=jnp.asarray(starts, jnp.float32),
        xy_sigma=jnp.full((N, 2), 1.0, jnp.float32),
        v_mean=jnp.zeros((N, 3), jnp.float32),
        v_sigma=jnp.full((N, 3), 0.5, jnp.float32).at[:, 2].set(0.0),
        a_mean=jnp.zeros((N, 3), jnp.float32),
        a_sigma=jnp.full((N, 3), 0.05, jnp.float32).at[:, 2].set(0.0),
        slope_sigma=jnp.zeros((N,), jnp.float32),
        dem=DeviceRaster.constant(0.0),
        dem_sigma=DeviceRaster.constant(0.0),
        use_dem_sigma=False,
    )
    cfg = BatchConfig(n_particles=P, template_size=(15, 15), search_size=(31, 31))
    viewshed = None
    if USE_VIEWSHED:
        from glimpse_tpu import Raster

        side = IMG + pad
        viewshed = Raster(
            np.ones((64, 64), np.float32), x=(-side, 2 * side),
            y=(2 * side, -side),
        )
    tracker = BatchTracker(
        camera_vectors=np.stack([c.to_array() for c in cams]),
        corrections=[None] * OBS, sigmas=[0.3] * OBS,
        motion=motion, config=cfg, viewshed=viewshed,
    )

    # Warm-up: compile initialize + step on a throwaway 2-frame stream
    # (remote-AOT compile times through the tunnel vary 10-30x run to run;
    # keep them out of the timed region).
    t0 = time.perf_counter()
    # Warm both chunk programs: the full-size chunk AND the trailing
    # remainder (T-1 rarely divides by CHUNK).
    rem = (T - 1) % CHUNK if CHUNK > 1 else 0
    n_warm = max(CHUNK, 1) + rem
    _, warm = tracker.track_stream(
        jax.random.PRNGKey(1), frame(0),
        iter([frame(1 + i) for i in range(n_warm)]),
        np.ones(n_warm, np.float32), chunk=CHUNK,
    )
    np.asarray(warm[-1]["mean"])
    compile_s = time.perf_counter() - t0

    start = time.perf_counter()
    state, outputs = tracker.track_stream(
        jax.random.PRNGKey(0),
        frame(0),
        (frame(i) for i in range(1, T)),
        np.ones(T - 1, np.float32),
        chunk=CHUNK,
    )
    final_mean = np.asarray(outputs[-1]["mean"])  # force completion
    if CHUNK > 1:
        final_mean = final_mean[-1]  # chunked entries carry a time axis
    elapsed = time.perf_counter() - start

    # Frames translate by +velocity; world x tracks +vx, world y = -image row.
    truth = starts + np.asarray([-velocity[0], velocity[1]]) * (T - 1)
    rmse = float(
        np.sqrt(np.mean(np.sum((final_mean[:, 0:2] - truth) ** 2, axis=-1)))
    )
    print(
        json.dumps(
            {
                "config": (
                    f"{N} points x {P} particles x {T} frames (streamed,"
                    f" chunk={CHUNK}, observers={OBS},"
                    f" viewshed={'on' if USE_VIEWSHED else 'off'})"
                ),
                "wall_s": round(elapsed, 1),
                "compile_s": round(compile_s, 1),
                "point_steps_per_s": round(N * (T - 1) / elapsed, 1),
                "rmse_vs_truth_px": round(rmse, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
