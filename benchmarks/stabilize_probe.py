"""Fast detector-quality probe on the REAL stabilization geometry.

The full columbia_pipeline showed the all-device detector 4x worse than
host SIFT at 1,000-frame scale (0.011 deg vs 0.0026 deg max rotation
error) while a pure-translation bias probe (detector_bias.py) shows both
detector variants nearly unbiased — the gap only appears under the
pipeline's oblique, foreshortened wobble geometry. This probe runs the
IDENTICAL render -> detect -> match -> fit chain on a short sequence so
detector variants can be compared in minutes on the CPU backend.

Usage:
  PROBE_FRAMES=24 python benchmarks/stabilize_probe.py host bilinear lattice
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("PROBE_CPU", "1") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

from benchmarks import columbia_pipeline as cp  # noqa: E402


def run_variant(renderer, true_viewdirs, variant: str):
    env = dict(os.environ)
    base, plus, _ = (variant + "++").split("+", 2)
    if plus == "refine":
        # '<detector>+refine': correlation match refinement on top.
        os.environ["PIPELINE_MATCH_REFINE"] = "1"
    if base == "host":
        os.environ["PIPELINE_DETECTOR"] = "host"
    else:
        os.environ["PIPELINE_DETECTOR"] = "device"
        os.environ["PIPELINE_REFINE"] = base
    try:
        workdir = tempfile.mkdtemp(prefix=f"stab_probe_{variant}_")
        recovered, n_pairs, timings = cp.stabilize(
            renderer, true_viewdirs, workdir
        )
    finally:
        os.environ.clear()
        os.environ.update(env)
    err = cp._rotation_errors(recovered, true_viewdirs)
    if os.environ.get("PROBE_DUMP"):
        np.savez(
            os.path.join(os.environ["PROBE_DUMP"], f"probe_{variant}.npz"),
            recovered=recovered, true=np.asarray(true_viewdirs),
        )
    # Error growth along the anchor chain + signed per-axis drift: an
    # accumulating per-hop bias shows as error rising with frame index
    # and a consistent sign in the (yaw, pitch, roll) residual.
    T = len(err)
    q = max(T // 4, 1)
    segs = [round(float(err[i : i + q].mean()), 5) for i in range(0, T, q)]
    dvd = np.asarray(recovered, float) - np.asarray(true_viewdirs, float)
    tail = dvd[-q:].mean(axis=0)
    return {
        "variant": variant,
        "pairs": int(n_pairs),
        "rot_max_deg": round(float(err.max()), 5),
        "rot_mean_deg": round(float(err.mean()), 5),
        "err_by_quarter": segs,
        "tail_bias_ypr_deg": [round(float(v), 5) for v in tail],
        "detect_s": timings.get("detect_s"),
    }


def main() -> None:
    T = int(os.environ.get("PROBE_FRAMES", 24))
    if os.environ.get("PROBE_VEL"):
        # Freeze (or override) the glacier drift: the discriminating
        # control for content leaking across the mask boundary into
        # detection/descriptor support.
        cp.VEL = tuple(float(v) for v in os.environ["PROBE_VEL"].split(","))
    variants = sys.argv[1:] or ["host", "bilinear", "lattice"]
    rng = np.random.default_rng(42)
    true_viewdirs = np.tile(np.asarray(cp.CAM_VIEWDIR), (T, 1))
    true_viewdirs[1:] += rng.normal(0, cp.JITTER_DEG, size=(T - 1, 3))
    renderer = cp.SceneRenderer(seed=0)
    for v in variants:
        print(json.dumps(run_variant(renderer, true_viewdirs, v)), flush=True)


if __name__ == "__main__":
    main()
