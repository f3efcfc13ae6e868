"""Bundle-adjustment benchmark: exact jacfwd Jacobians vs finite differences.

VERDICT round-2 item 3: the autodiff rebuild must show the jitted
residual+Jacobian beating the host finite-difference path on a synthetic
multi-camera problem. Prints one JSON line with wall times, residual
evaluation counts, and the recovered parameters' agreement.

Run on CPU (BA is a host-side calibration task):
    python benchmarks/ba_autodiff.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_problem(n_cams=4, n_points=2000, seed=0):
    from glimpse_tpu import Camera, optimize

    rng = np.random.default_rng(seed)
    xyz = np.column_stack(
        [
            rng.uniform(-400, 400, n_points),
            rng.uniform(600, 1200, n_points),
            rng.uniform(-200, 200, n_points),
        ]
    )
    true_viewdirs = rng.uniform(-6, 6, size=(n_cams, 3))
    true_f = 3000.0
    true_k1 = -0.12
    cams_true = [
        Camera(imgsz=(4288, 2848), f=true_f, viewdir=v, k=(true_k1,))
        for v in true_viewdirs
    ]
    uvs = [c.xyz_to_uv(xyz) for c in cams_true]
    cams = [
        Camera(
            imgsz=(4288, 2848), f=true_f * 0.97,
            viewdir=v + rng.uniform(-0.5, 0.5, 3), k=(true_k1 * 0.5,),
        )
        for v in true_viewdirs
    ]
    controls = []
    for i in range(n_cams):
        keep = np.isfinite(uvs[i]).all(axis=1) & cams_true[i].inframe(uvs[i])
        controls.append(
            optimize.Points(cam=cams[i], uv=uvs[i][keep], xyz=xyz[keep])
        )
    model = optimize.Cameras(
        cams=cams,
        controls=controls,
        cam_params=[{"viewdir": True} for _ in range(n_cams)],
        group_indices=[list(range(n_cams))],
        group_params=[{"f": True, "k": 0}],
    )
    truth = np.concatenate([[true_f, true_f, true_k1], true_viewdirs.ravel()])
    return model, truth


def build_matches_problem(n_cams=6, n_pts=4000, seed=0):
    """Pairwise-Matches chain: every host residual evaluation re-runs the
    iterative (oulu) undistortion, the expensive real-world BA case."""
    from glimpse_tpu import Camera, optimize

    rng = np.random.default_rng(seed)
    k_true = (-0.15, 0.05, -0.01)
    true = [
        Camera(imgsz=(4288, 2848), f=3000.0, viewdir=rng.uniform(-4, 4, 3), k=k_true)
        for _ in range(n_cams)
    ]
    cams = [
        Camera(
            imgsz=(4288, 2848), f=3000.0,
            viewdir=t.viewdir + rng.uniform(-0.3, 0.3, 3), k=(-0.1, 0.0, 0.0),
        )
        for t in true
    ]
    controls = []
    for i in range(n_cams - 1):
        uv_i = np.column_stack(
            [rng.uniform(200, 4000, n_pts), rng.uniform(200, 2600, n_pts)]
        )
        rays = true[i].uv_to_xyz(uv_i)
        uv_j = true[i + 1].xyz_to_uv(rays, directions=True)
        ok = np.isfinite(uv_j).all(axis=1) & true[i + 1].inframe(uv_j)
        controls.append(
            optimize.Matches(cams=[cams[i + 1], cams[i]], uvs=[uv_j[ok], uv_i[ok]])
        )
    model = optimize.Cameras(
        cams=cams, controls=controls,
        cam_params=[{"viewdir": True} for _ in range(n_cams)],
        group_indices=[list(range(n_cams))], group_params=[{"k": [0, 1, 2]}],
    )
    return model, None


def build_lines_problem(n_cams=3, n_ridge=400, n_obs=1200, seed=0):
    """Horizon-lines calibration: the Lines control's budgeted candidate
    densification traced end-to-end (round-4 feature, measured here).

    Each camera sees a distant ridge polyline; the observed image traces
    come from the true orientation, the fit recovers viewdir per camera.
    """
    from glimpse_tpu import Camera, optimize

    rng = np.random.default_rng(seed)
    xs = np.linspace(-3000, 3000, n_ridge)
    ridge = np.column_stack(
        [xs, np.full_like(xs, 6000.0),
         150 * np.sin(xs / 400) + 40 * np.sin(xs / 90)]
    )
    cams, controls = [], []
    for i in range(n_cams):
        true_v = rng.uniform(-2, 2, 3)
        cam_true = Camera(imgsz=(4288, 2848), f=3000.0, viewdir=true_v)
        uv = cam_true.xyz_to_uv(ridge)
        ok = np.isfinite(uv).all(axis=1) & cam_true.inframe(uv)
        trace = uv[ok]
        if len(trace) < 8:
            continue
        # Densify the observed trace to n_obs points along the polyline.
        t = np.linspace(0, len(trace) - 1, n_obs)
        i0 = np.clip(np.floor(t).astype(int), 0, len(trace) - 2)
        fr = (t - i0)[:, None]
        obs = trace[i0] * (1 - fr) + trace[i0 + 1] * fr
        cam = Camera(
            imgsz=(4288, 2848), f=3000.0,
            viewdir=true_v + rng.uniform(-0.25, 0.25, 3),
        )
        cams.append(cam)
        controls.append(optimize.Lines(cam=cam, uvs=[obs], xyzs=[ridge]))
    model = optimize.Cameras(
        cams=cams, controls=controls,
        cam_params=[{"viewdir": True} for _ in cams],
    )
    return model, None


def run(builder, jac: str):
    model, truth = builder()
    counter = {"n": 0}
    original = model.residuals

    def counted(*args, **kwargs):
        counter["n"] += 1
        return original(*args, **kwargs)

    model.residuals = counted
    start_vecs = [c.to_array().copy() for c in model.cams]
    walls = []
    for rep in range(2):  # rep 0 includes jit compile; rep 1 is warm
        for c, v in zip(model.cams, start_vecs):
            c._vector = v.copy()
        model.update_params()
        counter["n"] = 0
        start = time.perf_counter()
        result = model.fit(full=True, jac=jac)
        walls.append(time.perf_counter() - start)
    out = {
        "wall_cold_s": round(walls[0], 3),
        "wall_warm_s": round(walls[1], 3),
        "residual_evals": counter["n"],
        "scipy_nfev": int(result.nfev),
        "success": bool(result.success),
        "cost": float(result.cost),
    }
    if truth is not None:
        out["max_param_error"] = float(np.abs(result.x - truth).max())
    return out


def main() -> None:
    import jax

    if os.environ.get("BA_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    report = {}
    problems = [
        ("points_4cams_2kpts", build_problem),
        ("matches_6cams_4kpts", build_matches_problem),
        ("lines_3cams_horizon", build_lines_problem),
    ]
    only = os.environ.get("BA_ONLY")
    if only:
        problems = [(n, b) for n, b in problems if only in n]
    for name, builder in problems:
        exact = run(builder, "exact")
        fd = run(builder, "2-point")
        report[name] = {
            "exact": exact,
            "finite_difference": fd,
            "warm_speedup": round(exact["wall_warm_s"] and
                                  fd["wall_warm_s"] / exact["wall_warm_s"], 2),
            "residual_eval_ratio": round(
                fd["residual_evals"] / max(exact["residual_evals"], 1), 1
            ),
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
