"""Pair-level rotation-measurement bias of the stabilization chain.

Renders frame pairs (nominal, nominal + delta) with the columbia_pipeline
scene and measures the error of the recovered relative rotation as a
function of delta, per detector variant. This is the quantity the
stabilization match graph integrates: a nonzero bias here is what shows
up as the coherent per-frame rotation offset at 1,000-frame scale
(stabilize_probe.py), while per-keypoint noise averages out over the
~3k matches per pair.

Usage: PAIR_CPU=0 python benchmarks/pair_bias.py host lattice bilinear
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("PAIR_CPU", "1") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

from benchmarks import columbia_pipeline as cp  # noqa: E402
from glimpse_tpu import optimize  # noqa: E402
from glimpse_tpu.ops import features  # noqa: E402


DELTAS = [
    ("pitch", 0.0), ("pitch", 0.05), ("pitch", -0.05),
    ("pitch", 0.1), ("pitch", -0.1),
    ("yaw", 0.1), ("yaw", -0.1), ("roll", 0.03),
]
AXIS = {"yaw": 0, "pitch": 1, "roll": 2}


def detect(variant, imgs, mask):
    if variant == "host":
        out = []
        for im in imgs:
            kps, desc = optimize.detect_keypoints(
                im, mask=mask, contrastThreshold=0.02, nfeatures=2048
            )
            pts = np.asarray([k.pt for k in kps], np.float32)
            out.append((pts, desc))
        return out
    return features.detect_and_describe(
        imgs, masks=[mask] * len(imgs), nfeatures=2048, batch=2,
        refine=variant,
    )


def refine_pair(img_a, img_b, uv_a, uv_b, tsz=11, ssz=25):
    """Correlation-refined pair displacements (prototype).

    For each match, correlate an A-patch (template, centered on the
    rounded A keypoint) against a B-window (centered on the rounded B
    keypoint); the SSE peak, refined on the exact bicubic spline of the
    surface by Newton iteration, measures the displacement directly —
    keypoint subpixel bias (pixel locking) drops out of the PAIR
    measurement entirely.
    """
    import jax
    import jax.numpy as jnp
    import scipy.ndimage

    from glimpse_tpu.ops import ncc, sampling

    blur = float(os.environ.get("PAIR_REFINE_BLUR", "0"))
    if blur > 0:
        img_a = scipy.ndimage.gaussian_filter(
            img_a.astype(np.float32), blur
        )
        img_b = scipy.ndimage.gaussian_filter(
            img_b.astype(np.float32), blur
        )
    H, W = img_a.shape
    th = tsz // 2
    sh = ssz // 2
    pa = np.round(uv_a).astype(int)
    pb = np.round(uv_b).astype(int)
    ok = (
        (pa[:, 0] >= th) & (pa[:, 0] < W - th)
        & (pa[:, 1] >= th) & (pa[:, 1] < H - th)
        & (pb[:, 0] >= sh) & (pb[:, 0] < W - sh)
        & (pb[:, 1] >= sh) & (pb[:, 1] < H - sh)
    )
    pa, pb = pa[ok], pb[ok]
    uv_a = uv_a[ok]
    n = len(pa)
    win = np.lib.stride_tricks.sliding_window_view
    ta = win(img_a.astype(np.float32), (tsz, tsz))[
        pa[:, 1] - th, pa[:, 0] - th
    ]  # (n, tsz, tsz)
    sb = win(img_b.astype(np.float32), (ssz, ssz))[
        pb[:, 1] - sh, pb[:, 0] - sh
    ]  # (n, ssz, ssz)

    @jax.jit
    def peak(sb, ta):
        sse = ncc.sse_map_batched(jnp.asarray(sb), jnp.asarray(ta), xp=jnp)
        o = sse.shape[-1]  # oh == ow == ssz - tsz + 1
        flat = sse.reshape(n, -1)
        idx = jnp.argmin(flat, axis=1)
        iy = (idx // o).astype(jnp.float32)
        ix = (idx % o).astype(jnp.float32)
        coeff = sampling.bspline_prefilter_2d(sse, xp=jnp)

        def value(c, y, x):
            by = sampling.bspline_basis_dense(y, o, xp=jnp)  # (o,)
            bx = sampling.bspline_basis_dense(x, o, xp=jnp)
            return by @ c @ bx

        g = jax.vmap(jax.grad(value, argnums=(1, 2)))
        h_yy = jax.vmap(jax.grad(lambda c, y, x: jax.grad(value, 1)(c, y, x), 1))
        h_xx = jax.vmap(jax.grad(lambda c, y, x: jax.grad(value, 2)(c, y, x), 2))
        h_xy = jax.vmap(jax.grad(lambda c, y, x: jax.grad(value, 1)(c, y, x), 2))
        y, x = iy, ix
        for _ in range(4):
            gy, gx = g(coeff, y, x)
            hyy = h_yy(coeff, y, x)
            hxx = h_xx(coeff, y, x)
            hxy = h_xy(coeff, y, x)
            det = hyy * hxx - hxy * hxy
            det = jnp.where(jnp.abs(det) > 1e-9, det, 1e-9)
            sy = (hxx * gy - hxy * gx) / det
            sx = (hyy * gx - hxy * gy) / det
            y = jnp.clip(y - jnp.clip(sy, -1, 1), 0.0, o - 1.0)
            x = jnp.clip(x - jnp.clip(sx, -1, 1), 0.0, o - 1.0)
        return y, x, iy, ix

    y, x, iy0, ix0 = peak(sb, ta)
    y = np.asarray(y)
    x = np.asarray(x)
    center = (ssz - tsz) / 2.0
    # Displacement of the A-patch center inside B's window.
    duv = np.stack([x - center, y - center], axis=1) + (pb - pa)
    uv_a2 = pa.astype(np.float32)
    return uv_a2, uv_a2 + duv


def main() -> None:
    variants = sys.argv[1:] or ["host", "lattice"]
    renderer = cp.SceneRenderer(seed=0)
    mask = renderer.terrain_mask()
    nominal = np.asarray(cp.CAM_VIEWDIR, float)
    from glimpse_tpu.ops.matching import DescriptorMatcher
    from glimpse_tpu.ops import projection as proj

    m = DescriptorMatcher(pad_step=2048)
    img0 = np.clip(renderer.render(0, nominal), 0, 255).astype(np.uint8)
    for variant in variants:
        rows = []
        for axis, delta in DELTAS:
            vd = nominal.copy()
            vd[AXIS[axis]] += delta
            img1 = np.clip(renderer.render(0, vd), 0, 255).astype(np.uint8)
            (pa, da), (pb, db) = detect(variant, [img0, img1], mask)
            pairs, _ = m.match(da, db, max_ratio=0.75, cross_check=True)
            uv_a = pa[pairs[:, 0]]
            uv_b = pb[pairs[:, 1]]
            # The pipeline's distance gate (build_matches max_distance=20).
            keep = np.linalg.norm(uv_a - uv_b, axis=1) < 20.0
            uv_a, uv_b = uv_a[keep], uv_b[keep]
            if os.environ.get("PAIR_REFINE"):
                uv_a, uv_b = refine_pair(img0, img1, uv_a, uv_b)

            def fit_once(ua, ub):
                # Relative rotation on the reprojection objective: camera
                # A fixed at nominal, camera B free (viewdir only).
                cam_a = cp.nominal_camera()
                cam_b = cp.nominal_camera()
                matches = optimize.Matches(cams=(cam_a, cam_b), uvs=(ua, ub))
                model = optimize.Cameras(
                    cams=[cam_b], controls=[matches],
                    cam_params=[{"viewdir": True}],
                )
                fit = np.asarray(model.fit(jac="exact"))
                res = model.errors()
                model.reset_cameras()
                return fit, res

            # Trimmed refit stands in for the pipeline's robust L1: drop
            # matches beyond 3x the median residual, refit on the rest.
            fit, res = fit_once(uv_a, uv_b)
            inl = res < 3.0 * np.median(res)
            fit, _ = fit_once(uv_a[inl], uv_b[inl])
            err = fit - vd
            rows.append({
                "axis": axis, "delta": delta, "n": int(len(pairs)),
                "err_mdeg": [round(float(e) * 1e3, 3) for e in err],
            })
        print(json.dumps({"variant": variant, "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
