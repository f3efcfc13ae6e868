"""Per-stage roofline accounting for the batched PF step (VERDICT item 6).

Times each pipeline stage cumulatively at the north-star shape (delta =
stage cost), pairs the measurement with an analytic FLOP/byte model, and
reports achieved GFLOP/s / GB/s against the chip's peaks — answering "is it
actually fast or just faster than NumPy" per stage.

Run on the TPU:   python benchmarks/roofline.py
Env: PROF_POINTS (10240), PROF_PARTICLES (2048), PROF_IMGSZ (512).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Peak numbers per device kind (per chip). v5e: 197 TFLOP/s bf16 matmul,
# f32 matmul ~ half via passes, VPU vector ~ a few TFLOP/s, HBM 819 GB/s.
PEAKS = {
    "TPU v5 lite": {"hbm_gbps": 819, "mxu_bf16_tflops": 197,
                    "mxu_f32_tflops": 49, "vpu_f32_tflops": 4.9},
    "TPU v4": {"hbm_gbps": 1228, "mxu_bf16_tflops": 275,
               "mxu_f32_tflops": 69, "vpu_f32_tflops": 4.3},
}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from glimpse_tpu.ops import ncc
    from glimpse_tpu.ops import projection
    from glimpse_tpu.ops import sampling as S
    from glimpse_tpu.track import batch as B

    N = int(os.environ.get("PROF_POINTS", 10240))
    P = int(os.environ.get("PROF_PARTICLES", 2048))
    H = W = int(os.environ.get("PROF_IMGSZ", 512))
    cfg = B.BatchConfig(n_particles=P)
    th, tw = cfg.template_size
    sh, sw = cfg.search_size
    oh, ow = sh - th + 1, sw - tw + 1
    K = cfg.n_quantiles
    npx = sh * sw

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((H, W), np.float32))
    cam = jnp.asarray(
        np.array(
            [256, 256, 1500, 0, -90, 0, W, H, 600, 600, W / 2, H / 2]
            + [0] * 8,
            np.float32,
        )
    )
    particles = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(100, 400, (N, P, 2)),
                np.zeros((N, P, 1)),
                rng.normal(0, 1, (N, P, 3)),
            ],
            -1,
        ).astype(np.float32)
    )
    weights = jnp.ones((N, P), jnp.float32)
    templates = jnp.asarray(rng.random((N, th, tw), np.float32))
    table = jnp.sort(jnp.asarray(rng.random((N, K), np.float32)), -1)
    key = jax.random.PRNGKey(0)

    def proj(particles):
        uv = projection.project(cam, particles[..., 0:3], correction=None, xp=jnp)
        return jnp.nan_to_num(uv, nan=-1e6)

    def stages(upto):
        def fn(particles):
            uv = proj(particles)
            if upto == 1:
                return uv.sum()
            w_norm = weights / jnp.sum(weights, -1, keepdims=True)
            uv_mean = jnp.sum(uv * w_norm[..., None], 1)
            cc = jnp.clip(
                jnp.round(uv_mean[:, 0] - sw * 0.5).astype(jnp.int32), 0, W - sw
            )
            cr = jnp.clip(
                jnp.round(uv_mean[:, 1] - sh * 0.5).astype(jnp.int32), 0, H - sh
            )
            corners = jnp.stack([cr, cc], -1)
            t = B._extract_tiles_matmul(image, corners, (sh, sw), dtype=cfg.dtype)
            if upto == 2:
                return t.sum()
            t = B._prepare_search_tiles(t, table, cfg.highpass_size)
            if upto == 3:
                return t.sum()
            sse = ncc.sse_map_batched(t, templates, xp=jnp)
            if upto == 4:
                return sse.sum()
            co = S.bspline_prefilter_2d(sse, xp=jnp, dtype=cfg.dtype)
            if upto == 5:
                return co.sum()
            rows = jnp.clip(
                uv[..., 1] - cr[:, None].astype(cfg.dtype), 0.0, oh - 1.0
            )
            cols = jnp.clip(
                uv[..., 0] - cc[:, None].astype(cfg.dtype), 0.0, ow - 1.0
            )
            Br = S.bspline_basis_dense(rows, oh, xp=jnp, dtype=cfg.dtype)
            Bc = S.bspline_basis_dense(cols, ow, xp=jnp, dtype=cfg.dtype)
            tmp = jnp.einsum(
                "nph,nhw->npw", Br, co, precision=jax.lax.Precision.HIGHEST
            )
            sampled = jnp.sum(tmp * Bc, -1)
            if upto == 6:
                return sampled.sum()
            ll = sampled - jnp.min(sampled, -1, keepdims=True)
            w = jnp.exp(-ll) + 1e-30
            u = jax.random.uniform(key, (N, 1))
            p2, w2 = B._fused_resample(particles, w, u)
            wn = w2 / jnp.sum(w2, -1, keepdims=True)
            m = jnp.sum(p2 * wn[..., None], 1)
            return m.sum()

        return fn

    def bench(fn, reps=8):
        f = jax.jit(fn)
        np.asarray(f(particles))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(particles)
        np.asarray(out)
        return (time.perf_counter() - t0) / reps * 1e3

    # Analytic per-stage work model (flops, bytes, dominant unit).
    MB = 1e6
    models = {
        "project": {
            # ~80 VPU flops per (point, particle): rotate, divide, distort.
            "flops": N * P * 80, "bytes": N * P * 32, "unit": "vpu",
        },
        "extract": {
            # Two one-hot einsums: (N,sh,H)@(H,W) then (N,sh,W)@(W,sw)^T.
            "flops": 2 * N * sh * W * (H + sw),
            "bytes": N * (sh * H + sh * W + sh * sw) * 4, "unit": "mxu",
        },
        "hist+highpass": {
            # Two payload sorts of N x npx (~ npx log^2 npx comparator ops),
            # the K x npx quantile matmul, and the taps-compare highpass.
            "flops": N * npx * (2 * 121 + 2 * K + 9 * 25),
            "bytes": N * npx * 4 * 8, "unit": "vpu",
        },
        "sse": {
            "flops": N * oh * ow * th * tw * 2 * 2,
            "bytes": N * (npx + oh * ow) * 4, "unit": "mxu",
        },
        "prefilter": {
            # Sequential recursive filters along both axes (latency-bound).
            "flops": N * oh * ow * 16, "bytes": N * oh * ow * 4 * 4,
            "unit": "vpu",
        },
        "basis-einsum": {
            "flops": N * P * (oh * ow * 2 + ow * 2 + (oh + ow) * 12),
            "bytes": N * P * (oh + ow + 1) * 4, "unit": "mxu",
        },
        "resample+moments": {
            # Logically a 7-column row copy: read + write N*P*7 floats,
            # plus the weights/moments elementwise work.
            "flops": N * P * 40, "bytes": N * P * 7 * 4 * 2 + N * P * 16,
            "unit": "hbm",
        },
    }

    kind = jax.devices()[0].device_kind
    peaks = PEAKS.get(kind, {})
    names = list(models)
    prev = 0.0
    rows = []
    for i, name in enumerate(names, 1):
        cum = bench(stages(i))
        delta = max(cum - prev, 1e-6)
        prev = cum
        m = models[name]
        gflops = m["flops"] / delta / 1e6
        gbps = m["bytes"] / delta / 1e6
        row = {
            "stage": name,
            "ms": round(delta, 2),
            "achieved_gflop_s": round(gflops, 1),
            "achieved_gb_s": round(gbps, 1),
            "bound": m["unit"],
        }
        if peaks:
            roof = {
                "mxu": peaks["mxu_f32_tflops"] * 1e3,
                "vpu": peaks["vpu_f32_tflops"] * 1e3,
                "hbm": None,
            }[m["unit"]]
            if m["unit"] == "hbm":
                row["pct_of_roof"] = round(
                    100 * gbps / peaks["hbm_gbps"], 1
                )
            else:
                row["pct_of_roof"] = round(100 * gflops / roof, 1)
        rows.append(row)
    total = prev
    print(
        json.dumps(
            {
                "shape": f"{N} points x {P} particles, img {H}",
                "device": kind,
                "peaks": peaks,
                "step_ms": round(total, 2),
                "point_steps_per_s": round(N / (total / 1e3), 1),
                "stages": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
