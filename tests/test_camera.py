"""Camera model tests: numerical contracts from the reference test suite
(/root/reference/tests/test_camera.py) plus JAX-path consistency checks."""
import numpy as np
import pytest

import glimpse_tpu
from glimpse_tpu import Camera
from glimpse_tpu.ops import projection as proj


def reprojection_errors(cam: Camera) -> np.ndarray:
    uv = cam.grid(step=1, snap=(0.5, 0.5), mode="points")
    dxyz = cam.uv_to_xyz(uv)
    puv = cam.xyz_to_uv(dxyz, directions=True)
    return np.linalg.norm(puv - uv, axis=1)


def test_converts_millimeter_focal_length_to_pixels() -> None:
    fmm = (20, 10)
    sensorsz = (20, 10)
    cam = Camera(imgsz=(100, 100), fmm=fmm, sensorsz=sensorsz)
    assert all(cam.f == fmm * cam.imgsz / sensorsz)


def test_resizes_image() -> None:
    imgsz = (200, 100)
    cam = Camera(imgsz=imgsz, f=(100, 100))
    cam.resize(0.5)
    assert all(cam.imgsz * 2 == imgsz)
    cam.resize(1)
    assert all(cam.imgsz == imgsz)


def test_resize_rejects_aspect_change() -> None:
    cam = Camera(imgsz=(10, 20), f=(1, 2), c=(0.1, 0.2))
    cam.resize(2)
    assert all(cam.imgsz == (20, 40))
    assert all(cam.f == (2, 4))
    with pytest.raises(ValueError):
        cam.resize((11, 20))
    cam.resize((11, 20), force=True)
    assert all(cam.imgsz == (11, 20))


def test_idealizes_distortion() -> None:
    cam = Camera(imgsz=(100, 100), f=(100, 100), c=1, k=1, p=1)
    cam.idealize()
    assert all(cam.c == 0)
    assert all(cam.k == 0)
    assert all(cam.p == 0)


def test_reprojects_without_distortion() -> None:
    cam = Camera(imgsz=(100, 100), f=(100, 100))
    assert reprojection_errors(cam).max() < 1e-14


def test_reprojects_with_distortion() -> None:
    imgsz, f, tol = (100, 100), (100, 100), 1e-12
    for kwargs in (
        {"k": 0.1},
        {"k": -0.1},
        {"k": [0.1] * 6},
        {"p": [0.01] * 2},
        {"k": [0.1] * 6, "p": [0.01] * 2},
    ):
        cam = Camera(imgsz=imgsz, f=f, **kwargs)
        assert reprojection_errors(cam).max() < tol, kwargs


def test_reprojects_with_extreme_distortion() -> None:
    imgsz, f, tol = (100, 100), (100, 100), 1e-12
    for k1 in (2, -2):
        cam = Camera(imgsz=imgsz, f=f, k=k1)
        assert reprojection_errors(cam).max() < tol, k1


def test_projection_defaults() -> None:
    # Default camera at origin, pointed north: (0, 10, 0) -> image center.
    cam = Camera(imgsz=10, f=10)
    xyz = np.array([(0, 10.0, 0)])
    uv = cam.xyz_to_uv(xyz)
    np.testing.assert_allclose(uv, [[5.0, 5.0]])
    uv, depth = cam.xyz_to_uv(xyz, return_depth=True)
    np.testing.assert_allclose(depth, [10.0])
    # Reverse: image center -> +y ray.
    out = cam.uv_to_xyz(np.array([(5.0, 5.0)]))
    np.testing.assert_allclose(out, [[0.0, 1.0, 0.0]], atol=1e-15)
    out = cam.uv_to_xyz(np.array([(5.0, 5.0)]), depth=10)
    np.testing.assert_allclose(out, [[0.0, 10.0, 0.0]], atol=1e-14)


def test_behind_camera_is_nan_and_infront() -> None:
    cam = Camera(imgsz=10, f=10)
    xyz = np.array([(1000.0, 10, 0), (0, 10, 0), (0, 0, 0), (0, -10, 0)])
    np.testing.assert_array_equal(cam.infront(xyz), [True, True, False, False])
    uv = cam.xyz_to_uv(xyz)
    assert np.isnan(uv[2]).all() and np.isnan(uv[3]).all()
    np.testing.assert_allclose(uv[0], [1005.0, 5.0])
    np.testing.assert_array_equal(cam.inframe(uv), [False, True, False, False])


def test_inframe() -> None:
    cam = Camera(imgsz=(10, 12), f=10)
    uv = np.array([(-1, 1), (0, 0), (9, 11), (10, 15)])
    np.testing.assert_array_equal(cam.inframe(uv), [False, True, True, False])


def test_spherical_roundtrip() -> None:
    cam = Camera(imgsz=1, f=1, xyz=(1, 2, 3))
    angles = np.array([(0, 0, 1), (90, 0, 2), (0, 45, 3)], dtype=float)
    xyz = cam.spherical_to_xyz(angles)
    angles2 = cam.xyz_to_spherical(xyz)
    np.testing.assert_allclose(angles, angles2, atol=1e-12)


def test_elevation_correction_applied() -> None:
    cam = Camera(imgsz=100, f=100, correction=True)
    plain = Camera(imgsz=100, f=100)
    xyz = np.array([(0.0, 10000.0, 0.0)])
    uv_corr = cam.xyz_to_uv(xyz)
    uv_plain = plain.xyz_to_uv(xyz)
    # Correction lowers the apparent elevation -> larger v (down in image).
    assert uv_corr[0, 1] > uv_plain[0, 1]
    expected_dz = (0.13 - 1) * 10000.0 ** 2 / (2 * 6.3781e6)
    uv_manual = plain.xyz_to_uv(np.array([(0.0, 10000.0, expected_dz)]))
    np.testing.assert_allclose(uv_corr, uv_manual, rtol=1e-12)


def test_reversible() -> None:
    cam = Camera(imgsz=10, f=10)
    assert cam.reversible()
    cam.p = 0.01
    assert cam.reversible()
    cam.p = 0.4
    assert not cam.reversible()


def test_copy_reset_semantics() -> None:
    cam = Camera(imgsz=1, f=1)
    cam.f = (2, 2)
    rcam = cam
    ccam = cam.copy()
    cam.f = (3, 3)
    assert cam.f[0] == rcam.f[0]
    assert cam.f[0] != ccam.f[0]
    ccam.f = (4, 4)
    ccam.reset()
    assert ccam.f[0] == 2
    cam.reset()
    assert cam.f[0] == 1


def test_json_roundtrip(tmp_path) -> None:
    cam = Camera(
        imgsz=(8, 6), f=(7.9, 6.1), c=(0.1, -0.2), k=(0.1, 0, 0, 0, 0, 0),
        p=(0.01, 0.02), xyz=(1, 2, 3), viewdir=(4, 5, 6),
    )
    path = tmp_path / "cam.json"
    cam.to_json(path)
    cam2 = Camera.from_json(path)
    np.testing.assert_allclose(cam.to_array(), cam2.to_array())


def test_to_array_layout() -> None:
    cam = Camera(
        xyz=(1, 2, 3), viewdir=(4, 5, 6), imgsz=(7, 8), f=(9, 10),
        c=(11, 12), k=(13, 14, 15, 16, 17, 18), p=(19, 20),
    )
    np.testing.assert_array_equal(cam.to_array(), np.arange(1.0, 21.0))


def test_grid_and_edges() -> None:
    cam = Camera(imgsz=3, f=1)
    pts = cam.grid()
    assert pts.shape == (9, 2)
    np.testing.assert_allclose(pts[0], [0.5, 0.5])
    np.testing.assert_allclose(pts[-1], [2.5, 2.5])
    cam2 = Camera(imgsz=2, f=1)
    edges = cam2.edges()
    assert edges.shape == (8, 2)
    np.testing.assert_allclose(edges[0], [0, 0])


def test_viewbox() -> None:
    cam = Camera(imgsz=3, f=3)
    np.testing.assert_allclose(cam.viewbox(1), [-0.5, 0, -0.5, 0.5, 1, 0.5])
    np.testing.assert_allclose(cam.viewbox(2), [-1, 0, -1, 1, 2, 1])


def test_rasterize_points_mean() -> None:
    cam = Camera(imgsz=(3, 2), f=1)
    uv = np.array([(0.5, 0.5), (2.5, 1.5), (2.5, 1.5)])
    values = np.array([1, 2, 4])
    a = cam.rasterize(uv=uv, values=values)
    assert a[0, 0] == 1
    assert a[1, 2] == 3
    assert np.isnan(a[0, 1])


def test_rotation_matrix_gradient_matches_finite_difference() -> None:
    rng = np.random.default_rng(0)
    viewdir = rng.normal(size=3) * 30
    Rp = proj.rotation_matrix_gradient(viewdir, xp=np)
    eps = 1e-7
    for axis in range(3):
        dv = np.zeros(3)
        dv[axis] = eps
        fd = (
            proj.rotation_matrix(viewdir + dv, xp=np)
            - proj.rotation_matrix(viewdir - dv, xp=np)
        ) / (2 * eps)
        np.testing.assert_allclose(Rp[axis], fd, atol=1e-6)


def test_jax_path_matches_numpy_path() -> None:
    import jax
    import jax.numpy as jnp

    cam = Camera(
        imgsz=(64, 48), f=(60, 60), c=(0.5, -0.5), k=(0.05, -0.01, 0, 0, 0, 0),
        p=(0.001, -0.002), xyz=(5, -3, 2), viewdir=(10, -5, 2),
    )
    rng = np.random.default_rng(1)
    xyz = cam.xyz + np.column_stack(
        [rng.normal(10, 2, 100), rng.normal(50, 5, 100), rng.normal(0, 2, 100)]
    )
    uv_np = cam.xyz_to_uv(xyz)

    vector = jnp.asarray(cam.to_array(), dtype=jnp.float32)
    project_jit = jax.jit(lambda v, x: proj.project(v, x, xp=jnp))
    uv_jax = np.asarray(project_jit(vector, jnp.asarray(xyz, dtype=jnp.float32)))
    np.testing.assert_allclose(uv_jax, uv_np, atol=5e-2, rtol=1e-5)

    # Inverse on the JAX path (iterative undistort under jit).
    unproject_jit = jax.jit(
        lambda v, u: proj.unproject(v, u, method="regulafalsi", xp=jnp)
    )
    rays_jax = np.asarray(
        unproject_jit(vector, jnp.asarray(uv_np, dtype=jnp.float32))
    )
    rays_np = cam.uv_to_xyz(uv_np)
    np.testing.assert_allclose(rays_jax, rays_np, atol=1e-4)


def test_jax_vmap_over_cameras() -> None:
    import jax
    import jax.numpy as jnp

    cams = [
        Camera(imgsz=(32, 32), f=(30, 30), viewdir=(i * 5, 0, 0)) for i in range(4)
    ]
    vectors = jnp.asarray(np.stack([c.to_array() for c in cams]))
    xyz = jnp.asarray(np.array([[0.0, 100.0, 0.0]]))
    batched = jax.vmap(lambda v: proj.project(v, xyz, xp=jnp))(vectors)
    expected = np.stack([c.xyz_to_uv(np.asarray(xyz)) for c in cams])
    np.testing.assert_allclose(np.asarray(batched), expected, atol=1e-3)


def test_undistort_lookup_matches_iterative() -> None:
    cam = Camera(imgsz=(100, 100), f=(100, 100), k=(-0.3, 0.1), p=(0.005, -0.005))
    uv = cam.grid(step=10, mode="points")
    xy = (uv - (cam.imgsz * 0.5 + cam.c)) / cam.f
    dxy = cam._distort(xy)
    from glimpse_tpu.ops import projection as proj_ops

    lookup = proj_ops.undistort_lookup(
        dxy, cam.k, cam.p, cam.imgsz.astype(float), cam.f, cam.c, density=2
    )
    iterative = cam._undistort(dxy, method="oulu")
    finite = np.isfinite(lookup).all(axis=1)
    assert finite.mean() > 0.8
    np.testing.assert_allclose(lookup[finite], iterative[finite], atol=5e-3)


def test_device_roundtrip_fuzz_random_cameras() -> None:
    """Fuzz: random reversible cameras round-trip uv -> xyz -> uv under jit.

    The float32 device path stays within 0.01 px across random distortion
    (the float64 host contract of < 1e-12 px is covered above).
    """
    import jax
    import jax.numpy as jnp

    from glimpse_tpu.ops import projection

    rng = np.random.default_rng(12)
    for trial in range(8):
        cam = Camera(
            imgsz=(200, 150),
            f=float(rng.uniform(150, 400)),
            c=tuple(rng.uniform(-5, 5, 2)),
            viewdir=tuple(rng.uniform(-30, 30, 3)),
            k=(float(rng.uniform(-0.2, 0.2)), float(rng.uniform(-0.05, 0.05)),
               0, 0, 0, 0),
            p=tuple(rng.uniform(-0.01, 0.01, 2)),
        )
        if not cam.reversible():
            continue
        uv = rng.uniform([5, 5], [195, 145], size=(200, 2))
        vec = jnp.asarray(cam.to_array(), jnp.float32)
        xyz = jax.jit(
            lambda v, q: projection.unproject(v, q, directions=True, xp=jnp)
        )(vec, jnp.asarray(uv, jnp.float32))
        uv2 = jax.jit(
            lambda v, x: projection.project(v, x, directions=True, xp=jnp)
        )(vec, xyz)
        err = float(jnp.max(jnp.abs(uv2 - jnp.asarray(uv, jnp.float32))))
        assert err < 1e-2, f"trial {trial}: round-trip error {err}"


def test_nonreversible_camera_undistort_method_dispatch() -> None:
    """Non-reversible multi-coefficient cameras round-trip via the method kwarg.

    The Oulu fixed point may diverge when the distortion map folds
    (reference camera.py:1198-1230 lets the caller pick the solver); the
    lookup and regula falsi solvers must be reachable from the public API.
    """
    cam = Camera(
        imgsz=(100, 80), f=80,
        k=(-2.0, 0.2, -0.02, 0, 0, 0), p=(0.01, -0.01),
    )
    assert not cam.reversible()
    # Central pixels, away from the folded rim.
    uv = np.array([[40.0, 35.0], [50.0, 40.0], [60.0, 45.0], [45.0, 42.0]])
    for method in ("regulafalsi", "lookup"):
        xyz = cam.uv_to_xyz(uv, method=method)
        uv_back = cam.xyz_to_uv(xyz, directions=True)
        err = np.nanmax(np.abs(uv_back - uv))
        assert err < 0.05, f"{method}: round-trip error {err}"
    # regulafalsi should be solver-grade accurate at these points.
    xyz = cam.uv_to_xyz(uv, method="regulafalsi")
    uv_back = cam.xyz_to_uv(xyz, directions=True)
    assert np.nanmax(np.abs(uv_back - uv)) < 1e-6


def test_project_planes_matches_packed() -> None:
    """The plane-form projection equals the packed path (both backends).

    Float64 host: identical to ~1e-12 (op-order only). Covers distortion,
    elevation correction, and behind-camera NaN.
    """
    import numpy as np

    from glimpse_tpu.ops import projection

    rng = np.random.default_rng(4)
    vec = np.zeros(20)
    vec[0:3] = (100.0, -50.0, 25.0)
    vec[3:6] = (15.0, -30.0, 2.0)
    vec[6:8] = (4288, 2848)
    vec[8:10] = (3000.0, 3010.0)
    vec[10:12] = (3.0, -2.0)
    vec[12:18] = (-0.12, 0.04, -0.002, 0.01, 0.0, 0.0)
    vec[18:20] = (0.001, -0.002)
    xyz = np.column_stack(
        [
            rng.uniform(-500, 500, 4000),
            rng.uniform(-500, 2000, 4000),  # includes behind-camera points
            rng.uniform(-300, 300, 4000),
        ]
    )
    for correction in (None, (6.3781e6, 0.13)):
        uv = projection.project(vec, xyz, correction=correction, xp=np)
        u, v = projection.project_planes(
            vec, xyz[:, 0], xyz[:, 1], xyz[:, 2], correction=correction,
            xp=np,
        )
        both_nan = np.isnan(uv[:, 0]) & np.isnan(u)
        assert (np.isnan(uv[:, 0]) == np.isnan(u)).all()
        ok = ~both_nan
        assert ok.sum() > 100  # in-front points exist
        np.testing.assert_allclose(u[ok], uv[ok, 0], rtol=1e-11, atol=1e-9)
        np.testing.assert_allclose(v[ok], uv[ok, 1], rtol=1e-11, atol=1e-9)
