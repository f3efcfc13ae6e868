"""Calibration-stack tests: controls, bundle adjustment, RANSAC, stabilization."""
import copy
import datetime
from pathlib import Path

import numpy as np
import pytest

from glimpse_tpu import Camera, Image, optimize

PATH = Path(__file__).parent / "assets" / "AK10b_20141013_020336.JPG"


def test_points_control_contract() -> None:
    cam = Camera(imgsz=10, f=1, xyz=(0, 0, 1), viewdir=(0, -90, 0))
    xyz = [(-1, 0, 0), (0, 0, 0), (1, 0, 0)]
    uv = [(3, 5), (5, 5), (7, 5)]
    points = optimize.Points(cam=cam, uv=uv, xyz=xyz)
    assert points.size == 3
    np.testing.assert_allclose(
        points.predicted() - points.observed(),
        [[1, 0], [0, 0], [-1, 0]],
        atol=1e-12,
    )
    cam.f = (2, 2)
    np.testing.assert_allclose(points.predicted() - points.observed(), 0, atol=1e-12)


def test_lines_control_contract() -> None:
    cam = Camera(imgsz=10, f=1)
    xyzs = [[(-10, 1, 0), (0, 1, 0), (10, 1, 0)]]
    uvs = [[(2, 4), (4, 4)], [(6, 4), (8, 4)]]
    lines = optimize.Lines(cam=cam, uvs=uvs, xyzs=xyzs, density=10)
    assert lines.size == 4
    np.testing.assert_allclose(
        lines.predicted() - lines.observed(), [[0, 1]] * 4, atol=1e-9
    )
    cam.viewdir = (0, -45, 0)
    np.testing.assert_allclose(
        lines.predicted() - lines.observed(), 0, atol=1e-9
    )


def test_matches_control_contract() -> None:
    cams = Camera(imgsz=10, f=1), Camera(imgsz=10, f=1)
    uvs = [(4, 5), (5, 5), (6, 5)], [(4.1, 5), (5.1, 5), (6.1, 5)]
    matches = optimize.Matches(cams=cams, uvs=uvs)
    assert matches.size == 3
    np.testing.assert_allclose(
        matches.predicted() - matches.observed(), [[0.1, 0]] * 3, atol=1e-12
    )


def test_rotation_matches_equivalent_to_matches() -> None:
    camA = Camera(imgsz=100, f=80, k=(0.05, 0, 0, 0, 0, 0))
    camB = Camera(imgsz=100, f=80, k=(0.05, 0, 0, 0, 0, 0), viewdir=(3, -2, 1))
    rng = np.random.default_rng(0)
    uvA = rng.uniform(20, 80, size=(20, 2))
    uvB = camB.xyz_to_uv(camA.uv_to_xyz(uvA), directions=True)
    plain = optimize.Matches(cams=(camA, camB), uvs=[uvA, uvB])
    rot = optimize.RotationMatches(cams=(camA, camB), uvs=[uvA, uvB])
    np.testing.assert_allclose(rot.predicted(), plain.predicted(), atol=1e-8)
    xyz = optimize.RotationMatchesXYZ(cams=(camA, camB), uvs=[uvA, uvB])
    rays = xyz.predicted(cam=0)
    np.testing.assert_allclose(np.linalg.norm(rays, axis=1), 1, atol=1e-12)
    # Internals guard trips when camera internals change.
    camB.f = (90, 90)
    with pytest.raises(ValueError):
        rot.predicted()


def test_matches_filter() -> None:
    cams = Camera(imgsz=10, f=1), Camera(imgsz=10, f=1)
    uvs = (
        np.array([(4.0, 5), (5, 5), (6, 5)]),
        np.array([(4.0, 5), (5, 5), (9, 9)]),
    )
    matches = optimize.Matches(
        cams=cams, uvs=list(uvs), weights=np.array([1.0, 2.0, 3.0])
    )
    matches.filter(max_error=1.0)
    assert matches.size == 2
    matches.filter(n_best=1)
    assert matches.size == 1


def test_polynomial_ransac() -> None:
    xy = [(0, 0), (1.1, 1), (1.9, 2), (3.1, 3), (3.9, 4)]
    xy += [(3, 0.1), (0.1, 3)]
    model = optimize.Polynomial(xy, deg=1)
    plain = model.fit()
    assert abs(plain[0] - 1) > 0.01  # outliers corrupt the plain fit
    params, inliers = optimize.ransac(
        model, n=2, max_error=0.2, min_inliers=2, iterations=100,
        rng=np.random.default_rng(0),
    )
    assert set(inliers) == {0, 1, 2, 3, 4}
    np.testing.assert_allclose(params, [1.0, 0.0], atol=0.1)


def test_cameras_fit_recovers_viewdir_from_points() -> None:
    true = Camera(imgsz=(200, 150), f=(180, 180), viewdir=(5, -3, 1))
    rng = np.random.default_rng(1)
    xyz = np.column_stack(
        [rng.uniform(-50, 50, 40), rng.uniform(80, 120, 40), rng.uniform(-30, 30, 40)]
    )
    uv = true.xyz_to_uv(xyz)
    keep = np.isfinite(uv).all(axis=1) & true.inframe(uv)
    cam = Camera(imgsz=(200, 150), f=(180, 180))  # unknown viewdir
    points = optimize.Points(cam=cam, uv=uv[keep], xyz=xyz[keep])
    model = optimize.Cameras(
        cams=[cam], controls=[points], cam_params=[{"viewdir": True}]
    )
    values = model.fit()
    np.testing.assert_allclose(values, (5, -3, 1), atol=1e-6)
    # Applying the fit zeroes the reprojection errors.
    model.set_cameras(values)
    assert model.errors().max() < 1e-6


def test_cameras_fit_group_params() -> None:
    """Two cameras share focal length through a group parameter."""
    rng = np.random.default_rng(2)
    xyz = np.column_stack(
        [rng.uniform(-50, 50, 30), rng.uniform(80, 120, 30), rng.uniform(-30, 30, 30)]
    )
    true_f = 190.0
    cams_true = [
        Camera(imgsz=(200, 150), f=true_f, viewdir=(0, 0, 0)),
        Camera(imgsz=(200, 150), f=true_f, viewdir=(8, 0, 0)),
    ]
    uvs = [c.xyz_to_uv(xyz) for c in cams_true]
    cams = [
        Camera(imgsz=(200, 150), f=170.0, viewdir=(0, 0, 0)),
        Camera(imgsz=(200, 150), f=170.0, viewdir=(8, 0, 0)),
    ]
    controls = [
        optimize.Points(cam=cams[i], uv=uvs[i], xyz=xyz) for i in range(2)
    ]
    model = optimize.Cameras(
        cams=cams,
        controls=controls,
        group_indices=[[0, 1]],
        group_params=[{"f": True}],
    )
    values = model.fit()
    np.testing.assert_allclose(values, [true_f, true_f], rtol=1e-6)


def test_observer_cameras_stabilization() -> None:
    """Recover a known rotation between sequence images from synthetic matches."""
    import scipy.sparse

    camA = Camera(imgsz=(200, 150), f=(180, 180))
    true_viewdir = (1.5, -1.0, 0.5)
    camB = Camera(imgsz=(200, 150), f=(180, 180), viewdir=true_viewdir)
    rng = np.random.default_rng(3)
    uvA = rng.uniform(20, 130, size=(50, 2))
    uvB = camB.xyz_to_uv(camA.uv_to_xyz(uvA), directions=True)
    keep = np.isfinite(uvB).all(axis=1)
    match = optimize.RotationMatchesXYZ(cams=(camA, camB), uvs=[uvA[keep], uvB[keep]])
    matches = scipy.sparse.coo_matrix((np.ones(1), ([0], [1])))
    matches.data = np.array([match], dtype=object)

    class FakeImage:
        def __init__(self, cam):
            self.cam = cam

    class FakeObserver:
        images = [FakeImage(camA), FakeImage(camB)]

    # Start camB from a wrong guess.
    camB.viewdir = (0, 0, 0)
    model = optimize.ObserverCameras(FakeObserver(), matches=matches, anchors=[0])
    result = model.fit(tol=1e-12)
    fitted = result.x.reshape(-1, 3)
    np.testing.assert_allclose(fitted[0], (0, 0, 0), atol=1e-3)
    np.testing.assert_allclose(fitted[1], true_viewdir, atol=1e-2)

    # The fully-on-device L-BFGS (one jitted while_loop, no per-iteration
    # host round trips) must reach the same optimum.
    camB.viewdir = (0, 0, 0)
    model2 = optimize.ObserverCameras(
        FakeObserver(), matches=matches, anchors=[0]
    )
    result2 = model2.fit(method="lbfgs-device")
    fitted2 = result2.x.reshape(-1, 3)
    assert result2.success
    np.testing.assert_allclose(fitted2[0], (0, 0, 0), atol=1e-3)
    np.testing.assert_allclose(fitted2[1], true_viewdir, atol=1e-2)
    np.testing.assert_allclose(fitted2[1], fitted[1], atol=2e-3)


@pytest.mark.slow
def test_optimizes_camera_viewdir_with_ransac() -> None:
    """Reference integration contract (test_optimize.py:8-38): synthesize a
    rotated view, SIFT-match, show the plain fit fails and RANSAC recovers
    the rotation to < 0.1 degrees."""
    cv2 = pytest.importorskip("cv2")
    imgA = Image(PATH)
    imgA.cam.resize(0.5)
    imgB = copy.deepcopy(imgA)
    viewdir = (2, 2, 2)
    imgB.cam.viewdir = viewdir
    synthetic = np.nan_to_num(imgA.project(imgB.cam)).astype(np.uint8)
    keypoints = [
        optimize.detect_keypoints(np.asarray(a, dtype=float).mean(axis=2))
        for a in (imgA.read(), synthetic)
    ]
    uvs = optimize.match_keypoints(*keypoints, max_ratio=0.8)
    matches = optimize.Matches(cams=(imgA.cam, imgB.cam), uvs=list(uvs))
    model = optimize.Cameras(
        cams=[imgB.cam], controls=[matches], cam_params=[{"viewdir": True}]
    )
    rvalues, rindex = optimize.ransac(
        model, n=12, max_error=5, min_inliers=10, iterations=10,
        rng=np.random.default_rng(0),
    )
    assert all(abs(rvalues - np.asarray(viewdir)) < 0.1)


def test_keypoint_matcher_with_caches(tmp_path) -> None:
    cv2 = pytest.importorskip("cv2")
    t0 = datetime.datetime(2020, 1, 1)
    images = [
        Image(PATH, cam={"imgsz": (200, 134), "fmm": 20, "sensorsz": (23.6, 15.8)},
              datetime=t0 + datetime.timedelta(days=i))
        for i in range(3)
    ]
    # Unique basenames are required: use symlinked copies.
    import shutil

    paths = []
    for i, img in enumerate(images):
        p = tmp_path / f"img_{i}.jpg"
        shutil.copy(PATH, p)
        paths.append(p)
    images = [
        Image(p, cam={"imgsz": (200, 134), "fmm": 20, "sensorsz": (23.6, 15.8)},
              datetime=t0 + datetime.timedelta(days=i))
        for i, p in enumerate(paths)
    ]
    matcher = optimize.KeypointMatcher(images)
    kp_dir = tmp_path / "keypoints"
    matcher.build_keypoints(path=kp_dir, contrastThreshold=0.02)
    assert len(list(kp_dir.glob("*.pkl"))) == 3
    matcher.build_matches(maxdt=datetime.timedelta(days=1), path=tmp_path / "matches")
    assert matcher.matches is not None
    assert matcher.matches.data.size == 2  # (0,1), (1,2): maxdt window
    counts = matcher.matches_per_image()
    assert counts.shape == (3,)
    assert (counts > 0).all()
    breaks = matcher.match_breaks()
    assert len(breaks) == 0


def test_project_images(tmp_path) -> None:
    img = Image(PATH, cam={"imgsz": (100, 67), "fmm": 20, "sensorsz": (23.6, 15.8)})
    cam = img.cam.copy()
    cam.viewdir = (1, 0, 0)
    out = tmp_path / "projected.tif"
    optimize.project_images(cam=cam, images=[img], paths=[out])
    assert out.exists()
    from glimpse_tpu.io import geotiff

    a = geotiff.read(out)
    assert a.shape[0:2] == (67, 100)


def test_cameras_fit_recovers_position() -> None:
    """Absolute world control constrains camera position (xyz)."""
    true = Camera(imgsz=(200, 150), f=(180, 180), xyz=(10, -5, 3), viewdir=(0, 0, 0))
    rng = np.random.default_rng(4)
    xyz = np.column_stack(
        [rng.uniform(-60, 80, 50), rng.uniform(100, 200, 50), rng.uniform(-40, 40, 50)]
    )
    uv = true.xyz_to_uv(xyz)
    keep = np.isfinite(uv).all(axis=1) & true.inframe(uv)
    cam = Camera(imgsz=(200, 150), f=(180, 180), xyz=(0, 0, 0))
    points = optimize.Points(cam=cam, uv=uv[keep], xyz=xyz[keep])
    model = optimize.Cameras(
        cams=[cam], controls=[points], cam_params=[{"xyz": True}]
    )
    values = model.fit()
    np.testing.assert_allclose(values, (10, -5, 3), atol=1e-4)


def test_cameras_fit_distortion_from_points() -> None:
    """Radial distortion recovered from dense image-world control."""
    true = Camera(imgsz=(200, 150), f=(180, 180), k=(-0.15, 0.05, 0, 0, 0, 0))
    uv_grid = true.grid(step=10, mode="points")
    rays = true.uv_to_xyz(uv_grid, depth=100.0, directions=False)
    cam = Camera(imgsz=(200, 150), f=(180, 180))
    points = optimize.Points(cam=cam, uv=uv_grid, xyz=rays)
    # Large distortions exceed the default stability bounds (+-f/4000):
    # provide explicit bounds like the reference requires.
    model = optimize.Cameras(
        cams=[cam], controls=[points],
        cam_params=[{"k": ([0, 1], -0.5, 0.5)}],
    )
    values = model.fit()
    np.testing.assert_allclose(values, (-0.15, 0.05), atol=1e-6)


def test_plot_helpers_run_headless() -> None:
    """plot_weights / plot_quivers / set_plot_limits draw without a display."""
    import matplotlib

    matplotlib.use("Agg", force=True)
    import matplotlib.pyplot as plt

    from glimpse_tpu import helpers
    from glimpse_tpu.raster import Grid

    xy = np.array([[0.0, 0.0], [5.0, 5.0], [10.0, 0.0]])
    q = helpers.plot_quivers(xy, np.array([[1, 0], [0, 1], [1, 1.0]]))
    assert q is not None
    assert helpers.gdal_driver_from_path("a/b.tif") == "GTiff"
    assert helpers.driver_from_path("x.svg", raster=False) == "SVG"
    assert helpers.driver_from_path("x.xyz") is None
    Grid((4, 3), x=(0, 4), y=(3, 0)).set_plot_limits()
    assert plt.gca().get_xlim() == (0.0, 4.0)
    plt.close("all")


def test_calibrate_viewdir_from_svg_horizon() -> None:
    """Reference workflow: manual SVG horizon traces -> Lines control ->
    viewdir calibration (svg.py + optimize.py integration on the bundled
    annotation file)."""
    from glimpse_tpu import svg

    d = svg.read(
        str(PATH.parent / "AK10b_20141013_020336.svg"),
        key="id", imgsz=(800, 536),
    )
    uvs = [np.asarray(line, float) for line in d["horizon"]["polyline"]]
    true_cam = Camera(
        imgsz=(800, 536), fmm=20, sensorsz=(23.6, 15.8),
        xyz=(0, 0, 100), viewdir=(25.8, -6.2, 1.1),
    )
    # World horizon polylines consistent with the true camera (far ring).
    xyzs = [
        true_cam.xyz + true_cam.uv_to_xyz(uv, directions=True) * 5000.0
        for uv in uvs
    ]
    cam = true_cam.copy()
    cam.viewdir = (24.5, -5.5, 0.0)  # degraded initial orientation
    lines = optimize.Lines(cam=cam, uvs=uvs, xyzs=xyzs, density=2)
    model = optimize.Cameras(
        cams=[cam], controls=[lines], cam_params=[{"viewdir": True}]
    )
    fit = model.fit()
    np.testing.assert_allclose(fit, (25.8, -6.2, 1.1), atol=2e-2)


def test_plots_residuals_as_quivers() -> None:
    """Control .plot draws observed->predicted quivers (reference
    test_optimize.py counterpart), headless."""
    import matplotlib

    matplotlib.use("Agg", force=True)
    import matplotlib.pyplot as plt

    cam = Camera(imgsz=10, f=5, xyz=(0, 0, 1), viewdir=(0, -90, 0))
    xyz = [(-1, 0, 0), (0, 0, 0), (1, 0, 0)]
    uv = [(3.2, 5), (5, 5.1), (6.8, 5)]
    points = optimize.Points(cam=cam, uv=uv, xyz=xyz)
    result = points.plot()
    assert result
    plt.close("all")


def _synthetic_two_camera_problem(distortion=(-0.1,)):
    """Two distorted cameras observing shared world points + pair matches."""
    rng = np.random.default_rng(11)
    xyz = np.column_stack(
        [rng.uniform(-60, 60, 60), rng.uniform(90, 140, 60), rng.uniform(-40, 40, 60)]
    )
    true = [
        Camera(imgsz=(200, 150), f=185.0, viewdir=(4, -2, 0.5), k=distortion),
        Camera(imgsz=(200, 150), f=185.0, viewdir=(-3, 1, -0.5), k=distortion),
    ]
    uvs = [c.xyz_to_uv(xyz) for c in true]
    keep = np.logical_and.reduce(
        [np.isfinite(uv).all(axis=1) & c.inframe(uv) for uv, c in zip(uvs, true)]
    )
    cams = [
        Camera(imgsz=(200, 150), f=175.0, viewdir=(3, -1, 0), k=distortion),
        Camera(imgsz=(200, 150), f=175.0, viewdir=(-2, 0, 0), k=distortion),
    ]
    controls = [
        optimize.Points(cam=cams[i], uv=uvs[i][keep], xyz=xyz[keep])
        for i in range(2)
    ]
    model = optimize.Cameras(
        cams=cams,
        controls=controls,
        cam_params=[{"viewdir": True}, {"viewdir": True}],
        group_indices=[[0, 1]],
        group_params=[{"f": True}],
    )
    return model


def test_exact_jacobian_matches_finite_differences() -> None:
    """The jacfwd Jacobian agrees with scipy's numerical estimate at x0."""
    model = _synthetic_two_camera_problem()
    jac = model._autodiff_jac()
    x0 = model.values.copy()
    J = jac(x0)
    assert J.shape == (2 * model.size * 2 / 2, len(x0)) or J.ndim == 2
    # Central finite differences on the host residual path.
    eps = 1e-5
    J_fd = np.empty_like(J)
    for col in range(len(x0)):
        hi, lo = x0.copy(), x0.copy()
        hi[col] += eps
        lo[col] -= eps
        r_hi = np.nan_to_num(model.residuals(params=hi).ravel())
        r_lo = np.nan_to_num(model.residuals(params=lo).ravel())
        J_fd[:, col] = (r_hi - r_lo) / (2 * eps)
    assert np.allclose(J, J_fd, rtol=1e-3, atol=1e-3), np.abs(J - J_fd).max()


def test_exact_jacobian_through_matches_undistortion() -> None:
    """jacfwd differentiates through the iterative (oulu) undistortion when
    a Matches control frees the source camera's distortion."""
    rng = np.random.default_rng(3)
    cam_a = Camera(imgsz=(200, 150), f=180.0, viewdir=(0, 0, 0), k=(-0.2,))
    cam_b = Camera(imgsz=(200, 150), f=180.0, viewdir=(2, 1, 0), k=(-0.2,))
    uv_a = np.column_stack(
        [rng.uniform(20, 180, 40), rng.uniform(20, 130, 40)]
    )
    uv_b = cam_b.xyz_to_uv(cam_a.uv_to_xyz(uv_a), directions=True)
    matches = optimize.Matches(cams=[cam_b, cam_a], uvs=[uv_b, uv_a])
    model = optimize.Cameras(
        cams=[cam_a, cam_b],
        controls=[matches],
        cam_params=[{"k": 0}, {"viewdir": True}],
    )
    jac = model._autodiff_jac()
    x0 = model.values.copy()
    J = jac(x0)
    eps = 1e-6
    J_fd = np.empty_like(J)
    for col in range(len(x0)):
        hi, lo = x0.copy(), x0.copy()
        hi[col] += eps
        lo[col] -= eps
        J_fd[:, col] = (
            np.nan_to_num(model.residuals(params=hi).ravel())
            - np.nan_to_num(model.residuals(params=lo).ravel())
        ) / (2 * eps)
    assert np.allclose(J, J_fd, rtol=1e-2, atol=1e-3), np.abs(J - J_fd).max()


def test_exact_jacobian_with_fixed_anchor_camera() -> None:
    """A Matches control may reference a camera that is NOT being fit (the
    RANSAC viewdir fit anchors matches to a fixed camera): the fixed camera
    rides along as a constant row and the Jacobian matches finite
    differences on the free camera's parameters."""
    rng = np.random.default_rng(7)
    anchor = Camera(imgsz=(200, 150), f=180.0, viewdir=(0, 0, 0))
    cam = Camera(imgsz=(200, 150), f=180.0, viewdir=(2, 1, 0))
    uv_a = np.column_stack(
        [rng.uniform(20, 180, 30), rng.uniform(20, 130, 30)]
    )
    uv_b = cam.xyz_to_uv(anchor.uv_to_xyz(uv_a), directions=True)
    matches = optimize.Matches(cams=[cam, anchor], uvs=[uv_b, uv_a])
    model = optimize.Cameras(
        cams=[cam], controls=[matches], cam_params=[{"viewdir": True}]
    )
    jac = model._autodiff_jac()
    x0 = model.values.copy()
    J = jac(x0)
    eps = 1e-6
    J_fd = np.empty_like(J)
    for col in range(len(x0)):
        hi, lo = x0.copy(), x0.copy()
        hi[col] += eps
        lo[col] -= eps
        J_fd[:, col] = (
            np.nan_to_num(model.residuals(params=hi).ravel())
            - np.nan_to_num(model.residuals(params=lo).ravel())
        ) / (2 * eps)
    assert np.allclose(J, J_fd, rtol=1e-3, atol=1e-3), np.abs(J - J_fd).max()


def test_exact_jacobian_converges_with_fewer_evaluations() -> None:
    """Same optimum as finite differences with >= 5x fewer residual
    evaluations (VERDICT round-2 acceptance for the autodiff rebuild)."""
    def counting(model):
        # scipy's nfev excludes finite-difference probes; count the actual
        # residual evaluations at the source.
        counter = {"n": 0}
        original = model.residuals

        def counted(*args, **kwargs):
            counter["n"] += 1
            return original(*args, **kwargs)

        model.residuals = counted
        return counter

    model_exact = _synthetic_two_camera_problem()
    n_exact = counting(model_exact)
    result_exact = model_exact.fit(full=True, jac="exact")
    model_fd = _synthetic_two_camera_problem()
    n_fd = counting(model_fd)
    result_fd = model_fd.fit(full=True, jac="2-point")
    assert result_exact.success and result_fd.success
    np.testing.assert_allclose(result_exact.x, result_fd.x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        result_exact.x, [185.0, 185.0, 4, -2, 0.5, -3, 1, -0.5], atol=1e-3
    )
    # FD spends host residual evaluations on derivative probing; the exact
    # path spends them only on accepted/rejected steps.
    assert n_fd["n"] >= 5 * n_exact["n"], (n_fd["n"], n_exact["n"])


def test_device_matcher_agrees_with_bruteforce() -> None:
    """Device (MXU matmul) matching reproduces exact L2 kNN matching on real
    SIFT descriptors: same matches as cv2.BFMatcher under ratio+cross-check."""
    cv2 = pytest.importorskip("cv2")
    import scipy.ndimage

    arr = np.asarray(Image(PATH).read())
    if arr.ndim == 3:
        arr = arr.mean(axis=2)
    shifted = scipy.ndimage.shift(arr, (2.0, -3.0), order=1, mode="nearest")
    ka = optimize.detect_keypoints(arr)
    kb = optimize.detect_keypoints(shifted)
    uva_bf, uvb_bf = optimize.match_keypoints(
        ka, kb, matcher=cv2.BFMatcher(cv2.NORM_L2), max_ratio=0.75,
        cross_check=True, max_distance=20.0,
    )
    uva_dev, uvb_dev = optimize.match_keypoints(
        ka, kb, matcher="device", max_ratio=0.75, cross_check=True,
        max_distance=20.0,
    )
    set_bf = {tuple(np.round(r, 3)) for r in np.hstack([uva_bf, uvb_bf])}
    set_dev = {tuple(np.round(r, 3)) for r in np.hstack([uva_dev, uvb_dev])}
    # Identical up to float32-distance ties (allow a sliver of slack).
    overlap = len(set_bf & set_dev) / max(len(set_bf | set_dev), 1)
    assert overlap > 0.99, (len(set_bf), len(set_dev), overlap)
    assert len(uva_dev) > 100


def test_batched_match_pairs_agrees_with_per_pair() -> None:
    """match_pairs (one chunked dispatch for many pairs, common padding)
    returns exactly what per-pair DescriptorMatcher.match returns, including
    pairs whose stacks differ in size, tiny stacks, and the padded tail of a
    partial final chunk."""
    from glimpse_tpu.ops.matching import DescriptorMatcher

    rng = np.random.default_rng(0)
    sizes = [700, 1301, 64, 5, 1, 900]
    descs = [
        rng.normal(size=(int(s), 64)).astype(np.float32) * 10 for s in sizes
    ]
    # Make some descriptors near-identical across images so real matches
    # (and ratio-test ties) exist.
    descs[1][:300] = descs[0][:300] + rng.normal(size=(300, 64)).astype(np.float32) * 0.05
    descs[5][:200] = descs[0][100:300] + rng.normal(size=(200, 64)).astype(np.float32) * 0.05
    pairs = [(0, 1), (0, 5), (1, 5), (2, 3), (3, 4), (1, 0), (5, 0)]
    matcher = DescriptorMatcher(pad_step=256)
    batched = matcher.match_pairs(
        descs, np.asarray(pairs), max_ratio=0.8, cross_check=True, batch=3
    )
    for (i, j), (idx_b, ratio_b) in zip(pairs, batched):
        idx_s, ratio_s = matcher.match(
            descs[i], descs[j], max_ratio=0.8, cross_check=True
        )
        np.testing.assert_array_equal(idx_b, idx_s)
        np.testing.assert_allclose(ratio_b, ratio_s, rtol=1e-6)
    assert sum(len(r[0]) for r in batched) > 300


def test_build_matches_device_precompute_matches_per_pair(tmp_path) -> None:
    """build_matches(matcher='device') precomputes every pair in batched
    dispatches; the resulting Matches must equal the per-pair device path."""
    pytest.importorskip("cv2")
    import PIL.Image
    import scipy.ndimage

    arr = np.asarray(Image(PATH).read())
    if arr.ndim == 3:
        arr = arr.mean(axis=2)
    arr = arr[:256, :256]
    paths = []
    for k, shift in enumerate([(0, 0), (1.5, -2.0), (-2.5, 1.0)]):
        moved = scipy.ndimage.shift(arr, shift, order=1, mode="nearest")
        p = tmp_path / f"im{k}.png"
        PIL.Image.fromarray(moved.astype(np.uint8)).save(p)
        paths.append(p)
    t0 = datetime.datetime(2020, 1, 1)
    images = [
        Image(p, cam={"imgsz": 256, "f": 300},
              datetime=t0 + datetime.timedelta(hours=k))
        for k, p in enumerate(paths)
    ]
    kw = dict(max_ratio=0.8, cross_check=True, max_distance=30.0)

    def run():
        km = optimize.KeypointMatcher(images=images)
        km.build_keypoints(contrastThreshold=0.02)
        km.build_matches(matcher="device", clear_keypoints=False, **kw)
        return km

    km = run()
    assert km.matches.data.size == 3  # all unordered pairs of 3 images
    for m, i, j in zip(km.matches.data, km.matches.row, km.matches.col):
        uva, uvb = optimize.match_keypoints(
            km.keypoints[i], km.keypoints[j], matcher="device", **kw
        )
        assert m.size == len(uva) and m.size > 20
        np.testing.assert_allclose(m.uvs[0], uva)
        np.testing.assert_allclose(m.uvs[1], uvb)


def test_viewdir_from_rotation_round_trip():
    from glimpse_tpu.ops import projection as proj

    rng = np.random.default_rng(3)
    vds = rng.uniform(-1, 1, (20, 3)) * np.array([180, 80, 180])
    R = proj.rotation_matrix(vds, xp=np)
    back = proj.viewdir_from_rotation(R, xp=np)
    R2 = proj.rotation_matrix(back, xp=np)
    np.testing.assert_allclose(R, R2, atol=1e-12)


def test_observer_cameras_chain_initialize():
    """Chained Procrustes init recovers synthetic viewdirs exactly.

    The initializer is what makes ObserverCameras.fit converge at
    1,000-frame scale (validation.md): verify the closed-form chain is
    exact on noiseless matches, including frames BEFORE the anchor.
    """
    import scipy.sparse

    from glimpse_tpu import optimize
    from glimpse_tpu.ops import projection as proj

    rng = np.random.default_rng(11)
    T = 7
    anchor = 3
    vds = np.tile(np.array([5.0, -35.0, 1.0]), (T, 1))
    vds[np.arange(T) != anchor] += rng.normal(0, 0.1, (T - 1, 3))
    Rs = [proj.rotation_matrix(v, xp=np) for v in vds]

    class _M:
        def __init__(self, xa, xb):
            self.xys = (xa, xb)
            self.size = len(xa)

    data, rows, cols = [], [], []
    for i in range(T - 1):
        xy_a = rng.uniform(-0.4, 0.4, (40, 2))
        va = np.column_stack([xy_a, np.ones(40)])
        cb = (va @ Rs[i]) @ Rs[i + 1].T
        data.append(_M(xy_a, cb[:, :2] / cb[:, 2:3]))
        rows.append(i)
        cols.append(i + 1)

    class _Img:
        def __init__(self, v):
            self.cam = type("C", (), {})()
            self.cam.viewdir = v.copy()

    class _Obs:
        pass

    obs = _Obs()
    # Only the anchor image knows its true direction.
    obs.images = [
        _Img(vds[i] if i == anchor else np.array([5.0, -35.0, 1.0]))
        for i in range(T)
    ]
    oc = optimize.ObserverCameras(obs, anchors=[anchor])
    coo = scipy.sparse.coo_matrix(
        (np.arange(len(data), dtype=float), (rows, cols)), shape=(T, T)
    )
    coo.data = np.asarray(data, dtype=object)
    oc.matches = coo
    out = oc.initialize()
    np.testing.assert_allclose(out, vds, atol=1e-8)


def test_lines_autodiff_fit_matches_fd() -> None:
    """A Lines-containing fit uses the exact jacfwd path by default and
    reaches (at least) the finite-difference optimum (VERDICT r3 item 6):
    the fixed-budget world densification + masked nearest assignment
    (Lines._world_candidates) supplies the Jacobian while the optimum
    stays defined by the host residuals (reference optimize.py:320-376).

    Nearest-point matching constrains only the across-line direction
    (aperture), and the 0.5 px candidate quantization leaves a shallow
    valley where TRF legitimately stops at slightly different points for
    different (exact vs FD-noise) Jacobians — so the assertions compare
    fit QUALITY (cost, truth recovery), not parameter identity. The
    scene mixes horizontal polylines with a vertical one so every
    rotation axis is across-line for some control."""
    rng = np.random.default_rng(11)
    true_cam = Camera(
        imgsz=(400, 300), f=350.0, xyz=(0, 0, 50), viewdir=(10.0, -4.0, 0.5)
    )
    # Two horizontal polylines (a synthetic horizon) + one vertical
    # (a ridge silhouette), all far-field; observed traces carry noise.
    uv_sets = [
        np.column_stack(
            [np.linspace(20, 380, 40), v0 + 8 * np.sin(np.linspace(0, 3, 40))]
        )
        for v0 in (60.0, 220.0)
    ] + [
        np.column_stack(
            [200 + 6 * np.sin(np.linspace(0, 3, 30)), np.linspace(30, 270, 30)]
        )
    ]
    xyzs = []
    uvs = []
    for uv_line in uv_sets:
        xyz = true_cam.xyz + true_cam.uv_to_xyz(uv_line, directions=True) * 4e3
        xyzs.append(xyz)
        uvs.append(uv_line + rng.normal(scale=0.05, size=uv_line.shape))
    cam = true_cam.copy()
    cam.viewdir = (9.3, -3.4, 0.0)
    lines = optimize.Lines(cam=cam, uvs=uvs, xyzs=xyzs, density=2)
    model = optimize.Cameras(
        cams=[cam], controls=[lines], cam_params=[{"viewdir": True}]
    )
    assert model._autodiff_supported()
    fit_exact = np.asarray(model.fit(jac="exact"))
    cost_exact = float(np.sum(model.residuals(params=fit_exact) ** 2))
    model.reset_cameras()
    fit_fd = np.asarray(model.fit(jac="fd"))
    cost_fd = float(np.sum(model.residuals(params=fit_fd) ** 2))
    # The exact-Jacobian optimum is at least as good as FD's ...
    assert cost_exact <= cost_fd * 1.02
    # ... and recovers the true rotation within the candidate
    # quantization floor on every axis.
    np.testing.assert_allclose(fit_exact, (10.0, -4.0, 0.5), atol=0.02)


def test_clahe_matches_cv2() -> None:
    """NumPy CLAHE tracks cv2's output to sub-level accuracy."""
    cv2 = pytest.importorskip("cv2")
    from glimpse_tpu import helpers

    rng = np.random.default_rng(11)
    # Smooth gradient + noise + a dark band: exercises clipping and the
    # corner/edge interpolation regions. Non-multiple-of-8 dims on purpose.
    y, x = np.mgrid[0:123, 0:157]
    img = np.clip(
        0.6 * x + 0.3 * y + rng.normal(scale=12, size=x.shape) + 20 * (y > 80),
        0,
        255,
    ).astype(np.uint8)
    for clip, grid in [(40.0, (8, 8)), (2.0, (4, 4))]:
        ours = helpers.clahe(img, clip_limit=clip, tile_grid_size=grid)
        ref = cv2.createCLAHE(clipLimit=clip, tileGridSize=grid).apply(img)
        diff = np.abs(ours.astype(int) - ref.astype(int))
        # cvRound vs np.rint can differ by one level on exact halves.
        assert diff.max() <= 1, (clip, grid, diff.max())
        assert np.mean(diff) < 0.02, (clip, grid, np.mean(diff))


def test_clahe_without_cv2(monkeypatch, tmp_path) -> None:
    """KeypointMatcher clahe=True works (and transforms) when cv2 is absent."""
    monkeypatch.setattr(optimize, "cv2", None)
    maker = optimize.KeypointMatcher._make_clahe(True)
    assert isinstance(maker, optimize._NumpyCLAHE)
    rng = np.random.default_rng(0)
    img = (rng.random((64, 64)) * 120 + 40).astype(np.uint8)
    out = maker.apply(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    # CLAHE must expand the 40..160 input range toward the full 0..255.
    assert out.min() < 20 and out.max() > 235
    with pytest.raises(TypeError):
        optimize.KeypointMatcher._make_clahe({"bogus": 1})
