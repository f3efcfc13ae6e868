"""Batched on-device tracker tests: known-velocity recovery, sharding."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from glimpse_tpu import Camera
from glimpse_tpu.raster import Raster
from glimpse_tpu.track.batch import (
    BatchConfig,
    BatchMotion,
    BatchTracker,
    DeviceRaster,
)


def make_scene(n_frames=6, velocity=(2.0, 1.0), imgsz=256, seed=0):
    """Render frames of a moving ground texture through a nadir camera."""
    import scipy.ndimage

    rng = np.random.default_rng(seed)
    world = scipy.ndimage.gaussian_filter(rng.normal(size=(500, 500)), 0.8) * 100
    texture = Raster(world, x=(0, 500), y=(500, 0))
    cam = Camera(imgsz=imgsz, f=300, xyz=(250, 250, 300), viewdir=(0, -90, 0))
    # Ground intersection of each pixel ray (z = 0 plane).
    uv = cam.grid(step=1, mode="points")
    rays = cam.uv_to_xyz(uv)
    t = -cam.xyz[2] / rays[:, 2]
    ground = cam.xyz + rays * t[:, None]
    frames = []
    for i in range(n_frames):
        shifted = np.column_stack(
            [ground[:, 0] - velocity[0] * i, ground[:, 1] - velocity[1] * i]
        )
        vals = texture.sample(shifted, bounds_error=False, fill_value=0.0)
        frames.append(vals.reshape(imgsz, imgsz))
    return cam, np.stack(frames), ground


def make_motion(points_xy, v_sigma=3.0):
    N = len(points_xy)
    return BatchMotion(
        kind="cartesian",
        xy=jnp.asarray(points_xy, jnp.float32),
        xy_sigma=jnp.full((N, 2), 1.5, jnp.float32),
        v_mean=jnp.zeros((N, 3), jnp.float32),
        v_sigma=jnp.full((N, 3), v_sigma, jnp.float32).at[:, 2].set(0.0),
        a_mean=jnp.zeros((N, 3), jnp.float32),
        a_sigma=jnp.full((N, 3), 0.2, jnp.float32).at[:, 2].set(0.0),
        slope_sigma=jnp.zeros((N,), jnp.float32),
        dem=DeviceRaster.constant(0.0),
        dem_sigma=DeviceRaster.constant(0.0),
        use_dem_sigma=False,
    )


def run_tracker(mesh=None, n_points=8, n_frames=6, velocity=(2.0, 1.0),
                highpass_mode="auto", resample_mode="auto"):
    cam, frames, _ = make_scene(n_frames=n_frames, velocity=velocity)
    rng = np.random.default_rng(1)
    points_xy = rng.uniform(180, 320, size=(n_points, 2))
    motion = make_motion(points_xy)
    cfg = BatchConfig(
        n_particles=512, template_size=(15, 15), search_size=(41, 41),
        highpass_mode=highpass_mode, resample_mode=resample_mode,
    )
    tracker = BatchTracker(
        camera_vectors=cam.to_array()[None],
        corrections=[None],
        sigmas=[0.15],
        motion=motion,
        config=cfg,
        mesh=mesh,
    )
    images = frames[:, None]  # (T, O=1, H, W)
    dts = np.ones(n_frames - 1)
    state, outputs = tracker.track(jax.random.PRNGKey(0), images, dts)
    return np.asarray(outputs["mean"]), np.asarray(outputs["sigma"]), points_xy


def test_batch_tracker_recovers_velocity() -> None:
    velocity = (2.0, 1.0)
    means, sigmas, points_xy = run_tracker(velocity=velocity)
    # Final-step velocity per point.
    v_final = means[-1, :, 3:5]
    err = np.abs(v_final - np.asarray(velocity))
    assert np.median(err) < 0.5, v_final
    # Positions advance roughly with the texture.
    dx = means[-1, :, 0] - points_xy[:, 0]
    assert np.median(np.abs(dx - velocity[0] * 5)) < 2.0, dx
    # Uncertainty shrinks below the prior.
    assert np.median(sigmas[-1, :, 0]) < 1.5


def test_batch_tracker_multidevice_matches_single() -> None:
    from glimpse_tpu.parallel import get_mesh

    n_dev = len(jax.devices())
    assert n_dev >= 2, "conftest should provide 8 virtual CPU devices"
    mesh = get_mesh()
    means_sharded, _, _ = run_tracker(mesh=mesh, n_points=8)
    means_single, _, _ = run_tracker(mesh=None, n_points=8)
    np.testing.assert_allclose(means_sharded, means_single, atol=1e-3)


def test_batch_tracker_multidevice_pallas_highpass() -> None:
    """The fused Pallas high-pass stays active under a mesh via shard_map
    (interpret mode on CPU) and matches the single-device run."""
    from glimpse_tpu.parallel import get_mesh

    mesh = get_mesh()
    means_sharded, _, _ = run_tracker(
        mesh=mesh, n_points=8, highpass_mode="pallas"
    )
    means_single, _, _ = run_tracker(
        mesh=None, n_points=8, highpass_mode="pallas"
    )
    np.testing.assert_allclose(means_sharded, means_single, atol=1e-3)
    # Pallas and XLA high-pass produce the same filter output.
    means_xla, _, _ = run_tracker(mesh=None, n_points=8, highpass_mode="xla")
    np.testing.assert_allclose(means_single, means_xla, atol=1e-3)


@pytest.mark.slow
def test_batch_tracker_pallas_resample_matches_xla() -> None:
    """The fused Pallas resample (searchsorted + gather in one VMEM sweep)
    tracks identically to the XLA merge-rank + take_along_axis path,
    single-device and under a mesh via shard_map (interpret mode on CPU).

    The two paths compare the comb against the cumulative weights with
    different (mathematically equivalent) float roundings, so indices can
    flip by one on near-ties; the trajectory tolerance absorbs that.
    """
    from glimpse_tpu.parallel import get_mesh

    means_pallas, _, _ = run_tracker(
        mesh=None, n_points=8, resample_mode="pallas"
    )
    means_xla, _, _ = run_tracker(mesh=None, n_points=8, resample_mode="xla")
    np.testing.assert_allclose(means_pallas, means_xla, atol=1e-2)
    mesh = get_mesh()
    means_sharded, _, _ = run_tracker(
        mesh=mesh, n_points=8, resample_mode="pallas"
    )
    np.testing.assert_allclose(means_sharded, means_pallas, atol=1e-3)


@pytest.mark.slow
def test_fused_resample_kernel_exact() -> None:
    """Kernel output == take_along_axis with the kernel's own indices
    (bit-exact row copies, searchsorted-left tie semantics)."""
    from glimpse_tpu.kernels.resample_pallas import (
        systematic_resample_gather,
    )

    rng = np.random.default_rng(3)
    N, P, K = 6, 500, 7
    w = rng.random((N, P)).astype(np.float32) ** 3 + 1e-5
    u = rng.random((N, 1)).astype(np.float32)
    cum = np.cumsum(w / w.sum(-1, keepdims=True), -1)
    t = jnp.asarray((P * cum - u).astype(np.float32))
    cols = [
        jnp.asarray(rng.normal(size=(N, P)).astype(np.float32))
        for _ in range(K)
    ]
    out = systematic_resample_gather(t, cols, interpret=True)
    tn = np.asarray(t)
    idx = np.stack(
        [
            np.clip(np.searchsorted(tn[n], np.arange(P), side="left"), 0, P - 1)
            for n in range(N)
        ]
    )
    for k in range(K):
        want = np.take_along_axis(np.asarray(cols[k]), idx, 1)
        assert (np.asarray(out[k]) == want).all()
    # bfloat16 payload columns replicate bit-exactly too.
    cols16 = [c.astype(jnp.bfloat16) for c in cols[:2]]
    out16 = systematic_resample_gather(t, cols16, interpret=True)
    for k in range(2):
        want = np.take_along_axis(
            np.asarray(cols16[k]).astype(np.float32), idx, 1
        )
        assert (np.asarray(out16[k]).astype(np.float32) == want).all()
    # The tunable points-per-grid-step block sizes are bit-identical.
    for pb in (16, 32):
        outg = systematic_resample_gather(
            t, cols, interpret=True, points_block=pb
        )
        for k in range(K):
            assert (np.asarray(outg[k]) == np.asarray(out[k])).all(), pb
    # Every kernel layout is bit-identical (mxu_shared trades per-point
    # scalar sections for a shared per-block window; direct/lanes are the
    # reference layouts).
    for layout in ("mxu_shared", "direct", "lanes"):
        outl = systematic_resample_gather(
            t, cols, interpret=True, layout=layout
        )
        for k in range(K):
            assert (np.asarray(outl[k]) == np.asarray(out[k])).all(), layout


def test_fused_resample_production_layout_fast() -> None:
    """Fast default-gate coverage of the PRODUCTION kernel layout only
    (the exhaustive all-layout/all-knob sweep above is marked slow):
    bit-exact row copies at a small shape, skewed weights included."""
    from glimpse_tpu.kernels.resample_pallas import (
        systematic_resample_gather,
    )

    rng = np.random.default_rng(8)
    N, P, K = 4, 256, 7
    w = np.exp(rng.normal(size=(N, P)) * 3).astype(np.float32)
    u = rng.random((N, 1)).astype(np.float32)
    cum = np.cumsum(w / w.sum(-1, keepdims=True), -1)
    t = jnp.asarray((P * cum - u).astype(np.float32))
    cols = [
        jnp.asarray(rng.normal(size=(N, P)).astype(np.float32))
        for _ in range(K)
    ]
    out = systematic_resample_gather(t, cols, interpret=True)
    tn = np.asarray(t)
    idx = np.stack(
        [
            np.clip(np.searchsorted(tn[n], np.arange(P)), 0, P - 1)
            for n in range(N)
        ]
    )
    for k in range(K):
        want = np.take_along_axis(np.asarray(cols[k]), idx, 1)
        assert (np.asarray(out[k]) == want).all()


@pytest.mark.slow
def test_batch_tracker_pallas_resample_ess_threshold() -> None:
    """ESS-triggered resampling agrees between the fused Pallas path and
    the XLA path (non-degraded points keep particles and weights)."""
    cam, frames, _ = make_scene(n_frames=5)
    rng = np.random.default_rng(2)
    points_xy = rng.uniform(180, 320, size=(6, 2))
    motion = make_motion(points_xy)
    outs = {}
    for mode in ("pallas", "xla"):
        cfg = BatchConfig(
            n_particles=256, template_size=(15, 15), search_size=(41, 41),
            resample_mode=mode, resample_threshold=0.5,
        )
        tracker = BatchTracker(
            camera_vectors=cam.to_array()[None], corrections=[None],
            sigmas=[0.15], motion=motion, config=cfg,
        )
        _, outputs = tracker.track(
            jax.random.PRNGKey(3), frames[:, None], np.ones(4)
        )
        outs[mode] = np.asarray(outputs["mean"])
    np.testing.assert_allclose(outs["pallas"], outs["xla"], atol=1e-2)


def test_batch_state_is_checkpointable() -> None:
    """The PF state round-trips through flatten/unflatten (pytree contract)."""
    cam, frames, _ = make_scene(n_frames=2)
    motion = make_motion(np.array([[250.0, 250.0]]))
    tracker = BatchTracker(
        camera_vectors=cam.to_array()[None],
        corrections=[None],
        sigmas=[0.15],
        motion=motion,
        config=BatchConfig(n_particles=64),
    )
    state = tracker.initialize(jax.random.PRNGKey(0), jnp.asarray(frames[0])[None])
    leaves, treedef = jax.tree_util.tree_flatten(state)
    state2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_array_equal(
        np.asarray(state.particles), np.asarray(state2.particles)
    )
    # And it survives a step.
    new_state, out = jax.jit(tracker.step)(
        state2, jnp.asarray(frames[1])[None], jnp.float32(1.0)
    )
    assert np.asarray(new_state.step) == 1
    assert np.isfinite(np.asarray(out["mean"])).all()


def test_batch_motion_kinds_run() -> None:
    key = jax.random.PRNGKey(0)
    for kind in ("cartesian", "cylindrical", "tangent", "tangent_cylindrical"):
        motion = BatchMotion(
            kind=kind,
            xy=jnp.zeros((4, 2)),
            xy_sigma=jnp.ones((4, 2)),
            v_mean=jnp.ones((4, 3)),
            v_sigma=jnp.full((4, 3), 0.1),
            a_mean=jnp.zeros((4, 3)),
            a_sigma=jnp.full((4, 3), 0.01),
            slope_sigma=jnp.full((4,), 0.1),
            dem=DeviceRaster.constant(5.0),
            dem_sigma=DeviceRaster.constant(0.5),
            use_dem_sigma=True,
        )
        p = motion.initialize(key, 16)
        assert p.shape == (4, 16, 6)
        p2 = motion.evolve(key, p, jnp.float32(1.0))
        assert np.isfinite(np.asarray(p2)).all()
        ll = motion.log_likelihoods(p2)
        assert ll.shape == (4, 16)
        if kind.startswith("tangent"):
            # z stays near the DEM surface.
            assert np.abs(np.asarray(p2[..., 2]) - 5.0).max() < 3.0


def test_batch_tracker_cross_validates_host_tracker() -> None:
    """Both trackers see identical frames; world trajectories must agree.

    A nadir camera at height h with f = h images the z=0 plane 1:1, so the
    rendered frames double as world-grid rasters for the host tracker.
    """
    import datetime

    from glimpse_tpu.raster import Raster
    from glimpse_tpu.track import CartesianMotion, Observer, Tracker

    n_frames = 6
    velocity = (2.0, 1.0)
    imgsz = 256
    cam, frames, _ = make_scene(n_frames=n_frames, velocity=velocity, imgsz=imgsz)
    cx, cy = cam.xyz[0], cam.xyz[1]
    # Image frame <-> world: col = x - (cx - S/2), row = (cy + S/2) - y.
    t0 = datetime.datetime(2020, 1, 1)
    day = datetime.timedelta(days=1)
    rasters = [
        Raster(
            f,
            x=(cx - imgsz / 2, cx + imgsz / 2),
            y=(cy + imgsz / 2, cy - imgsz / 2),
            datetime=t0 + i * day,
        )
        for i, f in enumerate(frames)
    ]
    start = (float(cx), float(cy))
    # Host tracker.
    host_motion = CartesianMotion(
        xy=start, time_unit=day, dem=0.0, dem_sigma=None, n=1000,
        xy_sigma=(1.5, 1.5), vxyz_sigma=(3, 3, 0), axyz_sigma=(0.2, 0.2, 0),
        seed=7,
    )
    host = Tracker([Observer(rasters, sigma=0.15)], seed=7)
    host_tracks = host.track([host_motion], tile_size=(15, 15))
    # Batch tracker on the same frames through the camera.
    motion = make_motion(np.array([start]), v_sigma=3.0)
    cfg = BatchConfig(n_particles=1000, template_size=(15, 15), search_size=(41, 41))
    batch = BatchTracker(
        camera_vectors=cam.to_array()[None], corrections=[None], sigmas=[0.15],
        motion=motion, config=cfg,
    )
    _, outputs = batch.track(
        jax.random.PRNGKey(7), frames[:, None], np.ones(n_frames - 1)
    )
    batch_xy = np.asarray(outputs["mean"])[-1, 0, 0:2]
    host_xy = host_tracks.xyz[0, -1, 0:2]
    truth = np.array(start) + np.array(velocity) * (n_frames - 1)
    # Both implementations near the truth and near each other.
    np.testing.assert_allclose(host_xy, truth, atol=1.0)
    np.testing.assert_allclose(batch_xy, truth, atol=1.0)
    np.testing.assert_allclose(batch_xy, host_xy, atol=1.0)


def test_checkpoint_roundtrip(tmp_path) -> None:
    from glimpse_tpu.track import checkpoint

    cam, frames, _ = make_scene(n_frames=3)
    motion = make_motion(np.array([[250.0, 250.0], [240.0, 260.0]]))
    tracker = BatchTracker(
        camera_vectors=cam.to_array()[None], corrections=[None], sigmas=[0.15],
        motion=motion, config=BatchConfig(n_particles=64),
    )
    state = tracker.initialize(jax.random.PRNGKey(3), jnp.asarray(frames[0])[None])
    state, _ = jax.jit(tracker.step)(
        state, jnp.asarray(frames[1])[None], jnp.float32(1.0)
    )
    path = tmp_path / "pf_state.npz"
    checkpoint.save_state(state, path)
    restored = checkpoint.load_state(path)
    # Every pytree leaf must round-trip exactly (catches new BatchState
    # fields that checkpoint.py forgets to persist, e.g. `valid`).
    leaves_a, treedef_a = jax.tree_util.tree_flatten(state)
    leaves_b, treedef_b = jax.tree_util.tree_flatten(restored)
    assert treedef_a == treedef_b
    def as_np(leaf):
        # Typed PRNG keys (load_state wraps key data) and raw uint32 keys
        # (PRNGKey) must compare by their underlying integer data.
        if jax.dtypes.issubdtype(getattr(leaf, "dtype", None), jax.dtypes.prng_key):
            leaf = jax.random.key_data(leaf)
        return np.asarray(leaf).reshape(-1)

    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(as_np(la), as_np(lb))
    assert state.valid is not None  # step() must have populated it
    # Resuming from the snapshot continues bit-exactly.
    next_a, out_a = jax.jit(tracker.step)(
        state, jnp.asarray(frames[2])[None], jnp.float32(1.0)
    )
    next_b, out_b = jax.jit(tracker.step)(
        restored, jnp.asarray(frames[2])[None], jnp.float32(1.0)
    )
    np.testing.assert_array_equal(np.asarray(out_a["mean"]), np.asarray(out_b["mean"]))
    np.testing.assert_array_equal(
        np.asarray(next_a.particles), np.asarray(next_b.particles)
    )


def test_batch_tracker_multi_observer() -> None:
    """Two cameras viewing the same scene tighten the estimate."""
    velocity = (2.0, 1.0)
    cam1, frames1, _ = make_scene(n_frames=5, velocity=velocity)
    # Second camera: same scene from a slightly different nadir position.
    import scipy.ndimage

    rng = np.random.default_rng(0)
    world = scipy.ndimage.gaussian_filter(rng.normal(size=(500, 500)), 0.8) * 100
    texture = Raster(world, x=(0, 500), y=(500, 0))
    cam2 = Camera(imgsz=256, f=300, xyz=(260, 240, 300), viewdir=(0, -90, 0))
    uv = cam2.grid(step=1, mode="points")
    rays = cam2.uv_to_xyz(uv)
    t = -cam2.xyz[2] / rays[:, 2]
    ground = cam2.xyz + rays * t[:, None]
    frames2 = []
    for i in range(5):
        shifted = np.column_stack(
            [ground[:, 0] - velocity[0] * i, ground[:, 1] - velocity[1] * i]
        )
        frames2.append(
            texture.sample(shifted, bounds_error=False, fill_value=0.0).reshape(
                256, 256
            )
        )
    frames2 = np.stack(frames2)
    points_xy = np.array([[250.0, 250.0], [230.0, 260.0]])
    motion = make_motion(points_xy)
    tracker = BatchTracker(
        camera_vectors=np.stack([cam1.to_array(), cam2.to_array()]),
        corrections=[None, None],
        sigmas=[0.15, 0.15],
        motion=motion,
        config=BatchConfig(n_particles=512, search_size=(41, 41)),
    )
    images = np.stack([frames1, frames2], axis=1)  # (T, O=2, H, W)
    state, outputs = tracker.track(jax.random.PRNGKey(0), images, np.ones(4))
    v = np.asarray(outputs["mean"])[-1, :, 3:5]
    assert np.abs(v - np.asarray(velocity)).max() < 0.75, v


def test_batch_tracker_stream_matches_scan() -> None:
    """Frame-streamed tracking gives the same shapes/finite outputs."""
    cam, frames, _ = make_scene(n_frames=4)
    motion = make_motion(np.array([[250.0, 250.0]]))
    tracker = BatchTracker(
        camera_vectors=cam.to_array()[None], corrections=[None], sigmas=[0.15],
        motion=motion, config=BatchConfig(n_particles=128),
    )
    state, outputs = tracker.track_stream(
        jax.random.PRNGKey(0),
        frames[0][None],
        (f[None] for f in frames[1:]),
        np.ones(3),
    )
    assert len(outputs) == 3
    assert np.isfinite(np.asarray(outputs[-1]["mean"])).all()
    assert int(np.asarray(state.step)) == 3


def test_batch_outputs_to_tracks() -> None:
    import datetime

    from glimpse_tpu.track.batch import to_tracks

    cam, frames, _ = make_scene(n_frames=4)
    motion = make_motion(np.array([[250.0, 250.0], [240.0, 255.0]]))
    tracker = BatchTracker(
        camera_vectors=cam.to_array()[None], corrections=[None], sigmas=[0.15],
        motion=motion,
        config=BatchConfig(n_particles=128, return_covariances=True),
    )
    state, outputs = tracker.track(jax.random.PRNGKey(0), frames[:, None], np.ones(3))
    assert outputs["covariance"].shape == (3, 2, 6, 6)
    t0 = datetime.datetime(2020, 1, 1)
    day = datetime.timedelta(days=1)
    datetimes = [t0 + i * day for i in range(4)]
    tracks = to_tracks(datetimes, day, outputs, covariances=True)
    assert tracks.means.shape == (2, 4, 6)
    assert np.isnan(tracks.means[:, 0]).all()
    assert tracks.covariances.shape == (2, 4, 6, 6)
    assert tracks.xyz_sigma.shape == (2, 4, 3)


def test_stream_track_with_feeder() -> None:
    from glimpse_tpu.track.feeder import FrameFeeder, stream_track

    cam, frames, _ = make_scene(n_frames=4)
    motion = make_motion(np.array([[250.0, 250.0]]))
    tracker = BatchTracker(
        camera_vectors=cam.to_array()[None], corrections=[None], sigmas=[0.15],
        motion=motion, config=BatchConfig(n_particles=128),
    )
    observers = [[f for f in frames]]  # raw arrays feed directly
    feeder = FrameFeeder(observers, prefetch=2)
    assert len(feeder) == 4
    state, outputs = stream_track(
        tracker, jax.random.PRNGKey(0), observers, np.ones(3)
    )
    assert len(outputs) == 3
    assert np.isfinite(np.asarray(outputs[-1]["mean"])).all()


def test_from_observers_bridge(tmp_path) -> None:
    """Device tracker built from host Observers tracks a real image pair."""
    import datetime
    from pathlib import Path

    from glimpse_tpu import Image
    from glimpse_tpu.track import Observer
    from glimpse_tpu.track.feeder import stream_track

    src = Path(__file__).parent / "assets" / "AK10b_20141013_020336.JPG"
    import shutil

    t0 = datetime.datetime(2020, 1, 1)
    day = datetime.timedelta(days=1)
    paths = []
    for i in range(3):
        p = tmp_path / f"f{i}.jpg"
        shutil.copy(src, p)
        paths.append(p)
    cam_args = {"imgsz": (200, 134), "fmm": 20, "sensorsz": (23.6, 15.8),
                "xyz": (0, 0, 0), "viewdir": (0, 0, 0)}
    images = [Image(p, cam=dict(cam_args), datetime=t0 + i * day) for i, p in enumerate(paths)]
    obs = Observer(images, sigma=0.3)
    # A world point in front of the camera that projects mid-frame.
    xyz = np.asarray(images[0].cam.uv_to_xyz(np.array([[100.0, 67.0]]), depth=50.0))
    motion = BatchMotion(
        kind="cartesian",
        xy=jnp.asarray(xyz[:, 0:2], jnp.float32),
        xy_sigma=jnp.full((1, 2), 0.1, jnp.float32),
        v_mean=jnp.zeros((1, 3), jnp.float32),
        v_sigma=jnp.full((1, 3), 0.05, jnp.float32),
        a_mean=jnp.zeros((1, 3), jnp.float32),
        a_sigma=jnp.zeros((1, 3), jnp.float32),
        slope_sigma=jnp.zeros((1,), jnp.float32),
        dem=DeviceRaster.constant(float(xyz[0, 2])),
        dem_sigma=DeviceRaster.constant(0.05),
        use_dem_sigma=True,
    )
    tracker = BatchTracker.from_observers(
        [obs], motion, config=BatchConfig(n_particles=64, search_size=(31, 31))
    )
    state, outputs = stream_track(
        tracker, jax.random.PRNGKey(0), [obs.images], np.ones(2)
    )
    # Static scene: the point should stay put.
    mean = np.asarray(outputs[-1]["mean"])[0]
    np.testing.assert_allclose(mean[0:2], xyz[0, 0:2], atol=0.5)


def test_batch_tracker_oblique_camera_dem_prior() -> None:
    """Oblique view of a drifting surface with a DEM elevation prior —
    the real glacier geometry (perspective foreshortening, 3-D motion)."""
    import scipy.ndimage

    rng = np.random.default_rng(5)
    world = scipy.ndimage.gaussian_filter(rng.normal(size=(800, 800)), 1.0) * 80
    texture = Raster(world, x=(-200, 600), y=(600, -200))
    # Camera 250 m up, pitched down 40 degrees, looking north (+y).
    cam = Camera(imgsz=(320, 240), f=400, xyz=(200, -100, 250),
                 viewdir=(0, -40, 0))
    uv = cam.grid(step=1, mode="points")
    rays = cam.uv_to_xyz(uv)
    t = -cam.xyz[2] / rays[:, 2]
    ground = cam.xyz + rays * t[:, None]
    velocity = (1.5, 1.0)
    frames = []
    for i in range(6):
        shifted = ground[:, 0:2] - np.asarray(velocity) * i
        frames.append(
            texture.sample(shifted, bounds_error=False, fill_value=0.0).reshape(
                240, 320
            )
        )
    frames = np.stack(frames)
    # Points on the visible surface (z = 0), moderate range.
    points_xy = np.array([[180.0, 120.0], [220.0, 150.0], [200.0, 100.0]])
    N = len(points_xy)
    motion = BatchMotion(
        kind="cartesian",
        xy=jnp.asarray(points_xy, jnp.float32),
        xy_sigma=jnp.full((N, 2), 1.0, jnp.float32),
        v_mean=jnp.zeros((N, 3), jnp.float32),
        v_sigma=jnp.full((N, 3), 2.0, jnp.float32).at[:, 2].set(0.05),
        a_mean=jnp.zeros((N, 3), jnp.float32),
        a_sigma=jnp.full((N, 3), 0.1, jnp.float32).at[:, 2].set(0.01),
        slope_sigma=jnp.zeros((N,), jnp.float32),
        dem=DeviceRaster.constant(0.0),
        dem_sigma=DeviceRaster.constant(0.5),
        use_dem_sigma=True,
    )
    tracker = BatchTracker(
        camera_vectors=cam.to_array()[None], corrections=[None], sigmas=[0.2],
        motion=motion,
        config=BatchConfig(n_particles=1024, search_size=(41, 41)),
    )
    state, outputs = tracker.track(jax.random.PRNGKey(2), frames[:, None], np.ones(5))
    means = np.asarray(outputs["mean"])
    # World velocity recovered despite oblique perspective.
    v = means[-1, :, 0:2] - points_xy  # displacement over 5 days
    expected = np.asarray(velocity) * 5
    assert np.median(np.abs(v - expected)) < 1.5, v
    # z stays near the DEM prior.
    assert np.abs(means[-1, :, 2]).max() < 1.5


def test_batch_config_rejects_invalid_modes() -> None:
    import pytest as _pytest

    from glimpse_tpu.track.batch import BatchConfig

    with _pytest.raises(ValueError, match="sse_sample_mode"):
        BatchConfig(sse_sample_mode="einsumm")
    with _pytest.raises(ValueError, match="extract_mode"):
        BatchConfig(extract_mode="onehot")
    with _pytest.raises(ValueError, match="resample_method"):
        BatchConfig(resample_method="multinomial-ish")
    with _pytest.raises(ValueError, match="interpolation_order"):
        BatchConfig(interpolation_order=2)


def test_batch_tracker_with_elevation_correction() -> None:
    """A (radius, refraction) correction tuple flows through the jitted step
    and matches the host Camera's corrected projection."""
    from glimpse_tpu import Camera
    from glimpse_tpu.ops import projection

    cam = Camera(imgsz=256, f=300, xyz=(0, 0, 100), viewdir=(0, -5, 0),
                 correction=True)
    xyz = np.array([[2000.0, 3000.0, 50.0], [500.0, 1500.0, 80.0]])
    host_uv = cam.xyz_to_uv(xyz)
    dev_uv = np.asarray(
        jax.jit(
            lambda v, x: projection.project(
                v, x, correction=cam._correction_tuple, xp=jnp
            )
        )(jnp.asarray(cam.to_array(), jnp.float32), jnp.asarray(xyz, jnp.float32))
    )
    np.testing.assert_allclose(dev_uv, host_uv, atol=1e-2)

    # And end-to-end: a tracker built with the tuple runs and stays finite.
    rng = np.random.default_rng(5)
    frames = np.stack([rng.random((2, 256, 256)).astype(np.float32)] * 3)
    motion = make_motion(np.array([[80.0, 120.0], [150.0, 90.0]]), v_sigma=1.0)
    cfg = BatchConfig(n_particles=64, template_size=(9, 9), search_size=(19, 19))
    tracker = BatchTracker(
        camera_vectors=np.stack([cam.to_array()] * 2),
        corrections=[cam._correction_tuple, None],
        sigmas=[0.3, 0.3],
        motion=motion,
        config=cfg,
    )
    _, out = tracker.track(jax.random.PRNGKey(0), frames, np.ones(2, np.float32))
    assert np.isfinite(np.asarray(out["mean"])).all()


def test_batch_tracker_viewshed_validity() -> None:
    """Reference parity (tracker.py:91-95): points on non-visible viewshed
    cells are rejected at construction."""
    import pytest as _pytest

    from glimpse_tpu.raster import Raster

    vs = Raster(np.array([[1.0, 0.0], [1.0, 1.0]]), x=(0, 64), y=(64, 0))
    motion = make_motion(np.array([[16.0, 48.0], [48.0, 48.0]]))  # 2nd not visible
    cam = np.zeros(20, np.float32)
    with _pytest.raises(ValueError, match="non-visible"):
        BatchTracker([cam], [None], [0.3], motion, viewshed=vs)
    # All-visible points construct fine.
    motion_ok = make_motion(np.array([[16.0, 48.0], [16.0, 16.0]]))
    BatchTracker([cam], [None], [0.3], motion_ok, viewshed=vs)


def test_batch_motion_from_host_motions() -> None:
    """Migration bridge: stack host per-point motion models into BatchMotion
    and track (host pattern: Tracker.track([motion, motion, ...]))."""
    import datetime

    from glimpse_tpu.raster import Raster
    from glimpse_tpu.track import CartesianMotion

    day = datetime.timedelta(days=1)
    dem = Raster(np.zeros((8, 8)), x=(0, 128), y=(128, 0))
    sig = Raster(np.full((8, 8), 0.2), x=(0, 128), y=(128, 0))
    motions = [
        CartesianMotion(
            xy=(40.0 + 10 * i, 60.0), time_unit=day, dem=dem, dem_sigma=sig,
            xy_sigma=(1, 1), vxyz=(0.5, 0, 0), vxyz_sigma=(1, 1, 0.1),
            axyz_sigma=(0.1, 0.1, 0),
        )
        for i in range(3)
    ]
    batch = BatchMotion.from_motions(motions)
    assert batch.kind == "cartesian"
    assert batch.n_points == 3
    assert batch.use_dem_sigma
    np.testing.assert_allclose(np.asarray(batch.xy)[:, 0], [40, 50, 60])
    np.testing.assert_allclose(np.asarray(batch.v_mean)[0], [0.5, 0, 0])
    # It tracks end-to-end.
    cam = np.array([64, 64, 200, 0, -90, 0, 128, 128, 100, 100, 64, 64,
                    0, 0, 0, 0, 0, 0, 0, 0], np.float32)
    frames = np.random.default_rng(0).random((3, 1, 128, 128)).astype(np.float32)
    cfg = BatchConfig(n_particles=32, template_size=(9, 9), search_size=(19, 19))
    tracker = BatchTracker([cam], [None], [0.3], batch, config=cfg)
    _, out = tracker.track(jax.random.PRNGKey(0), frames, np.ones(2, np.float32))
    assert np.isfinite(np.asarray(out["mean"])).all()

    # Mixed classes are rejected.
    from glimpse_tpu.track import CylindricalMotion

    other = CylindricalMotion(xy=(40, 60), time_unit=day, dem=dem)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="same class"):
        BatchMotion.from_motions([motions[0], other])


def test_polar_motion_distributions_match_host() -> None:
    """Batch cylindrical initialize/evolve reproduce the host model's
    particle distributions (moments over many particles)."""
    import datetime

    from glimpse_tpu.raster import Raster
    from glimpse_tpu.track import CylindricalMotion

    day = datetime.timedelta(days=1)
    dem = Raster(np.zeros((8, 8)), x=(0, 256), y=(256, 0))
    host = CylindricalMotion(
        xy=(128.0, 128.0), time_unit=day, dem=dem, dem_sigma=None, n=40000,
        xy_sigma=(2, 2), vrthz=(3.0, np.pi / 4, 0.0),
        vrthz_sigma=(0.5, 0.1, 0.0), arthz=(0.2, 0.0, 0.0),
        arthz_sigma=(0.05, 0.02, 0.0), seed=1,
    )
    hp = host.initialize_particles()
    batch = BatchMotion.from_motions([host])
    bp = np.asarray(batch.initialize(jax.random.PRNGKey(1), 40000))[0]
    # Initial velocity distribution: mean and covariance agree.
    np.testing.assert_allclose(
        bp[:, 3:5].mean(axis=0), hp[:, 3:5].mean(axis=0), atol=0.03
    )
    np.testing.assert_allclose(
        np.cov(bp[:, 3:5].T), np.cov(hp[:, 3:5].T), atol=0.05
    )
    # One evolution step: radial/tangential acceleration semantics agree.
    hp2 = hp.copy()
    host.evolve_particles(hp2, dt=day)
    bp2 = np.asarray(
        batch.evolve(jax.random.PRNGKey(2), bp[None], jnp.float32(1.0))
    )[0]
    np.testing.assert_allclose(
        bp2[:, 3:6].mean(axis=0), hp2[:, 3:6].mean(axis=0), atol=0.03
    )
    np.testing.assert_allclose(
        bp2[:, 0:2].mean(axis=0), hp2[:, 0:2].mean(axis=0), atol=0.1
    )
    np.testing.assert_allclose(
        np.cov(bp2[:, 3:5].T), np.cov(hp2[:, 3:5].T), atol=0.06
    )


def test_tangent_motion_distributions_match_host() -> None:
    """Batch tangent initialize/evolve match the host model's moments,
    including the slope-scaled z random walk."""
    import datetime

    from glimpse_tpu.raster import Raster
    from glimpse_tpu.track import TangentCartesianMotion

    day = datetime.timedelta(days=1)
    rng = np.random.default_rng(0)
    dem = Raster(rng.normal(0, 1, (8, 8)), x=(0, 256), y=(256, 0))
    sig = Raster(np.full((8, 8), 0.3), x=(0, 256), y=(256, 0))
    host = TangentCartesianMotion(
        xy=(128.0, 128.0), time_unit=day, dem=dem, dem_sigma=sig, n=40000,
        xy_sigma=(2, 2), vxy=(1.0, 0.5), vxy_sigma=(0.5, 0.5),
        axy_sigma=(0.1, 0.1), slope_sigma=0.2, seed=3,
    )
    hp = host.initialize_particles()
    batch = BatchMotion.from_motions([host])
    assert batch.kind == "tangent"
    bp = np.asarray(batch.initialize(jax.random.PRNGKey(3), 40000))[0]
    np.testing.assert_allclose(
        bp[:, 0:3].mean(axis=0), hp[:, 0:3].mean(axis=0), atol=0.1
    )
    np.testing.assert_allclose(
        bp[:, 3:5].mean(axis=0), hp[:, 3:5].mean(axis=0), atol=0.03
    )
    hp2 = hp.copy()
    host.evolve_particles(hp2, dt=day)
    bp2 = np.asarray(
        batch.evolve(jax.random.PRNGKey(4), bp[None], jnp.float32(1.0))
    )[0]
    np.testing.assert_allclose(
        bp2[:, 0:3].mean(axis=0), hp2[:, 0:3].mean(axis=0), atol=0.1
    )
    # z variance grows with the slope-scaled random walk in both.
    np.testing.assert_allclose(
        bp2[:, 2].std(), hp2[:, 2].std(), rtol=0.15
    )


def test_batch_tracker_runs_in_bfloat16() -> None:
    """Non-default dtypes keep the scan carry stable (bfloat16 smoke)."""
    rng = np.random.default_rng(4)
    frames = rng.random((3, 1, 64, 64)).astype(np.float32)
    motion = make_motion(np.array([[32.0, 32.0]]))
    cam = np.array([32, 32, 100, 0, -90, 0, 64, 64, 50, 50, 32, 32,
                    0, 0, 0, 0, 0, 0, 0, 0], np.float32)
    cfg = BatchConfig(n_particles=32, template_size=(7, 7),
                      search_size=(15, 15), dtype=jnp.bfloat16)
    tracker = BatchTracker([cam], [None], [0.3], motion, config=cfg)
    _, out = tracker.track(jax.random.PRNGKey(0), frames, np.ones(2, np.float32))
    mean = np.asarray(out["mean"], np.float32)
    assert mean.dtype == np.float32 and np.isfinite(mean).all()


def test_batch_config_rejects_even_pallas_highpass() -> None:
    import pytest as _pytest

    with _pytest.raises(ValueError, match="odd highpass_size"):
        BatchConfig(highpass_mode="pallas", highpass_size=(4, 4))
    with _pytest.raises(ValueError, match="at most 49"):
        BatchConfig(highpass_mode="pallas", highpass_size=(9, 9))


def test_per_frame_camera_vectors_match_constant() -> None:
    """track_stream with a constant per-frame camera sequence reproduces the
    constant-camera run; per-frame viewdirs are the stabilization hook."""
    cam, frames, _ = make_scene(n_frames=5)
    rng = np.random.default_rng(1)
    points_xy = rng.uniform(180, 320, size=(4, 2))
    cfg = BatchConfig(n_particles=128, template_size=(11, 11), search_size=(25, 25))

    def run(camseq):
        tracker = BatchTracker(
            camera_vectors=cam.to_array()[None], corrections=[None],
            sigmas=[0.15], motion=make_motion(points_xy), config=cfg,
        )
        _, outputs = tracker.track_stream(
            jax.random.PRNGKey(0), frames[0][None],
            (f[None] for f in frames[1:]), np.ones(len(frames) - 1),
            camera_vectors_seq=camseq,
        )
        return np.asarray(outputs[-1]["mean"])

    constant = np.tile(cam.to_array()[None, None], (len(frames), 1, 1))
    np.testing.assert_allclose(run(constant), run(None), atol=1e-5)


def _host_lockstep_masked(frames, cam, starts, n_particles, obs_present,
                          init_xy, init_v, accel, resample_u, sigma=0.15,
                          late_template_b=False, obs_present_a=None):
    """Host Tracker driven with injected noise; observer 1 present per
    ``obs_present`` (reference skip semantics via imgs=[t, None])."""
    import copy
    import datetime

    from glimpse_tpu.raster import Raster
    from glimpse_tpu.track import CartesianMotion, Observer, Tracker

    imgsz = frames.shape[-1]
    cx, cy = cam.xyz[0], cam.xyz[1]
    t0 = datetime.datetime(2020, 1, 1)
    day = datetime.timedelta(days=1)
    rasters = [
        Raster(
            f,
            x=(cx - imgsz / 2, cx + imgsz / 2),
            y=(cy + imgsz / 2, cy - imgsz / 2),
            datetime=t0 + i * day,
        )
        for i, f in enumerate(frames)
    ]
    observers = [Observer(rasters, sigma=sigma), Observer(rasters, sigma=sigma)]
    host = Tracker(observers)
    n_points, n_frames = len(starts), len(frames)
    means = np.zeros((n_points, n_frames - 1, 2))
    for i in range(n_points):
        worker = copy.copy(host)
        worker.reset()
        motion = CartesianMotion(
            xy=tuple(starts[i]), time_unit=day, dem=0.0, dem_sigma=None,
            n=n_particles, xy_sigma=(1.5, 1.5), vxyz_sigma=(0.5, 0.5, 0),
            axyz_sigma=(0.2, 0.2, 0),
        )
        particles = np.zeros((n_particles, 6))
        particles[:, 0:2] = starts[i] + 1.5 * init_xy[i]
        particles[:, 3:6] = np.array([0.5, 0.5, 0.0]) * init_v[i]
        worker.particles = particles
        worker.initialize_weights()
        worker.initialize_template(obs=0, img=0, tile_size=(15, 15))
        b_first = None
        if late_template_b:
            # Observer B has no image at the template frame: its template
            # initializes at its first available frame, from the particle
            # state at that step (reference tracker.py:293,335-344).
            b_first = 1 + int(np.argmax(obs_present))
        else:
            worker.initialize_template(obs=1, img=0, tile_size=(15, 15))
        for t in range(1, n_frames):
            axyz = np.array([0.2, 0.2, 0.0]) * accel[t - 1, i]
            worker.particles[:, 0:3] += worker.particles[:, 3:6] + 0.5 * axyz
            worker.particles[:, 3:6] += axyz
            if b_first is not None and t == b_first:
                worker.initialize_template(obs=1, img=t, tile_size=(15, 15))
            a_ok = obs_present_a is None or obs_present_a[t - 1]
            imgs = [t if a_ok else None, t if obs_present[t - 1] else None]
            worker.update_weights(imgs=imgs)
            w = worker.weights / worker.weights.sum()
            means[i, t - 1] = (worker.particles[:, 0:2] * w[:, None]).sum(0)
            positions = (np.arange(n_particles) + resample_u[t - 1, i]) / n_particles
            idx = np.searchsorted(np.cumsum(w), positions)
            worker.particles = worker.particles[idx]
            worker.weights = worker.weights[idx]
    return means


def test_observation_masks_lockstep_matches_host() -> None:
    """Observer B missing ~30% of frames: the device obs_mask path matches
    the host tracker's skip semantics under shared noise draws
    (reference tracker.py:305-374,597-601).

    Thresholds: masking itself is exact (see
    test_fully_masked_observer_equals_single_observer — bit-identical), so
    the residual here is the known fixed-search-window (device) vs
    dynamic-particle-box (host) spline-placement divergence, amplified by
    the two-observer product likelihood. Measured on this scene: unmasked
    two-observer lockstep max 0.066 px / RMSE 0.024 px; the masked run must
    stay within ~2.5x of that, not the single-observer 0.1 px contract."""
    n_points, n_particles, n_frames = 3, 300, 8
    cam, frames, _ = make_scene(n_frames=n_frames, velocity=(1.2, -0.7))
    rng = np.random.default_rng(5)
    starts = rng.uniform(190, 310, size=(n_points, 2))
    noise_rng = np.random.default_rng(99)
    init_xy = noise_rng.standard_normal((n_points, n_particles, 2))
    init_v = noise_rng.standard_normal((n_points, n_particles, 3))
    accel = noise_rng.standard_normal((n_frames - 1, n_points, n_particles, 3))
    resample_u = noise_rng.random((n_frames - 1, n_points))
    # Observer B misses ~30% of observation frames.
    obs_present = np.array([True, False, True, True, False, True, True])

    host_means = _host_lockstep_masked(
        frames, cam, starts, n_particles, obs_present,
        init_xy, init_v, accel, resample_u,
    )

    motion = BatchMotion(
        kind="cartesian",
        xy=jnp.asarray(starts, jnp.float32),
        xy_sigma=jnp.full((n_points, 2), 1.5, jnp.float32),
        v_mean=jnp.zeros((n_points, 3), jnp.float32),
        v_sigma=jnp.full((n_points, 3), 0.5, jnp.float32).at[:, 2].set(0.0),
        a_mean=jnp.zeros((n_points, 3), jnp.float32),
        a_sigma=jnp.full((n_points, 3), 0.2, jnp.float32).at[:, 2].set(0.0),
        slope_sigma=jnp.zeros((n_points,), jnp.float32),
        dem=DeviceRaster.constant(0.0),
        dem_sigma=DeviceRaster.constant(0.0),
        use_dem_sigma=False,
    )
    cfg = BatchConfig(
        n_particles=n_particles, template_size=(15, 15), search_size=(41, 41)
    )
    tracker = BatchTracker(
        camera_vectors=np.stack([cam.to_array(), cam.to_array()]),
        corrections=[None, None], sigmas=[0.15, 0.15],
        motion=motion, config=cfg,
    )
    obs_masks = np.stack(
        [np.ones(n_frames - 1), obs_present.astype(float)], axis=1
    )
    _, outputs = tracker.track(
        jax.random.PRNGKey(0), np.repeat(frames[:, None], 2, axis=1),
        np.ones(n_frames - 1, np.float32),
        noise={
            "init": {
                "xy": jnp.asarray(init_xy, jnp.float32),
                "v": jnp.asarray(init_v, jnp.float32),
            },
            "a": jnp.asarray(accel, jnp.float32),
            "resample_u": jnp.asarray(resample_u, jnp.float32),
        },
        obs_masks=obs_masks,
    )
    batch_means = np.moveaxis(np.asarray(outputs["mean"])[:, :, 0:2], 0, 1)
    diff = np.linalg.norm(batch_means - host_means, axis=-1)
    assert diff.max() < 0.17, diff.max()
    assert np.sqrt((diff**2).mean()) < 0.08, np.sqrt((diff**2).mean())


def test_fully_masked_observer_equals_single_observer() -> None:
    """An observer masked on EVERY frame contributes nothing: the 2-observer
    tracker with observer B fully masked must reproduce the 1-observer
    trajectory bit-exactly (the strongest form of the reference's skip
    semantics, tracker.py:466-492 — a None image is simply not accumulated)."""
    n_points, n_particles, n_frames = 3, 300, 6
    cam, frames, _ = make_scene(n_frames=n_frames, velocity=(1.2, -0.7))
    rng = np.random.default_rng(5)
    starts = rng.uniform(190, 310, size=(n_points, 2))
    noise_rng = np.random.default_rng(99)
    noise = {
        "init": {
            "xy": jnp.asarray(
                noise_rng.standard_normal((n_points, n_particles, 2)),
                jnp.float32,
            ),
            "v": jnp.asarray(
                noise_rng.standard_normal((n_points, n_particles, 3)),
                jnp.float32,
            ),
        },
        "a": jnp.asarray(
            noise_rng.standard_normal((n_frames - 1, n_points, n_particles, 3)),
            jnp.float32,
        ),
        "resample_u": jnp.asarray(
            noise_rng.random((n_frames - 1, n_points)), jnp.float32
        ),
    }
    cfg = BatchConfig(
        n_particles=n_particles, template_size=(15, 15), search_size=(41, 41)
    )

    def run(n_obs, obs_masks):
        motion = make_motion(starts)
        tracker = BatchTracker(
            camera_vectors=np.stack([cam.to_array()] * n_obs),
            corrections=[None] * n_obs, sigmas=[0.15] * n_obs,
            motion=motion, config=cfg,
        )
        _, outputs = tracker.track(
            jax.random.PRNGKey(0),
            np.repeat(frames[:, None], n_obs, axis=1),
            np.ones(n_frames - 1, np.float32),
            noise=noise, obs_masks=obs_masks,
        )
        return np.asarray(outputs["mean"])

    masks = np.stack(
        [np.ones(n_frames - 1), np.zeros(n_frames - 1)], axis=1
    )
    two_obs = run(2, masks)
    one_obs = run(1, None)
    np.testing.assert_array_equal(two_obs, one_obs)


def test_all_observers_masked_step_carries_weights() -> None:
    """A step with every observer masked out receives no information: the
    device path must carry weights over (reference update_weights leaves
    weights unchanged when all observers are skipped)."""
    cam, frames, _ = make_scene(n_frames=4)
    motion = make_motion(np.array([[250.0, 250.0], [230.0, 260.0]]))
    cfg = BatchConfig(n_particles=128, template_size=(11, 11), search_size=(25, 25))
    tracker = BatchTracker(
        camera_vectors=cam.to_array()[None], corrections=[None], sigmas=[0.15],
        motion=motion, config=cfg,
    )
    state = tracker.initialize(jax.random.PRNGKey(0), jnp.asarray(frames[0])[None])
    state, _ = jax.jit(tracker.step)(
        state, jnp.asarray(frames[1])[None], jnp.float32(1.0)
    )
    w_before = np.asarray(state.weights)
    masked, _ = jax.jit(tracker.step)(
        state, jnp.asarray(frames[2])[None], jnp.float32(1.0),
        obs_mask=jnp.zeros(1, jnp.float32),
    )
    # Weights carried through the (identity-free) resample: the multiset of
    # weight values per point is preserved up to resampling replication —
    # with carried weights the systematic resample is driven by them, so
    # compare the weighted mean of the particles instead: it must match a
    # motion-only evolution (no likelihood reweighting).
    unmasked, _ = jax.jit(tracker.step)(
        state, jnp.asarray(frames[2])[None], jnp.float32(1.0),
    )
    # Masked step must NOT equal the unmasked step (information was real)...
    assert not np.allclose(
        np.asarray(masked.weights), np.asarray(unmasked.weights)
    )
    # ...and its resampled weights must be drawn from the carried weight
    # values, not from a fresh likelihood (subset check).
    carried_vals = np.unique(np.round(w_before, 6))
    masked_vals = np.unique(np.round(np.asarray(masked.weights), 6))
    assert np.isin(masked_vals, carried_vals).all()


def test_per_step_viewshed_validity_latches() -> None:
    """Reference parity (tracker.py:106-119,329,334): a point whose
    particles wander onto non-visible viewshed cells MID-SEQUENCE is
    flagged at exactly the evolve step where it happens, and to_tracks
    fault-contains it (NaN from the failing step on, ValueError recorded)
    while other points keep tracking."""
    import datetime

    from glimpse_tpu.track.batch import to_tracks

    velocity = (2.0, 0.0)
    n_frames = 9
    cam, frames, _ = make_scene(n_frames=n_frames, velocity=velocity)
    # Two points: point 0 stays visible; point 1 crosses x = 260 (the
    # invisible half-plane) at step 5 (x_t = 250 + 2 t, order-0 cells of
    # 10 px). Deterministic particles: zero spread, exact velocity.
    motion = make_motion(np.array([[250.0, 200.0], [250.0, 250.0]]))
    motion.xy_sigma = jnp.zeros((2, 2), jnp.float32)
    motion.v_mean = jnp.asarray(
        [[0.0, 0.0, 0.0], [velocity[0], velocity[1], 0.0]], jnp.float32
    )
    motion.v_sigma = jnp.zeros((2, 3), jnp.float32)
    motion.a_sigma = jnp.zeros((2, 3), jnp.float32)
    vs_array = np.ones((50, 50), np.float32)
    vs_array[:, 26:] = 0.0  # world x >= 260 invisible
    vs = Raster(vs_array, x=(0, 500), y=(500, 0))
    tracker = BatchTracker(
        camera_vectors=cam.to_array()[None], corrections=[None],
        sigmas=[0.15], motion=motion,
        config=BatchConfig(n_particles=64), viewshed=vs,
    )
    state, outputs = tracker.track(
        jax.random.PRNGKey(0), frames[:, None], np.ones(n_frames - 1)
    )
    valid = np.asarray(outputs["valid"])  # (T-1, N)
    assert valid.shape == (n_frames - 1, 2)
    assert (valid[:, 0] == 1).all()
    # Point 1: x after evolve at step t (1-based) is 250 + 2t; first
    # x >= 260 at t = 5 -> outputs row index 4.
    assert (valid[:4, 1] == 1).all(), valid[:, 1]
    assert (valid[4:, 1] == 0).all(), valid[:, 1]
    t0 = datetime.datetime(2020, 1, 1)
    day = datetime.timedelta(days=1)
    tracks = to_tracks(
        [t0 + i * day for i in range(n_frames)], day, outputs
    )
    assert tracks.errors[0] is None
    assert isinstance(tracks.errors[1], ValueError)
    assert np.isfinite(tracks.means[1, 1:5]).all()
    assert np.isnan(tracks.means[1, 5:]).all()
    assert np.isfinite(tracks.means[0, 1:]).all()


def test_per_step_nan_validity() -> None:
    """NaN particle components latch the validity flag even without a
    viewshed (reference tracker.py:117-119)."""
    cam, frames, _ = make_scene(n_frames=4)
    motion = make_motion(np.array([[250.0, 250.0], [240.0, 255.0]]))
    # Point 1's acceleration mean is NaN from the start: first evolve
    # produces NaN particles.
    motion.a_mean = jnp.asarray(
        [[0.0, 0.0, 0.0], [np.nan, 0.0, 0.0]], jnp.float32
    )
    tracker = BatchTracker(
        camera_vectors=cam.to_array()[None], corrections=[None],
        sigmas=[0.15], motion=motion, config=BatchConfig(n_particles=64),
    )
    _, outputs = tracker.track(
        jax.random.PRNGKey(0), frames[:, None], np.ones(3)
    )
    valid = np.asarray(outputs["valid"])
    assert (valid[:, 0] == 1).all()
    assert (valid[:, 1] == 0).all()


def test_host_tracker_viewshed_cross_validation() -> None:
    """The host Tracker (reference semantics) errors the same mid-sequence
    viewshed crossing that the device path flags."""
    import datetime

    from glimpse_tpu.track import CartesianMotion, Observer, Tracker

    velocity = (2.0, 0.0)
    n_frames = 9
    cam, frames, _ = make_scene(n_frames=n_frames, velocity=velocity)
    vs_array = np.ones((50, 50), np.float32)
    vs_array[:, 26:] = 0.0
    vs = Raster(vs_array, x=(0, 500), y=(500, 0))
    t0 = datetime.datetime(2020, 1, 1)
    day = datetime.timedelta(days=1)
    imgsz = frames.shape[-1]
    cx, cy = cam.xyz[0], cam.xyz[1]
    rasters = [
        Raster(
            f,
            x=(cx - imgsz / 2, cx + imgsz / 2),
            y=(cy + imgsz / 2, cy - imgsz / 2),
            datetime=t0 + i * day,
        )
        for i, f in enumerate(frames)
    ]
    obs = Observer(rasters, sigma=0.15)
    models = [
        CartesianMotion(
            xy=(250, 200), time_unit=day, dem=0.0, dem_sigma=None, n=16,
            xy_sigma=(0, 0), vxyz=(0, 0, 0), vxyz_sigma=(0, 0, 0),
            axyz_sigma=(0, 0, 0),
        ),
        CartesianMotion(
            xy=(250, 250), time_unit=day, dem=0.0, dem_sigma=None, n=16,
            xy_sigma=(0, 0), vxyz=(velocity[0], velocity[1], 0),
            vxyz_sigma=(0, 0, 0), axyz_sigma=(0, 0, 0),
        ),
    ]
    tracker = Tracker(observers=[obs], viewshed=vs)
    tracks = tracker.track(motion_models=models)
    assert tracks.errors[0] is None
    assert tracks.errors[1] is not None
    assert "non-visible" in str(tracks.errors[1])
    # Failure at evolve step 5: means written through step 4 only.
    assert np.isfinite(tracks.means[1, :5]).all()
    assert np.isnan(tracks.means[1, 5:]).all()


def test_late_starting_observer_template_lockstep() -> None:
    """Observer B first fires at step 4 of a drifting scene (~5.6 px of
    accumulated motion): its template must anchor at that step's particle
    state, not at sequence start (reference template_indices semantics,
    tracker.py:293,335-344). The device obs_mask0/late-template path must
    match the host tracker under shared draws within the masked-lockstep
    tolerance, and beat a t0-anchored template by a wide margin."""
    n_points, n_particles, n_frames = 3, 300, 9
    velocity = (1.2, -0.7)
    cam, frames, _ = make_scene(n_frames=n_frames, velocity=velocity)
    rng = np.random.default_rng(9)
    starts = rng.uniform(200, 300, size=(n_points, 2))
    # Seeds chosen so the single-observer lockstep control stays tight on
    # this scene (lockstep runs are sensitive to near-tie resample flips
    # on weakly textured points; max 0.14 px for this draw).
    noise_rng = np.random.default_rng(11)
    init_xy = noise_rng.standard_normal((n_points, n_particles, 2))
    init_v = noise_rng.standard_normal((n_points, n_particles, 3))
    accel = noise_rng.standard_normal((n_frames - 1, n_points, n_particles, 3))
    resample_u = noise_rng.random((n_frames - 1, n_points))
    # B absent until step 4; afterwards A and B alternate (disjoint), so
    # B's likelihood is the SOLE signal on its steps — any error in B's
    # template anchoring shows directly in the lockstep.
    obs_present = np.array([False, False, False, True, False, True, False, True])
    obs_present_a = np.array([True, True, True, False, True, False, True, False])

    host_means = _host_lockstep_masked(
        frames, cam, starts, n_particles, obs_present,
        init_xy, init_v, accel, resample_u, late_template_b=True,
        obs_present_a=obs_present_a,
    )

    def run_device(obs_mask0):
        motion = BatchMotion(
            kind="cartesian",
            xy=jnp.asarray(starts, jnp.float32),
            xy_sigma=jnp.full((n_points, 2), 1.5, jnp.float32),
            v_mean=jnp.zeros((n_points, 3), jnp.float32),
            v_sigma=jnp.full((n_points, 3), 0.5, jnp.float32).at[:, 2].set(0.0),
            a_mean=jnp.zeros((n_points, 3), jnp.float32),
            a_sigma=jnp.full((n_points, 3), 0.2, jnp.float32).at[:, 2].set(0.0),
            slope_sigma=jnp.zeros((n_points,), jnp.float32),
            dem=DeviceRaster.constant(0.0),
            dem_sigma=DeviceRaster.constant(0.0),
            use_dem_sigma=False,
        )
        cfg = BatchConfig(
            n_particles=n_particles, template_size=(15, 15),
            search_size=(41, 41),
        )
        tracker = BatchTracker(
            camera_vectors=np.stack([cam.to_array(), cam.to_array()]),
            corrections=[None, None], sigmas=[0.15, 0.15],
            motion=motion, config=cfg,
        )
        obs_masks = np.stack(
            [obs_present_a.astype(float), obs_present.astype(float)], axis=1
        )
        images = np.repeat(frames[:, None], 2, axis=1).copy()
        # Observer B has NO image at the template frame — the realistic
        # late-start situation. The late-template path must never read it.
        # (Rolled texture: an informative-but-WRONG fabricated frame.)
        images[0, 1] = np.roll(frames[0], 10, axis=1)
        _, outputs = tracker.track(
            jax.random.PRNGKey(0), images,
            np.ones(n_frames - 1, np.float32),
            noise={
                "init": {
                    "xy": jnp.asarray(init_xy, jnp.float32),
                    "v": jnp.asarray(init_v, jnp.float32),
                },
                "a": jnp.asarray(accel, jnp.float32),
                "resample_u": jnp.asarray(resample_u, jnp.float32),
            },
            obs_masks=obs_masks, obs_mask0=obs_mask0,
        )
        return np.moveaxis(np.asarray(outputs["mean"])[:, :, 0:2], 0, 1)

    batch_means = run_device(np.array([True, False]))
    diff = np.linalg.norm(batch_means - host_means, axis=-1)
    assert diff.max() < 0.25, diff.max()
    assert np.sqrt((diff**2).mean()) < 0.1, np.sqrt((diff**2).mean())
    # Negative control: WITHOUT the late-template plan the tracker builds
    # B's template from the nonexistent frame-0 image (the pre-round-4
    # behavior forced callers to fabricate one) and must diverge far.
    stale_means = run_device(None)
    stale_diff = np.linalg.norm(stale_means - host_means, axis=-1)
    assert stale_diff.max() > 3 * diff.max(), (
        stale_diff.max(), diff.max()
    )


@pytest.mark.slow
def test_late_template_stream_matches_track() -> None:
    """track_stream with obs_mask0/late templates matches the in-memory
    segmented-scan path bit-exactly."""
    n_frames = 7
    cam, frames, _ = make_scene(n_frames=n_frames, velocity=(1.0, 0.5))
    starts = np.array([[250.0, 250.0], [230.0, 260.0], [270.0, 240.0]])
    motion = make_motion(starts)
    cfg = BatchConfig(n_particles=128, template_size=(11, 11), search_size=(25, 25))
    obs_present = np.array([False, True, False, True, True, True])
    obs_masks = np.stack(
        [np.ones(n_frames - 1), obs_present.astype(float)], axis=1
    )
    obs_mask0 = np.array([True, False])

    def build():
        return BatchTracker(
            camera_vectors=np.stack([cam.to_array()] * 2),
            corrections=[None, None], sigmas=[0.15, 0.15],
            motion=make_motion(starts), config=cfg,
        )

    images = np.repeat(frames[:, None], 2, axis=1)
    dts = np.ones(n_frames - 1, np.float32)
    key = jax.random.PRNGKey(3)
    _, out_scan = build().track(
        key, images, dts, obs_masks=obs_masks, obs_mask0=obs_mask0
    )
    _, out_stream = build().track_stream(
        key, images[0], iter(images[1:]), dts, obs_masks=obs_masks,
        obs_mask0=obs_mask0,
    )
    stream_means = np.stack([np.asarray(o["mean"]) for o in out_stream])
    np.testing.assert_allclose(
        np.asarray(out_scan["mean"]), stream_means, atol=1e-3
    )  # one fused program vs per-step jit: fusion-order float noise
