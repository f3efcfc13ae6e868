"""End-to-end particle-filter tests on synthetic image sequences.

The reference has no tracker tests (SURVEY.md section 4); these establish
the behavioral contract: a textured surface translating at a known velocity
is recovered by the filter within sub-pixel tolerance.
"""
import datetime

import numpy as np
import pytest
import scipy.ndimage

from glimpse_tpu.raster import Raster
from glimpse_tpu.track import (
    CartesianMotion,
    CylindricalMotion,
    Observer,
    TangentCartesianMotion,
    Tracker,
    Tracks,
)

T0 = datetime.datetime(2020, 1, 1)
DAY = datetime.timedelta(days=1)


def make_texture(size: int = 120, seed: int = 0) -> np.ndarray:
    # Sharp texture: strong high-frequency content -> strong NCC likelihood.
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(size, size))
    return scipy.ndimage.gaussian_filter(a, 0.8) * 100 + 100


def make_observer(n_frames: int = 4, shift=(2.0, 1.0), size: int = 120) -> Observer:
    """Frames of a texture translating by `shift` pixels per day.

    World frame: x right, y up (descending raster rows), d = (1, -1), so a
    texture shifting by (+sx, +sy) in world units moves content right and up.
    """
    base = make_texture(size)
    frames = []
    for i in range(n_frames):
        # Shift world content by i*shift: sample base at (x - i sx, y - i sy).
        f = scipy.ndimage.shift(
            base, (i * shift[1] * -1 * -1, i * shift[0]), order=1, mode="nearest"
        )
        frames.append(f)
    # NOTE on rows: y descending -> +sy world shift = -sy rows. We shift rows
    # by +sy * ... ; see assertion below which measures the actual velocity.
    images = [
        Raster(f, x=(0, size), y=(size, 0), datetime=T0 + i * DAY)
        for i, f in enumerate(frames)
    ]
    return Observer(images, sigma=0.3)


def test_tracker_recovers_known_velocity() -> None:
    shift = (2.0, 1.0)  # pixels/day in array (col, row) direction
    size = 120
    n_frames = 8
    obs = make_observer(n_frames=n_frames, shift=shift, size=size)
    obs.sigma = 0.15
    # Content shifts +2 cols, +1 rows per day; with the y-descending grid
    # that is world velocity (+2, -1).
    motion = CartesianMotion(
        xy=(60.0, 60.0),
        time_unit=DAY,
        dem=0.0,
        dem_sigma=None,
        n=2000,
        xy_sigma=(2, 2),
        vxyz=(0, 0, 0),
        vxyz_sigma=(3, 3, 0),
        axyz_sigma=(0.25, 0.25, 0),
        seed=42,
    )
    tracker = Tracker([obs], seed=42)
    tracks = tracker.track([motion], tile_size=(15, 15))
    assert tracks.means.shape == (1, n_frames, 6)
    # Position track: the point should follow the texture within ~1 px.
    t = n_frames - 1
    expected_xy = np.array([60.0 + shift[0] * t, 60.0 - shift[1] * t])
    np.testing.assert_allclose(tracks.xyz[0, -1, :2], expected_xy, atol=1.0)
    # Velocity converges to the true velocity by the end of the sequence.
    v = tracks.vxyz[0, -1, :2]
    np.testing.assert_allclose(v, [shift[0], -shift[1]], atol=0.75)
    # Position uncertainty shrinks below the prior.
    assert np.all(tracks.sigmas[0, -1, 0:2] < 2.0)


def test_tracker_fault_containment() -> None:
    obs = make_observer(n_frames=3)
    good = CartesianMotion(
        xy=(60.0, 60.0), time_unit=DAY, dem=0.0, n=200, xy_sigma=(2, 2),
        vxyz_sigma=(2, 2, 0), seed=0,
    )
    bad = CartesianMotion(
        xy=(10000.0, 10000.0), time_unit=DAY, dem=0.0, n=200, xy_sigma=(1, 1),
        vxyz_sigma=(1, 1, 0), seed=0,
    )
    tracker = Tracker([obs], seed=0)
    tracks = tracker.track([good, bad], tile_size=(15, 15))
    assert tracks.success[0]
    assert not tracks.success[1]
    assert tracks.errors[1] is not None


def test_tracker_single_model_raises() -> None:
    obs = make_observer(n_frames=3)
    bad = CartesianMotion(
        xy=(10000.0, 10000.0), time_unit=DAY, dem=0.0, n=50, seed=0
    )
    tracker = Tracker([obs], seed=0)
    with pytest.raises(Exception):
        tracker.track([bad])


def test_tracker_viewshed_validation() -> None:
    obs = make_observer(n_frames=3)
    viewshed = Raster(np.zeros((120, 120)), x=(0, 120), y=(120, 0))
    motion = CartesianMotion(
        xy=(60.0, 60.0), time_unit=DAY, dem=0.0, n=50, seed=0
    )
    tracker = Tracker([obs], viewshed=viewshed, seed=0)
    with pytest.raises(ValueError):
        tracker.track([motion])


def test_tracker_return_particles_and_covariances() -> None:
    obs = make_observer(n_frames=3)
    motion = CartesianMotion(
        xy=(60.0, 60.0), time_unit=DAY, dem=0.0, n=100, xy_sigma=(2, 2),
        vxyz_sigma=(2, 2, 0), seed=1,
    )
    tracker = Tracker([obs], seed=1)
    tracks = tracker.track(
        [motion], tile_size=(15, 15), return_covariances=True, return_particles=True
    )
    assert tracks.covariances.shape == (1, 3, 6, 6)
    assert tracks.particles.shape == (1, 3, 100, 6)
    assert tracks.weights.shape == (1, 3, 100)
    assert tracks.xyz_sigma is not None


def test_tangent_motion_tracks() -> None:
    obs = make_observer(n_frames=3)
    motion = TangentCartesianMotion(
        xy=(60.0, 60.0), time_unit=DAY, dem=0.0, dem_sigma=0, n=500,
        xy_sigma=(2, 2), vxy_sigma=(4, 4), slope_sigma=0.0, seed=2,
    )
    tracker = Tracker([obs], seed=2)
    tracks = tracker.track([motion], tile_size=(15, 15))
    assert np.isfinite(tracks.means[0, -1, 0:2]).all()


def test_cylindrical_motion_initialization() -> None:
    motion = CylindricalMotion(
        xy=(0.0, 0.0), time_unit=DAY, dem=0.0, n=1000,
        vrthz=(5.0, np.pi / 2, 0.0), vrthz_sigma=(0.1, 0.01, 0), seed=3,
    )
    p = motion.initialize_particles()
    # Speed 5 at angle pi/2 -> velocity along +y.
    np.testing.assert_allclose(p[:, 3].mean(), 0.0, atol=0.1)
    np.testing.assert_allclose(p[:, 4].mean(), 5.0, atol=0.1)


def test_tracks_reverse_and_fusion() -> None:
    datetimes = np.array([T0 + i * DAY for i in range(3)])
    means = np.arange(1, 1 + 2 * 3 * 6, dtype=float).reshape(2, 3, 6)
    sigmas = np.ones((2, 3, 6))
    t1 = Tracks(datetimes=datetimes, time_unit=DAY, means=means, sigmas=sigmas)
    t2 = Tracks(
        datetimes=datetimes, time_unit=DAY, means=means + 1.0, sigmas=sigmas
    )
    fused = Tracks.from_multiple([t1, t2])
    np.testing.assert_allclose(fused.means, means + 0.5)
    np.testing.assert_allclose(fused.sigmas, np.sqrt(0.5))
    t1.reverse()
    np.testing.assert_allclose(t1.means[:, ::-1], means)
    # Time-averaged velocity with full correlation.
    mean, sigma = t2.average()
    assert mean.shape == (2, 6)
    np.testing.assert_allclose(sigma, 1.0)


def test_observer_split_and_subset() -> None:
    obs = make_observer(n_frames=4)
    parts = obs.split(2, overlap=1)
    assert len(parts) == 2
    assert parts[0].datetimes[-1] == parts[1].datetimes[0]
    sub = obs.subset(start=T0 + DAY)
    assert len(sub.images) == 3


def test_split_track_fuse_workflow() -> None:
    """Sequence-parallel workflow: chunk the observer, track each chunk,
    fuse forward and backward runs by inverse variance (SURVEY.md section 5:
    the reference's long-sequence strategy)."""
    obs = make_observer(n_frames=6, shift=(1.5, 0.5))
    obs.sigma = 0.15

    def fresh_motion(seed):
        # Nonzero z noise everywhere: inverse-variance fusion requires
        # nonzero sigmas in all six state components.
        return CartesianMotion(
            xy=(60.0, 60.0), time_unit=DAY, dem=0.0, dem_sigma=0.2, n=800,
            xy_sigma=(1.5, 1.5), vxyz_sigma=(3, 3, 0.1),
            axyz_sigma=(0.2, 0.2, 0.01), seed=seed,
        )

    # Forward pass.
    forward = Tracker([obs], seed=1).track([fresh_motion(1)], tile_size=(15, 15))
    # Backward pass: reverse the observer's images.
    rev_images = []
    for img, dt in zip(obs.images[::-1], obs.datetimes):
        r = img.copy()
        r.datetime = dt
        rev_images.append(r)
    obs_rev = Observer(rev_images, sigma=obs.sigma)
    backward = Tracker([obs_rev], seed=2).track(
        [fresh_motion(2)], tile_size=(15, 15)
    )
    backward.reverse()
    backward.datetimes = forward.datetimes
    # Negate velocities measured backward in time.
    backward.means[:, :, 3:6] *= -1
    fused = Tracks.from_multiple([forward, backward])
    assert fused.means.shape == forward.means.shape
    # Fused uncertainty is no larger than either pass where both are valid.
    both = ~np.isnan(forward.sigmas[..., 0]) & ~np.isnan(backward.sigmas[..., 0])
    assert (
        fused.sigmas[..., 0][both]
        <= np.minimum(forward.sigmas[..., 0], backward.sigmas[..., 0])[both] + 1e-9
    ).all()
    # Observer.split chunking covers the full sequence with overlap.
    parts = obs.split(2, overlap=1)
    assert parts[0].datetimes[-1] == parts[1].datetimes[0]
    assert len(parts[0].images) + len(parts[1].images) == len(obs.images) + 1


def test_tracker_parallel_threads_match_serial_structure() -> None:
    """Thread-parallel tracking produces one valid result per model."""
    obs = make_observer(n_frames=3)
    models = [
        CartesianMotion(
            xy=(55.0 + 5 * i, 60.0), time_unit=DAY, dem=0.0, n=200,
            xy_sigma=(2, 2), vxyz_sigma=(2, 2, 0), seed=i,
        )
        for i in range(3)
    ]
    tracks = Tracker([obs], seed=0).track(models, tile_size=(15, 15), parallel=3)
    assert tracks.means.shape == (3, 3, 6)
    assert tracks.success.all()
    assert np.isfinite(tracks.means[:, -1, 0]).all()


def test_animate_headless(tmp_path) -> None:
    """Tracks.animate and Observer.animate render under the Agg backend."""
    import datetime

    import matplotlib

    matplotlib.use("Agg", force=True)

    from glimpse_tpu.raster import Raster
    from glimpse_tpu.track import CartesianMotion, Observer, Tracker

    rng = np.random.default_rng(0)
    t0 = datetime.datetime(2020, 1, 1)
    day = datetime.timedelta(days=1)
    frames = rng.random((4, 64, 64)).astype(np.float32)
    rasters = [
        Raster(f, x=(0, 64), y=(64, 0), datetime=t0 + i * day)
        for i, f in enumerate(frames)
    ]
    obs = Observer(rasters, sigma=0.3)
    motion = CartesianMotion(
        xy=(32.0, 32.0), time_unit=day, dem=0.0, dem_sigma=None, n=50,
        xy_sigma=(1, 1), vxyz_sigma=(1, 1, 0), seed=0,
    )
    tracker = Tracker([obs], seed=0)
    tracks = tracker.track([motion], tile_size=(9, 9), return_particles=True)
    anim = tracks.animate(track=0, images=False)
    anim.save(tmp_path / "track.gif", writer="pillow", fps=2)
    assert (tmp_path / "track.gif").stat().st_size > 0
    anim2 = obs.animate(uv=(32, 32), size=(21, 21))
    anim2.save(tmp_path / "tiles.gif", writer="pillow", fps=2)
    assert (tmp_path / "tiles.gif").stat().st_size > 0
