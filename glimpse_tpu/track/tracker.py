"""Bayesian particle filter tracking world points through image sequences.

API parity with the reference ``Tracker``
(``/root/reference/src/glimpse/track/tracker.py:22``): per-model particle
filters driven by NCC observation likelihoods with histogram matching and
median high-pass preprocessing, viewshed validity testing, four resampling
schemes, and per-track fault containment. The observation kernel runs
through the batched ops in :mod:`glimpse_tpu.ops` (SSE maps, exact cubic
spline sampling) instead of OpenCV/SciPy — the same ops the fully batched
TPU tracker (:mod:`glimpse_tpu.track.batch`) jits on device.
"""
import datetime
import sys
import traceback
import warnings
from typing import Any, Callable, Iterable, Optional, Union

import numpy as np

from .. import config, helpers
from ..ops import imageproc, ncc, resampling
from ..raster import Raster
from .motion import Motion
from .observer import Observer
from .tracks import Tracks

Number = Union[int, float]


class Tracker:
    """Estimate trajectories of world points through time.

    Attributes:
        observers: Image sequences (one per camera position).
        viewshed: Binary visibility raster; particles must fall on visible
            cells.
        resample_method: 'systematic' | 'stratified' | 'residual' | 'choice'.
        highpass: Median high-pass filter arguments ({'size': (ny, nx)}).
        interpolation: Spline order arguments ({'kx': k, 'ky': k}).
        particles, weights, templates: Current filter state.
    """

    def __init__(
        self,
        observers: Iterable[Observer],
        viewshed: Raster = None,
        resample_method: str = "systematic",
        highpass: dict = {"size": (5, 5)},
        interpolation: dict = {"kx": 3, "ky": 3},
        seed: Optional[int] = None,
    ) -> None:
        self.observers = list(observers)
        self.viewshed = viewshed
        self.resample_method = resample_method
        self.highpass = highpass
        self.interpolation = interpolation
        self.rng = np.random.default_rng(seed)
        self.particles: Optional[np.ndarray] = None
        self.weights: Optional[np.ndarray] = None
        self.templates: Optional[list] = None

    # ---- Particle statistics ---- #

    @property
    def particle_mean(self) -> np.ndarray:
        """Weighted particle mean (6,)."""
        return np.average(self.particles, weights=self.weights, axis=0)

    @property
    def particle_covariance(self) -> np.ndarray:
        """Weighted (biased) particle covariance (6, 6)."""
        return np.cov(self.particles.T, aweights=self.weights, ddof=0)

    def compute_particle_sigma(self, mean: Iterable[Number] = None) -> np.ndarray:
        """Weighted particle standard deviation (6,)."""
        if mean is None:
            mean = self.particle_mean
        variance = np.average(
            (self.particles - mean) ** 2, weights=self.weights, axis=0
        )
        return np.sqrt(variance)

    @property
    def datetimes(self) -> np.ndarray:
        """Sorted unique observation datetimes over all observers."""
        return np.unique(np.concatenate([obs.datetimes for obs in self.observers]))

    # ---- Filter steps ---- #

    def test_particles(self) -> None:
        """Raise if particles are NaN or fall on non-visible viewshed cells."""
        if self.viewshed is not None:
            visible = self.viewshed.sample(self.particles[:, 0:2], order=0)
            if not all(visible):
                raise ValueError("Some particles are on non-visible viewshed cells")
        if np.isnan(self.particles).any():
            raise ValueError("Some particles have missing (NaN) values")

    def initialize_weights(self) -> None:
        """Uniform initial weights."""
        self.weights = np.ones(len(self.particles))

    def update_weights(self, imgs: Iterable[Optional[int]], motion_model: Motion = None) -> None:
        """Multiply in observation likelihoods (all observers + motion prior)."""
        log_likelihoods = [
            self.compute_observer_log_likelihoods(obs, img)
            for obs, img in enumerate(imgs)
        ]
        if motion_model:
            log_likelihoods.append(
                motion_model.compute_log_likelihoods(self.particles)
            )
        log_likelihoods = [ll for ll in log_likelihoods if ll is not None]
        if log_likelihoods:
            likelihoods = np.exp(-sum(log_likelihoods))
            self.weights = likelihoods + 1e-300

    def resample_particles(self, method: str = None) -> None:
        """Prune unlikely particles, reproduce likely ones."""
        if method is None:
            method = self.resample_method
        indexes = resampling.resample_np(self.weights, method=method, rng=self.rng)
        self.particles = self.particles[indexes]
        self.weights = self.weights[indexes]

    # ---- Templates and likelihoods ---- #

    def extract_tile(
        self,
        obs: int,
        img: int,
        box: Iterable[Number],
        histogram=None,
        return_histogram: bool = False,
    ):
        """Extract and preprocess an image tile.

        Grayscale -> mean-0/var-1 normalize -> optional histogram match ->
        median high-pass (tracker.py:494-534), via the dual-backend ops.
        """
        tile = self.observers[obs].extract_tile(box=box, img=img)
        tile = imageproc.grayscale(np.asarray(tile, dtype=float), xp=np)
        tile = imageproc.normalize(tile, xp=np)
        if histogram is not None:
            tile = imageproc.match_cdf(tile, histogram, xp=np)
        if return_histogram:
            out_histogram = imageproc.sorted_cdf(tile, xp=np)
        tile = imageproc.highpass(tile, size=self.highpass.get("size", (5, 5)), xp=np)
        if return_histogram:
            return tile, out_histogram
        return tile

    def initialize_template(self, obs: int, img: int, tile_size: Iterable[int]) -> None:
        """Build an observer's template around the current particle mean."""
        if self.templates is None:
            self.templates = [None] * len(self.observers)
        xyz = self.particle_mean[None, 0:3]
        uv = self.observers[obs].xyz_to_uv(xyz, img=img).ravel()
        box = self.observers[obs].tile_box(uv, size=tile_size, img=img)
        template = {
            "obs": obs,
            "img": img,
            "box": box,
            "duv": uv - box.reshape(2, -1).mean(axis=0),
        }
        template["tile"], template["histogram"] = self.extract_tile(
            obs=obs, img=img, box=box, return_histogram=True
        )
        self.templates[obs] = template

    def compute_observer_log_likelihoods(self, obs: int, img: Optional[int]) -> Optional[np.ndarray]:
        """Per-particle negative log likelihood from one observer's image.

        Projects particles, extracts a histogram-matched search tile spanning
        them, computes the area-normalized SSE surface against the template,
        and spline-samples it at the projected particle positions
        (tracker.py:563-625).
        """
        if img is None:
            return None
        template = self.templates[obs]
        size = np.asarray(template["tile"].shape[0:2][::-1])
        uv = self.observers[obs].xyz_to_uv(self.particles[:, 0:3], img=img)
        halfsize = size * 0.5
        box = np.vstack((uv.min(axis=0) - halfsize, uv.max(axis=0) + halfsize))
        # Ensure the SSE surface is large enough for spline interpolation.
        ky = self.interpolation.get("ky", 3)
        ncols = ky - (np.diff(box[:, 0]) - size[0])
        if np.all(ncols > 0):
            box[:, 0] += np.hstack((-ncols, ncols)) * 0.5
        kx = self.interpolation.get("kx", 3)
        nrows = kx - (np.diff(box[:, 1]) - size[1])
        if np.all(nrows > 0):
            box[:, 1] += np.hstack((-nrows, nrows)) * 0.5
        box = np.vstack((np.floor(box[0, :]), np.ceil(box[1, :]))).astype(int)
        if not all(self.observers[obs].images[img].inbounds(box)):
            warnings.warn(
                "Particles too close to or beyond image bounds, skipping image"
            )
            return None
        box = box.ravel()
        search_tile = self.extract_tile(
            obs=obs, img=img, box=box, histogram=template["histogram"]
        )
        sse = ncc.sse_map(
            search_tile.astype(np.float32), template["tile"].astype(np.float32), xp=np
        )
        sse = sse * (1 / (size[0] * size[1]))
        # SSE surface extent: shrunk by template half-size minus half a pixel,
        # shifted by the template's subpixel offset.
        box_edge = halfsize - 0.5
        sse_box = box + np.concatenate((box_edge, -box_edge))
        sse_box = sse_box + np.tile(template["duv"], 2)
        sampled = self.observers[obs].sample_tile(
            uv, tile=sse, box=sse_box, grid=False, **self.interpolation
        )
        return sampled * (1 / (2 * self.observers[obs].sigma ** 2))

    # ---- Datetime matching ---- #

    def parse_datetimes(
        self,
        datetimes: Iterable[datetime.datetime],
        maxdt: datetime.timedelta = datetime.timedelta(0),
    ) -> np.ndarray:
        """Validate tracking datetimes (monotonic, unique, observer-matched)."""
        datetimes = np.asarray(datetimes)
        monotonic = (datetimes[1:] >= datetimes[:-1]).all() or (
            datetimes[1:] <= datetimes[:-1]
        ).all()
        if not monotonic:
            raise ValueError("Datetimes must be monotonic")
        selected = np.concatenate(((True,), datetimes[1:] != datetimes[:-1]))
        if not all(selected):
            warnings.warn("Dropping duplicate datetimes")
            datetimes = datetimes[selected]
        distances = helpers.pairwise_distance_datetimes(datetimes, self.datetimes)
        selected = distances.min(axis=1) <= abs(maxdt.total_seconds())
        if not all(selected):
            warnings.warn("Dropping datetimes not matching any Observers")
            datetimes = datetimes[selected]
        if len(datetimes) < 2:
            raise ValueError("Fewer than two valid datetimes")
        return datetimes

    def match_datetimes(
        self,
        datetimes: Iterable[datetime.datetime],
        maxdt: datetime.timedelta = datetime.timedelta(0),
    ) -> np.ndarray:
        """Image index (or None) for each (datetime, observer) pair."""
        matches = np.full((len(datetimes), len(self.observers)), None)
        for i, observer in enumerate(self.observers):
            distances = helpers.pairwise_distance_datetimes(
                datetimes, observer.datetimes
            )
            nearest = np.argmin(distances, axis=1)
            matches[:, i] = nearest
            nearest_distance = distances[np.arange(len(distances)), nearest]
            matches[nearest_distance > abs(maxdt.total_seconds()), i] = None
        return matches

    # ---- Main loop ---- #

    def reset(self) -> None:
        """Clear the filter state."""
        self.particles = None
        self.weights = None
        self.templates = None

    def track(
        self,
        motion_models: Iterable[Motion],
        datetimes: Iterable[datetime.datetime] = None,
        maxdt: datetime.timedelta = datetime.timedelta(0),
        tile_size: Iterable[int] = (15, 15),
        observer_mask: np.ndarray = None,
        return_covariances: bool = False,
        return_particles: bool = False,
        reduce_particles: Callable[[np.ndarray, np.ndarray], Any] = None,
        parallel: Union[bool, int] = False,
    ) -> Tracks:
        """Track one particle filter per motion model (tracker.py:225-417).

        With multiple models, per-track errors and warnings are caught and
        stored in the result (fault containment) rather than aborting.
        """
        if reduce_particles:
            return_particles = True
        params = {
            "datetimes": datetimes, "maxdt": maxdt, "tile_size": tile_size,
            "observer_mask": observer_mask,
            "return_covariances": return_covariances,
            "return_particles": return_particles, "parallel": parallel,
        }
        motion_models = list(motion_models)
        time_unit = motion_models[0].time_unit
        for model in motion_models[1:]:
            if model.time_unit != time_unit:
                raise ValueError("Motion models must have equal time units")
        self.reset()
        ntracks = len(motion_models)
        raise_errors = ntracks < 2
        parallel = helpers._parse_parallel(parallel)
        if datetimes is None:
            datetimes = self.datetimes
        else:
            datetimes = self.parse_datetimes(datetimes=datetimes, maxdt=maxdt)
        if observer_mask is None:
            observer_mask = np.ones((ntracks, len(self.observers)), dtype=bool)
        matching_images = self.match_datetimes(datetimes=datetimes, maxdt=maxdt)
        template_indices = np.not_equal(matching_images, None).argmax(axis=0)
        if ntracks > 1:
            for i, observer in enumerate(self.observers):
                if observer.cache:
                    index = [img for img in matching_images[:, i] if img is not None]
                    observer.cache_images(index=index)
        ntimes = len(datetimes)
        dts = np.diff(datetimes)

        def process(motion_model: Motion, obs_mask: np.ndarray, worker: "Tracker") -> list:
            """Run one track on a private Tracker clone (thread-safe: the
            reference relied on fork isolation for its shared state)."""
            means = np.full((ntimes, 6), np.nan)
            if return_covariances:
                sigmas = np.full((ntimes, 6, 6), np.nan)
            else:
                sigmas = np.full((ntimes, 6), np.nan)
            if return_particles:
                all_particles = np.full((ntimes, motion_model.n, 6), np.nan)
                all_weights = np.full((ntimes, motion_model.n), np.nan)
            error = None
            caught_warnings = None
            try:
                with warnings.catch_warnings(record=True) as caught:
                    observed = np.not_equal(matching_images[:, obs_mask], None).any(
                        axis=1
                    )
                    first = int(np.argmax(observed))
                    last = len(observed) - 1 - int(np.argmax(observed[::-1]))
                    for i in range(first, last + 1):
                        if i == first:
                            worker.particles = motion_model.initialize_particles()
                            worker.test_particles()
                            worker.initialize_weights()
                        else:
                            motion_model.evolve_particles(worker.particles, dt=dts[i - 1])
                            worker.test_particles()
                        at_template = obs_mask & (template_indices == i)
                        for obs in np.nonzero(at_template)[0]:
                            worker.initialize_template(
                                obs=obs,
                                img=matching_images[i][obs],
                                tile_size=tile_size,
                            )
                        if i > first:
                            imgs = [
                                img if m else None
                                for img, m in zip(matching_images[i], obs_mask)
                            ]
                            worker.update_weights(imgs=imgs, motion_model=motion_model)
                            worker.resample_particles()
                        means[i] = worker.particle_mean
                        if return_covariances:
                            sigmas[i] = worker.particle_covariance
                        else:
                            sigmas[i] = worker.compute_particle_sigma(mean=means[i])
                        if return_particles:
                            all_particles[i] = worker.particles
                            all_weights[i] = worker.weights
                if caught:
                    caught_warnings = tuple(caught)
            except Exception as e:
                if raise_errors:
                    raise
                # Tracebacks don't pickle; store the formatted text.
                error = e.__class__(
                    "".join(traceback.format_exception(*sys.exc_info()))
                )
            results = [means, sigmas, error, caught_warnings]
            if reduce_particles:
                results += [reduce_particles(all_particles, all_weights)]
            elif return_particles:
                results += [all_particles, all_weights]
            return results

        import copy as copy_module

        seeds = self.rng.spawn(ntracks)
        workers = []
        for seed in seeds:
            worker = copy_module.copy(self)
            worker.rng = seed
            worker.reset()
            workers.append(worker)
        with config.backend(np=parallel) as pool:
            results = pool.map(
                func=process,
                star=True,
                sequence=tuple(zip(motion_models, observer_mask, workers)),
            )
        if return_particles and not reduce_particles:
            means, sigmas, errors, all_warnings, particles, weights = zip(*results)
        else:
            particles, weights = None, None
            if reduce_particles:
                means, sigmas, errors, all_warnings, reduced = zip(*results)
            else:
                means, sigmas, errors, all_warnings = zip(*results)
        kwargs = {
            "time_unit": time_unit,
            "datetimes": datetimes,
            "means": means,
            "particles": particles,
            "weights": weights,
            "tracker": self,
            "images": matching_images,
            "params": params,
            "errors": errors,
            "warnings": all_warnings,
        }
        if return_covariances:
            kwargs["covariances"] = sigmas
        else:
            kwargs["sigmas"] = sigmas
        tracks = Tracks(**kwargs)
        if reduce_particles:
            tracks.reduced = list(reduced)
        return tracks
