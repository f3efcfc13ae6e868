"""Camera calibration: control objects, bundle adjustment, stabilization.

API parity with the reference optimize module
(``/root/reference/src/glimpse/optimize.py``), re-engineered:

- the lmfit dependency is replaced by :func:`scipy.optimize.least_squares`
  driven directly (parameter masks, bounds, per-parameter scales, Jacobian
  sparsity — optimize.py:1326-1878);
- :class:`ObserverCameras` replaces the reference's hand-coded analytic
  gradient over a Python loop of match pairs (optimize.py:2047-2072) with a
  flat segmented formulation whose objective and exact gradient come from
  ``jax.value_and_grad`` — one fused device computation over all pairs;
- keypoint detection/matching stays host-side on OpenCV (SIFT/FLANN), as a
  deliberate host-feeder component.
"""
import copyreg
import datetime
import math
from pathlib import Path
from typing import Any, Dict, Generator, Iterable, List, Optional, Tuple, Type, Union

import numpy as np
import scipy.optimize
import scipy.sparse

from . import config, helpers
from .camera import Camera
from .image import Image
from .io import geotiff
from .ops import projection as proj
from .ops import sampling as sampling_ops

try:
    import cv2

    # Make cv2.KeyPoint picklable for keypoint cache files.
    copyreg.pickle(
        cv2.KeyPoint,
        lambda k: (
            cv2.KeyPoint,
            (*k.pt, k.size, k.angle, k.response, k.octave, k.class_id),
        ),
    )
except ImportError:  # pragma: no cover
    cv2 = None

Index = Union[slice, Iterable[int]]
CamIndex = Union[int, "Camera"]
Number = Union[int, float]


def _float_pair(arrays):
    """Coerce a pair of coordinate arrays to float, passing None through."""
    if arrays is None:
        return None
    return [np.asarray(a, dtype=float) for a in arrays]


# ---- Control objects ---- #
# Controls support RANSAC via: .size, .observed(index), .predicted(index).


class Points:
    """Image-world point correspondences.

    World coordinates project through the camera and compare against their
    observed image coordinates (optimize.py:46-236).
    """

    def __init__(self, cam: Camera, uv, xyz, directions: bool = False) -> None:
        uv = np.asarray(uv, dtype=float)
        xyz = np.asarray(xyz, dtype=float)
        if uv.shape[0] != xyz.shape[0]:
            raise ValueError("Image and world coordinates have different length")
        self.cam = cam
        self.uv = uv
        self.xyz = xyz
        self.directions = directions
        self._remember_camera_state()

    def _remember_camera_state(self) -> None:
        """Snapshot camera position/size for later invalidation checks."""
        self._position = self.cam.xyz.copy()
        self._imgsz = self.cam.imgsz.copy()

    @property
    def size(self) -> int:
        """Number of point pairs."""
        return len(self.uv)

    def observed(self, index: Index = slice(None)) -> np.ndarray:
        """Observed image coordinates."""
        return self.uv[index]

    def _test_position(self) -> None:
        if self.directions and any(self.cam.xyz != self._position):
            raise ValueError(
                "Camera position has changed and world coordinates are ray directions"
            )

    def predicted(self, index: Index = slice(None)) -> np.ndarray:
        """Image coordinates predicted by projecting the world coordinates."""
        self._test_position()
        return self.cam.xyz_to_uv(self.xyz[index], directions=self.directions)

    def _scale(self, scale: np.ndarray) -> None:
        if np.any(scale != 1):
            self.uv = self.uv * scale

    def resize(self, size=None, force: bool = False) -> None:
        """Resize the camera and image coordinates together."""
        if size is not None:
            self.cam.resize(size=size, force=force)
        self._scale(self.cam.imgsz / self._imgsz)
        self._imgsz = self.cam.imgsz.copy()

    def plot(self, index: Index = slice(None), selected="red", unselected="gray",
             **kwargs: Any) -> dict:
        """Plot reprojection errors as quivers (observed -> predicted)."""
        return _plot_quivers(
            self.observed(), self.predicted(), self.cam, index, selected,
            unselected, **kwargs,
        )


class Lines(Points):
    """Image-world line correspondences.

    World polylines are projected, clipped to the frame, resampled to a
    pixel density, and each observed image point matches its nearest
    projected point (optimize.py:239-459).
    """

    def __init__(self, cam: Camera, uvs, xyzs, directions: bool = False,
                 density: float = 1) -> None:
        self.cam = cam
        self.xyzs = xyzs
        self.directions = directions
        self.density = density
        self.uvs = _float_pair(uvs) or []
        self.uv = np.vstack(self.uvs)
        self._remember_camera_state()

    def _frame_window_xy(self) -> np.ndarray:
        """Bounding box, in normalized camera coordinates, spanned by the
        frame edges (computed from densified edge samples so distortion
        wrap-around cannot leak lines outside the view)."""
        edge_xy = self.cam._uv_to_xy(self.cam.edges(step=self.cam.imgsz / 2))
        return np.concatenate([edge_xy.min(axis=0), edge_xy.max(axis=0)])

    def _project_xyzs(self) -> List[np.ndarray]:
        """Project world lines into the image at the target pixel density.

        Two phases (reference optimize.py:320-353): (1) project every
        polyline to normalized coordinates and split out the runs in front
        of the camera; (2) clip those runs to the frame window, densify to
        the target pixel step, and distort into pixels. If clipping leaves
        nothing in frame, the in-front runs are projected raw instead.
        """
        in_front: List[np.ndarray] = []
        for xyz in self.xyzs:
            xy = self.cam._xyz_to_xy(np.asarray(xyz), directions=self.directions)
            in_front += helpers.boolean_split(
                xy, np.isnan(xy[:, 0]), include="false"
            )
        window = self._frame_window_xy()
        step = 1.0 / (self.density * self.cam.f.max())
        visible = [
            helpers.interpolate_line(np.asarray(run), dx=step)
            for segment in in_front
            for run in helpers.clip_polyline_box(segment, window)
        ]
        return [self.cam._xy_to_uv(xy) for xy in (visible or in_front)]

    def predicted(self, index: Index = slice(None)) -> np.ndarray:
        """Nearest projected world-line point for each observed image point."""
        self._test_position()
        candidates = np.concatenate(self._project_xyzs(), axis=0)
        d2 = helpers.pairwise_distance(
            self.observed(index=index), candidates, metric="sqeuclidean"
        )
        return candidates[d2.argmin(axis=1)]

    def _world_candidates(self, budget: int = 4096) -> np.ndarray:
        """Fixed world-space densification for the autodiff Jacobian path.

        The host ``predicted`` pipeline densifies AFTER projection and
        clipping (data-dependent shapes, reference optimize.py:320-353);
        the traceable path fixes the candidate set in WORLD space
        instead: each polyline segment gets points in proportion to its
        projected image length under the current camera (target spacing
        ~1/density px), capped at ``budget`` points total. Projecting
        these fixed points is differentiable; visibility and the
        nearest-candidate assignment are resolved with masks inside the
        traced residual (the assignment is held fixed under
        differentiation — the standard ICP-style semi-smooth Jacobian,
        which is also what finite differences of the host path measure
        away from assignment switches).
        """
        segs: List[Tuple[np.ndarray, np.ndarray]] = []
        want: List[float] = []
        for xyz in self.xyzs:
            xyz = np.asarray(xyz, dtype=float)
            uv = self.cam.xyz_to_uv(xyz, directions=self.directions)
            d = np.linalg.norm(np.diff(uv, axis=0), axis=1)
            # Behind-camera segments keep a nominal count: they are
            # masked while invisible but can swing into view mid-fit.
            d = np.where(np.isfinite(d), d, 32.0)
            for i in range(len(xyz) - 1):
                segs.append((xyz[i], xyz[i + 1]))
                want.append(max(float(d[i]) * self.density, 1.0))
        counts = np.maximum(np.ceil(np.asarray(want)).astype(int), 1)
        total = int(counts.sum()) + len(self.xyzs)
        if total > budget:
            scale = (budget - len(self.xyzs)) / max(counts.sum(), 1)
            counts = np.maximum((counts * scale).astype(int), 1)
        pts = []
        for (a, b), c in zip(segs, counts):
            frac = np.arange(c, dtype=float)[:, None] / c
            pts.append(a[None, :] + (b - a)[None, :] * frac)
        # Closing endpoints (one per polyline).
        for xyz in self.xyzs:
            pts.append(np.asarray(xyz, dtype=float)[-1:])
        return np.concatenate(pts, axis=0)

    def _scale(self, scale: np.ndarray) -> None:
        if np.any(scale != 1):
            self.uvs = [uv * scale for uv in self.uvs]
            self.uv = self.uv * scale

    def plot(self, index: Index = slice(None), selected="red", unselected="gray",
             observed="green", predicted="yellow", **kwargs: Any) -> dict:
        """Plot observed/predicted lines and reprojection-error quivers."""
        import matplotlib.pyplot as plt

        result = {}
        for uvs, args, label in [
            (self.uvs, observed, "observed"),
            (self._project_xyzs(), predicted, "predicted"),
        ]:
            if args is None:
                result[label] = None
                continue
            if not isinstance(args, dict):
                args = {"color": args}
            result[label] = [
                plt.plot(uv[:, 0], uv[:, 1], **args)[0] for uv in uvs
            ]
        result.update(
            _plot_quivers(
                self.observed(), self.predicted(), self.cam, index, selected,
                unselected, **kwargs,
            )
        )
        return result


class Matches:
    """Image-image point correspondences between co-located cameras.

    Points from one camera are cast out as rays and projected into the
    other (optimize.py:462-740).
    """

    def __init__(self, cams, uvs, weights=None) -> None:
        self.cams = cams
        self.weights = weights
        self.uvs = _float_pair(uvs) if uvs else uvs
        self._test_matches()
        self._test_position()
        self._imgszs = [cam.imgsz.copy() for cam in cams]

    @property
    def size(self) -> int:
        """Number of point pairs."""
        return len(self.uvs[0]) if self.uvs else len(self.xys[0])

    def _test_matches(self) -> None:
        coords = self.uvs if self.uvs else getattr(self, "xys", None)
        a, b = self.cams[0], self.cams[1]
        if a is b:
            raise ValueError("Both cameras are the same object")
        if not (len(self.cams) == 2 == len(coords)):
            raise ValueError(
                "Cameras and point coordinates do not have two elements each"
            )
        if len(coords[0]) != len(coords[1]):
            raise ValueError("Camera point coordinates do not have the same length")

    def _test_position(self) -> None:
        if any(self.cams[0].xyz != self.cams[1].xyz):
            raise ValueError("Cameras have different positions")

    def _cam_index(self, cam: CamIndex) -> int:
        if isinstance(cam, int):
            if cam >= len(self.cams):
                raise IndexError("Camera index out of range")
            return cam
        return list(self.cams).index(cam)

    def observed(self, cam: CamIndex = 0, index: Index = slice(None)) -> np.ndarray:
        """Observed image coordinates in one camera."""
        return self.uvs[self._cam_index(cam)][index]

    def predicted(self, cam: CamIndex = 0, index: Index = slice(None)) -> np.ndarray:
        """Image coordinates predicted from the other camera's observations."""
        self._test_position()
        into = self._cam_index(cam)
        rays = self.cams[1 - into].uv_to_xyz(self.uvs[1 - into][index])
        return self.cams[into].xyz_to_uv(rays, directions=True)

    def to_type(self, mtype: Type["Matches"]) -> "Matches":
        """Convert to another matches type."""
        if mtype is type(self):
            return self
        return mtype(cams=self.cams, uvs=self.uvs, weights=self.weights)

    def resize(self, size=None, force: bool = False) -> None:
        """Resize the cameras and their image coordinates together."""
        for i, (cam, old_size) in enumerate(zip(self.cams, self._imgszs)):
            if size is not None:
                cam.resize(size=size, force=force)
            if np.array_equal(cam.imgsz, old_size):
                continue
            self.uvs[i] = self.uvs[i] * (cam.imgsz / old_size)
            self._imgszs[i] = cam.imgsz.copy()

    def filter(
        self,
        n_best: int = None,
        min_weight: float = None,
        cam: CamIndex = 0,
        max_error: float = None,
        max_distance: float = None,
        scaled: bool = False,
    ) -> None:
        """Keep matches by weight rank, reprojection error, or pair distance."""
        if (n_best or min_weight) and self.weights is None:
            raise ValueError("Filtering on weights failed since these are missing")
        keep = np.ones(self.size, dtype=bool)
        if self.weights is not None:
            if n_best:
                ranked = np.argsort(-self.weights)
                keep[ranked[min(n_best, self.size):]] = False
            if min_weight:
                keep &= self.weights >= min_weight
        ci = self._cam_index(cam)
        co = 1 - ci
        unit = self.cams[ci].imgsz[0] if scaled else 1.0
        if max_error:
            live = np.flatnonzero(keep)
            residuals = self.predicted(ci, index=live) - self.observed(ci, index=live)
            keep[live] &= np.hypot(residuals[:, 0], residuals[:, 1]) <= max_error * unit
        if max_distance and keep.any():
            live = np.flatnonzero(keep)
            to_ci = self.cams[ci].imgsz / self.cams[co].imgsz
            shifts = self.observed(co, index=live) * to_ci - self.observed(
                ci, index=live
            )
            keep[live] &= (
                np.hypot(shifts[:, 0], shifts[:, 1]) <= max_distance * unit
            )
        self._apply_selection(keep)

    def _apply_selection(self, keep: np.ndarray) -> None:
        """Drop matches outside the boolean selection, in place.

        Both pixel (uvs) and normalized (xys) coordinates are filtered when
        present, keeping RotationMatches' two representations in sync (the
        reference filters only one, optimize.py:734-738).
        """
        if self.uvs:
            self.uvs = [uv[keep] for uv in self.uvs]
        if getattr(self, "xys", None) is not None:
            self.xys = [xy[keep] for xy in self.xys]
        if self.weights is not None:
            self.weights = self.weights[keep]

    def plot(self, cam: CamIndex = 0, index: Index = slice(None), selected="red",
             unselected="gray", **kwargs: Any) -> dict:
        """Plot reprojection errors as quivers in one camera."""
        c = self._cam_index(cam)
        return _plot_quivers(
            self.observed(cam=cam), self.predicted(cam=cam), self.cams[c], index,
            selected, unselected, **kwargs,
        )


class RotationMatches(Matches):
    """Matches between cameras separated by a pure rotation.

    Normalized camera coordinates are precomputed, so camera internals must
    not change after construction (optimize.py:743-832).
    """

    def __init__(self, cams, uvs=None, xys=None, weights=None) -> None:
        if uvs is None and xys is None:
            raise ValueError("Both uvs and xys are missing")
        self.cams = cams
        self.weights = weights
        self.uvs = _float_pair(uvs)
        self.xys = _float_pair(xys)
        if self.xys is None:
            self.xys = [c._uv_to_xy(uv) for c, uv in zip(cams, self.uvs)]
        elif self.uvs is None:
            self.uvs = [c._xy_to_uv(xy) for c, xy in zip(cams, self.xys)]
        self._test_matches()
        self._snapshot_internals()

    def _snapshot_internals(self) -> None:
        """Record imgsz/f/c/k/p, which must not change after construction."""
        self._internals = [cam.to_array()[6:] for cam in self.cams]

    def _test_internals(self) -> None:
        if any(
            (cam._vector[6:] != v).any() for cam, v in zip(self.cams, self._internals)
        ):
            raise ValueError(
                "Camera internal parameters (imgsz, f, c, k, p) have changed"
            )

    def predicted(self, cam: CamIndex = 0, index: Index = slice(None)) -> np.ndarray:
        """Image coordinates predicted via the precomputed camera coordinates."""
        self._test_position()
        self._test_internals()
        into = self._cam_index(cam)
        rays = self.cams[1 - into]._xy_to_xyz(self.xys[1 - into][index])
        return self.cams[into].xyz_to_uv(rays, directions=True)

    def to_type(self, mtype: Type[Matches]) -> Matches:
        """Convert to another matches type."""
        if mtype is type(self):
            return self
        return mtype(cams=self.cams, uvs=self.uvs, weights=self.weights)


class RotationMatchesXY(RotationMatches):
    """RotationMatches whose residuals live in normalized camera coordinates.

    Image coordinates may be dropped to save memory (optimize.py:835-919).
    """

    def __init__(self, cams, uvs=None, xys=None, weights=None) -> None:
        if uvs is None and xys is None:
            raise ValueError("Both uvs and xys are missing")
        self.cams = cams
        self.weights = weights
        self.uvs = _float_pair(uvs)  # may stay None (dropped to save memory)
        self.xys = _float_pair(xys)
        if self.xys is None:
            self.xys = [c._uv_to_xy(uv) for c, uv in zip(cams, self.uvs)]
        self._test_matches()
        self._snapshot_internals()

    @property
    def size(self) -> int:
        """Number of point pairs."""
        return len(self.xys[0])

    def observed(self, cam: CamIndex = 0, index: Index = slice(None)) -> np.ndarray:
        """Observed normalized camera coordinates."""
        return self.xys[self._cam_index(cam)][index]

    def predicted(self, cam: CamIndex = 0, index: Index = slice(None)) -> np.ndarray:
        """Camera coordinates predicted from the other camera's observations."""
        self._test_position()
        self._test_internals()
        into = self._cam_index(cam)
        rays = self.cams[1 - into]._xy_to_xyz(self.xys[1 - into][index])
        return self.cams[into]._xyz_to_xy(rays, directions=True)

    def to_type(self, mtype: Type[Matches]) -> Matches:
        """Convert to another matches type."""
        if mtype is type(self):
            return self
        if mtype is Matches:
            uvs = self.uvs
            if uvs is None:
                uvs = [c._xy_to_uv(xy) for c, xy in zip(self.cams, self.xys)]
            return mtype(cams=self.cams, uvs=uvs, weights=self.weights)
        return mtype(cams=self.cams, uvs=self.uvs, xys=self.xys, weights=self.weights)

    def plot(self, *args: Any, **kwargs: Any) -> None:
        """Plotting is not available in normalized coordinates."""
        raise NotImplementedError()


class RotationMatchesXYZ(RotationMatchesXY):
    """RotationMatches whose predictions are unit world rays.

    Exclusively for :class:`ObserverCameras` (optimize.py:922-974).
    """

    def predicted(self, cam: CamIndex = 0, index: Index = slice(None)) -> np.ndarray:
        """Unit-length world ray directions for one camera's observations."""
        for guard in (self._test_position, self._test_internals):
            guard()
        which = self._cam_index(cam)
        rays = self.cams[which]._xy_to_xyz(self.xys[which][index])
        return rays / np.linalg.norm(rays, axis=1, keepdims=True)

    def observed(self, *args: Any, **kwargs: Any) -> None:
        """Observed coordinates are not available for RotationMatchesXYZ."""
        raise NotImplementedError()


def _plot_quivers(uv, puv, cam, index, selected, unselected, **kwargs):
    """Shared quiver plotting for control objects."""
    import matplotlib.pyplot as plt

    new_plot = not plt.get_fignums()
    defaults = {
        "scale": 1, "scale_units": "xy", "angles": "xy", "units": "xy",
        "width": cam.imgsz[0] * 0.005, **kwargs,
    }
    duv = puv - uv
    full = np.arange(len(uv))
    index, unindex = full[index], np.delete(full, index)
    result = {}
    for idx, args, label in [
        (unindex, unselected, "unselected"),
        (index, selected, "selected"),
    ]:
        if not len(idx) or args is None:
            result[label] = None
            continue
        if not isinstance(args, dict):
            args = {"color": args}
        args = {**defaults, **args}
        result[label] = plt.quiver(
            uv[idx, 0], uv[idx, 1], duv[idx, 0], duv[idx, 1], **args
        )
    if new_plot:
        cam.set_plot_limits()
    return result


# ---- Models (RANSAC-compatible: .size, .fit(index), .errors(params, index)) --


class Polynomial:
    """Least-squares polynomial model (RANSAC-compatible)."""

    def __init__(self, xy, deg: int = 1) -> None:
        self.xy = np.asarray(xy)
        self.deg = deg

    @property
    def size(self) -> int:
        """Number of observations."""
        return len(self.xy)

    def predict(self, params, index: Index = slice(None)) -> np.ndarray:
        """Evaluate the polynomial at the x of the indexed points."""
        return np.polyval(params, self.xy[index, 0])

    def errors(self, params, index: Index = slice(None)) -> np.ndarray:
        """Absolute prediction errors."""
        return np.abs(self.predict(params, index) - self.xy[index, 1])

    def fit(self, index: Index = slice(None)) -> np.ndarray:
        """Least-squares polynomial coefficients (highest degree first)."""
        return np.polyfit(self.xy[index, 0], self.xy[index, 1], deg=self.deg)

    def plot(self, params=None, index: Index = slice(None), selected="red",
             unselected="gray", predicted="red", **kwargs: Any) -> dict:
        """Scatter the observations and draw the fitted polynomial."""
        import matplotlib.pyplot as plt

        if params is None:
            params = self.fit(index)
        everything = np.arange(self.size)
        chosen = everything[index]
        rest = np.setdiff1d(everything, chosen)

        def scatter(rows, spec):
            if spec is None or rows.size == 0:
                return None
            style = spec if isinstance(spec, dict) else {"c": spec}
            return plt.scatter(
                self.xy[rows, 0], self.xy[rows, 1], **{**style, **kwargs}
            )

        result = {
            "unselected": scatter(rest, unselected),
            "selected": scatter(chosen, selected),
            "predicted": None,
        }
        if predicted is not None:
            line_style = (
                predicted if isinstance(predicted, dict) else {"color": predicted}
            )
            result["predicted"] = plt.plot(
                self.xy[:, 0], self.predict(params), **line_style
            )
        return result


Control = Union[Points, Lines, Matches, RotationMatches]
Params = Dict[str, Union[bool, int, Iterable[int], tuple]]

_ATTRIBUTES = ("xyz", "viewdir", "imgsz", "f", "c", "k", "p")
_OFFSETS = (0, 3, 6, 8, 10, 12, 18, 20)


class Cameras:
    """Multi-camera bundle adjustment over masked camera parameters.

    Cameras may share groups of parameters (synchronized across a group) and
    have per-camera free parameters; the optimizer is
    ``scipy.optimize.least_squares`` with per-parameter scale factors and a
    control x camera block sparsity structure (optimize.py:1133-1971).
    """

    def __init__(
        self,
        cams,
        controls,
        cam_params=None,
        group_indices=None,
        group_params=None,
        weights=None,
        scales: bool = True,
        sparsity: bool = True,
    ) -> None:
        if isinstance(cams, Camera):
            cams = [cams]
        if isinstance(controls, (Points, Lines, Matches)):
            controls = [controls]
        if isinstance(cam_params, dict):
            cam_params = [cam_params]
        if isinstance(group_indices, int):
            group_indices = [group_indices]
        if group_indices is not None and isinstance(group_indices[0], int):
            group_indices = [group_indices]
        if isinstance(group_params, dict):
            group_params = [group_params]
        self.cams = list(cams)
        self.controls = self.prune_controls(controls, cams=self.cams)
        ncams = len(self.cams)
        self.cam_params = cam_params if cam_params is not None else [{}] * ncams
        self.group_indices = (
            group_indices if group_indices is not None else [list(range(ncams))]
        )
        self.group_params = (
            group_params
            if group_params is not None
            else [{}] * len(self.group_indices)
        )
        self.weights = weights
        self.update_params()
        self._test()
        self.vectors = [cam.to_array() for cam in self.cams]
        self.scales = None
        if scales:
            self._build_scales()
        self.sparsity = None
        if sparsity:
            self._build_sparsity()

    # -- weights -- #

    @property
    def weights(self):
        """Per-point weights, normalized to mean 1."""
        return self._weights

    @weights.setter
    def weights(self, value) -> None:
        if value is None:
            self._weights = None
        else:
            value = np.atleast_2d(value).reshape(-1, 1)
            self._weights = value * len(value) / sum(value)

    # -- static helpers -- #

    @staticmethod
    def _get_control_cams(control) -> List[Camera]:
        if isinstance(control, (Points, Lines)):
            return [control.cam]
        return list(control.cams)

    @classmethod
    def prune_controls(cls, controls, cams) -> list:
        """Keep only controls that reference at least one of the cameras."""
        return [
            control
            for control in controls
            if set(cams) & set(cls._get_control_cams(control))
        ]

    @staticmethod
    def camera_scales(cam: Camera, controls=None) -> np.ndarray:
        """Per-parameter scale factors: change producing ~1 px of motion.

        Analytic pixels-per-unit heuristics for each of the 20 parameters
        (optimize.py:1326-1407), inverted to units per pixel.
        """
        f_mean = float(cam.f.mean())
        # Mean image radius (px), and its normalized-camera-frame twin.
        r_px = (cam.imgsz.mean() / 6) * (np.sqrt(2) + np.log(1 + np.sqrt(2)))
        r_xy = r_px / f_mean

        px_per_unit = np.ones(20, dtype=float)
        world = Cameras._control_world_points(cam, controls)
        if world is not None:
            depth = np.linalg.norm(world - cam.xyz).mean()
            px_per_unit[0:3] = f_mean / depth
        fov_deg = np.degrees(2 * np.arctan(cam.imgsz / (2 * cam.f)))
        px_per_unit[3:5] = cam.imgsz / fov_deg
        px_per_unit[5] = 2 * r_px * np.sin(np.radians(1.0) / 2)
        px_per_unit[6:8] = 0.5
        px_per_unit[8:10] = r_xy
        # Radial terms: r^(2i+1) per coefficient order, rational denominators
        # for k4..k6, with the 2^(i+1/2) spread factor.
        for i in range(3):
            magnitude = r_xy ** (3 + 2 * i) * f_mean * 2 ** (0.5 + i)
            px_per_unit[12 + i] = magnitude
            px_per_unit[15 + i] = magnitude / (1 + cam.k[3 + i] * r_xy ** (2 + 2 * i))
        px_per_unit[18:20] = np.sqrt(5) * r_xy ** 2 * f_mean
        return 1 / px_per_unit

    @staticmethod
    def _control_world_points(cam: Camera, controls) -> Optional[np.ndarray]:
        """World coordinates of absolute (non-direction) controls on ``cam``."""
        gathered = []
        for control in controls or ():
            applies = (
                isinstance(control, (Points, Lines))
                and control.cam is cam
                and not control.directions
            )
            if not applies:
                continue
            if isinstance(control, Lines):
                gathered.extend(control.xyzs)
            else:
                gathered.append(control.xyz)
        return np.vstack(gathered) if gathered else None

    @staticmethod
    def camera_bounds(cam: Camera) -> np.ndarray:
        """Default parameter bounds (distortion limits from undistort stability)."""
        k = cam.f.mean() / 4000
        p = cam.f.mean() / 40000
        bounds = np.full((20, 2), [-np.inf, np.inf], dtype=float)
        bounds[6:10] = [0, np.inf]
        bounds[10] = np.array([-0.5, 0.5]) * cam.imgsz[0]
        bounds[11] = np.array([-0.5, 0.5]) * cam.imgsz[1]
        bounds[12] = [-k, k]
        bounds[13] = [-k / 2, k / 2]
        bounds[14] = [-k / 2, k / 2]
        bounds[15:18] = [-k, k]
        bounds[18:20] = [-p, p]
        return bounds

    @staticmethod
    def parse_params(params: Params = None, default_bounds=None):
        """Parse a parameter selection dict into a (20,) mask and (20, 2) bounds.

        Selections: {'viewdir': True} (all), {'viewdir': 0} (one index),
        {'viewdir': [0, 1]}, or with bounds {'viewdir': (indices, min, max)}.
        """
        if params is None:
            params = {}
        mask = np.zeros(20, dtype=bool)
        bounds = np.full((20, 2), np.nan)
        for key, value in params.items():
            if key not in _ATTRIBUTES:
                continue
            selection = value[0] if isinstance(value, tuple) else value
            i = _ATTRIBUTES.index(key)
            if selection or selection == 0:
                if selection is True:
                    positions = np.arange(_OFFSETS[i], _OFFSETS[i + 1])
                else:
                    positions = _OFFSETS[i] + np.atleast_1d(selection)
                mask[positions] = True
            if isinstance(value, tuple):
                min_bounds = np.atleast_1d(value[1]).astype(float)
                if len(min_bounds) == 1:
                    min_bounds = np.repeat(min_bounds, len(positions))
                max_bounds = np.atleast_1d(value[2]).astype(float)
                if len(max_bounds) == 1:
                    max_bounds = np.repeat(max_bounds, len(positions))
                bounds[positions] = np.column_stack((min_bounds, max_bounds))
        if default_bounds is not None:
            missing = np.isnan(bounds)
            bounds[missing] = default_bounds[missing]
        missing = np.isnan(bounds)
        bounds[missing[:, 0], 0] = -np.inf
        bounds[missing[:, 1], 1] = np.inf
        return mask, bounds

    # -- parameter bookkeeping -- #

    def update_params(self) -> None:
        """Rebuild masks, bounds, values, and index breaks from current state."""
        cam_bounds = [self.camera_bounds(cam) for cam in self.cams]
        parsed = [
            self.parse_params(params, default_bounds=bounds)
            for params, bounds in zip(self.cam_params, cam_bounds)
        ]
        self.cam_masks = [mask for mask, _ in parsed]
        cam_bounds = [bounds for _, bounds in parsed]
        self.group_masks = []
        group_bounds = []
        for group, idx in enumerate(self.group_indices):
            defaults = np.column_stack(
                (
                    np.column_stack([cam_bounds[i][:, 0] for i in idx]).max(axis=1),
                    np.column_stack([cam_bounds[i][:, 1] for i in idx]).min(axis=1),
                )
            )
            mask, bounds = self.parse_params(
                self.group_params[group], default_bounds=defaults
            )
            self.group_masks.append(mask)
            group_bounds.append(bounds)
        # Parameter vector layout: [group0 | group1 | ... | cam0 | cam1 | ...].
        values, lower, upper = [], [], []
        for group, idx in enumerate(self.group_indices):
            mask = self.group_masks[group]
            group_values = np.nanmean(
                np.vstack([self.cams[i]._vector[mask] for i in idx]), axis=0
            )
            values.extend(group_values)
            lower.extend(group_bounds[group][mask, 0])
            upper.extend(group_bounds[group][mask, 1])
        for i, mask in enumerate(self.cam_masks):
            values.extend(self.cams[i]._vector[mask])
            lower.extend(cam_bounds[i][mask, 0])
            upper.extend(cam_bounds[i][mask, 1])
        self.values = np.asarray(values, dtype=float)
        self.bounds = (np.asarray(lower, dtype=float), np.asarray(upper, dtype=float))
        self.group_breaks = np.cumsum(
            [0] + [int(mask.sum()) for mask in self.group_masks]
        )
        self.cam_breaks = np.cumsum(
            [self.group_breaks[-1]] + [int(mask.sum()) for mask in self.cam_masks]
        )

    def _test(self) -> None:
        """Guard against configurations with undefined behavior."""
        if not self.controls:
            raise ValueError("No controls reference the cameras")
        self._check_group_image_sizes()
        self._check_mask_overlaps()
        self._check_controls_cover_params()

    def _check_group_image_sizes(self) -> None:
        """Groups synchronizing f or c need a single shared image size."""
        for g, members in enumerate(self.group_indices):
            if not ({"f", "c"} & set(self.group_params[g])):
                continue
            sizes = {tuple(self.cams[j].imgsz) for j in members}
            if len(sizes) > 1:
                raise ValueError(
                    f"Group {g}: 'f' or 'c' in parameters but image sizes not equal"
                )

    def _check_mask_overlaps(self) -> None:
        """No camera may belong to two groups that free the same parameter."""
        stacked = np.vstack(self.group_masks)
        for param in np.flatnonzero(stacked.sum(axis=0) > 1):
            touching = np.flatnonzero(stacked[:, param])
            members = np.concatenate([self.group_indices[g] for g in touching])
            if np.unique(members).size < members.size:
                raise ValueError(
                    "Some cameras are in multiple groups with overlapping masks"
                )

    def _check_controls_cover_params(self) -> None:
        """Every camera with free parameters needs at least one control."""
        controlled = {
            cam
            for control in self.controls
            for cam in self._get_control_cams(control)
        }
        for i, cam in enumerate(self.cams):
            in_param_group = any(
                self.group_params[g]
                for g, members in enumerate(self.group_indices)
                if i in members
            )
            if (self.cam_params[i] or in_param_group) and cam not in controlled:
                raise ValueError("Not all cameras with params appear in controls")

    def _build_scales(self) -> None:
        scales = [self.camera_scales(cam, self.controls) for cam in self.cams]
        cam_scales = [scale[mask] for scale, mask in zip(scales, self.cam_masks)]
        group_scales = [
            np.nanmean(np.vstack([scales[i][mask] for i in idx]), axis=0)
            for mask, idx in zip(self.group_masks, self.group_indices)
        ]
        parts = group_scales + cam_scales
        self.scales = np.hstack([p for p in parts if len(p)]) if any(
            len(p) for p in parts
        ) else None

    def _build_sparsity(self) -> None:
        """Control x parameter block sparsity for the Jacobian estimate."""
        m_control = [2 * control.size for control in self.controls]
        m = sum(m_control)
        n = int(self.cam_breaks[-1])
        groups = np.zeros((len(self.cams), len(self.group_indices)), dtype=bool)
        for i, idx in enumerate(self.group_indices):
            groups[list(idx), i] = True
        S = scipy.sparse.lil_matrix((m, n), dtype=int)
        control_breaks = np.cumsum([0] + m_control)
        for i, control in enumerate(self.controls):
            ctrl_slice = slice(control_breaks[i], control_breaks[i + 1])
            for cam in self._get_control_cams(control):
                try:
                    j = self.cams.index(cam)
                except ValueError:
                    continue
                S[ctrl_slice, self.cam_breaks[j] : self.cam_breaks[j + 1]] = 1
                for group in np.nonzero(groups[j])[0]:
                    S[
                        ctrl_slice,
                        self.group_breaks[group] : self.group_breaks[group + 1],
                    ] = 1
        self.sparsity = S

    # -- exact Jacobians (autodiff) -- #

    def _autodiff_supported(self) -> bool:
        """Whether every control has a JAX-traceable residual.

        All reference control types are covered — ``Lines`` through the
        fixed-budget world densification + masked nearest-candidate
        assignment (:meth:`Lines._world_candidates`). Only
        ``RotationMatchesXYZ`` is excluded: it has no ``observed`` (it
        exists only for :class:`ObserverCameras`).
        """
        for control in self.controls:
            if isinstance(control, RotationMatchesXYZ):
                return False
            if not isinstance(control, (Points, Matches)):
                return False
        return True

    def _build_autodiff_residual(self):
        """One JAX-traceable function params -> residual array (n, 2).

        The TPU-first replacement for the reference's finite-difference
        Jacobians + hand-built sparsity (reference optimize.py:1781-1878;
        SURVEY.md section 3.3): the residual stack is rebuilt on the pure
        dual-backend projection ops, so ``jax.jacfwd`` delivers exact
        derivatives. Free parameters scatter into the 20-vectors exactly
        like :meth:`set_cameras` (groups first, then per-camera blocks);
        the fit-start camera vectors arrive as the ``base`` argument, so
        non-free entries stay at their current values for one fit while the
        compiled program remains reusable across fits.
        """
        import jax.numpy as jnp

        writes = []  # (camera row, 20-vector positions, parameter indices)
        for g, members in enumerate(self.group_indices):
            span = np.arange(self.group_breaks[g], self.group_breaks[g + 1])
            pos = np.flatnonzero(self.group_masks[g])
            writes += [(j, pos, span) for j in members]
        for j, mask in enumerate(self.cam_masks):
            span = np.arange(self.cam_breaks[j], self.cam_breaks[j + 1])
            writes.append((j, np.flatnonzero(mask), span))
        writes = [w for w in writes if len(w[1])]

        # Controls may reference cameras that are NOT being fit (e.g. a
        # Matches pair anchored to a fixed camera — the reference evaluates
        # residuals against the live camera objects, so non-fit cameras act
        # as constants). Such cameras get rows appended after the fit
        # cameras; `writes` never touches those rows, so they contribute
        # values but no derivatives.
        cam_row = {id(cam): i for i, cam in enumerate(self.cams)}
        fixed_cams: List[Camera] = []

        def row_of(cam):
            key = id(cam)
            if key not in cam_row:
                cam_row[key] = len(self.cams) + len(fixed_cams)
                fixed_cams.append(cam)
            return cam_row[key]

        terms = []
        for control in self.controls:
            if isinstance(control, RotationMatchesXY):
                j0 = row_of(control.cams[0])
                j1 = row_of(control.cams[1])
                xy0 = jnp.asarray(control.xys[0])
                xy1 = jnp.asarray(control.xys[1])

                def term(vs, j0=j0, j1=j1, xy0=xy0, xy1=xy1):
                    rays = proj.camera_to_world(
                        xy1, proj.rotation_matrix(vs[j1][3:6], jnp),
                        directions=True, xp=jnp,
                    )
                    pred = proj.world_to_camera(
                        rays, vs[j0][0:3],
                        proj.rotation_matrix(vs[j0][3:6], jnp),
                        directions=True, xp=jnp,
                    )
                    return pred - xy0

            elif isinstance(control, RotationMatches):
                j0 = row_of(control.cams[0])
                j1 = row_of(control.cams[1])
                uv0 = jnp.asarray(control.uvs[0])
                xy1 = jnp.asarray(control.xys[1])

                def term(vs, j0=j0, j1=j1, uv0=uv0, xy1=xy1):
                    rays = proj.camera_to_world(
                        xy1, proj.rotation_matrix(vs[j1][3:6], jnp),
                        directions=True, xp=jnp,
                    )
                    pred = proj.project(
                        vs[j0], rays, directions=True, xp=jnp
                    )
                    return pred - uv0

            elif isinstance(control, Matches):
                j0 = row_of(control.cams[0])
                j1 = row_of(control.cams[1])
                uv0 = jnp.asarray(control.uvs[0])
                uv1 = jnp.asarray(control.uvs[1])

                def term(vs, j0=j0, j1=j1, uv0=uv0, uv1=uv1):
                    rays = proj.unproject(
                        vs[j1], uv1, directions=True, xp=jnp
                    )
                    pred = proj.project(
                        vs[j0], rays, directions=True, xp=jnp
                    )
                    return pred - uv0

            elif isinstance(control, Lines):
                j = row_of(control.cam)
                world = jnp.asarray(control._world_candidates())
                uv_obs = jnp.asarray(control.uv)
                l_directions = control.directions
                l_corr = (
                    None if l_directions else control.cam._correction_tuple
                )

                def term(vs, j=j, world=world, uv_obs=uv_obs,
                         directions=l_directions, corr=l_corr):
                    # Project the FIXED world candidates; resolve
                    # visibility + nearest assignment with masks (the
                    # traceable form of project->clip->densify->NN,
                    # reference optimize.py:320-376).
                    uvc = proj.project(
                        vs[j], world, directions=directions,
                        correction=corr, xp=jnp,
                    )  # (M, 2)
                    finite = jnp.isfinite(uvc[:, 0]) & jnp.isfinite(
                        uvc[:, 1]
                    )
                    uvc = jnp.where(finite[:, None], uvc, 1e9)
                    imgsz = vs[j][6:8]
                    inside = (
                        finite
                        & (uvc[:, 0] >= 0) & (uvc[:, 0] <= imgsz[0])
                        & (uvc[:, 1] >= 0) & (uvc[:, 1] <= imgsz[1])
                    )
                    # Reference fallback: if clipping leaves nothing in
                    # frame, match against the in-front runs raw.
                    use = jnp.where(jnp.any(inside), inside, finite)
                    d2 = jnp.sum(
                        (uv_obs[:, None, :] - uvc[None, :, :]) ** 2,
                        axis=-1,
                    )
                    d2 = jnp.where(use[None, :], d2, jnp.inf)
                    nearest = jnp.take(
                        uvc, jnp.argmin(d2, axis=1), axis=0
                    )
                    return nearest - uv_obs

            else:  # Points (absolute or directions)
                j = row_of(control.cam)
                xyz = jnp.asarray(control.xyz)
                uv = jnp.asarray(control.uv)
                directions = control.directions
                corr = None if directions else control.cam._correction_tuple

                def term(vs, j=j, xyz=xyz, uv=uv, directions=directions,
                         corr=corr):
                    pred = proj.project(
                        vs[j], xyz, directions=directions, correction=corr,
                        xp=jnp,
                    )
                    return pred - uv

            terms.append(term)

        weight_arr = (
            None if self.weights is None else jnp.asarray(self.weights)
        )

        def residual_array(params, base):
            vs = base
            for j, pos, span in writes:
                vs = vs.at[j, pos].set(params[span])
            r = jnp.concatenate([t(vs) for t in terms], axis=0)
            if weight_arr is not None:
                r = r * weight_arr
            # Behind-camera NaNs contribute zero residual AND zero gradient
            # (the host fun applies the same nan_to_num).
            return jnp.where(jnp.isnan(r), 0.0, r)

        return residual_array, fixed_cams

    def _autodiff_jac(self, index: Index = slice(None)):
        """scipy-compatible callable returning the exact (m, n) Jacobian.

        The jacfwd program takes the fit-start camera vectors and the row
        subset as ARGUMENTS, so one compile is reused across repeated fits
        — RANSAC draws hundreds of same-size subsets and pays the compile
        once. The cache invalidates when the controls change shape.
        """
        import jax
        import jax.numpy as jnp

        rows = np.arange(self.size)[index]
        full = rows.size == self.size and np.array_equal(
            rows, np.arange(self.size)
        )
        token = (len(self.cams), tuple(c.size for c in self.controls))
        cache = getattr(self, "_jac_cache", None)
        if cache is None or cache["token"] != token:
            cache = self._jac_cache = {"token": token, "fns": {}}
        key = "full" if full else int(rows.size)
        if key not in cache["fns"]:
            residual_array, fixed_cams = self._build_autodiff_residual()

            if full:
                def flat(params, base):
                    return residual_array(params, base).ravel()
            else:
                def flat(params, base, subset):
                    return residual_array(params, base)[subset].ravel()

            cache["fns"][key] = jax.jit(jax.jacfwd(flat))
            cache["fixed_cams"] = fixed_cams
        jac_fn = cache["fns"][key]
        fixed_cams = cache["fixed_cams"]

        def jac(x, *args):
            # Residuals restore the live camera vectors after every call,
            # so to_array() here is the fit-start (non-free) state. Cameras
            # referenced by controls but not fit ride along as constant
            # rows (live values — matching the host residual path).
            base = jnp.asarray(
                np.stack(
                    [cam.to_array() for cam in self.cams]
                    + [cam.to_array() for cam in fixed_cams]
                ),
                dtype=jnp.float32,
            )
            x32 = jnp.asarray(x, dtype=jnp.float32)
            if full:
                return np.asarray(jac_fn(x32, base))
            return np.asarray(jac_fn(x32, base, rows))

        return jac

    # -- camera parameter application -- #

    def set_cameras(self, params, save: bool = False) -> None:
        """Write a parameter vector into the camera 20-vectors.

        Layout: group blocks first (broadcast to every member camera), then
        one block of free parameters per camera.
        """
        values = np.asarray(params, dtype=float)
        for g, members in enumerate(self.group_indices):
            block = values[self.group_breaks[g] : self.group_breaks[g + 1]]
            for j in members:
                self.cams[j]._vector[self.group_masks[g]] = block
        for j, cam in enumerate(self.cams):
            cam._vector[self.cam_masks[j]] = values[
                self.cam_breaks[j] : self.cam_breaks[j + 1]
            ]
        if save:
            self.vectors = [cam.to_array() for cam in self.cams]

    def reset_cameras(self) -> None:
        """Restore cameras to their previously saved state."""
        for cam, vector in zip(self.cams, self.vectors):
            cam._vector = vector.copy()

    # -- residuals -- #

    @property
    def size(self) -> int:
        """Total number of control points."""
        return int(np.sum([control.size for control in self.controls]))

    def _stack_controls(self, method: str, index: Index) -> np.ndarray:
        """Concatenate a per-control accessor over all controls."""
        if len(self.controls) == 1:
            return getattr(self.controls[0], method)(index=index)
        return np.vstack(
            [getattr(control, method)() for control in self.controls]
        )[index]

    def observed(self, index: Index = slice(None)) -> np.ndarray:
        """Observed coordinates over all controls."""
        return self._stack_controls("observed", index)

    def predicted(self, params=None, index: Index = slice(None)) -> np.ndarray:
        """Predicted coordinates over all controls (optionally at params)."""
        if params is None:
            return self._stack_controls("predicted", index)
        saved = [cam.to_array() for cam in self.cams]
        self.set_cameras(params)
        try:
            return self._stack_controls("predicted", index)
        finally:
            for cam, vector in zip(self.cams, saved):
                cam._vector = vector

    def residuals(self, params=None, index: Index = slice(None)) -> np.ndarray:
        """Weighted residuals (predicted - observed), shape (n, 2)."""
        d = self.predicted(params=params, index=index) - self.observed(index=index)
        if self.weights is None:
            return d
        return d * self.weights[index]

    def plot_weights(self, index: Index = slice(None), **kwargs):
        """Scatter the observed points colored and sized by their weights.

        Parity: ``Cameras.plot_weights`` (reference optimize.py:1957-1971).
        """
        import matplotlib.pyplot as plt

        weights = np.ones(self.size) if self.weights is None else self.weights
        uv = self.observed(index=index)
        return plt.scatter(
            uv[:, 0], uv[:, 1], c=weights[index], s=weights[index], **kwargs
        )

    def errors(self, params=None, index: Index = slice(None)) -> np.ndarray:
        """Euclidean reprojection errors (n,)."""
        return np.linalg.norm(self.residuals(params=params, index=index), axis=1)

    def fit(
        self,
        index: Index = slice(None),
        cam_params=None,
        group_params=None,
        full: bool = False,
        method: str = "least_squares",
        verbose: bool = False,
        jac: str = "auto",
        **kwargs: Any,
    ):
        """Optimal parameter vector minimizing the reprojection residuals.

        Direct ``scipy.optimize.least_squares`` driver (Trust Region
        Reflective with bounds) using the per-parameter scales as ``x_scale``.
        ``jac`` selects the Jacobian source: ``'exact'`` evaluates exact
        derivatives of the full residual stack with ``jax.jacfwd`` over the
        pure projection ops (one jitted program; replaces the reference's
        finite differences + hand sparsity, optimize.py:1781-1878);
        ``'2-point'`` keeps the reference's finite-difference path with the
        block sparsity structure; ``'auto'`` (default) uses exact whenever
        every control supports tracing (all built-in controls — including
        ``Lines``, whose residual is traced through the budgeted candidate
        densification — do; only custom controls without pure-op residuals
        fall back to finite differences). ``cam_params``/
        ``group_params`` run staged pre-fits like the reference.
        """
        iterations = max(
            len(cam_params) if cam_params else 0,
            len(group_params) if group_params else 0,
        )
        if iterations:
            for n in range(iterations):
                model = Cameras(
                    cams=self.cams,
                    controls=self.controls,
                    cam_params=cam_params[n] if cam_params else self.cam_params,
                    group_params=(
                        group_params[n] if group_params else self.group_params
                    ),
                )
                values = model.fit(index=index, method=method, jac=jac, **kwargs)
                if values is not None:
                    model.set_cameras(params=values)
            self.update_params()
        options = dict(kwargs)
        if self.scales is not None and len(self.scales):
            options.setdefault("x_scale", self.scales)
        exact = jac == "exact" or (jac == "auto" and self._autodiff_supported())
        if exact:
            options.setdefault("jac", self._autodiff_jac(index))
        elif self.sparsity is not None:
            if isinstance(index, slice) and index == slice(None):
                options.setdefault("jac_sparsity", self.sparsity)
            else:
                jac_index = (
                    np.arange(self.size)[index]
                    if isinstance(index, slice)
                    else np.asarray(index)
                )
                jac_index = np.dstack((2 * jac_index, 2 * jac_index + 1)).ravel()
                options.setdefault("jac_sparsity", self.sparsity[jac_index])

        def fun(params: np.ndarray) -> np.ndarray:
            r = self.residuals(params=params, index=index).ravel()
            return np.nan_to_num(r, nan=0.0)

        lower, upper = self.bounds
        # TRF requires strictly interior starting points.
        x0 = np.clip(self.values, lower + 1e-12, upper - 1e-12)
        result = scipy.optimize.least_squares(
            fun, x0=x0, bounds=(lower, upper), verbose=1 if verbose else 0, **options
        )
        if iterations:
            self.reset_cameras()
            self.update_params()
        if not result.success:
            print(result.message)
        if full:
            return result
        if result.success:
            return result.x
        return None

    def plot(self, params=None, cam: CamIndex = 0, index: Index = slice(None),
             **kwargs: Any) -> list:
        """Plot reprojection errors for one camera across its controls."""
        if params is not None:
            vectors = [c.to_array() for c in self.cams]
            self.set_cameras(params)
        cam = self.cams[cam] if isinstance(cam, int) else cam
        results = [
            control.plot(index=index, **kwargs)
            if not isinstance(control, Matches)
            else control.plot(cam=cam, index=index, **kwargs)
            for control in self.prune_controls(self.controls, cams=[cam])
        ]
        if params is not None:
            for c, vector in zip(self.cams, vectors):
                c._vector = vector
        return results


# ---- Observer stabilization ---- #


class ObserverCameras:
    """Globally optimal view directions for an Observer's image sequence.

    Minimizes the L1 norm of unit-ray differences over all matched keypoint
    pairs plus quadratic anchor terms. The reference walks a Python loop of
    match pairs with a hand-coded gradient (optimize.py:2024-2083); here all
    pairs flatten into segmented arrays and ``jax.value_and_grad`` of the
    fused objective supplies the exact gradient in one device call.
    """

    def __init__(self, observer, matches=None, anchors: Iterable[int] = None) -> None:
        self.observer = observer
        self.anchors = [0] if anchors is None else list(anchors)
        self.matches = matches
        self._matcher = None
        self.viewdirs = np.vstack(
            [img.cam.viewdir.copy() for img in self.observer.images]
        )

    @property
    def matcher(self) -> "KeypointMatcher":
        """KeypointMatcher over the observer's images (built on first use)."""
        if self._matcher is None:
            self._matcher = KeypointMatcher(images=self.observer.images)
        return self._matcher

    def set_cameras(self, viewdirs) -> None:
        """Write view directions into the Observer's cameras."""
        for i, img in enumerate(self.observer.images):
            img.cam.viewdir = viewdirs[i]

    def reset_cameras(self) -> None:
        """Restore original view directions."""
        self.set_cameras(viewdirs=self.viewdirs.copy())

    def build_keypoints(self, **kwargs: Any) -> None:
        """Detect keypoints for all images (see KeypointMatcher)."""
        self.matcher.build_keypoints(**kwargs)

    def build_matches(self, **kwargs: Any) -> None:
        """Match keypoints between images and convert to RotationMatchesXYZ."""
        self.matcher.build_matches(**kwargs)
        self.matcher.convert_matches(RotationMatchesXYZ)
        self.matches = self.matcher.matches

    def _flatten_matches(self):
        """Flatten the match matrix into (xyA, xyB, imgA, imgB) arrays."""
        matches = self.matches
        if not scipy.sparse.issparse(matches):
            matches = scipy.sparse.coo_matrix(matches)
        xa, xb, ia, ib = [], [], [], []
        for m, i, j in zip(matches.data, matches.row, matches.col):
            xa.append(m.xys[0])
            xb.append(m.xys[1])
            ia.append(np.full(m.size, i, dtype=np.int32))
            ib.append(np.full(m.size, j, dtype=np.int32))
        return (
            np.vstack(xa), np.vstack(xb),
            np.concatenate(ia), np.concatenate(ib),
        )

    def initialize(self, min_matches: int = 8) -> np.ndarray:
        """Closed-form viewdir initialization by chaining pairwise rotations.

        For every consecutive image pair with matches, the relative
        rotation is the orthogonal-Procrustes optimum over the matched
        unit rays (one 3x3 SVD per pair); composing them outward from the
        first anchor gives a starting point already within the per-frame
        match noise. Without it, BFGS on the L1 ray objective must drag
        every frame from the nominal direction individually — measured at
        1,000 frames this is the difference between a ~1 minute fit and a
        ~45 minute crawl to a worse optimum (validation.md).

        Returns the (n_images, 3) viewdir array (does not mutate state).
        """
        from .ops import projection as proj

        matches = self.matches
        if not scipy.sparse.issparse(matches):
            matches = scipy.sparse.coo_matrix(matches)
        pair_map = {}
        for m, i, j in zip(matches.data, matches.row, matches.col):
            if m.size >= min_matches:
                pair_map[(int(i), int(j))] = m

        def unit(v):
            v = np.column_stack([v, np.ones(len(v))])
            return v / np.linalg.norm(v, axis=1, keepdims=True)

        def relative(m, R_known, forward: bool):
            """Rotation of the unknown frame given the known frame's R."""
            va, vb = unit(m.xys[0]), unit(m.xys[1])
            if not forward:  # unknown is the FIRST image of the pair
                va, vb = vb, va
            M3 = vb.T @ (va @ R_known)
            U, _, Vt = np.linalg.svd(M3)
            d = np.sign(np.linalg.det(U @ Vt))
            return U @ np.diag([1.0, 1.0, d]) @ Vt

        n = len(self.viewdirs)
        out = self.viewdirs.copy()
        a0 = self.anchors[0] if self.anchors else 0
        R = proj.rotation_matrix(out[a0], xp=np)
        known = {a0: R}
        for i in range(a0 + 1, n):
            m = pair_map.get((i - 1, i))
            if m is not None:
                known[i] = relative(m, known[i - 1], forward=True)
            else:
                known[i] = known[i - 1]
            out[i] = proj.viewdir_from_rotation(known[i], xp=np)
        for i in range(a0 - 1, -1, -1):
            m = pair_map.get((i, i + 1))
            if m is not None:
                known[i] = relative(m, known[i + 1], forward=False)
            else:
                known[i] = known[i + 1]
            out[i] = proj.viewdir_from_rotation(known[i], xp=np)
        return out

    def fit(self, anchor_weight: Number = 1e6, method: str = "lbfgs-device",
            tol: float = None, init: str = "chain", smooth: float = 1e-5,
            **kwargs: Any):
        """Optimal view directions on the device-fused ray objective.

        ``init='chain'`` starts from :meth:`initialize` (chained
        closed-form pairwise rotations); ``init='current'`` reproduces the
        reference behavior of starting at the images' current viewdirs
        (reference optimize.py:2075-2083). ``anchor_weight`` is accepted
        for API parity but anchors are held EXACTLY fixed here: the
        reference's 1e6 soft penalty is what the constraint approximates,
        and it puts ~1e10 on the Hessian's condition number, which turns
        every curvature-aware optimizer into a device-round-trip crawl.

        The objective is a smoothed L1 (``sqrt(r^2 + smooth^2)``);
        ``smooth`` only reweights residuals below ~1e-5 rad (the match
        noise floor). Matches are scanned in fixed ``chunk_size`` blocks
        so the compiled graph is one chunk body regardless of match
        count. ``method='lbfgs-device'`` (default) runs optax L-BFGS
        entirely on device in ONE jitted while_loop (see
        :meth:`_fit_lbfgs_device`): measured at 1,000 frames it reaches
        a better optimum than the host drivers in 26 s (0.0026 deg max
        viewdir error vs Newton-CG's 0.0035 deg in 222 s — every host
        driver pays ~30 ms of tunnel RPC per objective call).
        ``method='newton-cg'`` is truncated Newton with device
        Hessian-vector products (``jax.jvp`` of the gradient);
        ``method='l-bfgs-b'`` (gradient-driven stop defaults) is the
        host quasi-Newton fallback; ``method='bfgs', smooth=0,
        init='current'`` is the reference's exact-L1 BFGS (reference
        optimize.py:2075-2083).
        """
        import jax
        import jax.numpy as jnp

        from .ops import projection as proj

        # Pack matches into PER-PAIR blocks padded to a common width K:
        # every image pair's matches share one (i, j), so the rotation
        # expansion becomes a (P, 3, 3) pair-indexed gather feeding
        # batched (P, K, 3) @ (P, 3, 3) einsums — MXU work. The previous
        # per-match formulation needed eighteen (M,)-element scalar
        # gathers per evaluation, and TPU scalar gathers move ~2 GB/s:
        # at 3M matches one Hessian-vector product took seconds, turning
        # the fit into an hours-long crawl (CLAUDE.md gather rule).
        matches = self.matches
        if not scipy.sparse.issparse(matches):
            matches = scipy.sparse.coo_matrix(matches)
        blocks = [
            (m.xys[0], m.xys[1], int(i), int(j))
            for m, i, j in zip(matches.data, matches.row, matches.col)
            if m.size > 0
        ]
        P = len(blocks)
        K = -(-max(len(b[0]) for b in blocks) // 128) * 128
        xa_p = np.zeros((P, K, 3), np.float32)
        xb_p = np.zeros((P, K, 3), np.float32)
        # Homogeneous coordinate 1 on EVERY row, padding included: a
        # zero-padded row would hit the norm at 0, whose backward pass
        # poisons the whole gradient with NaN (0 * inf) even under a
        # zero weight.
        xa_p[..., 2] = 1.0
        xb_p[..., 2] = 1.0
        w_p = np.zeros((P, K), np.float32)
        ia_p = np.zeros(P, np.int32)
        ib_p = np.zeros(P, np.int32)
        for p, (a, b, i, j) in enumerate(blocks):
            mlen = len(a)
            xa_p[p, :mlen, :2] = a
            xb_p[p, :mlen, :2] = b
            w_p[p, :mlen] = 1.0
            ia_p[p], ib_p[p] = i, j
        # Scan over fixed-size pair chunks: one compiled body regardless
        # of sequence length, bounded memory.
        pair_chunk = min(P, int(kwargs.pop("pair_chunk", 512)))
        n_chunks = -(-P // pair_chunk)
        padP = n_chunks * pair_chunk - P
        if padP:
            zpad = np.zeros((padP, K, 3), np.float32)
            zpad[..., 2] = 1.0  # same NaN guard as above
            xa_p = np.concatenate([xa_p, zpad])
            xb_p = np.concatenate([xb_p, zpad.copy()])
            w_p = np.concatenate([w_p, np.zeros((padP, K), np.float32)])
            ia_p = np.concatenate([ia_p, np.zeros(padP, np.int32)])
            ib_p = np.concatenate([ib_p, np.zeros(padP, np.int32)])
        xa_p = jnp.asarray(xa_p.reshape(n_chunks, pair_chunk, K, 3))
        xb_p = jnp.asarray(xb_p.reshape(n_chunks, pair_chunk, K, 3))
        w_p = jnp.asarray(w_p.reshape(n_chunks, pair_chunk, K))
        ia_p = jnp.asarray(ia_p.reshape(n_chunks, pair_chunk))
        ib_p = jnp.asarray(ib_p.reshape(n_chunks, pair_chunk))
        n_imgs = len(self.viewdirs)
        # Anchor frames are held EXACTLY fixed (free-parameter reduction)
        # instead of the reference's 1e6 quadratic penalty: the penalty
        # makes the Hessian's condition number ~1e10 against the ~1e-4
        # ray terms, which turns Newton-CG's inner loop into thousands of
        # device calls per step (and stalls quasi-Newton too). The
        # constraint is what the penalty was approximating.
        free = np.setdiff1d(
            np.arange(n_imgs), np.asarray(self.anchors, dtype=int)
        )
        free_j = jnp.asarray(free, dtype=jnp.int32)
        viewdirs_0 = jnp.asarray(self.viewdirs)

        eps2 = float(smooth) ** 2
        # Match blocks enter the jitted objective as ARGUMENTS, never as
        # closed-over arrays: jit would bake a closure's device arrays
        # into the executable as constants, fetching ~100 MB at lowering
        # time (the failure mode that lost the round-2 bench capture).
        data = (xa_p, xb_p, ia_p, ib_p, w_p)

        def objective(flat, data):
            xa_p, xb_p, ia_p, ib_p, w_p = data
            viewdirs = viewdirs_0.at[free_j].set(flat.reshape(-1, 3))
            R = proj.rotation_matrix(viewdirs, xp=jnp)  # (n_imgs, 3, 3)

            def unit_rays(xys, Rp):
                d = jnp.einsum(
                    "pkc,pcd->pkd", xys, Rp,
                    precision=jax.lax.Precision.HIGHEST,
                )
                norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
                return d / jnp.maximum(norm, 1e-20)

            def body(acc, args):
                cxa, cxb, cia, cib, cw = args
                r = unit_rays(cxa, R[cia]) - unit_rays(cxb, R[cib])
                if eps2 > 0.0:
                    term = jnp.sqrt(r * r + eps2)
                else:
                    term = jnp.abs(r)
                return acc + jnp.sum(cw[..., None] * term), None

            obj, _ = jax.lax.scan(
                body, jnp.float32(0.0), (xa_p, xb_p, ia_p, ib_p, w_p)
            )
            return obj

        grad_fn = jax.grad(objective)
        value_and_grad = jax.jit(jax.value_and_grad(objective))

        def fun(x):
            v, g = value_and_grad(jnp.asarray(x), data)
            return float(v), np.asarray(g, dtype=float)

        full0 = (
            self.initialize() if init == "chain" else self.viewdirs
        )
        x0 = np.asarray(full0)[free].ravel()
        if method.lower() == "lbfgs-device":
            return self._fit_lbfgs_device(
                objective, jnp.asarray(x0, jnp.float32), data, free, kwargs
            )
        scipy_kwargs = dict(kwargs)
        if method.lower() == "l-bfgs-b":
            # The smoothing floor adds ~n_matches * smooth to the
            # objective VALUE, so scipy's relative ftol default would
            # stop on the first flat-looking step; drive convergence by
            # the gradient instead.
            options = {"ftol": 1e-14, "gtol": 1e-7, "maxcor": 30,
                       "maxiter": 2000}
            options.update(scipy_kwargs.pop("options", {}))
            scipy_kwargs["options"] = options
        if method.lower() in ("newton-cg", "trust-ncg", "trust-krylov"):
            hessp_fn = jax.jit(
                lambda x, v, d: jax.jvp(
                    lambda xx: grad_fn(xx, d), (x,), (v,)
                )[1]
            )
            scipy_kwargs["hessp"] = lambda x, v: np.asarray(
                hessp_fn(jnp.asarray(x), jnp.asarray(v), data), dtype=float
            )
        result = scipy.optimize.minimize(
            fun=fun, x0=x0, jac=True, method=method, tol=tol,
            **scipy_kwargs,
        )
        # Re-expand to the full (n_images, 3) vector (anchors included)
        # so result.x keeps the reference fit's shape contract.
        full = self.viewdirs.copy()
        full[free] = np.asarray(result.x, dtype=float).reshape(-1, 3)
        result.x = full.ravel()
        self.reset_cameras()
        if not result.success:
            print(result.message)
        return result

    def _fit_lbfgs_device(self, objective, x0, data, free, kwargs):
        """Device-resident L-BFGS: the WHOLE optimizer loop is one jitted
        ``lax.while_loop`` (optax.lbfgs + zoom linesearch).

        The scipy drivers round-trip the host every objective/gradient/
        Hessian-vector evaluation — through a remote-tunnel TPU that is
        ~30 ms of RPC per call, and Newton-CG makes thousands of them
        (measured ~200 s per 1,000-frame fit, 40% of the whole
        stabilization stage). Here scipy's loop is replaced by optax's
        L-BFGS (the reference fits the same objective with BFGS,
        optimize.py:2075-2083); one dispatch runs every iteration on
        device and only the final parameters cross back.
        """
        import jax
        import jax.numpy as jnp
        import optax
        import optax.tree_utils as otu

        # Iterations run on device inside ONE dispatch, so the budget is
        # cheap: measured on the 1,000-frame ladder-5 objective (2,997
        # free params), 2,000 iterations beat Newton-CG's optimum in 26 s
        # and 4,000 add nothing; 400 under-converge (0.0083 deg). The
        # f32 gradient norm floors out at ~1e-2 on a sum-scaled
        # objective, so gtol is a best-case early exit, not the
        # expected stop.
        max_iter = int(kwargs.pop("maxiter", 2000))
        gtol = float(kwargs.pop("gtol", 1e-7))
        memory = int(kwargs.pop("memory_size", 30))
        opt = optax.lbfgs(memory_size=memory)

        @jax.jit
        def run(x0, data):
            fun_ = lambda x: objective(x, data)
            vg = optax.value_and_grad_from_state(fun_)

            def step_fn(carry):
                params, state = carry
                value, grad = vg(params, state=state)
                updates, state = opt.update(
                    grad, state, params, value=value, grad=grad,
                    value_fn=fun_,
                )
                return optax.apply_updates(params, updates), state

            def continuing(carry):
                _, state = carry
                it = otu.tree_get(state, "count")
                g = otu.tree_get(state, "grad")
                return (it == 0) | (
                    (it < max_iter) & (otu.tree_l2_norm(g) >= gtol)
                )

            params, state = jax.lax.while_loop(
                continuing, step_fn, (x0, opt.init(x0))
            )
            return (
                params,
                otu.tree_get(state, "count"),
                objective(params, data),
                otu.tree_l2_norm(otu.tree_get(state, "grad")),
            )

        xf, n_iter, fval, gnorm = run(x0, data)
        xf = np.asarray(xf, dtype=float)
        n_iter = int(n_iter)
        full = self.viewdirs.copy()
        full[free] = xf.reshape(-1, 3)
        result = scipy.optimize.OptimizeResult(
            x=full.ravel(), fun=float(fval), nit=n_iter,
            success=bool(np.isfinite(fval)),
            message=(
                "device L-BFGS converged (|g| < gtol)"
                if n_iter < max_iter
                else f"device L-BFGS iteration budget spent "
                     f"(|g| = {float(gnorm):.3e})"
            ),
        )
        self.reset_cameras()
        if not result.success:
            print(result.message)
        return result


# ---- RANSAC ---- #


def ransac(
    model,
    n: int,
    max_error: float,
    min_inliers: int,
    iterations: int = 100,
    rng: np.random.Generator = None,
    **kwargs: Any,
) -> Tuple[np.ndarray, np.ndarray]:
    """Random Sample Consensus over any model with .size/.fit/.errors.

    Samples are drawn without replacement and never repeat
    (optimize.py:2091-2188).
    """
    rng = np.random.default_rng() if rng is None else rng
    everything = np.arange(model.size)

    def evaluate(sample: np.ndarray):
        """Fit on the sample, grow a consensus set, refit, score."""
        seed_params = model.fit(sample, **kwargs)
        if seed_params is None:
            return None
        rest = np.setdiff1d(everything, sample)
        close = rest[model.errors(seed_params, rest) < max_error]
        if close.size <= min_inliers:
            return None
        consensus = np.concatenate((sample, close))
        refined = model.fit(consensus, **kwargs)
        if refined is None:
            return None
        return float(np.mean(model.errors(refined, consensus))), refined

    best_err, best_params = np.inf, None
    for sample in _ransac_samples(
        n=n, size=model.size, iterations=iterations, rng=rng
    ):
        scored = evaluate(np.asarray(sample))
        if scored is not None and scored[0] < best_err:
            best_err, best_params = scored
    if best_params is None:
        raise ValueError("Best fit does not meet acceptance criteria")
    inliers = np.flatnonzero(model.errors(best_params) <= max_error)
    return best_params, inliers


def _ransac_samples(
    n: int, size: int, iterations: int = 100, rng: np.random.Generator = None
) -> Generator[List[int], None, None]:
    """Yield non-repeating random index samples of size n."""
    if rng is None:
        rng = np.random.default_rng()
    if n >= size:
        raise ValueError("Sample size is larger or equal to total size")
    log = math.lgamma(size + 1) - math.lgamma(n + 1) - math.lgamma(size - n + 1)
    if log < 700:  # avoid float overflow in exp
        iterations = min(iterations, int(np.floor(np.exp(log))))
    seen = set()
    indices = np.arange(size)
    while len(seen) < iterations:
        rng.shuffle(indices)
        sample = frozenset(indices[:n])
        if sample not in seen:
            yield list(sample)
            seen.add(sample)


# ---- Keypoints (host-side OpenCV feeders) ---- #


def detect_keypoints(array, mask=None, method=None, root: bool = False, **kwargs):
    """Detect keypoints and descriptors (SIFT by default, RootSIFT optional)."""
    if cv2 is None:
        raise ImportError("OpenCV is required for keypoint detection")
    detector = (cv2.SIFT if method is None else method).create(**kwargs)
    img8 = np.asarray(array, dtype=np.uint8)
    mask8 = None if mask is None else np.asarray(mask, dtype=np.uint8)
    keypoints, descriptors = detector.detectAndCompute(img8, mask=mask8)
    if root and descriptors is not None:
        # RootSIFT: L1-normalize, then take the elementwise square root.
        l1 = descriptors.sum(axis=1, keepdims=True) + 1e-7
        descriptors = np.sqrt(descriptors / l1)
    return keypoints, descriptors


# cv2.SIFT_create kwarg names accepted by the device detector for drop-in
# compatibility (values are translated, not emulated exactly).
_DEVICE_DETECTOR_KWARGS = {
    "contrastThreshold": "contrast_threshold",
    "edgeThreshold": "edge_ratio",
    "sigma": "sigma0",
    "nOctaveLayers": "n_scales",
}


def detect_keypoints_device(arrays, masks=None, **kwargs):
    """Batched keypoint detection on the device (TPU DoG detector).

    Replaces per-image host SIFT (reference ``optimize.py:2442-2445`` fans
    it over processes; this host has one core) with
    :func:`glimpse_tpu.ops.features.detect_and_describe` — scale space,
    extrema, subpixel and descriptors all as dense device ops. Accepts
    common ``cv2.SIFT_create`` kwarg spellings.

    Returns a list of ``(pts (n, 2), descriptors (n, 128))`` per image.
    """
    from .ops import features

    for cv2_name, ours in _DEVICE_DETECTOR_KWARGS.items():
        if cv2_name in kwargs:
            kwargs[ours] = kwargs.pop(cv2_name)
    return features.detect_and_describe(arrays, masks=masks, **kwargs)


def match_keypoints_device(
    ka,
    kb,
    cross_check: bool = False,
    max_ratio: float = None,
    max_distance: float = None,
    return_ratios: bool = False,
    matcher=None,
):
    """Device-batched descriptor matching (same contract as match_keypoints).

    One (n_a, 128) @ (128, n_b) MXU matmul + top-2 per pair replaces the
    host FLANN KD-tree (SURVEY.md section 2.3); padding makes one compiled
    program serve every pair of a sequence.
    """
    from .ops import matching as matching_ops

    if matcher is None or isinstance(matcher, str):
        matcher = _shared_device_matcher()

    def empty():
        e = np.array([], dtype=float).reshape(0, 2)
        if return_ratios:
            return e, e.copy(), np.array([], dtype=float)
        return e, e.copy()

    pairs, ratios = matcher.match(
        ka[1], kb[1], max_ratio=max_ratio, cross_check=cross_check
    )
    if not len(pairs):
        return empty()
    uva = _keypoint_pts(ka[0])[pairs[:, 0]]
    uvb = _keypoint_pts(kb[0])[pairs[:, 1]]
    if max_distance:
        valid = np.linalg.norm(uva - uvb, axis=1) < max_distance
        uva, uvb, ratios = uva[valid], uvb[valid], ratios[valid]
    if return_ratios:
        return uva, uvb, ratios
    return uva, uvb


_KEYPOINT_PTS_CACHE: Dict[int, tuple] = {}


def _keypoint_pts(keypoints) -> np.ndarray:
    """(n, 2) coordinate array for a cv2.KeyPoint list, identity-cached
    (each image's keypoints are reused across all its sequence pairs).
    Device-detected keypoints are already coordinate arrays."""
    if isinstance(keypoints, np.ndarray):
        return keypoints
    key = id(keypoints)
    hit = _KEYPOINT_PTS_CACHE.get(key)
    if hit is not None and hit[0] is keypoints:
        return hit[1]
    if len(_KEYPOINT_PTS_CACHE) > 256:
        _KEYPOINT_PTS_CACHE.clear()
    pts = np.array([k.pt for k in keypoints], dtype=float).reshape(-1, 2)
    _KEYPOINT_PTS_CACHE[key] = (keypoints, pts)
    return pts


_DEVICE_MATCHER = None


def _shared_device_matcher():
    """Process-wide DescriptorMatcher so jit compilations are reused."""
    global _DEVICE_MATCHER
    if _DEVICE_MATCHER is None:
        from .ops.matching import DescriptorMatcher

        _DEVICE_MATCHER = DescriptorMatcher()
    return _DEVICE_MATCHER


def match_keypoints(
    ka,
    kb,
    mask=None,
    cross_check: bool = False,
    max_ratio: float = None,
    max_distance: float = None,
    return_ratios: bool = False,
    matcher=None,
):
    """Match keypoint descriptors (FLANN kNN with Lowe ratio and cross check).

    ``matcher='device'`` routes to :func:`match_keypoints_device` (batched
    MXU matmul matching); any cv2 matcher object is used directly; None
    builds a FLANN matcher.
    """
    if matcher == "device" or (
        matcher is not None and not hasattr(matcher, "knnMatch")
    ):
        return match_keypoints_device(
            ka, kb, cross_check=cross_check, max_ratio=max_ratio,
            max_distance=max_distance, return_ratios=return_ratios,
            matcher=matcher if not isinstance(matcher, str) else None,
        )
    if cv2 is None:
        raise ImportError("OpenCV is required for keypoint matching")
    if matcher is None:
        matcher = cv2.FlannBasedMatcher()

    def empty():
        e = np.array([], dtype=float).reshape(0, 2)
        if return_ratios:
            return e, e.copy(), np.array([], dtype=float)
        return e, e.copy()

    if mask is not None:
        mask = np.asarray(mask, dtype=np.uint8)
    compute_ratios = max_ratio or return_ratios
    k = 2 if compute_ratios else 1
    if len(ka[0]) < k or len(kb[0]) < k:
        return empty()
    matches = matcher.knnMatch(ka[1], kb[1], k=k, mask=mask)
    if cross_check:
        matches_ba = matcher.knnMatch(kb[1], ka[1], k=k, mask=mask)
        ba = {(m[0].trainIdx, m[0].queryIdx) for m in matches_ba}
        matches = [m for m in matches if (m[0].queryIdx, m[0].trainIdx) in ba]
    if max_ratio:
        # A zero second-nearest distance (duplicate descriptors, e.g. two
        # keypoints refined onto the same location) makes the ratio test
        # degenerate; such matches are ambiguous by definition — drop them.
        matches = [
            m
            for m in matches
            if m[1].distance > 0 and m[0].distance / m[1].distance < max_ratio
        ]
    if not matches:
        return empty()
    uva = _keypoint_pts(ka[0])[[m[0].queryIdx for m in matches]]
    uvb = _keypoint_pts(kb[0])[[m[0].trainIdx for m in matches]]
    if return_ratios:
        ratios = np.array(
            [m.distance / max(n_.distance, 1e-12) for m, n_ in matches]
        )
    if max_distance:
        valid = np.linalg.norm(uva - uvb, axis=1) < max_distance
        uva, uvb = uva[valid], uvb[valid]
        if return_ratios:
            ratios = ratios[valid]
    if return_ratios:
        return uva, uvb, ratios
    return uva, uvb


class _NumpyCLAHE:
    """cv2.CLAHE-compatible shim over :func:`helpers.clahe` (apply method)."""

    def __init__(self, clip_limit: float, tile_grid_size) -> None:
        self.clip_limit = float(clip_limit)
        self.tile_grid_size = tuple(tile_grid_size)

    def apply(self, array: np.ndarray) -> np.ndarray:
        return helpers.clahe(array, self.clip_limit, self.tile_grid_size)


class KeypointMatcher:
    """Sequence-scale keypoint detection and time-windowed pair matching.

    Keypoints and per-pair matches are memoized to pickle files; matches are
    stored as an upper-triangular COO matrix of :class:`Matches`
    (optimize.py:2312-2773).
    """

    def __init__(self, images: Iterable[Image], clahe=False) -> None:
        ordered = list(images)
        times = [img.datetime for img in ordered]
        if any(b < a for a, b in zip(times, times[1:])):
            raise ValueError("Images are not in ascending temporal order")
        self.images = np.asarray(ordered, dtype=object)
        self.clahe = self._make_clahe(clahe)
        self.keypoints = None
        self.matches = None

    @staticmethod
    def _make_clahe(spec):
        if spec is False:
            return None
        if cv2 is not None:
            return cv2.createCLAHE(**({} if spec is True else spec))
        # cv2-free fallback: pure-NumPy CLAHE with cv2-compatible kwargs
        # (reference silently requires cv2 here, optimize.py:2346-2365).
        kwargs = {} if spec is True else dict(spec)
        clip_limit = kwargs.pop("clipLimit", 40.0)
        tile_grid_size = kwargs.pop("tileGridSize", (8, 8))
        if kwargs:
            raise TypeError(f"Unknown CLAHE options: {sorted(kwargs)}")
        return _NumpyCLAHE(clip_limit, tile_grid_size)

    def _basenames(self) -> List[str]:
        basenames = [helpers.strip_path(img.path) for img in self.images]
        if len(basenames) != len(set(basenames)):
            raise ValueError("Image basenames are not unique")
        return basenames

    def _prepare_image(self, array: np.ndarray) -> np.ndarray:
        if array.ndim > 2:
            array = array.mean(axis=2)
        array = array.astype(np.uint8, copy=False)
        if self.clahe is not None:
            array = self.clahe.apply(array)
        return array

    def build_keypoints(
        self,
        masks=None,
        path=None,
        overwrite: bool = False,
        clear_images: bool = True,
        clear_keypoints: bool = False,
        parallel=False,
        detector=None,
        **kwargs: Any,
    ) -> None:
        """Detect (or load cached) keypoints for every image.

        ``detector='device'`` batches detection through the TPU DoG
        detector (:func:`detect_keypoints_device`) instead of per-image
        host SIFT; all cache semantics are shared.
        """
        if path:
            path = Path(path)
        if clear_keypoints and not path:
            raise ValueError("path is required when clear_keypoints is True")
        if path and path.is_file():
            raise ValueError("path must be a directory")
        basenames = self._basenames()
        if masks is None or isinstance(masks, np.ndarray):
            masks = [masks] * len(self.images)
        parallel = helpers._parse_parallel(parallel)
        if not self.keypoints:
            self.keypoints = [None] * len(self.images)
        if detector == "device":
            self._build_keypoints_device(
                masks, path, basenames, overwrite=overwrite,
                clear_images=clear_images, clear_keypoints=clear_keypoints,
                **kwargs,
            )
            return

        def detect(i: int, img: Image):
            array = self._prepare_image(img.read())
            found = detect_keypoints(array, mask=masks[i], **kwargs)
            if clear_images:
                img.array = None
            return found

        def job(i: int, img: Image):
            cache_file = path / f"{basenames[i]}.pkl" if path else None
            on_disk = cache_file is not None and cache_file.exists()
            known = self.keypoints[i]
            if overwrite or (known is None and not on_disk):
                known = detect(i, img)
                if cache_file:
                    helpers.write_pickle(known, path=cache_file)
            elif known is not None:
                if cache_file and not on_disk:
                    helpers.write_pickle(known, path=cache_file)
            elif not clear_keypoints:
                known = helpers.read_pickle(cache_file)
            return None if clear_keypoints else known

        with config.backend(np=parallel) as pool:
            self.keypoints = pool.map(
                func=job, sequence=tuple(enumerate(self.images)), star=True
            )

    def _build_keypoints_device(
        self,
        masks,
        path,
        basenames,
        overwrite: bool,
        clear_images: bool,
        clear_keypoints: bool,
        **kwargs: Any,
    ) -> None:
        """Batched device detection with the same cache contract as the
        host path: compute only what is neither in memory nor on disk."""
        cache_files = [
            path / f"{basenames[i]}.pkl" if path else None
            for i in range(len(self.images))
        ]
        todo = []
        for i in range(len(self.images)):
            on_disk = cache_files[i] is not None and cache_files[i].exists()
            if overwrite or (self.keypoints[i] is None and not on_disk):
                todo.append(i)
            elif self.keypoints[i] is not None:
                if cache_files[i] and not on_disk:
                    helpers.write_pickle(self.keypoints[i], path=cache_files[i])
            elif not clear_keypoints:
                self.keypoints[i] = helpers.read_pickle(cache_files[i])
        # Group by image shape so each batch compiles one program.
        arrays = {}
        for i in todo:
            arrays[i] = self._prepare_image(self.images[i].read())
            if clear_images:
                self.images[i].array = None
        by_shape: Dict[tuple, list] = {}
        for i in todo:
            by_shape.setdefault(arrays[i].shape, []).append(i)
        for idxs in by_shape.values():
            found = detect_keypoints_device(
                [arrays[i] for i in idxs], masks=[masks[i] for i in idxs],
                **kwargs,
            )
            for i, kp in zip(idxs, found):
                if cache_files[i]:
                    helpers.write_pickle(kp, path=cache_files[i])
                self.keypoints[i] = None if clear_keypoints else kp

    def build_matches(
        self,
        maxdt: datetime.timedelta = None,
        seq: Iterable[int] = None,
        imgs: Iterable[int] = None,
        keypoints_path=None,
        path=None,
        overwrite: bool = False,
        clear_keypoints: bool = True,
        clear_matches: bool = False,
        parallel=False,
        weights: bool = False,
        mtype=None,
        filter: dict = None,
        refine=False,
        **kwargs: Any,
    ) -> None:
        """Match each image to its temporal neighbors (maxdt window / seq offsets).

        ``refine`` (device matcher only): re-measure every matched pair
        displacement by batched template correlation on the device
        (:class:`ops.refine.MatchRefiner`), which removes the detector's
        coherent subpixel bias from the match graph. ``True`` for
        defaults, or a dict of MatchRefiner options. Requires images to be
        readable (they are re-read through the same grayscale/CLAHE prep
        as detection).
        """
        if path:
            path = Path(path)
        if keypoints_path:
            keypoints_path = Path(keypoints_path)
        if clear_matches and not path:
            raise ValueError("path is required when clear_matches is True")
        if path and path.is_file():
            raise ValueError("path must be a directory")
        parallel = helpers._parse_parallel(parallel)
        kwargs = {**kwargs, "return_ratios": weights}
        basenames = self._basenames()
        if self.keypoints is None:
            self.keypoints = [None] * len(self.images)
        if any(k is None for k in self.keypoints) and not keypoints_path:
            raise ValueError("Missing keypoints so keypoints_path is required")
        n = len(self.images)
        if maxdt is None and seq is None:
            matching_images = [np.arange(i + 1, n) for i in range(n)]
        elif maxdt is not None:
            datetimes = np.array([img.datetime for img in self.images])
            ends = np.searchsorted(datetimes, datetimes + maxdt, side="right")
            matching_images = [np.arange(i + 1, end) for i, end in enumerate(ends)]
        else:
            matching_images = [np.array([], dtype=int) for _ in range(n)]
        if seq is not None:
            seq = np.asarray(seq)
            seq = np.unique(seq[seq > 0])
            for i, m in enumerate(matching_images):
                iseq = seq + i
                iseq = iseq[: np.searchsorted(iseq, n)]
                matching_images[i] = np.unique(np.concatenate((m, iseq)))
        if imgs is not None:
            for i, m in enumerate(matching_images):
                matching_images[i] = m if i in imgs else m[np.isin(m, imgs)]

        def ensure_keypoints(k: int):
            if self.keypoints[k] is None:
                self.keypoints[k] = helpers.read_pickle(
                    keypoints_path / f"{basenames[k]}.pkl"
                )
            return self.keypoints[k]

        # Device path: instead of one dispatch per pair, match every
        # not-yet-cached pair up front in chunked batched dispatches (one
        # compiled program + one RPC per chunk; see ops.matching.match_pairs).
        precomputed = None
        if kwargs.get("matcher") == "device":
            need = []
            for i, js in enumerate(matching_images):
                for j in js:
                    cache_file = (
                        path / f"{basenames[i]}-{basenames[j]}.pkl"
                        if path
                        else None
                    )
                    if overwrite or cache_file is None or not cache_file.exists():
                        need.append((int(i), int(j)))
            precomputed = {}
            if need:
                involved = {k for ij in need for k in ij}
                for k in involved:
                    ensure_keypoints(k)
                no_desc = np.empty((0, 1), dtype=np.float32)
                descs = [
                    self.keypoints[k][1]
                    if (
                        k in involved
                        and self.keypoints[k] is not None
                        and self.keypoints[k][1] is not None
                    )
                    else no_desc
                    for k in range(n)
                ]
                found_all = _shared_device_matcher().match_pairs(
                    descs,
                    np.asarray(need, dtype=int),
                    max_ratio=kwargs.get("max_ratio"),
                    cross_check=kwargs.get("cross_check", False),
                )
                max_distance = kwargs.get("max_distance")
                no_uv = np.empty((0, 2), dtype=float)
                for (i, j), (idx, ratios) in zip(need, found_all):
                    if len(idx):
                        uva = _keypoint_pts(self.keypoints[i][0])[idx[:, 0]]
                        uvb = _keypoint_pts(self.keypoints[j][0])[idx[:, 1]]
                    else:
                        uva, uvb = no_uv, no_uv.copy()
                    if max_distance:
                        ok = np.linalg.norm(uva - uvb, axis=1) < max_distance
                        uva, uvb, ratios = uva[ok], uvb[ok], ratios[ok]
                    precomputed[(i, j)] = (
                        (uva, uvb, ratios) if weights else (uva, uvb)
                    )
                if refine and precomputed:
                    from .ops.refine import MatchRefiner

                    refiner = MatchRefiner(
                        **(refine if isinstance(refine, dict) else {})
                    )
                    keys = list(precomputed)
                    refined = refiner.refine_pairs(
                        keys,
                        [precomputed[key][:2] for key in keys],
                        lambda k: self._prepare_image(self.images[k].read()),
                    )
                    for key, ruv in zip(keys, refined):
                        precomputed[key] = ruv + precomputed[key][2:]

        def match_pair(i: int, j: int):
            """Load the cached pair match, or compute (and cache) it.

            Returns None when the result is not needed in memory.
            """
            cams = (self.images[i].cam, self.images[j].cam)
            cache_file = path / f"{basenames[i]}-{basenames[j]}.pkl" if path else None
            if cache_file and cache_file.exists() and not overwrite:
                if clear_matches:
                    return None
                match = helpers.read_pickle(cache_file)
                match.cams = cams
            else:
                found = (
                    precomputed.pop((int(i), int(j)), None)
                    if precomputed is not None
                    else None
                )
                if found is None:
                    found = match_keypoints(
                        ensure_keypoints(i), ensure_keypoints(j), **kwargs
                    )
                match = Matches(
                    cams=cams,
                    uvs=list(found[0:2]),
                    weights=(1 / found[2]) if weights else None,
                )
                if cache_file:
                    helpers.write_pickle(match, cache_file)
                if clear_matches:
                    return None
            return match.to_type(mtype) if mtype is not None else match

        def process(i: int, js: np.ndarray):
            found = [match_pair(i, j) for j in js]
            if clear_keypoints:
                self.keypoints[i] = None
            return None if clear_matches else found

        def reduce(matches):
            if filter and matches:
                for match in matches:
                    if match:
                        match.filter(**filter)
            return matches

        with config.backend(np=parallel) as pool:
            results = pool.map(
                func=process,
                reduce=reduce,
                star=True,
                sequence=tuple(enumerate(matching_images)),
            )
        if clear_matches:
            self.matches = None
            return
        data = np.concatenate([np.asarray(r, dtype=object) for r in results])
        rows = np.concatenate(
            [np.full(len(row), i, dtype=int) for i, row in enumerate(matching_images)]
        )
        cols = np.concatenate(matching_images) if len(matching_images) else np.array([])
        matches = scipy.sparse.coo_matrix((np.ones(len(data)), (rows, cols)))
        matches.data = data
        self.matches = matches
        self._assign_cameras()

    def _test_matches(self) -> None:
        if self.matches is None:
            raise ValueError("Matches have not been initialized. Run build_matches()")

    def _assign_cameras(self) -> None:
        for m, i, j in zip(self.matches.data, self.matches.row, self.matches.col):
            m.cams = (self.images[i].cam, self.images[j].cam)

    def convert_matches(self, mtype, clear_uvs: bool = False, parallel=False) -> None:
        """Convert all matches to a different type (optionally dropping uvs)."""
        self._test_matches()
        for i, m in enumerate(self.matches.data):
            m = m.to_type(mtype)
            if clear_uvs and mtype in (RotationMatchesXY, RotationMatchesXYZ):
                m.uvs = None
            self.matches.data[i] = m

    def filter_matches(self, clear_weights: bool = False, **kwargs: Any) -> None:
        """Filter all matches in place."""
        self._test_matches()
        for m in self.matches.data:
            if kwargs:
                m.filter(**kwargs)
            if clear_weights:
                m.weights = None

    def _images_mask(self, imgs) -> np.ndarray:
        if np.iterable(imgs):
            return np.isin(self.matches.row, imgs) | np.isin(self.matches.col, imgs)
        return (self.matches.row == imgs) | (self.matches.col == imgs)

    def matches_per_image(self) -> np.ndarray:
        """Total matched points per image."""
        self._test_matches()
        return np.array(
            [
                np.sum([m.size for m in self.matches.data[self._images_mask(i)]])
                for i in range(len(self.images))
            ]
        )

    def images_per_image(self) -> np.ndarray:
        """Number of images matched to each image."""
        self._test_matches()
        return np.array(
            [
                np.sum([m.size > 0 for m in self.matches.data[self._images_mask(i)]])
                for i in range(len(self.images))
            ]
        )

    def drop_images(self, imgs) -> None:
        """Drop images and all their matches, compacting the match matrix."""
        self._test_matches()
        hit = self._images_mask(imgs)
        self.matches.data[hit] = False
        self.matches.eliminate_zeros()
        # Renumber surviving images densely via an old->new lookup table.
        survivors = np.union1d(self.matches.row, self.matches.col)
        remap = np.full(len(self.images), -1, dtype=int)
        remap[survivors] = np.arange(survivors.size)
        self.matches.row = remap[self.matches.row]
        self.matches.col = remap[self.matches.col]
        self.matches._shape = (survivors.size, survivors.size)
        self.images = self.images[survivors]

    def match_breaks(self, min_matches: int = 0) -> np.ndarray:
        """Indices where the pairwise match chain is broken.

        Image ``i`` is a break when fewer than ``max(1, min_matches)`` match
        pairs start at it (capped by how many later images exist).
        """
        self._test_matches()
        n = len(self.images)
        pairs_from = np.zeros(n - 1, dtype=int)
        starts, counts = np.unique(self.matches.row, return_counts=True)
        pairs_from[starts] = counts
        available = (n - 1) - np.arange(n - 1)
        required = np.maximum(1, np.minimum(min_matches, available))
        return np.flatnonzero(pairs_from < required)


# ---- Batch reprojection ---- #


def project_images(
    cam: Camera,
    images: Iterable[Image],
    paths: Iterable[Union[str, Path]],
    u: np.ndarray = None,
    v: np.ndarray = None,
    overwrite: bool = False,
    method: str = "linear",
    grayscale: bool = False,
    parallel=False,
) -> None:
    """Reproject an image sequence into a common ideal camera (rectified video).

    The target grid is cast out once; each source image is sampled on its
    own projection of that grid with the vectorized interpolation ops
    (optimize.py:2776-2871).
    """
    paths = [str(path) for path in paths]
    if len(paths) != len(set(paths)):
        raise ValueError("Image output paths are not unique")
    if u is None:
        u = np.linspace(0.5, cam.imgsz[0] - 0.5, int(cam.imgsz[0]))
    if v is None:
        v = np.linspace(0.5, cam.imgsz[1] - 0.5, int(cam.imgsz[1]))
    U, V = np.meshgrid(u, v)
    uv = np.column_stack((U.ravel(), V.ravel()))
    dxyz = cam.uv_to_xyz(uv)
    parallel = helpers._parse_parallel(parallel)
    order = {"linear": 1, "nearest": 0}[method]

    def process(image: Image, path: str) -> None:
        path = Path(path)
        if path.exists() and not overwrite:
            return None
        puv = image.cam.xyz_to_uv(dxyz, directions=True)
        finite = np.isfinite(puv).all(axis=1)
        box_min = np.floor(np.nanmin(puv[finite], axis=0)).astype(int)
        box_max = np.ceil(np.nanmax(puv[finite], axis=0)).astype(int)
        box_min = np.maximum(box_min, 0)
        box_max = np.minimum(box_max, image.cam.imgsz)
        box = [*box_min, *box_max]
        local = puv - box_min
        array = image.read(box=box)
        if array.ndim < 3:
            array = array[:, :, None]
        if grayscale:
            array = array.mean(axis=2, keepdims=True)
        H, W = array.shape[0:2]
        rows = local[:, 1] - 0.5
        cols = local[:, 0] - 0.5
        oob = (
            ~finite | (rows < -0.5) | (rows > H - 0.5) | (cols < -0.5)
            | (cols > W - 0.5)
        )
        rows = np.where(oob, 0.0, rows)
        cols = np.where(oob, 0.0, cols)
        bands = []
        for i in range(array.shape[2]):
            vals = sampling_ops.sample_grid(
                array[:, :, i].astype(float), rows, cols, order=order, xp=np
            )
            vals[oob] = 0
            bands.append(vals.reshape(len(v), len(u)).astype(array.dtype))
        projected = np.dstack(bands)
        path.parent.mkdir(parents=True, exist_ok=True)
        geotiff.write(str(path), projected)
        return None

    with config.backend(np=parallel) as pool:
        pool.map(func=process, sequence=tuple(zip(images, paths)), star=True)
    return None
