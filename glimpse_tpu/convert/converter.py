"""Fit between external camera models and the glimpse_tpu camera model.

Parity with the reference Converter
(``/root/reference/src/glimpse/convert/converter.py:20``): residuals are
evaluated on a regular image-point grid; either camera's selected
parameters are least-squares-optimized to minimize them. External cameras
with an *outgoing* distortion model implement ``_xy_to_uv``; those with an
*incoming* model implement ``_uv_to_xy``.
"""
from typing import Any, Dict, Iterable, Union

import numpy as np
import scipy.optimize

from .. import optimize as optimize_module
from ..camera import Camera

Parameters = Dict[str, Union[bool, int, Iterable[int]]]


class Converter:
    """Convert between an external camera and a glimpse camera.

    Both cameras must share an image size; residuals are computed at ``uv``
    image points (or a generated ~n-point grid when ``uv`` is an int).
    """

    def __init__(self, xcam, cam: Camera, uv: Union[np.ndarray, int] = 1000) -> None:
        if any(np.asarray(xcam.imgsz) != cam.imgsz):
            raise ValueError("Cameras have different image sizes.")
        self.xcam = xcam
        self.cam = cam
        if isinstance(uv, int):
            uv = self._grid(uv)
        self.uv = np.atleast_2d(uv)

    def _grid(self, n: int) -> np.ndarray:
        """Regular point grid with edge spacing half the point spacing."""
        imgsz = self.cam.imgsz
        d = np.sqrt(imgsz[0] * imgsz[1] / n)
        dx = imgsz[0] / round(imgsz[0] / d)
        dy = imgsz[1] / round(imgsz[1] / d)
        x = np.arange(0.5 * dx, imgsz[0], dx)
        y = np.arange(0.5 * dy, imgsz[1], dy)
        return np.reshape(np.meshgrid(x, y), (2, -1)).T

    def residuals(self) -> np.ndarray:
        """Image coordinate residuals cam - xcam at the test points.

        Outgoing xcam models (``_uv_to_xy``): points leave xcam and enter
        cam. Incoming models: points leave cam, then enter both cameras (the
        cam round trip cancels inversion error).
        """
        if hasattr(self.xcam, "_uv_to_xy"):
            predicted = self.cam._xy_to_uv(self.xcam._uv_to_xy(self.uv))
            return predicted - self.uv
        leave = self.cam._uv_to_xy(self.uv)
        into_cam, into_xcam = (
            c._xy_to_uv(leave) for c in (self.cam, self.xcam)
        )
        return into_cam - into_xcam

    def optimize_cam(self, params: Parameters, **kwargs: Any) -> None:
        """Least-squares fit of selected cam parameters to xcam."""
        mask, _ = optimize_module.Cameras.parse_params(params)
        vector = self.cam._vector

        def objective(values: np.ndarray) -> np.ndarray:
            vector[mask] = values
            return self.residuals().ravel()

        result = scipy.optimize.least_squares(
            objective, x0=vector[mask].copy(), **kwargs
        )
        vector[mask] = result.x

    def _xcam_slots(self, params: Parameters) -> list:
        """Resolve a {attribute: selection} spec into (name, indices) slots."""
        slots = []
        for name, selection in params.items():
            if not selection:
                continue
            width = np.atleast_1d(getattr(self.xcam, name)).size
            if selection is True:
                picked = np.arange(width)
            else:
                picked = np.atleast_1d(np.arange(width)[selection])
            slots.append((name, picked))
        return slots

    def _write_xcam(self, slots: list, flat: np.ndarray) -> None:
        """Scatter a flat parameter vector back into xcam attributes."""
        cursor = 0
        for name, picked in slots:
            values = np.atleast_1d(getattr(self.xcam, name)).astype(float)
            values[picked] = flat[cursor : cursor + picked.size]
            cursor += picked.size
            setattr(self.xcam, name, tuple(values) if values.size > 1 else values[0])

    def optimize_xcam(self, params: Parameters, **kwargs: Any) -> None:
        """Least-squares fit of selected xcam attributes to cam."""
        slots = self._xcam_slots(params)
        x0 = np.concatenate(
            [
                np.atleast_1d(getattr(self.xcam, name)).astype(float)[picked]
                for name, picked in slots
            ]
        )

        def fun(x: np.ndarray) -> np.ndarray:
            self._write_xcam(slots, x)
            return self.residuals().ravel()

        fit = scipy.optimize.least_squares(fun=fun, x0=x0, **kwargs)
        self._write_xcam(slots, fit.x)

    def plot(self, **kwargs: Any):
        """Quiver plot of residuals (xcam -> cam)."""
        import matplotlib.pyplot as plt

        kwargs = {
            "scale": 1, "width": 5, "color": "red", "scale_units": "xy",
            "angles": "xy", "units": "xy", **kwargs,
        }
        duv = kwargs["scale"] * self.residuals()
        return plt.quiver(self.uv[:, 0], self.uv[:, 1], duv[:, 0], duv[:, 1], **kwargs)
