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
            return self.cam._xy_to_uv(self.xcam._uv_to_xy(self.uv)) - self.uv
        xy = self.cam._uv_to_xy(self.uv)
        return self.cam._xy_to_uv(xy) - self.xcam._xy_to_uv(xy)

    def optimize_cam(self, params: Parameters, **kwargs: Any) -> None:
        """Least-squares fit of selected cam parameters to xcam."""
        mask, _ = optimize_module.Cameras.parse_params(params)

        def fun(x: np.ndarray) -> np.ndarray:
            self.cam._vector[mask] = x
            return self.residuals().ravel()

        fit = scipy.optimize.least_squares(fun=fun, x0=self.cam._vector[mask], **kwargs)
        self.cam._vector[mask] = fit.x

    def optimize_xcam(self, params: Parameters, **kwargs: Any) -> None:
        """Least-squares fit of selected xcam attributes to cam."""
        indices = {k: slice(None) if v is True else v for k, v in params.items() if v}
        x0 = []
        for key, idx in indices.items():
            value = np.atleast_1d(getattr(self.xcam, key))
            x0.extend(np.atleast_1d(value[idx]))

        def apply(x: np.ndarray) -> None:
            i = 0
            for key, idx in indices.items():
                value = np.atleast_1d(getattr(self.xcam, key)).astype(float)
                n = len(value) if isinstance(idx, slice) else len(np.atleast_1d(idx))
                value[idx] = x[i : i + n]
                setattr(self.xcam, key, tuple(value) if len(value) > 1 else value[0])
                i += n

        def fun(x: np.ndarray) -> np.ndarray:
            apply(x)
            return self.residuals().ravel()

        fit = scipy.optimize.least_squares(fun=fun, x0=x0, **kwargs)
        apply(fit.x)

    def plot(self, **kwargs: Any):
        """Quiver plot of residuals (xcam -> cam)."""
        import matplotlib.pyplot as plt

        kwargs = {
            "scale": 1, "width": 5, "color": "red", "scale_units": "xy",
            "angles": "xy", "units": "xy", **kwargs,
        }
        duv = kwargs["scale"] * self.residuals()
        return plt.quiver(self.uv[:, 0], self.uv[:, 1], duv[:, 0], duv[:, 1], **kwargs)
