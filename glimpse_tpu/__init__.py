"""glimpse_tpu: TPU-native timelapse image calibration and velocity tracking.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
``glimpse`` package (time-lapse glacier photogrammetry and velocimetry):
distorted camera models, raster/DEM sampling with viewshed and horizon,
camera calibration and sequence stabilization, and a Bayesian particle-filter
tracker whose entire update step (projection, NCC template matching,
likelihood, resampling) runs on-device, batched over thousands of points.
"""
from . import config, convert, helpers, io, native, ops, optimize, parallel, profiling, render, svg
from .camera import Camera
from .exif import Exif
from .image import Image
from .raster import Grid, Raster, RasterInterpolant
from .track import (
    CartesianMotion,
    CylindricalMotion,
    Observer,
    TangentCartesianMotion,
    TangentCylindricalMotion,
    Tracker,
    Tracks,
)

__all__ = [
    "config",
    "convert",
    "helpers",
    "io",
    "native",
    "ops",
    "optimize",
    "parallel",
    "profiling",
    "render",
    "svg",
    "Camera",
    "Exif",
    "Image",
    "Grid",
    "Raster",
    "RasterInterpolant",
    "Observer",
    "Tracker",
    "Tracks",
    "CartesianMotion",
    "CylindricalMotion",
    "TangentCartesianMotion",
    "TangentCylindricalMotion",
]

__version__ = "0.1.0"
