"""Particle-filter tracking of world points through image time series."""
from .motion import (
    CartesianMotion,
    CylindricalMotion,
    Motion,
    TangentCartesianMotion,
    TangentCylindricalMotion,
)
from .observer import Observer
from .tracker import Tracker
from .tracks import Tracks

__all__ = [
    "Motion",
    "CartesianMotion",
    "CylindricalMotion",
    "TangentCartesianMotion",
    "TangentCylindricalMotion",
    "Observer",
    "Tracker",
    "Tracks",
]
