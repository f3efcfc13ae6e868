"""Pallas TPU kernels for the hot ops."""
from . import ncc_pallas  # noqa: F401
