"""Pallas TPU kernels for the hot ops."""
from . import highpass_pallas, ncc_pallas  # noqa: F401
