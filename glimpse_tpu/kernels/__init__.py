"""Pallas TPU kernels for the hot ops."""
from . import highpass_pallas  # noqa: F401
