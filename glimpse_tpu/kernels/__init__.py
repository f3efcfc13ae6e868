"""Pallas TPU kernels for the hot ops.

- :mod:`.highpass_pallas` — lane-packed median high-pass (odd-even min/max
  network over whole vector registers); the template/search-tile filter.
- :mod:`.resample_pallas` — fused systematic resampling (searchsorted +
  bit-exact particle replication in one VMEM sweep); replaces the
  ~2 GB/s XLA gather engine in the particle-filter step.
"""
from . import highpass_pallas  # noqa: F401
from . import resample_pallas  # noqa: F401
