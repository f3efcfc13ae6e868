"""Pure array ops (NumPy host / JAX device) backing the glimpse_tpu API.

Every function in this package is a pure function over explicit arrays with no
object state, so the same math serves the host-side object API (float64
NumPy), and — jitted, vmapped, and sharded — the TPU hot paths.
"""
from . import projection  # noqa: F401
