"""Global configuration: precision, device mesh, and host parallelism.

The reference exposes a fork-based MapReduce pool and a matmul kill-switch
(``/root/reference/src/glimpse/config.py``). The TPU-native equivalents are:

- device parallelism via a :class:`jax.sharding.Mesh` (see
  :mod:`glimpse_tpu.parallel`), configured here by name;
- host-side thread pools for I/O-bound fan-out (image decode, file caches);
- a compute dtype knob for the device hot paths (bfloat16/float32).
"""
import concurrent.futures
import os
from typing import Optional

# Dtype used for device-side image/NCC math. float32 is the accuracy-safe
# default; bfloat16 halves HBM traffic where tolerances allow.
compute_dtype = "float32"

# Number of host worker threads for I/O-bound fan-out (image decode, caches).
host_workers: int = max(4, (os.cpu_count() or 4))

# Name of the mesh axis over which points/tracks are sharded.
points_axis: str = "points"

# matmul kill-switch kept for reference API parity (config.py:11-17). The
# TPU build has no fork-based workers, so this is always safe to leave True.
matmul = True


def thread_pool(max_workers: Optional[int] = None):
    """Return a thread pool for host-side I/O fan-out."""
    return concurrent.futures.ThreadPoolExecutor(max_workers or host_workers)


class _MapReduceBackend:
    """Minimal MapReduce-style pool over threads (reference config.py:4).

    Supports the subset of the sharedmem.MapReduce API the reference uses:
    ``with backend(np=n) as pool: pool.map(func, sequence, reduce=, star=)``.
    Work is I/O-bound on the host (decode, pickle caches), so threads suffice;
    device math never runs under this pool.
    """

    def __init__(self, np: int = 0):
        self.np = np

    def __enter__(self):
        return self

    def __exit__(self, *args):
        return False

    def map(self, func, sequence, reduce=None, star: bool = False):
        call = (lambda item: func(*item)) if star else func
        if self.np and self.np > 1:
            with concurrent.futures.ThreadPoolExecutor(self.np) as pool:
                results = list(pool.map(call, sequence))
        else:
            results = [call(item) for item in sequence]
        if reduce is not None:
            # sharedmem-compatible reduce: tuples are star-unpacked, None maps
            # to a call with defaults; map returns the reduce return values.
            def apply(r):
                if r is None:
                    return reduce()
                if isinstance(r, tuple):
                    return reduce(*r)
                return reduce(r)

            results = [apply(r) for r in results]
        return results


backend = _MapReduceBackend
