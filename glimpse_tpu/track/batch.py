"""Fully batched on-device particle filter: the TPU-native tracker core.

The reference tracks ONE point per forked process, with a Python loop over
time and OpenCV calls per step (``/root/reference/src/glimpse/track/
tracker.py:225-417``; SURVEY.md sections 3.1, 7). This module is the
TPU-first redesign: a single jitted program tracks *thousands* of points at
once —

- state is a pytree ``(particles[N,P,6], weights[N,P], templates, key)``;
- time is a ``lax.scan`` (the PF recurrence is inherently sequential);
- points and particles are batched array axes; the points axis shards over
  a device :class:`~jax.sharding.Mesh` (see :mod:`glimpse_tpu.parallel`);
- the observation kernel (project -> extract search tiles -> normalize +
  histogram-match + median-highpass -> SSE -> cubic-spline sample) is the
  fused batched op pipeline from :mod:`glimpse_tpu.ops`;
- randomness is explicit PRNG-key threading;
- the whole PF state is a checkpointable pytree (save/restore mid-sequence).

Static-shape design notes (SURVEY.md section 7 "hard parts"): the reference
computes per-step search boxes from the particle spread; under jit the
search window is a fixed budget (``search_size``) centered on the projected
weighted particle mean, and particles projecting outside the window incur a
quadratic distance penalty instead of the reference's skip-with-warning.

Numerical-stability improvement over the reference: log-likelihoods are
shifted by their per-point minimum before exponentiation, so weights cannot
collectively underflow to the 1e-300 floor.
"""
import dataclasses
import functools
from typing import Any, Optional, Sequence, Tuple

import numpy as np

from ..ops import imageproc, ncc, projection, resampling
from ..ops import sampling as sampling_ops

try:  # JAX is required for this module's device paths.
    import jax
    import jax.numpy as jnp
except ImportError:  # pragma: no cover
    jax = None
    jnp = None


# ---- Device raster (DEM) ---- #


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceRaster:
    """A raster living in device memory: values + affine grid."""

    array: Any  # (H, W)
    x0: Any  # world x of the left outer edge
    y0: Any  # world y of the top outer edge
    dx: Any  # signed cell size in x
    dy: Any  # signed cell size in y

    def _use_dense(self, n_samples: int) -> bool:
        """Gather-free dense sampling pays off on TPU for small rasters at
        particle-filter sample counts (scalar gathers ~13 ms/M elements)."""
        H, W = self.array.shape
        return (
            jax.default_backend() in ("tpu", "axon")
            and H * W <= sampling_ops.DENSE_SAMPLE_MAX_CELLS
            and n_samples >= 4096
        )

    def sample(self, xy):
        """Bilinear sample at world points (..., 2)."""
        cols = (xy[..., 0] - self.x0) / self.dx - 0.5
        rows = (xy[..., 1] - self.y0) / self.dy - 0.5
        if self.array.shape == (1, 1):
            # Constant raster: every sample is the single cell value.
            return jnp.broadcast_to(self.array[0, 0], rows.shape)
        if self._use_dense(rows.size):
            return sampling_ops.grid_sample_bilinear_dense(
                self.array, rows, cols
            )
        return sampling_ops.bilinear_sample(self.array, rows, cols, xp=jnp)

    def sample_nearest(self, xy):
        """Order-0 (nearest-cell) sample at world points (..., 2).

        The device twin of ``Raster.sample(..., order=0)`` used by the
        reference's per-step particle validity test
        (``/root/reference/src/glimpse/track/tracker.py:106-119``).
        Out-of-extent points clamp to the edge cells.
        """
        H, W = self.array.shape
        cols = jnp.clip(
            jnp.floor((xy[..., 0] - self.x0) / self.dx).astype(jnp.int32),
            0, W - 1,
        )
        rows = jnp.clip(
            jnp.floor((xy[..., 1] - self.y0) / self.dy).astype(jnp.int32),
            0, H - 1,
        )
        if self.array.shape == (1, 1):
            return jnp.broadcast_to(self.array[0, 0], rows.shape)
        if self._use_dense(rows.size):
            return sampling_ops.grid_sample_nearest_dense(
                self.array, rows, cols
            )
        return self.array[rows, cols]

    def tree_flatten(self):
        return (self.array, self.x0, self.y0, self.dx, self.dy), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def constant(cls, value: float) -> "DeviceRaster":
        """An infinite-extent constant raster."""
        return cls(
            array=jnp.full((1, 1), float(value), dtype=jnp.float32),
            x0=jnp.float32(0.0), y0=jnp.float32(0.0),
            dx=jnp.float32(1e30), dy=jnp.float32(1e30),
        )

    @classmethod
    def from_raster(cls, raster) -> "DeviceRaster":
        """Upload a host :class:`glimpse_tpu.Raster`."""
        return cls(
            array=jnp.asarray(raster.array, dtype=jnp.float32),
            x0=jnp.float32(raster.xlim[0]), y0=jnp.float32(raster.ylim[0]),
            dx=jnp.float32(raster.d[0]), dy=jnp.float32(raster.d[1]),
        )


# ---- Motion models (batched, functional) ---- #


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BatchMotion:
    """Per-point motion-model parameters for N points (one model kind).

    Mirrors the reference motion models (motion.py:92-522) with every
    parameter batched on the points axis. Polar ("cylindrical") variants
    draw (speed, angle) noise; tangent variants glue z to the DEM with a
    slope-scaled random walk.
    """

    kind: str  # 'cartesian' | 'cylindrical' | 'tangent' | 'tangent_cylindrical'
    xy: Any  # (N, 2) initial position means
    xy_sigma: Any  # (N, 2)
    v_mean: Any  # (N, 3) cartesian: vxyz; cylindrical: (vr, theta, vz)
    v_sigma: Any  # (N, 3)
    a_mean: Any  # (N, 3) accelerations (same convention)
    a_sigma: Any  # (N, 3)
    slope_sigma: Any  # (N,) tangent models' small-scale slope
    dem: DeviceRaster
    dem_sigma: DeviceRaster
    use_dem_sigma: bool = True

    def tree_flatten(self):
        children = (
            self.xy, self.xy_sigma, self.v_mean, self.v_sigma, self.a_mean,
            self.a_sigma, self.slope_sigma, self.dem, self.dem_sigma,
        )
        return children, (self.kind, self.use_dem_sigma)

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, use_dem_sigma = aux
        return cls(kind, *children, use_dem_sigma=use_dem_sigma)

    @property
    def n_points(self) -> int:
        return self.xy.shape[0]

    @classmethod
    def from_motions(cls, motions: Sequence) -> "BatchMotion":
        """Stack host per-point motion models into one batched model.

        Accepts a sequence of host :class:`~glimpse_tpu.track.motion`
        models (the reference's one-model-per-point pattern), all of the
        same class and sharing DEM rasters. The migration bridge from
        ``Tracker.track([motions...])`` to the device tracker.
        """
        from . import motion as host_motion

        first = motions[0]
        kinds = {
            host_motion.CartesianMotion: "cartesian",
            host_motion.CylindricalMotion: "cylindrical",
            host_motion.TangentCartesianMotion: "tangent",
            host_motion.TangentCylindricalMotion: "tangent_cylindrical",
        }
        kind = kinds.get(type(first))
        if kind is None:
            raise TypeError(f"Unsupported motion model {type(first).__name__}")
        if any(type(m) is not type(first) for m in motions):
            raise ValueError("All motion models must be of the same class")
        if any(m.dem is not first.dem for m in motions):
            raise ValueError("All motion models must share the same dem")

        def stack(attr, width, pad_zero: bool = True):
            rows = []
            for m in motions:
                v = np.atleast_1d(np.asarray(getattr(m, attr), dtype=np.float32))
                if v.size < width:
                    v = np.concatenate([v, np.zeros(width - v.size, np.float32)])
                rows.append(v[:width])
            return jnp.asarray(np.stack(rows))

        if kind == "cartesian":
            v, vs, a, as_ = "vxyz", "vxyz_sigma", "axyz", "axyz_sigma"
        elif kind == "cylindrical":
            v, vs, a, as_ = "vrthz", "vrthz_sigma", "arthz", "arthz_sigma"
        elif kind == "tangent":
            v, vs, a, as_ = "vxy", "vxy_sigma", "axy", "axy_sigma"
        else:
            v, vs, a, as_ = "vrth", "vrth_sigma", "arth", "arth_sigma"
        slope = (
            stack("slope_sigma", 1)[:, 0]
            if hasattr(first, "slope_sigma")
            else jnp.zeros(len(motions), jnp.float32)
        )
        dem_sigma = getattr(first, "dem_sigma", None)
        return cls(
            kind=kind,
            xy=stack("xy", 2),
            xy_sigma=stack("xy_sigma", 2),
            v_mean=stack(v, 3),
            v_sigma=stack(vs, 3),
            a_mean=stack(a, 3),
            a_sigma=stack(as_, 3),
            slope_sigma=slope,
            dem=DeviceRaster.from_raster(first.dem),
            dem_sigma=(
                DeviceRaster.constant(0.0)
                if dem_sigma is None
                else DeviceRaster.from_raster(dem_sigma)
            ),
            use_dem_sigma=dem_sigma is not None,
        )

    def initialize(self, key, n_particles: int, noise=None):
        """Initial particles (N, P, 6).

        ``noise`` optionally injects the standard-normal draws (keys "xy"
        (N,P,2), "z" (N,P), "v" (N,P,3)) for lockstep validation against the
        host motion models.
        """
        N, P = self.n_points, n_particles
        noise = noise or {}
        k1, k2, k3 = jax.random.split(key, 3)
        xy_noise = noise.get("xy", None)
        if xy_noise is None:
            xy_noise = jax.random.normal(k1, (N, P, 2))
        xy = self.xy[:, None, :] + self.xy_sigma[:, None, :] * xy_noise
        z = self.dem.sample(xy)
        if self.use_dem_sigma:
            z_sigma = self.dem_sigma.sample(xy)
            z_noise = noise.get("z", None)
            if z_noise is None:
                z_noise = jax.random.normal(k2, (N, P))
            z = z + z_sigma * z_noise
        v_noise = noise.get("v", None)
        if v_noise is None:
            v_noise = jax.random.normal(k3, (N, P, 3))
        v = self.v_mean[:, None, :] + self.v_sigma[:, None, :] * v_noise
        if self.kind in ("cylindrical", "tangent_cylindrical"):
            vx = v[..., 0] * jnp.cos(v[..., 1])
            vy = v[..., 0] * jnp.sin(v[..., 1])
            vz = v[..., 2] if self.kind == "cylindrical" else jnp.zeros_like(vx)
            v = jnp.stack([vx, vy, vz], axis=-1)
        if self.kind == "tangent":
            v = v.at[..., 2].set(0.0)
        return jnp.concatenate([xy, z[..., None], v], axis=-1)

    def evolve(self, key, particles, dt_units, noise=None):
        """One motion step (N, P, 6) -> (N, P, 6).

        ``noise`` optionally injects the standard-normal draws (keys "a"
        (N,P,3), "zwalk" (N,P)) for lockstep validation.
        """
        noise = noise or {}
        k1, k2 = jax.random.split(key)
        N, P = particles.shape[0], particles.shape[1]
        a_noise = noise.get("a", None)
        if a_noise is None:
            a_noise = jax.random.normal(k1, (N, P, 3))
        a = self.a_mean[:, None, :] + self.a_sigma[:, None, :] * a_noise
        if self.kind in ("cylindrical", "tangent_cylindrical"):
            vx, vy = particles[..., 3], particles[..., 4]
            vr = jnp.sqrt(vx * vx + vy * vy)
            vr_safe = jnp.where(vr > 0, vr, 1.0)
            ax = a[..., 0] * (vx / vr_safe) - vy * a[..., 1]
            ay = a[..., 0] * (vy / vr_safe) + vx * a[..., 1]
            az = a[..., 2] if self.kind == "cylindrical" else jnp.zeros_like(ax)
            a = jnp.stack([ax, ay, az], axis=-1)
        tangent = self.kind in ("tangent", "tangent_cylindrical")
        if tangent:
            a = a.at[..., 2].set(0.0)
        dxyz = dt_units * particles[..., 3:6] + 0.5 * a * dt_units ** 2
        if tangent:
            # z offsets survive resampling by reconstruction from current z.
            z_offsets = particles[..., 2] - self.dem.sample(particles[..., 0:2])
            step_len = jnp.sqrt(jnp.sum(dxyz[..., 0:2] ** 2, axis=-1))
            walk_noise = noise.get("zwalk", None)
            if walk_noise is None:
                walk_noise = jax.random.normal(k2, (N, P))
            z_offsets = z_offsets + (
                self.slope_sigma[:, None] * walk_noise * step_len
            )
            xy = particles[..., 0:2] + dxyz[..., 0:2]
            z = self.dem.sample(xy) + z_offsets
            v = particles[..., 3:6] + dt_units * a
            return jnp.concatenate([xy, z[..., None], v], axis=-1)
        pos = particles[..., 0:3] + dxyz
        v = particles[..., 3:6] + dt_units * a
        return jnp.concatenate([pos, v], axis=-1)

    def log_likelihoods(self, particles):
        """DEM-distance prior (N, P), or zeros when not applicable."""
        if self.kind != "cartesian" and self.kind != "cylindrical":
            return jnp.zeros(particles.shape[:2], dtype=particles.dtype)
        if not self.use_dem_sigma:
            return jnp.zeros(particles.shape[:2], dtype=particles.dtype)
        xy = particles[..., 0:2]
        z = self.dem.sample(xy)
        z_sigma = self.dem_sigma.sample(xy)
        safe = jnp.where(z_sigma > 0, z_sigma, 1.0)
        ll = (z - particles[..., 2]) ** 2 / (2 * safe * safe)
        return jnp.where(z_sigma > 0, ll, 0.0)


# ---- Tracker configuration and state ---- #


@dataclasses.dataclass(frozen=True)
class BatchConfig:
    """Static configuration of the batched tracker (hashable, jit-static)."""

    n_particles: int = 500
    template_size: Tuple[int, int] = (15, 15)  # (height, width)
    search_size: Tuple[int, int] = (31, 31)  # (height, width)
    highpass_size: Tuple[int, int] = (5, 5)
    interpolation_order: int = 3
    # Histogram matching runs against a fixed-size quantile table (lossless
    # when >= template pixel count; SURVEY.md hard-part 3).
    n_quantiles: int = 256
    # SSE likelihood sampling mode:
    #   'einsum' (default): EXACT bicubic evaluation with zero gathers —
    #     dense per-axis basis weights contracted against the coefficient
    #     grid on the MXU.
    #   'nearest'/'bilinear': evaluate the spline on an ``sse_upsample``-x
    #     regular fine grid with MXU matmuls, then sample it by nearest
    #     neighbor (1 gather) or bilinearly (4 gathers); with
    #     ``sse_upsample <= 1`` falls back to direct 16-gather evaluation.
    sse_upsample: int = 8
    sse_sample_mode: str = "einsum"  # 'einsum' | 'nearest' | 'bilinear'
    # Tile extraction: 'matmul' builds one-hot selectors and uses the MXU;
    # 'gather' uses vmapped dynamic slices.
    extract_mode: str = "matmul"
    resample_method: str = "systematic"
    # Median high-pass implementation: 'auto' resolves to the fused Pallas
    # kernel on a single TPU chip and to the XLA sort-median under a device
    # mesh (Pallas custom calls do not partition) or on CPU.
    highpass_mode: str = "auto"  # 'auto' | 'xla' | 'pallas'
    # Resample implementation: 'pallas' fuses systematic searchsorted +
    # particle gather in one VMEM sweep (kernels/resample_pallas.py; the
    # XLA take_along_axis gather alone costs ~80% of the step at production
    # shapes). 'auto' resolves to Pallas on TPU when resample_method is
    # 'systematic', else to the XLA merge-rank + gather path.
    resample_mode: str = "auto"  # 'auto' | 'xla' | 'pallas'
    # Pallas resample kernel shape knobs: source-window width, output
    # chunk height per sweep (multiples of 128), and kernel layout
    # ('mxu_shared' = production: one scalar section per (block, chunk),
    # block-level bf16 pre-split, one stacked MXU select per round —
    # 18.9 ms at 10,240 x 2,048 vs mxu_rows' 43-58 ms, round-5 sweep;
    # 'mxu_rows' / 'direct' / 'lanes' are the earlier bit-identical
    # layouts; see resample_pallas.py).
    resample_window: int = 384
    resample_chunk: int = 128
    resample_layout: str = "mxu_shared"
    # Points per kernel grid step ('mxu_shared'/'mxu_rows' layouts).
    resample_points_block: int = 16
    # Whether step outputs include full 6x6 weighted covariances.
    return_covariances: bool = False
    # Effective-sample-size-triggered resampling: None resamples every step
    # and overwrites weights with the per-step likelihood (reference
    # tracker.py:126-223 parity). A fraction in (0, 1] switches to proper
    # SIR weight accumulation, resampling a point only when its ESS drops
    # below ``resample_threshold * n_particles`` — less resampling noise.
    resample_threshold: Any = None
    # Keep float32: bfloat16 runs but measured ~7x worse trajectory
    # accuracy with no meaningful speed gain (the step is dominated by the
    # resample sweep, histogram sorts, and elementwise work, not matmuls).
    dtype: Any = jnp.float32 if jnp is not None else None

    def __post_init__(self) -> None:
        if self.sse_sample_mode not in ("einsum", "nearest", "bilinear"):
            raise ValueError(
                f"sse_sample_mode must be 'einsum', 'nearest', or 'bilinear',"
                f" got {self.sse_sample_mode!r}"
            )
        if self.extract_mode not in ("matmul", "gather"):
            raise ValueError(
                f"extract_mode must be 'matmul' or 'gather',"
                f" got {self.extract_mode!r}"
            )
        if self.resample_method not in (
            "systematic", "stratified", "residual", "choice"
        ):
            raise ValueError(
                f"unknown resample_method {self.resample_method!r}"
            )
        if self.interpolation_order not in (1, 3):
            raise ValueError(
                f"interpolation_order must be 1 or 3,"
                f" got {self.interpolation_order!r}"
            )
        if self.highpass_mode not in ("auto", "xla", "pallas"):
            raise ValueError(
                f"highpass_mode must be 'auto', 'xla', or 'pallas',"
                f" got {self.highpass_mode!r}"
            )
        if self.resample_layout not in (
            "mxu_shared", "mxu_rows", "direct", "lanes"
        ):
            raise ValueError(
                f"resample_layout must be one of"
                f" mxu_shared|mxu_rows|direct|lanes,"
                f" got {self.resample_layout!r}"
            )
        if self.resample_points_block < 8 or self.resample_points_block % 8:
            raise ValueError(
                f"resample_points_block must be a positive multiple of 8,"
                f" got {self.resample_points_block!r}"
            )
        if self.resample_mode not in ("auto", "xla", "pallas"):
            raise ValueError(
                f"resample_mode must be 'auto', 'xla', or 'pallas',"
                f" got {self.resample_mode!r}"
            )
        if self.resample_mode == "pallas" and self.resample_method != "systematic":
            raise ValueError(
                "resample_mode='pallas' supports only"
                " resample_method='systematic'"
            )
        if self.highpass_mode == "pallas":
            kh, kw = self.highpass_size
            if kh % 2 == 0 or kw % 2 == 0 or kh * kw > 49:
                raise ValueError(
                    "highpass_mode='pallas' requires odd highpass_size taps"
                    f" with at most 49 total, got {self.highpass_size}"
                )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BatchState:
    """Checkpointable PF state: everything needed to resume mid-sequence."""

    particles: Any  # (N, P, 6)
    weights: Any  # (N, P)
    key: Any  # PRNG key
    templates: Any  # (O, N, th, tw) high-passed template tiles
    template_table: Any  # (O, N, K) quantile table of pre-highpass values
    template_duv: Any  # (O, N, 2) subpixel offsets
    step: Any  # scalar int
    valid: Any = None  # (N,) 1.0 while the per-step particle test passes

    def tree_flatten(self):
        return (
            self.particles, self.weights, self.key, self.templates,
            self.template_table, self.template_duv, self.step, self.valid,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


# ---- Observation kernel ---- #


def _particle_validity(particles, viewshed: Optional[DeviceRaster]):
    """Per-point particle validity: (N,) 1.0 where ALL particles pass.

    The TPU-first translation of the reference's ``test_particles``
    (``/root/reference/src/glimpse/track/tracker.py:106-119``, called after
    initialize and after every evolve at ``:329,334``): any particle on a
    non-visible viewshed cell (order-0 sample) or with a NaN component
    invalidates the whole point. The reference raises and fault-contains
    the track; under jit the failure is folded into a validity output
    that :func:`to_tracks` bridges back into per-track errors.
    """
    ok = jnp.all(jnp.isfinite(particles), axis=(1, 2))
    if viewshed is not None:
        visible = viewshed.sample_nearest(particles[..., 0:2])  # (N, P)
        ok = ok & jnp.all(visible > 0, axis=-1)
    return ok


def _gather_rows(particles, weights, idx):
    """Replicate resampled particle rows (+ carried weights) by index.

    One fused (N, P, 7) row gather replicates particles + weights
    together: ~2x faster than two separate ``take_along_axis`` on TPU.
    Still the slow path there (~2 GB/s gather engine) — the systematic
    default uses :func:`_fused_resample` instead.
    """
    pw = jnp.concatenate([particles, weights[..., None]], axis=-1)
    pw = jnp.take_along_axis(pw, idx[..., None], axis=1)
    return pw[..., :6], pw[..., 6]


def _fused_resample(particles, weights, u, mesh=None, window=384, chunk=128,
                    layout="mxu_shared", points_block=16):
    """Systematic resample via the fused Pallas kernel (no gather engine).

    ``u``: (N, 1) comb offsets. Returns (particles, weights) resampled —
    exact row copies, searchsorted-left tie semantics. Under a device mesh
    the kernel is shard_map-wrapped over the points axis (Pallas custom
    calls do not partition on their own); on non-TPU backends it runs in
    the Pallas interpreter.
    """
    from ..kernels.resample_pallas import systematic_resample_gather

    P = weights.shape[-1]
    # The threshold table must hold exact particle counts: bfloat16 state
    # would quantize P * cum to ~8 bits, so build it in float32 always.
    wn = weights.astype(jnp.float32)
    wn = wn / jnp.sum(wn, axis=-1, keepdims=True)
    t = P * jnp.cumsum(wn, axis=-1) - u.astype(jnp.float32)
    cols = [particles[..., k] for k in range(6)] + [weights]
    interpret = jax.default_backend() not in ("tpu", "axon")
    kernel = functools.partial(
        systematic_resample_gather, interpret=interpret,
        window=window, chunk=chunk, layout=layout,
        points_block=points_block,
    )
    if mesh is not None:
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec

        spec = PartitionSpec(mesh.axis_names[0])
        kernel = shard_map(
            kernel, mesh=mesh, in_specs=(spec, [spec] * 7),
            out_specs=[spec] * 7, check_rep=False,
        )
    out = kernel(t, cols)
    return jnp.stack(out[:6], axis=-1), out[6]


def _extract_tiles(image, corners, size: Tuple[int, int]):
    """Gather (N,) fixed-size tiles from one image.

    ``corners`` are integer (row, col) upper-left corners (N, 2), already
    clamped to the image. One dynamic_slice per point, vmapped.
    """

    def one(corner):
        return jax.lax.dynamic_slice(image, (corner[0], corner[1]), size)

    return jax.vmap(one)(corners)


def _extract_tiles_matmul(image, corners, size: Tuple[int, int], dtype=None):
    """Tile extraction as two one-hot matmuls (MXU) instead of gathers.

    out[n, i, j] = image[r0_n + i, c0_n + j] expressed as
    R_n @ image @ C_n^T with one-hot selector matrices built from iota
    comparisons. TPU gathers run at ~10 ms per million elements; the
    equivalent matmuls take well under a millisecond.
    """
    H, W = image.shape
    th, tw = size
    if dtype is None:
        dtype = image.dtype
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, 1, H), 2)
    iota_th = jax.lax.broadcasted_iota(jnp.int32, (1, th, 1), 1)
    rows_onehot = (corners[:, 0][:, None, None] + iota_th == iota_h).astype(dtype)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    iota_tw = jax.lax.broadcasted_iota(jnp.int32, (1, tw, 1), 1)
    cols_onehot = (corners[:, 1][:, None, None] + iota_tw == iota_w).astype(dtype)
    rows = jnp.einsum(
        "nih,hw->niw", rows_onehot, image.astype(dtype),
        preferred_element_type=dtype,
    )
    return jnp.einsum(
        "niw,njw->nij", rows, cols_onehot, preferred_element_type=dtype
    )


@functools.lru_cache(maxsize=8)
def _quantile_interp_matrix(n: int, K: int):
    """Constant (K, n) matrix: column j linearly interpolates a K-entry
    quantile table at quantile (j + 1) / n (two nonzeros per column)."""
    S = np.zeros((K, n), np.float32)
    pos = np.clip((np.arange(n) + 1.0) / n * K - 0.5, 0.0, K - 1.0)
    i0 = np.minimum(np.floor(pos).astype(np.int64), K - 2)
    fr = pos - i0
    cols = np.arange(n)
    S[i0, cols] += 1.0 - fr
    S[i0 + 1, cols] += fr
    return S


def _device_highpass(t, size, mode: str = "auto", mesh=None):
    """Median high-pass on the device path.

    ``mode='pallas'`` uses the fused min/max-network kernel (bit-exact,
    ~10x faster than the sort-based ``jnp.median`` on TPU); ``'xla'`` the
    portable path. ``'auto'`` picks Pallas on a TPU backend (odd tap
    counts up to 7x7 only). BatchTracker resolves 'auto' once at
    construction. Under a device mesh the Pallas call is wrapped in
    ``shard_map`` over the points axis (custom calls do not partition on
    their own); on non-TPU backends it runs in the Pallas interpreter.
    """
    kh, kw = size
    pallas_ok = kh % 2 == 1 and kw % 2 == 1 and kh * kw <= 49
    use_pallas = mode == "pallas" or (
        mode == "auto"
        and pallas_ok
        and jax.default_backend() in ("tpu", "axon")
    )
    if use_pallas:
        from ..kernels.highpass_pallas import median_highpass

        interpret = jax.default_backend() not in ("tpu", "axon")
        kernel = functools.partial(
            median_highpass, size=(kh, kw), interpret=interpret
        )
        if mesh is not None:
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec

            spec = PartitionSpec(mesh.axis_names[0])
            kernel = shard_map(
                kernel, mesh=mesh, in_specs=spec, out_specs=spec,
                check_rep=False,
            )
        return kernel(t)
    return imageproc.highpass(t, size=size, xp=jnp)


def _prepare_search_tiles(tiles, table, highpass_size, mode: str = "auto", mesh=None):
    """Normalize + histogram-match + median-highpass a stack of tiles (N, h, w).

    Histogram matching via rank statistics, sort-only (no per-element binary
    search, no data-dependent gathers — both are slow on TPU):

    1. sort pixel values carrying their positions (one ``lax.sort``);
    2. the matched value at sort position j depends only on j (quantile
       (j+1)/n of the template), so all matched values come from one constant
       MXU matmul ``table @ S``;
    3. un-permute by sorting (positions, matched) on the integer positions
       (one more ``lax.sort`` — cheaper than a scatter on TPU).

    Equivalent to empirical CDF matching up to ties (measure-zero on
    continuous image data).
    """
    N, h, w = tiles.shape
    n = h * w
    K = table.shape[-1]
    t = imageproc.normalize(tiles, xp=jnp, axis=(-2, -1), eps=1e-12)
    flat = t.reshape(N, n)
    iota = jax.lax.broadcasted_iota(jnp.int32, (N, n), 1)
    _, order = jax.lax.sort((flat, iota), dimension=-1, num_keys=2)
    m = jnp.matmul(
        table,
        jnp.asarray(_quantile_interp_matrix(n, K), dtype=table.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )  # (N, n): matched values in sorted order
    _, matched = jax.lax.sort((order, m), dimension=-1, num_keys=1)
    t = matched.reshape(N, h, w)
    return _device_highpass(t, highpass_size, mode, mesh=mesh)


def _prepare_template_tiles(tiles, highpass_size, n_quantiles: int, mode: str = "auto", mesh=None):
    """Template pipeline: normalize -> record quantile table -> highpass.

    Returns (highpassed tiles, quantile table (N, K)) where table[k] is the
    normalized template value at quantile (k + 0.5)/K (lossless relative to
    the empirical CDF once K >= template pixel count).
    """
    N, h, w = tiles.shape
    n = h * w
    K = n_quantiles
    t = imageproc.normalize(tiles, xp=jnp, axis=(-2, -1), eps=1e-12)
    values = jnp.sort(t.reshape(N, n), axis=-1)
    idx = jnp.clip(
        jnp.floor((jnp.arange(K) + 0.5) * n / K).astype(jnp.int32), 0, n - 1
    )
    table = values[:, idx]
    hp = _device_highpass(t, highpass_size, mode, mesh=mesh)
    return hp, table


def _project_and_extract(
    image, camera_vector, correction, particles, template_duv, w_norm,
    cfg: BatchConfig,
):
    """One observer's image-dependent front end: project + extract tiles.

    Returns (search tiles (N, sh, sw), fractional SSE-surface indices
    cols/rows (N, P)). The expensive shared-shape tile pipeline runs on
    the (O*N)-stacked output of this per-observer stage (see
    :func:`observer_log_likelihoods_multi`).
    """
    th, tw = cfg.template_size
    sh, sw = cfg.search_size
    H, W = image.shape
    # Plane-form projection: (N, P) u/v component planes keep the particle
    # axis in the TPU's 128-lane dimension (the packed (N, P, 2/3) chain
    # ran the whole elementwise projection at <3% lane utilization).
    u, v = projection.project_planes(
        camera_vector,
        particles[..., 0],
        particles[..., 1],
        particles[..., 2],
        correction=correction,
        xp=jnp,
    )  # (N, P) each
    u = jnp.nan_to_num(u, nan=-1e6)
    v = jnp.nan_to_num(v, nan=-1e6)
    u_mean = jnp.sum(u * w_norm, axis=1)  # (N,)
    v_mean = jnp.sum(v * w_norm, axis=1)
    # Integer search-box corners, clamped inside the image.
    corner_col = jnp.clip(jnp.round(u_mean - sw * 0.5).astype(jnp.int32), 0, W - sw)
    corner_row = jnp.clip(jnp.round(v_mean - sh * 0.5).astype(jnp.int32), 0, H - sh)
    corners = jnp.stack([corner_row, corner_col], axis=-1)
    if cfg.extract_mode == "matmul":
        search = _extract_tiles_matmul(image, corners, (sh, sw), dtype=cfg.dtype)
    else:
        search = _extract_tiles(image, corners, (sh, sw))  # (N, sh, sw)
    # SSE surface origin in image coordinates (cell centers at +0.5):
    # left edge = box_left + (tw/2 - 0.5) + duv_x.
    sse_left = corner_col.astype(cfg.dtype) + (tw * 0.5 - 0.5) + template_duv[:, 0]
    sse_top = corner_row.astype(cfg.dtype) + (th * 0.5 - 0.5) + template_duv[:, 1]
    cols = u - sse_left[:, None] - 0.5  # (N, P) fractional indices
    rows = v - sse_top[:, None] - 0.5
    return search, cols, rows


def observer_log_likelihoods_multi(
    images,
    camera_vectors,
    corrections,
    sigmas,
    particles,
    templates,
    template_table,
    template_duv,
    weights,
    cfg: BatchConfig,
    mesh=None,
    obs_mask=None,
):
    """Sum over observers of per-particle negative log likelihoods.

    The multi-observer equivalent of the reference's per-observer loop
    (``/root/reference/src/glimpse/track/tracker.py:563-625``), with the
    observer axis batched: the image-identity-dependent front end
    (projection, search corners, tile extraction) runs per observer, but
    the expensive shared-shape stages — histogram-match sorts, median
    high-pass, the SSE grouped conv, and the spline prefilter + dense
    basis einsum — run ONCE on (O*N)-stacked tiles, so the second
    observer costs only the marginal work, not a second set of
    fixed-overhead kernel launches. ``obs_mask`` (O,) zeroes skipped
    observers (reference skip semantics, tracker.py:597-601).

    Arguments shapes: images (O, H, W), camera_vectors (O, 20),
    corrections length-O list, sigmas length-O, templates (O, N, th, tw),
    template_table (O, N, K), template_duv (O, N, 2). Returns (N, P).
    """
    O = len(images)
    N, P = particles.shape[0], particles.shape[1]
    th, tw = cfg.template_size
    sh, sw = cfg.search_size
    oh, ow = sh - th + 1, sw - tw + 1
    w_norm = weights / jnp.sum(weights, axis=-1, keepdims=True)
    searches, colss, rowss = [], [], []
    for o in range(O):
        search_o, cols_o, rows_o = _project_and_extract(
            images[o], camera_vectors[o], corrections[o], particles,
            template_duv[o], w_norm, cfg,
        )
        searches.append(search_o)
        colss.append(cols_o)
        rowss.append(rows_o)
    search = jnp.concatenate(searches, axis=0)  # (O*N, sh, sw)
    cols = jnp.concatenate(colss, axis=0)  # (O*N, P)
    rows = jnp.concatenate(rowss, axis=0)
    search = _prepare_search_tiles(
        search, template_table.reshape(O * N, -1), cfg.highpass_size,
        cfg.highpass_mode, mesh=mesh,
    )
    sse = ncc.sse_map_batched(
        search, templates.reshape(O * N, th, tw), xp=jnp
    )  # (O*N, oh, ow)
    sse = sse * (1.0 / (th * tw))
    cols_c = jnp.clip(cols, 0.0, ow - 1.0)
    rows_c = jnp.clip(rows, 0.0, oh - 1.0)
    oob_d2 = (cols - cols_c) ** 2 + (rows - rows_c) ** 2
    sampled = _sample_sse_surface(sse, rows_c, cols_c, cfg)
    inv_2s2 = jnp.stack(
        [jnp.asarray(1.0 / (2.0 * s**2), cfg.dtype) for s in sigmas]
    )  # (O,)
    ll = (
        sampled.reshape(O, N, P) * inv_2s2[:, None, None]
        + oob_d2.reshape(O, N, P)
    )
    if obs_mask is not None:
        ll = ll * obs_mask[:, None, None].astype(cfg.dtype)
    return jnp.sum(ll, axis=0)


def observer_log_likelihoods(
    image,
    camera_vector,
    correction,
    sigma,
    particles,
    templates,
    template_table,
    template_duv,
    weights,
    cfg: BatchConfig,
    mesh=None,
):
    """Per-particle negative log likelihood from one observer's image.

    The batched equivalent of tracker.py:563-625: one fused pipeline over
    all N points. The search window is the static ``cfg.search_size`` box
    centered on each point's weighted-mean projection; particles sampling
    outside the SSE surface are clamped with a quadratic distance penalty.
    """
    th, tw = cfg.template_size
    sh, sw = cfg.search_size
    oh, ow = sh - th + 1, sw - tw + 1
    w_norm = weights / jnp.sum(weights, axis=-1, keepdims=True)
    search, cols, rows = _project_and_extract(
        image, camera_vector, correction, particles, template_duv, w_norm,
        cfg,
    )
    search = _prepare_search_tiles(
        search, template_table, cfg.highpass_size, cfg.highpass_mode,
        mesh=mesh,
    )
    sse = ncc.sse_map_batched(search, templates, xp=jnp)  # (N, oh, ow)
    sse = sse * (1.0 / (th * tw))
    cols_c = jnp.clip(cols, 0.0, ow - 1.0)
    rows_c = jnp.clip(rows, 0.0, oh - 1.0)
    oob_d2 = (cols - cols_c) ** 2 + (rows - rows_c) ** 2
    sampled = _sample_sse_surface(sse, rows_c, cols_c, cfg)
    ll = sampled * (1.0 / (2.0 * sigma ** 2))
    # Quadratic penalty for particles outside the search window.
    return ll + oob_d2


def _sample_sse_surface(sse, rows_c, cols_c, cfg: BatchConfig):
    """Sample the per-point SSE surfaces at clamped particle indices.

    ``sse`` (B, oh, ow), ``rows_c``/``cols_c`` (B, P) already clamped to
    the surface. Exact cubic B-spline by default (matching the
    reference's RectBivariateSpline kx=ky=3, tracker.py:620-624), with
    the gather-free dense-basis einsum formulation on device.
    """
    oh, ow = sse.shape[-2], sse.shape[-1]
    if cfg.interpolation_order == 3:
        coeffs = sampling_ops.bspline_prefilter_2d(sse, xp=jnp, dtype=cfg.dtype)
        if cfg.sse_sample_mode == "einsum":
            # Exact bicubic evaluation with ZERO gathers: dense per-axis
            # basis weights contracted against the coefficient grid on the
            # MXU (the oh/ow axes are small, the particle axis is huge).
            Br = sampling_ops.bspline_basis_dense(
                rows_c, oh, xp=jnp, dtype=cfg.dtype
            )  # (N, P, oh)
            Bc = sampling_ops.bspline_basis_dense(
                cols_c, ow, xp=jnp, dtype=cfg.dtype
            )  # (N, P, ow)
            tmp = jnp.einsum(
                "nph,nhw->npw", Br, coeffs,
                precision=jax.lax.Precision.HIGHEST,
            )
            sampled = jnp.sum(tmp * Bc, axis=-1)
        elif cfg.sse_upsample and cfg.sse_upsample > 1:
            # Exact spline values on a fine regular grid (two MXU matmuls),
            # then bilinear at the particles (4 gathers instead of 16).
            factor = cfg.sse_upsample
            fine = sampling_ops.bspline_upsample(
                coeffs, factor, xp=jnp, dtype=cfg.dtype
            )
            fr = (rows_c + 0.5) * factor - 0.5
            fc = (cols_c + 0.5) * factor - 0.5
            if cfg.sse_sample_mode == "nearest":
                fh, fw = fine.shape[-2], fine.shape[-1]
                ri = jnp.clip(jnp.round(fr).astype(jnp.int32), 0, fh - 1)
                ci = jnp.clip(jnp.round(fc).astype(jnp.int32), 0, fw - 1)
                flat = fine.reshape(fine.shape[0], fh * fw)
                sampled = jnp.take_along_axis(flat, ri * fw + ci, axis=-1)
            else:
                sampled = jax.vmap(
                    lambda s, r, co: sampling_ops.bilinear_sample(s, r, co, xp=jnp)
                )(fine, fr, fc)
        else:
            padded = sampling_ops.bspline_pad_coeffs(coeffs, xp=jnp)
            sampled = jax.vmap(
                lambda c, r, co: sampling_ops.bspline_sample_padded(c, r, co, xp=jnp)
            )(padded, rows_c, cols_c)
    else:
        sampled = jax.vmap(
            lambda s, r, co: sampling_ops.bilinear_sample(s, r, co, xp=jnp)
        )(sse, rows_c, cols_c)
    return sampled


# ---- The batched tracker ---- #


class BatchTracker:
    """Track N points x P particles through an image sequence on device.

    Arguments:
        camera_vectors: (O, 20) camera parameter vectors (one per observer).
        corrections: per-observer elevation correction, each None or
            (radius, refraction).
        sigmas: per-observer expected pixel noise (O,).
        motion: :class:`BatchMotion` with per-point parameters.
        config: :class:`BatchConfig` static settings.
        mesh: optional :class:`jax.sharding.Mesh`; per-point state shards
            over its points axis, images and cameras replicate.
    """

    def __init__(
        self,
        camera_vectors,
        corrections,
        sigmas,
        motion: BatchMotion,
        config: BatchConfig = None,
        mesh=None,
        viewshed=None,
    ) -> None:
        self.viewshed = None
        if viewshed is not None:
            # Reference semantics (tracker.py:91-95): fail early if any
            # tracked point starts on a non-visible viewshed cell. Checked
            # host-side (static shapes preclude raising inside jit).
            visible = np.asarray(
                viewshed.sample(np.asarray(motion.xy), order=0)
            )
            if not np.all(visible > 0):
                bad = np.flatnonzero(~(visible > 0))
                raise ValueError(
                    f"Points on non-visible viewshed cells: {bad.tolist()}"
                )
            # Device copy for the per-step particle validity test (kept as
            # host NumPy leaves and passed as a jit argument, like motion).
            self.viewshed = jax.tree_util.tree_map(
                np.asarray, DeviceRaster.from_raster(viewshed)
            )
        # Cameras and motion parameters stay HOST-side (NumPy) and are
        # passed to the jitted step as arguments, never closed over: a
        # closed-over device array is baked into the executable as a
        # constant by fetching it at lowering time — one transient backend
        # error during that fetch kills the whole program, and large DEMs
        # bloat every compiled executable.
        self.camera_vectors = np.asarray(camera_vectors, dtype=np.float32)
        motion = jax.tree_util.tree_map(np.asarray, motion)
        self.corrections = list(corrections)
        self.sigmas = tuple(float(s) for s in sigmas)
        self.motion = motion
        self.config = config or BatchConfig()
        self.mesh = mesh
        if self.config.highpass_mode == "auto":
            # Resolve once: Pallas on TPU (shard_map-wrapped under a mesh,
            # see _device_highpass); the XLA sort-median elsewhere.
            resolved = (
                "pallas"
                if jax.default_backend() in ("tpu", "axon")
                else "xla"
            )
            self.config = dataclasses.replace(
                self.config, highpass_mode=resolved
            )
        if self.config.resample_mode == "auto":
            # Fused Pallas resample on TPU for the systematic default
            # (shard_map-wrapped under a mesh); merge-rank + gather
            # elsewhere and for the other resamplers.
            resolved = (
                "pallas"
                if (
                    jax.default_backend() in ("tpu", "axon")
                    and self.config.resample_method == "systematic"
                )
                else "xla"
            )
            self.config = dataclasses.replace(
                self.config, resample_mode=resolved
            )
        self.n_observers = self.camera_vectors.shape[0]

    @classmethod
    def from_observers(cls, observers, motion: BatchMotion,
                       config: "BatchConfig" = None, mesh=None) -> "BatchTracker":
        """Build a device tracker from host :class:`Observer` sequences.

        Camera vectors, elevation corrections, and pixel-noise sigmas come
        from each observer's first image; frames are supplied separately
        (e.g. via :func:`glimpse_tpu.track.feeder.stream_track`).
        """
        vectors, corrections, sigmas = [], [], []
        for obs in observers:
            cam = obs.images[0].cam
            vectors.append(cam.to_array())
            corrections.append(cam._correction_tuple)
            sigmas.append(obs.sigma)
        return cls(
            camera_vectors=np.stack(vectors), corrections=corrections,
            sigmas=sigmas, motion=motion, config=config, mesh=mesh,
        )

    # -- sharding helpers -- #

    def _shard(self, tree, points_axis_by_path: Optional[dict] = None):
        if self.mesh is None:
            return tree
        import jax
        from ..parallel.mesh import points_sharding, replicated_sharding

        # Shard any leaf whose shape starts with (N, ...) or (O, N, ...).
        N = self.motion.n_points

        def place(leaf):
            if not hasattr(leaf, "shape") or leaf.ndim == 0:
                return jax.device_put(leaf, replicated_sharding(self.mesh))
            if leaf.shape[0] == N:
                return jax.device_put(leaf, points_sharding(self.mesh, 0))
            if (
                leaf.ndim >= 2
                and leaf.shape[0] == self.n_observers
                and leaf.shape[1] == N
            ):
                return jax.device_put(leaf, points_sharding(self.mesh, 1))
            return jax.device_put(leaf, replicated_sharding(self.mesh))

        return jax.tree_util.tree_map(place, tree)

    # -- argument plumbing -- #

    def _device_motion(self) -> BatchMotion:
        """The motion pytree ready to pass as a jit argument.

        Host NumPy leaves pass through unchanged (jit device-puts them);
        under a mesh they are pre-placed with the points-axis sharding.
        """
        if self.mesh is None:
            return self.motion
        return self._shard(self.motion)

    def _device_cams(self):
        if self.mesh is None:
            return self.camera_vectors
        from ..parallel.mesh import replicated_sharding

        return jax.device_put(
            self.camera_vectors, replicated_sharding(self.mesh)
        )

    def _device_viewshed(self):
        if self.viewshed is None or self.mesh is None:
            return self.viewshed
        from ..parallel.mesh import replicated_sharding

        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated_sharding(self.mesh)),
            self.viewshed,
        )

    # -- initialization -- #

    def _make_template(self, image, cam_vec, correction, xyz_mean):
        """Extract one observer's template stack at the particle means.

        The device analog of the reference's ``initialize_template``
        (``/root/reference/src/glimpse/track/tracker.py:536-561``): a
        ``template_size`` tile centered on each point's projected weighted
        particle mean, with its quantile table and subpixel offset.
        Returns (templates (N, th, tw), table (N, K), duv (N, 2)).
        """
        cfg = self.config
        th, tw = cfg.template_size
        uv = projection.project(cam_vec, xyz_mean, correction=correction, xp=jnp)
        H, W = image.shape
        corner_col = jnp.clip(
            jnp.round(uv[:, 0] - tw * 0.5).astype(jnp.int32), 0, W - tw
        )
        corner_row = jnp.clip(
            jnp.round(uv[:, 1] - th * 0.5).astype(jnp.int32), 0, H - th
        )
        corners = jnp.stack([corner_row, corner_col], axis=-1)
        tiles = _extract_tiles(image, corners, (th, tw))
        hp, table = _prepare_template_tiles(
            tiles, cfg.highpass_size, cfg.n_quantiles, cfg.highpass_mode,
            mesh=self.mesh,
        )
        duv = uv - (
            corners[:, ::-1].astype(cfg.dtype)
            + jnp.asarray([tw * 0.5, th * 0.5], dtype=cfg.dtype)
        )
        return hp, table, duv

    def initialize(
        self, key, images0, noise=None, camera_vectors=None, motion=None,
        viewshed=None, obs_mask0=None,
    ) -> BatchState:
        """Initialize particles, weights, and templates from the first frame.

        ``images0``: (O, H, W) float image per observer at template time.
        When observers fired their first frames at different times, stack
        each observer's first *available* frame here (templates are
        per-observer; see ``obs_mask`` in :meth:`step`).
        ``noise`` optionally injects the initial standard-normal draws
        (see :meth:`BatchMotion.initialize`). ``camera_vectors`` (O, 20)
        overrides the constructor cameras for the template frame.
        ``motion`` overrides the constructor motion (used by the jitted
        sequence paths to pass parameters as arguments instead of baking
        them into the executable as constants).
        """
        cfg = self.config
        if motion is None:
            motion = self.motion
        if viewshed is None:
            viewshed = self.viewshed
        N = motion.n_points
        th, tw = cfg.template_size
        key, sub = jax.random.split(key)
        cams = self.camera_vectors if camera_vectors is None else camera_vectors
        particles = motion.initialize(sub, cfg.n_particles, noise=noise)
        # Reference: test_particles() right after initialize_particles()
        # (tracker.py:329) — folded into the carried validity flag.
        valid0 = _particle_validity(particles, viewshed).astype(cfg.dtype)
        weights = jnp.ones((N, cfg.n_particles), dtype=cfg.dtype)
        xyz_mean = jnp.mean(particles[..., 0:3], axis=1)
        templates, tables, duvs = [], [], []
        for o in range(self.n_observers):
            if obs_mask0 is not None and not obs_mask0[o]:
                # Late-starting observer (no image at the template frame):
                # its template is extracted inside the sequence at its
                # first valid frame (reference tracker.py:335-344 via
                # ``template_indices``), through step(init_template_for=).
                templates.append(jnp.zeros((N, th, tw), cfg.dtype))
                tables.append(jnp.zeros((N, cfg.n_quantiles), cfg.dtype))
                duvs.append(jnp.zeros((N, 2), cfg.dtype))
                continue
            hp, table, duv = self._make_template(
                images0[o], cams[o], self.corrections[o], xyz_mean
            )
            templates.append(hp)
            tables.append(table)
            duvs.append(duv)
        state = BatchState(
            particles=particles.astype(cfg.dtype),
            weights=weights,
            key=key,
            templates=jnp.stack(templates),
            template_table=jnp.stack(tables),
            template_duv=jnp.stack(duvs),
            step=jnp.int32(0),
            valid=valid0,
        )
        return self._shard(state)

    # -- single step -- #

    def step(
        self, state: BatchState, images, dt_units, noise=None,
        camera_vectors=None, obs_mask=None, motion=None, viewshed=None,
        init_template_for: Tuple[int, ...] = (),
    ) -> Tuple[BatchState, dict]:
        """One PF update: evolve -> weight by all observers -> resample.

        ``images``: (O, H, W) frame per observer. ``dt_units``: scalar time
        step in motion time units. ``noise`` optionally injects the random
        draws (see :meth:`BatchMotion.evolve`; plus "resample_u" (N,)) for
        lockstep validation. ``camera_vectors`` (O, 20) overrides the
        constructor cameras for this frame — per-frame view directions from
        :class:`~glimpse_tpu.optimize.ObserverCameras` stabilization plug in
        here. ``obs_mask`` (O,) marks observers with a valid image this
        step: an invalid observer (camera that did not fire at this
        datetime, or a skipped out-of-bounds observation) contributes zero
        log-likelihood, the reference's skip semantics
        (``/root/reference/src/glimpse/track/tracker.py:305-374,597-601``);
        when NO term is informative this step, weights carry over unchanged
        (reference ``update_weights`` leaves weights untouched when every
        observer is skipped, ``tracker.py:126-149``). ``motion`` overrides
        the constructor motion (argument-passing for the jitted paths).
        Returns (new state, outputs dict).
        """
        cfg = self.config
        noise = noise or {}
        if motion is None:
            motion = self.motion
        if viewshed is None:
            viewshed = self.viewshed
        cams = self.camera_vectors if camera_vectors is None else camera_vectors
        key = state.key
        key, k_evolve, k_resample = jax.random.split(key, 3)
        # Motion parameters are float32; keep the carried state in cfg.dtype
        # (scan requires carry-type stability, e.g. for bfloat16 configs).
        particles = motion.evolve(
            k_evolve, state.particles, dt_units, noise=noise
        ).astype(cfg.dtype)
        # Reference: test_particles() after every evolve (tracker.py:334) —
        # a failure there raises and fault-contains the track; here it
        # latches the per-point validity flag (surfaced via to_tracks).
        valid = state.valid
        if valid is None:
            valid = jnp.ones(particles.shape[0], dtype=cfg.dtype)
        valid = valid * _particle_validity(particles, viewshed).astype(
            cfg.dtype
        )
        templates = state.templates
        template_table = state.template_table
        template_duv = state.template_duv
        if init_template_for:
            # Late-starting observers: build their templates from THIS
            # frame at the current (post-evolve) particle means, exactly
            # where the reference calls initialize_template inside the
            # tracking loop (tracker.py:335-344) — the observer then
            # contributes to this same step's update.
            w_norm = state.weights / jnp.sum(
                state.weights, axis=-1, keepdims=True
            )
            xyz_mean = jnp.sum(
                particles[..., 0:3] * w_norm[..., None], axis=1
            )
            for o in init_template_for:
                hp, table, duv = self._make_template(
                    images[o], cams[o], self.corrections[o], xyz_mean
                )
                templates = templates.at[o].set(hp.astype(templates.dtype))
                template_table = template_table.at[o].set(
                    table.astype(template_table.dtype)
                )
                template_duv = template_duv.at[o].set(
                    duv.astype(template_duv.dtype)
                )
        ll = motion.log_likelihoods(particles).astype(cfg.dtype)
        # Static: does the motion prior contribute a likelihood term?
        motion_informative = (
            motion.kind in ("cartesian", "cylindrical")
            and motion.use_dem_sigma
        )
        # Observer axis batched: projection/extraction per observer, the
        # expensive tile pipeline once on (O*N)-stacked tiles.
        ll = ll + observer_log_likelihoods_multi(
            images,
            cams,
            self.corrections,
            self.sigmas,
            particles,
            templates,
            template_table,
            template_duv,
            state.weights,
            cfg,
            mesh=self.mesh,
            obs_mask=obs_mask,
        )
        # Per-point shift keeps exp() in range regardless of absolute scale.
        ll = ll - jnp.min(ll, axis=-1, keepdims=True)
        P = particles.shape[1]
        if cfg.resample_threshold is None:
            # Reference parity: per-step likelihood overwrite + resample.
            weights = (jnp.exp(-ll) + 1e-30).astype(cfg.dtype)
        else:
            # Proper SIR: accumulate importance weights across steps.
            weights = state.weights * jnp.exp(-ll).astype(cfg.dtype) + 1e-30
            weights = weights / jnp.mean(weights, axis=-1, keepdims=True)
        if obs_mask is not None and not motion_informative:
            # All observers masked out and no motion prior: no information
            # arrived this step — carry the previous weights (the reference
            # resamples with unchanged weights in this case).
            has_update = jnp.sum(obs_mask) > 0
            weights = jnp.where(has_update, weights, state.weights)
        # Record the posterior moments from the fresh likelihood weights
        # (before resampling): the post-resample gathered-weight estimator
        # effectively weights particles by likelihood^2 and is noisier.
        mean, sigma = particle_moments(particles, weights)
        if cfg.return_covariances:
            covariance = particle_covariances(particles, weights)
        if cfg.resample_mode == "pallas":
            # Fused systematic searchsorted + gather in one Pallas sweep
            # (the XLA gather engine alone costs ~80% of the step).
            u = noise.get("resample_u", None)
            if u is None:
                u = jax.random.uniform(
                    k_resample, weights.shape[:-1] + (1,)
                )
            else:
                u = jnp.reshape(u, weights.shape[:-1] + (1,))
            new_p, new_w = _fused_resample(
                particles, weights, u, mesh=self.mesh,
                window=cfg.resample_window, chunk=cfg.resample_chunk,
                layout=cfg.resample_layout,
                points_block=cfg.resample_points_block,
            )
        else:
            idx = resampling.resample_jax(
                k_resample, weights, cfg.resample_method,
                u=noise.get("resample_u", None),
            )
            # One fused (N, P, 7) row replication of particles + weights
            # together (reference parity: the gathered likelihood weights
            # center the next step's search box, tracker.py:151-223).
            new_p, new_w = _gather_rows(particles, weights, idx)
        if cfg.resample_threshold is not None:
            # Resample only points whose effective sample size has
            # degraded; SIR bookkeeping resets their weights to uniform.
            ess = jnp.sum(weights, axis=-1) ** 2 / jnp.sum(
                weights * weights, axis=-1
            )
            degraded = ess < cfg.resample_threshold * P
            particles = jnp.where(
                degraded[:, None, None], new_p, particles
            )
            weights = jnp.where(
                degraded[:, None], jnp.ones_like(weights), weights
            )
        else:
            particles, weights = new_p, new_w
        new_state = BatchState(
            particles=particles,
            weights=weights,
            key=key,
            templates=templates,
            template_table=template_table,
            template_duv=template_duv,
            step=state.step + 1,
            valid=valid,
        )
        outputs = {"mean": mean, "sigma": sigma, "valid": valid}
        if cfg.return_covariances:
            outputs["covariance"] = covariance
        return new_state, outputs

    # -- full sequence -- #

    @functools.cached_property
    def _scan(self):
        """Jitted scan over the time axis (compiled once per tracker).

        Motion and cameras are ARGUMENTS, not closures: closed-over device
        arrays are fetched at lowering time and baked into the executable
        as constants (fragile and bloated; see ``__init__``).
        """

        def run(state: BatchState, images, dts, motion, cams, viewshed):
            def body(carry, xs):
                frame, dt = xs
                new_state, out = self.step(
                    carry, frame, dt, camera_vectors=cams, motion=motion,
                    viewshed=viewshed,
                )
                return new_state, out

            return jax.lax.scan(body, state, (images, dts))

        return jax.jit(run)

    def _template_plan(self, obs_masks, obs_mask0):
        """Static late-template plan from host-side observation masks.

        Returns ``(mask0, boundaries)``: ``mask0`` is an O-tuple of bools
        (observer has an image at the template frame) or None, and
        ``boundaries`` maps each late observer to its first unmasked step —
        a tuple of ``(step_index, (obs, ...))`` pairs, step indices
        1-based (aligned with ``images[1:]``). Mirrors the reference's
        ``template_indices = argmax(matching_images != None)``
        (``/root/reference/src/glimpse/track/tracker.py:293,335-344``).
        """
        if obs_mask0 is None:
            return None, ()
        mask0 = tuple(bool(v) for v in np.asarray(obs_mask0) > 0)
        if all(mask0):
            return mask0, ()
        if obs_masks is None:
            raise ValueError(
                "obs_mask0 marks late-starting observers but obs_masks"
                " was not provided"
            )
        masks = np.asarray(obs_masks) > 0
        by_step: dict = {}
        for o, present in enumerate(mask0):
            if present:
                continue
            fires = np.flatnonzero(masks[:, o])
            if fires.size == 0:
                continue  # never fires: template stays zero, always masked
            by_step.setdefault(int(fires[0]) + 1, []).append(o)
        boundaries = tuple(
            (b, tuple(obs)) for b, obs in sorted(by_step.items())
        )
        return mask0, boundaries

    def _track_program(self, mask0, boundaries, noise_keys, has_masks):
        """Build (and cache) the jitted init + segmented-scan program.

        Motion, cameras, and viewshed are ARGUMENTS, not closures:
        closed-over device arrays are fetched at lowering time and baked
        into the executable as constants (fragile and bloated; see
        ``__init__``). Late-template boundaries split the time scan into
        static segments with an eager template-initializing step between
        them — one compiled program, no in-scan conditionals.
        """
        cache_key = (mask0, boundaries, noise_keys, has_masks)
        cache = getattr(self, "_track_program_cache", None)
        if cache is None:
            cache = self._track_program_cache = {}
        if cache_key in cache:
            return cache[cache_key]

        def run(key, images, dts, motion, cams, obs_masks, viewshed,
                init_noise, step_noise):
            state = self.initialize(
                key, images[0], noise=init_noise, camera_vectors=cams,
                motion=motion, viewshed=viewshed, obs_mask0=mask0,
            )
            T1 = dts.shape[0]

            def step_args(i_or_slice):
                sliced = {}
                if noise_keys:
                    sliced["noise"] = {
                        k: step_noise[k][i_or_slice] for k in noise_keys
                    }
                if has_masks:
                    sliced["obs_mask"] = obs_masks[i_or_slice]
                return sliced

            def seg_scan(state, lo, hi):
                xs = {
                    "frame": images[1 + lo : 1 + hi],
                    "dt": dts[lo:hi],
                    **step_args(slice(lo, hi)),
                }

                def body(carry, x):
                    return self.step(
                        carry, x["frame"], x["dt"],
                        noise=x.get("noise"), camera_vectors=cams,
                        obs_mask=x.get("obs_mask"), motion=motion,
                        viewshed=viewshed,
                    )

                return jax.lax.scan(body, state, xs)

            outs = []
            prev = 0
            for b, obs_tuple in boundaries:
                i = b - 1  # 0-based index into frames[1:] / dts
                if i > prev:
                    state, out = seg_scan(state, prev, i)
                    outs.append(out)
                args = step_args(i)
                state, out1 = self.step(
                    state, images[b], dts[i], noise=args.get("noise"),
                    camera_vectors=cams, obs_mask=args.get("obs_mask"),
                    motion=motion, viewshed=viewshed,
                    init_template_for=obs_tuple,
                )
                outs.append(
                    jax.tree_util.tree_map(lambda x: x[None], out1)
                )
                prev = i + 1
            if prev < T1 or not outs:
                state, out = seg_scan(state, prev, T1)
                outs.append(out)
            if len(outs) == 1:
                return state, outs[0]
            outputs = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=0), *outs
            )
            return state, outputs

        cache[cache_key] = jax.jit(run)
        return cache[cache_key]

    def track(
        self, key, images, dts, noise=None, obs_masks=None, obs_mask0=None
    ) -> Tuple[BatchState, dict]:
        """Track through a sequence held in device memory.

        Arguments:
            key: PRNG key.
            images: (T, O, H, W) image sequence (frame 0 initializes
                templates; frames 1..T-1 are observations). Frames masked
                out by ``obs_masks`` must still be finite arrays (zeros
                work) — they are computed then zero-weighted.
            dts: (T-1,) time steps in motion time units.
            noise: Optional injected random draws for lockstep validation:
                {"init": {"xy","z","v"}, "a": (T-1,N,P,3),
                 "zwalk": (T-1,N,P), "resample_u": (T-1,N)} (all optional).
            obs_masks: Optional (T-1, O) validity flags; 0 marks an
                observer with no image at that step (reference skip
                semantics, see :meth:`step`). Build from host
                ``Tracker.match_datetimes`` with
                :func:`masks_from_frame_table`.
            obs_mask0: Optional (O,) validity flags for the TEMPLATE frame
                (row 0 of :func:`masks_from_frame_table`). An observer
                without an image there is late-starting: its template is
                extracted inside the sequence at its first unmasked step,
                from the particle state at that step (reference
                ``template_indices`` semantics, tracker.py:293,335-344).
                Default: all observers present at frame 0.

        Returns:
            (final state, outputs) where outputs['mean'] is (T-1, N, 6) and
            outputs['sigma'] is (T-1, N, 6).
        """
        images = jnp.asarray(images, dtype=self.config.dtype)
        if self.mesh is not None:
            from ..parallel.mesh import replicated_sharding

            images = jax.device_put(images, replicated_sharding(self.mesh))
        dts = jnp.asarray(dts, dtype=self.config.dtype)
        mask0, boundaries = self._template_plan(obs_masks, obs_mask0)
        if obs_masks is not None:
            obs_masks = jnp.asarray(obs_masks, dtype=self.config.dtype)
        motion = self._device_motion()
        cams = self._device_cams()
        viewshed = self._device_viewshed()
        init_noise = None
        step_noise = {}
        noise_keys = ()
        if noise is not None:
            init_noise = noise.get("init", None)
            step_noise = {
                k: jnp.asarray(noise[k])
                for k in ("a", "zwalk", "resample_u")
                if k in noise
            }
            noise_keys = tuple(sorted(step_noise))
        program = self._track_program(
            mask0, boundaries, noise_keys, obs_masks is not None
        )
        return program(
            key, images, dts, motion, cams, obs_masks, viewshed,
            init_noise, step_noise,
        )

    def _chunk_program(self, n_steps: int, has_cams: bool, has_masks: bool):
        """Jitted ``n_steps``-frame scan for the chunked streaming path.

        One device dispatch covers ``n_steps`` PF updates — amortizing the
        per-dispatch RPC/launch tax that a frame-by-frame stream pays on
        every step (measured 12% at the north-star shape: 80,609 vs
        91,450 point-steps/s).
        """
        cache = getattr(self, "_chunk_program_cache", None)
        if cache is None:
            cache = self._chunk_program_cache = {}
        key = (n_steps, has_cams, has_masks)
        if key not in cache:

            def run(state, frames, dts, cams_seq, masks, cams_default,
                    motion, viewshed):
                xs = {"frame": frames, "dt": dts}
                if has_cams:
                    xs["cams"] = cams_seq
                if has_masks:
                    xs["mask"] = masks

                def body(carry, x):
                    return self.step(
                        carry, x["frame"], x["dt"],
                        camera_vectors=(
                            x["cams"] if has_cams else cams_default
                        ),
                        obs_mask=x.get("mask"), motion=motion,
                        viewshed=viewshed,
                    )

                return jax.lax.scan(body, state, xs)

            cache[key] = jax.jit(run)
        return cache[key]

    def track_stream(
        self, key, first_frame, frame_iter, dts, camera_vectors_seq=None,
        obs_masks=None, obs_mask0=None, chunk: int = 1,
    ) -> Tuple[BatchState, list]:
        """Track a sequence streamed frame by frame from the host.

        For sequences too large for device memory: ``frame_iter`` yields
        (O, H, W) arrays; the jitted step runs per frame while the host
        decodes the next one (double buffering via async dispatch).
        ``camera_vectors_seq`` (T, O, 20) optionally supplies per-frame
        cameras (index 0 is the template frame) — the stabilized-sequence
        workflow. ``obs_masks`` (T-1, O), aligned with ``dts``, marks
        observers with a valid image per step (see :meth:`track`).
        ``obs_mask0`` (O,) marks observers with an image at the template
        frame; late-starting observers get their template at their first
        unmasked step (see :meth:`track`).

        ``chunk`` > 1 uploads that many frames per transfer and runs ONE
        jitted ``lax.scan`` over them (device-resident frame chunks):
        per-step dispatch overhead is paid once per chunk instead of once
        per frame, while the host stacks the next chunk during the scan.
        With chunking, each entry of the returned outputs list covers a
        whole chunk with a leading time axis (concatenate along axis 0 to
        recover the per-step series); steps where a late-starting
        observer initializes its template run singly between chunks.
        """
        step = jax.jit(self.step, static_argnames=("init_template_for",))
        motion = self._device_motion()
        cams_default = self._device_cams()
        viewshed = self._device_viewshed()
        cams0 = cams_default
        if camera_vectors_seq is not None:
            camera_vectors_seq = jnp.asarray(camera_vectors_seq, jnp.float32)
            cams0 = camera_vectors_seq[0]
        mask0, boundaries = self._template_plan(obs_masks, obs_mask0)
        template_steps = {b: obs for b, obs in boundaries}
        if obs_masks is not None:
            obs_masks = jnp.asarray(obs_masks, dtype=self.config.dtype)
        # Jitted initialization: run eagerly, every op compiles as its own
        # tiny executable (minutes through a remote-compile backend).
        init = functools.partial(self.initialize, obs_mask0=mask0)
        state = jax.jit(init)(
            key, jnp.asarray(first_frame, self.config.dtype),
            camera_vectors=cams0, motion=motion, viewshed=viewshed,
        )
        outputs = []
        dts_np = np.asarray(dts)

        def one(state, t, frame):
            """Single-frame step (boundary steps and chunk=1)."""
            frame = jnp.asarray(frame, self.config.dtype)
            cams_t = (
                cams_default
                if camera_vectors_seq is None
                else camera_vectors_seq[t]
            )
            mask_t = None if obs_masks is None else obs_masks[t - 1]
            return step(
                state, frame, jnp.asarray(dts_np[t - 1], self.config.dtype),
                camera_vectors=cams_t, obs_mask=mask_t, motion=motion,
                viewshed=viewshed,
                init_template_for=template_steps.get(t, ()),
            )

        if chunk <= 1:
            for t, frame in enumerate(frame_iter, start=1):
                if t > len(dts_np):
                    break
                state, out = one(state, t, frame)
                outputs.append(out)
            return state, outputs

        it = iter(frame_iter)
        T1 = len(dts_np)
        t = 1
        while t <= T1:
            t_end = min(t + chunk - 1, T1)
            if any(b in template_steps for b in range(t, t_end + 1)):
                # Template-initializing steps run singly (rare: at most
                # one span per late-starting observer).
                for tt in range(t, t_end + 1):
                    state, out = one(state, tt, next(it))
                    outputs.append(
                        jax.tree_util.tree_map(lambda x: x[None], out)
                    )
                t = t_end + 1
                continue
            n = t_end - t + 1
            frames_np = np.stack(
                [np.asarray(next(it)) for _ in range(n)]
            )
            frames_dev = jnp.asarray(frames_np, self.config.dtype)
            run = self._chunk_program(
                n, camera_vectors_seq is not None, obs_masks is not None
            )
            state, outs = run(
                state, frames_dev,
                jnp.asarray(dts_np[t - 1 : t_end], self.config.dtype),
                None
                if camera_vectors_seq is None
                else camera_vectors_seq[t : t_end + 1],
                None if obs_masks is None else obs_masks[t - 1 : t_end],
                cams_default, motion, viewshed,
            )
            outputs.append(outs)
            t = t_end + 1
        return state, outputs


def masks_from_frame_table(frame_table) -> np.ndarray:
    """Observation validity masks from a host frame-index table.

    ``frame_table``: (T, O) array of image-index-or-None, as produced by
    :meth:`glimpse_tpu.track.tracker.Tracker.match_datetimes`. Returns a
    (T, O) float32 array with 1 where the observer has an image; pass
    ``masks[1:]`` as ``obs_masks`` to :meth:`BatchTracker.track` /
    :meth:`BatchTracker.track_stream` (row 0 is the template frame).
    """
    return np.not_equal(np.asarray(frame_table), None).astype(np.float32)


def particle_moments(particles, weights):
    """Weighted mean and standard deviation over the particle axis.

    ``particles`` (N, P, 6), ``weights`` (N, P) -> ((N, 6), (N, 6)).
    """
    w = weights / jnp.sum(weights, axis=-1, keepdims=True)
    mean = jnp.sum(particles * w[..., None], axis=-2)
    centered = particles - mean[..., None, :]
    var = jnp.sum(centered * centered * w[..., None], axis=-2)
    return mean, jnp.sqrt(var)


def particle_covariances(particles, weights):
    """Weighted (biased) covariance over the particle axis: (N, 6, 6)."""
    w = weights / jnp.sum(weights, axis=-1, keepdims=True)
    mean = jnp.sum(particles * w[..., None], axis=-2)
    centered = particles - mean[..., None, :]
    return jnp.einsum("npi,npj,np->nij", centered, centered, w)


def to_tracks(datetimes, time_unit, outputs, covariances: bool = False):
    """Wrap BatchTracker outputs in the host :class:`Tracks` container.

    ``outputs`` come from :meth:`BatchTracker.track` (time-major); the first
    datetime corresponds to the template frame, whose state is not emitted,
    so it is filled with NaN like the reference's pre-first-observation rows.

    When the outputs carry per-step validity flags (``outputs['valid']``,
    produced whenever the tracker was built with a viewshed or by the NaN
    check), a point whose flag drops to 0 is fault-contained the way the
    reference contains a ``test_particles`` failure (``/root/reference/src/
    glimpse/track/tracker.py:106-119,329,334,375-384``): its means/sigmas
    are NaN from the failing step onward and ``Tracks.errors`` records a
    ``ValueError`` for it; valid points get ``errors[n] = None``.
    """
    from .tracks import Tracks

    means = np.asarray(outputs["mean"])  # (T-1, N, 6)
    sigmas = np.asarray(outputs["sigma"])
    T1, N = means.shape[0], means.shape[1]
    full_means = np.full((N, T1 + 1, 6), np.nan)
    full_means[:, 1:] = np.moveaxis(means, 0, 1)
    kwargs = {}
    if covariances and "covariance" in outputs:
        cov = np.asarray(outputs["covariance"])
        full_cov = np.full((N, T1 + 1, 6, 6), np.nan)
        full_cov[:, 1:] = np.moveaxis(cov, 0, 1)
        kwargs["covariances"] = full_cov
    else:
        full_sigmas = np.full((N, T1 + 1, 6), np.nan)
        full_sigmas[:, 1:] = np.moveaxis(sigmas, 0, 1)
        kwargs["sigmas"] = full_sigmas
    if "valid" in outputs and outputs["valid"] is not None:
        valid = np.moveaxis(np.asarray(outputs["valid"]), 0, 1) > 0  # (N, T-1)
        errors = np.full(N, None, dtype=object)
        bad_points = np.flatnonzero(~valid.all(axis=1))
        for n in bad_points:
            t_fail = int(np.argmin(valid[n]))  # first failing step
            errors[n] = ValueError(
                "Particle validity test failed at step"
                f" {t_fail + 1}: particles on non-visible viewshed cells"
                " or with missing (NaN) values"
            )
            # Reference: the exception aborts before means[i] is written,
            # so the failing step and everything after stay NaN.
            full_means[n, t_fail + 1:] = np.nan
            for key in ("sigmas", "covariances"):
                if key in kwargs:
                    kwargs[key][n, t_fail + 1:] = np.nan
        kwargs["errors"] = errors
    return Tracks(
        datetimes=np.asarray(datetimes), time_unit=time_unit, means=full_means,
        **kwargs,
    )
