"""Grid interpolation ops: nearest, bilinear, and exact cubic B-spline.

These replace the reference's SciPy interpolants on the device path:

- ``RegularGridInterpolator`` (order 0/1 point sampling,
  ``/root/reference/src/glimpse/raster.py:891-1027``) -> :func:`sample_grid`
  with ``order`` 0 or 1.
- ``RectBivariateSpline`` (kx=ky=3 tile/SSE-surface sampling,
  ``observer.py:178-214``, ``tracker.py:620-624``) -> :func:`sample_grid`
  with ``order=3``: an exact interpolating cubic B-spline. The spline
  coefficients solve a dense prefilter system (small, static tile sizes ->
  a single MXU matmul per axis), with *natural* (second-derivative-free)
  boundary conditions. This interpolates the grid values exactly, like
  scipy's spline; between knots it differs from RectBivariateSpline's
  not-a-knot boundary only near the tile edge (difference decays
  geometrically with distance from the boundary).

All functions operate in *index space*: coordinate ``i`` refers to grid node
``values[..., i]``; callers map world/image coordinates into index space.
Dual backend: ``xp=numpy`` or ``xp=jax.numpy``.
"""
import functools

import numpy as np

__all__ = [
    "nearest_sample",
    "bilinear_sample",
    "grid_sample_nearest_dense",
    "grid_sample_bilinear_dense",
    "DENSE_SAMPLE_MAX_CELLS",
    "bspline_prefilter_matrix",
    "bspline_prefilter_2d",
    "bspline_sample",
    "bspline_pad_coeffs",
    "bspline_sample_padded",
    "bspline_eval_matrix",
    "bspline_upsample",
    "bspline_basis_dense",
    "cubic_bspline_kernel",
    "sample_grid",
]


def _clip(i, lo, hi, xp):
    return xp.clip(i, lo, hi)


def nearest_sample(values, rows, cols, xp=np):
    """Sample a 2-D grid (..., H, W) at fractional indices, nearest neighbor."""
    H, W = values.shape[-2], values.shape[-1]
    r = _clip(xp.round(rows).astype(int), 0, H - 1, xp)
    c = _clip(xp.round(cols).astype(int), 0, W - 1, xp)
    return values[..., r, c] if values.ndim == 2 else xp.take_along_axis(
        values.reshape(values.shape[:-2] + (-1,)), r * W + c, axis=-1
    )


# TPU scalar gathers run ~13 ms per MILLION elements, so sampling a raster
# at particle-filter scale (N x P ~ 20M points) through `values[r, c]`
# costs hundreds of milliseconds per step. For rasters up to this many
# cells, the dense path below replaces every gather with one-hot row
# matmuls + masked column reductions on the MXU — measured >10x faster at
# north-star shapes and bit-identical. Cost per sample grows with H*W, so
# beyond this limit the gather is the lesser evil (crop rasters to the
# tracked extent to stay under it).
DENSE_SAMPLE_MAX_CELLS = 65536


def _dense_row_select(values, ri, xp):
    """Exact rows-by-one-hot: out[b, :] = values[ri[b], :] via the MXU.

    One f32 matmul at ``Precision.HIGHEST``: the one-hot row has a single
    nonzero, and the 6-pass bf16 emulation reproduces each f32 product
    exactly, so every selected row is bit-exact. (A manually split
    3-term bf16 formulation is NOT safe here: outside Pallas, XLA's
    algebraic simplifier merges the per-term dots back into one dot with
    the operand sum computed in bf16, silently collapsing the split to
    single-bf16 precision — observed as ~2^-8 relative error. The
    matmul is a small fraction of this op's cost — the one-hot build
    dominates — so HIGHEST costs nothing measurable.)
    """
    import jax
    import jax.numpy as jnp

    H = values.shape[0]
    oh = (
        ri[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)
    ).astype(jnp.float32)  # (B, H)
    return jax.lax.dot_general(
        oh, values.astype(jnp.float32), (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (B, W)


def _dense_col_select(rowsv, ci, xp):
    """out[b] = rowsv[b, ci[b]] as a masked reduction (no gather)."""
    import jax
    import jax.numpy as jnp

    W = rowsv.shape[1]
    mask = ci[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    return jnp.sum(jnp.where(mask, rowsv, 0.0), axis=1)


def _chunked_flat(f, args, B, chunk):
    """Apply ``f`` over `chunk`-sized slices of flat (B,) arrays.

    Chunks bound the transient (chunk, H) one-hot / (chunk, W) row
    intermediates. Keep chunks LARGE (default 2^19): the XLA TPU compile
    time of the surrounding lax.map grows pathologically with iteration
    count (measured 186 s at 320 iterations vs 2.6 s at 40 for the same
    program), while warm runtime is unchanged.
    """
    import jax
    import jax.numpy as jnp

    pad = (-B) % chunk
    padded = [jnp.pad(a.reshape(-1), (0, pad)) for a in args]
    stacked = [a.reshape(-1, chunk) for a in padded]
    out = jax.lax.map(lambda xs: f(*xs), tuple(stacked))
    return out.reshape(-1)[:B]


def grid_sample_nearest_dense(values, ri, ci, chunk: int = 524288):
    """Gather-free ``values[ri, ci]`` for integer index arrays (any shape).

    One-hot row matmul + masked column reduction per chunk; bit-identical
    to the gather. Intended for (points x particles)-scale sampling of
    small rasters on TPU (viewshed validity, DEM priors).
    """
    shape = ri.shape
    B = int(np.prod(shape)) if shape else 1

    def one(ri_c, ci_c):
        rows = _dense_row_select(values, ri_c, None)
        return _dense_col_select(rows, ci_c, None)

    out = _chunked_flat(one, (ri, ci), B, min(chunk, max(B, 1)))
    return out.reshape(shape)


def grid_sample_bilinear_dense(values, rows, cols, chunk: int = 524288):
    """Gather-free bilinear sample matching :func:`bilinear_sample`.

    The four corner values are EXACT one-hot selections (two row matmuls +
    four masked column reductions — bit-identical to the gathers); the
    fractional weighting then runs the same f32 formula, so results match
    the gather path to FMA-contraction level (compilers may fuse the
    multiply-adds differently across contexts; ~1 ulp per stage),
    including the edge-extrapolation semantics.
    """
    import jax.numpy as jnp

    H, W = values.shape[-2], values.shape[-1]
    shape = rows.shape
    B = int(np.prod(shape)) if shape else 1

    def one(rows_c, cols_c):
        r0f = jnp.clip(jnp.floor(rows_c), 0, max(H - 2, 0))
        c0f = jnp.clip(jnp.floor(cols_c), 0, max(W - 2, 0))
        r0 = r0f.astype(jnp.int32)
        c0 = c0f.astype(jnp.int32)
        r1 = jnp.minimum(r0 + 1, H - 1)
        c1 = jnp.minimum(c0 + 1, W - 1)
        fr = rows_c - r0f
        fc = cols_c - c0f
        row0 = _dense_row_select(values, r0, None)
        row1 = _dense_row_select(values, r1, None)
        v00 = _dense_col_select(row0, c0, None)
        v01 = _dense_col_select(row0, c1, None)
        v10 = _dense_col_select(row1, c0, None)
        v11 = _dense_col_select(row1, c1, None)
        top = v00 + (v01 - v00) * fc
        bot = v10 + (v11 - v10) * fc
        return top + (bot - top) * fr

    out = _chunked_flat(one, (rows, cols), B, min(chunk, max(B, 1)))
    return out.reshape(shape)


def bilinear_sample(values, rows, cols, xp=np):
    """Sample a 2-D grid (H, W) at fractional indices (bilinear).

    Matches ``RegularGridInterpolator(method='linear')`` for in-bounds
    coordinates; out-of-bounds coordinates extrapolate linearly from the
    edge cells (``fill_value=None`` semantics — callers mask out-of-bounds
    points separately to reproduce bounds_error/fill behavior).
    """
    H, W = values.shape[-2], values.shape[-1]
    r0f = xp.clip(xp.floor(rows), 0, max(H - 2, 0))
    c0f = xp.clip(xp.floor(cols), 0, max(W - 2, 0))
    r0 = r0f.astype(int)
    c0 = c0f.astype(int)
    r1 = xp.minimum(r0 + 1, H - 1)
    c1 = xp.minimum(c0 + 1, W - 1)
    fr = rows - r0f
    fc = cols - c0f
    v00 = values[..., r0, c0]
    v01 = values[..., r0, c1]
    v10 = values[..., r1, c0]
    v11 = values[..., r1, c1]
    top = v00 + (v01 - v00) * fc
    bot = v10 + (v11 - v10) * fc
    return top + (bot - top) * fr


@functools.lru_cache(maxsize=128)
def bspline_prefilter_matrix(n: int) -> np.ndarray:
    """Inverse of the cubic B-spline collocation matrix for n uniform nodes.

    Solving ``A @ coeffs = values`` where ``A[i, j] = B3(i - j)`` with
    natural boundary conditions (coefficients mirrored with second-difference
    = 0 at the ends). Returned dense so the prefilter is a single matmul —
    static tile sizes make the host-side factorization free and the device
    work MXU-shaped.
    """
    if n == 1:
        return np.ones((1, 1))
    # Collocation matrix: value at node i = (c[i-1] + 4 c[i] + c[i+1]) / 6,
    # with natural BC: c[-1] = 2 c[0] - c[1], c[n] = 2 c[n-1] - c[n-2].
    A = np.zeros((n, n))
    for i in range(n):
        A[i, i] = 4 / 6
        if i > 0:
            A[i, i - 1] += 1 / 6
        if i < n - 1:
            A[i, i + 1] += 1 / 6
    # Natural boundary: fold the ghost coefficients into the end columns.
    A[0, 0] += 2 * (1 / 6)
    A[0, 1] -= 1 / 6
    A[n - 1, n - 1] += 2 * (1 / 6)
    A[n - 1, n - 2] -= 1 / 6
    return np.linalg.inv(A)


def bspline_prefilter_2d(values, xp=np, dtype=None, precision=None):
    """Compute cubic B-spline coefficients of a (..., H, W) grid.

    Two dense matmuls (per-axis collocation inverses); exact interpolation
    at the nodes. ``precision`` (jax path only): pass
    ``jax.lax.Precision.HIGHEST`` when the coefficients feed subpixel peak
    localization — the TPU matmul default truncates inputs to bf16, which
    is fine for the particle-filter likelihood (0.1 px lockstep contract
    holds) but not for Newton steps on a nearly-flat SSE surface.
    """
    H, W = values.shape[-2], values.shape[-1]
    Ar = bspline_prefilter_matrix(H)
    Ac = bspline_prefilter_matrix(W)
    if dtype is None:
        dtype = values.dtype
    Ar = xp.asarray(Ar, dtype=dtype)
    Ac = xp.asarray(Ac, dtype=dtype)
    kw = {} if precision is None or xp is np else {"precision": precision}
    # coeffs = Ar @ values @ Ac.T
    return xp.matmul(
        xp.matmul(Ar, values, **kw), xp.swapaxes(Ac, -1, -2), **kw
    )


def _cubic_bspline_weights(t, xp):
    """The four cubic B-spline basis values for fractional offset t in [0, 1).

    Returns weights for nodes at offsets (-1, 0, 1, 2) from the base node.
    """
    t2 = t * t
    t3 = t2 * t
    w0 = (1 - 3 * t + 3 * t2 - t3) / 6
    w1 = (4 - 6 * t2 + 3 * t3) / 6
    w2 = (1 + 3 * t + 3 * t2 - 3 * t3) / 6
    w3 = t3 / 6
    return w0, w1, w2, w3


def _natural_index(i, n, xp):
    """Clamp coefficient index with natural-BC ghost handling.

    Ghost coefficients were folded into the prefilter matrix as
    c[-1] = 2c[0] - c[1] and c[n] = 2c[n-1] - c[n-2]; reproduce the same
    extension here via (index, weight-pair) so sampling near edges stays
    exact. Returns (i0, w0, i1, w1) such that c_ghost = w0*c[i0] + w1*c[i1].
    """
    below = i < 0
    above = i > n - 1
    i0 = xp.where(below, 0, xp.where(above, n - 1, i))
    i1 = xp.where(below, xp.minimum(1, n - 1), xp.where(above, xp.maximum(n - 2, 0), i))
    w0 = xp.where(below | above, 2.0, 1.0)
    w1 = xp.where(below | above, -1.0, 0.0)
    return i0, w0, i1, w1


def bspline_sample(coeffs, rows, cols, xp=np):
    """Evaluate a cubic B-spline (given coefficients) at fractional indices.

    ``coeffs`` is the output of :func:`bspline_prefilter_2d` with shape
    (H, W); ``rows``/``cols`` are arrays of identical shape.
    """
    H, W = coeffs.shape[-2], coeffs.shape[-1]
    rb = xp.floor(rows)
    cb = xp.floor(cols)
    tr = rows - rb
    tc = cols - cb
    rb = rb.astype(int)
    cb = cb.astype(int)
    wr = _cubic_bspline_weights(tr, xp)
    wc = _cubic_bspline_weights(tc, xp)
    out = xp.zeros_like(rows)
    for dr in range(4):
        ri = rb + (dr - 1)
        ri0, rw0, ri1, rw1 = _natural_index(ri, H, xp)
        for dc in range(4):
            ci = cb + (dc - 1)
            ci0, cw0, ci1, cw1 = _natural_index(ci, W, xp)
            # Ghost extension: bilinear combination of the folded indices.
            val = (
                rw0 * cw0 * coeffs[..., ri0, ci0]
                + rw0 * cw1 * coeffs[..., ri0, ci1]
                + rw1 * cw0 * coeffs[..., ri1, ci0]
                + rw1 * cw1 * coeffs[..., ri1, ci1]
            )
            out = out + wr[dr] * wc[dc] * val
    return out


def cubic_bspline_kernel(x, xp=np):
    """The cubic B-spline kernel b3(x) (support |x| < 2)."""
    ax = xp.abs(x)
    ax2 = ax * ax
    inner = (4.0 - 6.0 * ax2 + 3.0 * ax2 * ax) / 6.0
    t = xp.maximum(2.0 - ax, 0.0)
    outer = t * t * t / 6.0
    return xp.where(ax < 1.0, inner, outer)


def bspline_basis_dense(q, n: int, xp=np, dtype=None):
    """Dense natural-BC cubic B-spline basis weights.

    Returns B with shape ``q.shape + (n,)`` such that evaluating the spline
    with coefficients c equals ``B @ c`` exactly for queries in [0, n-1]
    (ghost coefficients c[-1] = 2c[0] - c[1] and c[n] = 2c[n-1] - c[n-2]
    are folded into the first/last two columns, matching
    :func:`bspline_sample`). No gathers: the basis is evaluated densely
    against the whole index grid, so spline evaluation becomes a matmul —
    the MXU-friendly form for many queries against a small grid.
    """
    if dtype is None:
        dtype = getattr(q, "dtype", np.float64)
    grid = xp.arange(n, dtype=dtype)
    B = cubic_bspline_kernel(q[..., None] - grid, xp=xp)
    # Fold the one reachable ghost on each side (queries are in [0, n-1]).
    fold_lo = np.zeros(n, np.float64)
    fold_lo[0] += 2.0
    fold_lo[min(1, n - 1)] -= 1.0
    fold_hi = np.zeros(n, np.float64)
    fold_hi[n - 1] += 2.0
    fold_hi[max(n - 2, 0)] -= 1.0
    g_lo = cubic_bspline_kernel(q + 1.0, xp=xp)
    g_hi = cubic_bspline_kernel(q - n, xp=xp)
    B = B + g_lo[..., None] * xp.asarray(fold_lo, dtype=dtype)
    B = B + g_hi[..., None] * xp.asarray(fold_hi, dtype=dtype)
    return B


def bspline_pad_coeffs(coeffs, xp=np):
    """Fold the natural-BC ghost coefficients into a 1-cell border.

    Padding with c[-1] = 2 c[0] - c[1] (and symmetrically at the far edge)
    lets :func:`bspline_sample_padded` use ONE gather per tap instead of the
    four-way ghost logic in :func:`bspline_sample` — the difference between
    16 and 64 gathers per evaluation, which dominates TPU sampling cost.
    """
    top = 2 * coeffs[..., 0:1, :] - coeffs[..., 1:2, :]
    bottom = 2 * coeffs[..., -1:, :] - coeffs[..., -2:-1, :]
    c = xp.concatenate([top, coeffs, bottom], axis=-2)
    left = 2 * c[..., :, 0:1] - c[..., :, 1:2]
    right = 2 * c[..., :, -1:] - c[..., :, -2:-1]
    return xp.concatenate([left, c, right], axis=-1)


def bspline_sample_padded(padded, rows, cols, xp=np):
    """Evaluate a cubic B-spline from ghost-padded coefficients.

    ``padded`` is :func:`bspline_pad_coeffs` output, (H+2, W+2); ``rows``/
    ``cols`` index the ORIGINAL (unpadded) grid. Exactly equals
    :func:`bspline_sample` for in-bounds coordinates within one cell of the
    border (the reach of cubic taps), i.e. all clamped samples.
    """
    H2, W2 = padded.shape[-2], padded.shape[-1]
    rb = xp.floor(rows)
    cb = xp.floor(cols)
    tr = rows - rb
    tc = cols - cb
    rb = rb.astype(int) + 1  # shift into padded frame
    cb = cb.astype(int) + 1
    wr = _cubic_bspline_weights(tr, xp)
    wc = _cubic_bspline_weights(tc, xp)
    out = xp.zeros_like(rows)
    for dr in range(4):
        ri = xp.clip(rb + (dr - 1), 0, H2 - 1)
        for dc in range(4):
            ci = xp.clip(cb + (dc - 1), 0, W2 - 1)
            out = out + wr[dr] * wc[dc] * padded[..., ri, ci]
    return out


@functools.lru_cache(maxsize=64)
def bspline_eval_matrix(n: int, factor: int) -> np.ndarray:
    """Dense matrix evaluating a 1-D cubic B-spline on a regular fine grid.

    Returns E (n*factor, n) such that ``E @ coeffs`` gives the exact spline
    values at fine-grid positions (j + 0.5)/factor - 0.5 for j in
    [0, n*factor) — i.e. fine cells centered over the coarse grid. Evaluating
    a 2-D spline on the fine grid is then two MXU matmuls instead of
    per-sample gathers.
    """
    m = n * factor
    positions = (np.arange(m) + 0.5) / factor - 0.5
    E = np.zeros((m, n))
    base = np.floor(positions).astype(int)
    t = positions - base
    w = _cubic_bspline_weights(t, np)
    for tap in range(4):
        idx = base + (tap - 1)
        # Natural-BC ghost: c[-1] = 2c[0] - c[1]; c[n] = 2c[n-1] - c[n-2].
        for j in range(m):
            i = idx[j]
            wt = w[tap][j]
            if i < 0:
                E[j, 0] += 2 * wt
                E[j, min(1, n - 1)] -= wt
            elif i > n - 1:
                E[j, n - 1] += 2 * wt
                E[j, max(n - 2, 0)] -= wt
            else:
                E[j, i] += wt
    return E


def bspline_upsample(coeffs, factor: int, xp=np, dtype=None):
    """Evaluate a 2-D cubic B-spline on a regular `factor`-x fine grid.

    ``coeffs`` (..., H, W) -> (..., H*factor, W*factor) exact spline values,
    via two dense matmuls (MXU work; no gathers). Fine cell (i, j) is
    centered at coarse coordinate ((i + 0.5)/factor - 0.5, ...).
    """
    H, W = coeffs.shape[-2], coeffs.shape[-1]
    if dtype is None:
        dtype = coeffs.dtype
    Er = xp.asarray(bspline_eval_matrix(H, factor), dtype=dtype)
    Ec = xp.asarray(bspline_eval_matrix(W, factor), dtype=dtype)
    return xp.matmul(xp.matmul(Er, coeffs), xp.swapaxes(Ec, -1, -2))


def sample_grid(values, rows, cols, order: int = 1, xp=np, prefiltered: bool = False):
    """Sample a 2-D grid at fractional indices with the given order.

    order 0: nearest; 1: bilinear; 3: exact interpolating cubic B-spline.
    With ``prefiltered=True``, ``values`` are already spline coefficients.
    """
    if order == 0:
        return nearest_sample(values, rows, cols, xp=xp)
    if order == 1:
        return bilinear_sample(values, rows, cols, xp=xp)
    if order == 3:
        coeffs = values if prefiltered else bspline_prefilter_2d(values, xp=xp)
        return bspline_sample(coeffs, rows, cols, xp=xp)
    raise ValueError(f"Unsupported interpolation order: {order}")
