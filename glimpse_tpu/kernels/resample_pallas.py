"""Pallas TPU kernel: fused systematic resampling (searchsorted + gather).

The particle filter's resample step — ``idx = searchsorted(cumsum(w),
(arange(P)+u)/P)`` then ``particles = particles[idx]`` (reference
``/root/reference/src/glimpse/track/tracker.py:151-223``) — is the
dominant cost of the batched PF step on TPU when written in XLA: at
10,240 points x 2,048 particles the ``take_along_axis`` row gather alone
measured 457 ms of a 567 ms step, because the TPU gather engine moves
~1.5-2.5 GB/s regardless of index count (batched ``dynamic_slice`` windows
are just as slow — measured in round 2).

This kernel never touches the gather engine. Per point, the
cumulative-weight row and the K payload columns live in VMEM (regular
block pipelining = full-bandwidth DMA), and both the search and the
selection are fused compare-multiply-reduce sweeps on the VPU:

- systematic positions are folded into the table once on the XLA side:
  ``t_i = P * cum_i - u`` so that ``idx[j] = #{i : t_i < j}`` (integer
  thresholds, no per-chunk position vector);
- for each C-wide output chunk, coarse scalar counts ``s = #{t < j0}``
  and ``e = #{t < j0+C-1}`` bracket the source rows the chunk can touch;
- W-wide windows of ``t`` starting at the lane-aligned base below s are
  compare-counted against the chunk's j's to finish the searchsorted
  (round r covers source rows ``[b0+rW, b0+(r+1)W)`` exactly once —
  data-dependent trip count, usually one round: spans are ~C for
  near-uniform weights, ~0 for degenerate ones);
- the same windows of each payload column are one-hot mask-reduced to
  materialize the resampled rows — a sum with exactly one nonzero term,
  so the copy is bit-exact in any dtype.

Mosaic constraints shape the layout:
- block shapes divisible by (8, 128): the grid advances 8 points per step
  while each (P, 128)-wide TRANSPOSED output block is revisited for 16
  consecutive steps (revisited blocks stay resident in VMEM — one DMA per
  128 points); the wrapper transposes outputs back and P is padded to a
  multiple of 128;
- dynamic lane-slice starts must be provably 128-aligned: window starts
  are computed in 128-block units and multiplied back;
- dynamic-lane vector stores don't lower: result columns are accumulated
  into the output block through a one-hot lane mask (full-row store).
(A (N, P, K)-blocked formulation would lane-pad K=7 to 128 — an 18x HBM
blowup, observed as a 21 GB OOM.)
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_G_IN = 8  # points per grid step (input block sublane height)
_G_OUT = 128  # points per output block (lane width)
_C = 128  # output-chunk height (P is padded to a multiple of this)


def _kernel(P: int, P_real: int, W: int, K: int, t_ref, *refs):
    col_refs = refs[:K]
    out_refs = refs[K : K + K]
    s_scr, e_scr = refs[K + K], refs[K + K + 1]
    nch = P // _C
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    steps_per_block = _G_OUT // _G_IN
    j = pl.program_id(0) % steps_per_block
    lane0 = j * _G_IN

    @pl.when(j == 0)
    def _init():
        for k in range(K):
            out_refs[k][...] = jnp.zeros_like(out_refs[k])

    # Batched coarse brackets: count the source rows below every chunk's
    # first/last integer thresholds in one compare-reduce per (point,
    # bound) spanning ALL chunks at once, rather than two scalar
    # reductions inside each chunk's loop body (the per-chunk scalar
    # sections, not the vector sweeps, dominate kernel time; measured
    # 170 -> 123 ms at 10,240 x 2,048).
    thr = _C * jax.lax.broadcasted_iota(jnp.int32, (nch, 1), 0)
    for g in range(_G_IN):
        trow = t_ref[g : g + 1, :]
        thr_f = thr.astype(trow.dtype)
        s_scr[g * nch : (g + 1) * nch, 0:1] = jnp.sum(
            (trow < thr_f).astype(jnp.int32), axis=1, keepdims=True
        )
        e_scr[g * nch : (g + 1) * nch, 0:1] = jnp.sum(
            (trow < thr_f + (_C - 1)).astype(jnp.int32),
            axis=1,
            keepdims=True,
        )

    out_lanes = jax.lax.broadcasted_iota(jnp.int32, (1, _G_OUT), 1)
    last_blk = (P - W) // 128
    wblk = W // 128
    for g in range(_G_IN):
        lane_hot = (out_lanes == lane0 + g).astype(col_refs[0].dtype)
        for ci, c0 in enumerate(range(0, P, _C)):
            jg = c0 + jax.lax.broadcasted_iota(jnp.int32, (_C, 1), 0)
            s = s_scr[g * nch + ci, 0]
            e = e_scr[g * nch + ci, 0]
            # Lane-aligned window base (Mosaic: dynamic lane starts must
            # be provable multiples of 128), in 128-block units.
            b0_blk = s // 128
            b0 = b0_blk * 128
            jg_f = jg.astype(jnp.float32)

            def count_round(r, cnt):
                sr = jnp.minimum(b0_blk + r * wblk, last_blk) * 128
                win = t_ref[g : g + 1, pl.ds(sr, W)]  # (1, W)
                gidx = sr + iota_w
                # Rows < s are already in the coarse count (the aligned
                # base b0 <= s would re-count [b0, s) in round 0).
                valid = (
                    (gidx >= jnp.maximum(s, b0 + r * W)) & (gidx < e)
                )
                hit = (win < jg_f) & valid  # (_C, W)
                return cnt + jnp.sum(
                    hit.astype(jnp.int32), axis=1, keepdims=True
                )

            # Round 0 unrolled; the rare wide-span chunk (> W source rows)
            # finishes in a dynamic loop. Spans are ~_C for near-uniform
            # weights and ~0 for degenerate ones, so the static round
            # almost always suffices and the while-loop overhead is paid
            # only when needed.
            n_rounds = (e - b0) // W + 1
            cnt = jnp.full((_C, 1), 1, jnp.int32) * s
            cnt = count_round(0, cnt)
            cnt = jax.lax.cond(
                n_rounds > 1,
                lambda c: jax.lax.fori_loop(1, n_rounds, count_round, c),
                lambda c: c,
                cnt,
            )
            cnt = jnp.minimum(cnt, P_real - 1)  # resampler clip semantics
            rel = cnt - b0  # (_C, 1), in [0, e - b0]

            def select_round(r, accs):
                sr = jnp.minimum(b0_blk + r * wblk, last_blk) * 128
                rw = cnt - sr
                in_round = (rel >= r * W) & (rel < (r + 1) * W)
                hit = (rw == iota_w) & in_round  # (_C, W): <=1 hot per row
                out = []
                for k in range(K):
                    win = col_refs[k][g : g + 1, pl.ds(sr, W)]  # (1, W)
                    sel = jnp.sum(
                        hit.astype(win.dtype) * win, axis=1, keepdims=True
                    )  # (_C, 1) — exact: a sum with one nonzero term
                    out.append(accs[k] + sel)
                return tuple(out)

            accs = tuple(
                jnp.zeros((_C, 1), col_refs[k].dtype) for k in range(K)
            )
            accs = select_round(0, accs)
            accs = jax.lax.cond(
                n_rounds > 1,
                lambda a: jax.lax.fori_loop(1, n_rounds, select_round, a),
                lambda a: a,
                accs,
            )
            # Dynamic-lane stores don't lower; place the column through a
            # one-hot lane mask instead (the block was zero-initialized).
            for k in range(K):
                out_refs[k][c0 : c0 + _C, :] += accs[k] * lane_hot


@functools.partial(
    jax.jit, static_argnames=("window", "interpret")
)
def systematic_resample_gather(
    t, cols, window: int = 256, interpret: bool = False
):
    """Resample payload columns by systematic indices, in one fused pass.

    Arguments:
        t: (N, P) float table ``P * cumsum(w / sum(w)) - u`` (u the
            per-point systematic comb offset in [0, 1)).
        cols: sequence of (N, P) payload columns (same dtype).
        window: source window width per round (rounded to 128).
        interpret: run in the Pallas interpreter (CPU tests).

    Returns a list of (N, P) columns with
    ``out[k][n, j] = cols[k][n, idx[n, j]]`` where
    ``idx[n, j] = min(#{i : t[n, i] < j}, P - 1)`` — systematic
    resampling with searchsorted-left tie semantics, exact row copies.
    """
    cols = list(cols)
    N, P = t.shape
    K = len(cols)
    Np = -(-N // _G_OUT) * _G_OUT
    Pp = -(-P // 128) * 128
    if Np != N or Pp != P:
        # Point padding: +inf thresholds (count 0 -> idx 0), harmless rows
        # sliced off below. Particle padding: thresholds above every j so
        # padded source rows are never counted nor selected (idx <= P-1).
        t = jnp.pad(
            t, ((0, Np - N), (0, Pp - P)), constant_values=float(P + Pp)
        )
        cols = [jnp.pad(c, ((0, Np - N), (0, Pp - P))) for c in cols]
    W = min(-(-window // 128) * 128, Pp)
    kern = functools.partial(_kernel, Pp, P, W, K)
    row_spec = pl.BlockSpec((_G_IN, Pp), lambda i: (i, 0))
    col_spec = pl.BlockSpec(
        (Pp, _G_OUT), lambda i: (0, i // (_G_OUT // _G_IN))
    )
    outs = pl.pallas_call(
        kern,
        grid=(Np // _G_IN,),
        in_specs=[row_spec] * (1 + K),
        out_specs=[col_spec] * K,
        out_shape=[
            jax.ShapeDtypeStruct((Pp, Np), c.dtype) for c in cols
        ],
        scratch_shapes=[
            pltpu.VMEM((_G_IN * (Pp // _C), 1), jnp.int32)
        ] * 2,
        # K double-buffered (Pp, 128) output blocks overflow the default
        # 16 MB scoped-VMEM budget at production P; v5e has 128 MB VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(t, *cols)
    return [jnp.transpose(o)[:N, :P] for o in outs]
