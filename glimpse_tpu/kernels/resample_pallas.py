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
block pipelining = full-bandwidth DMA). Shared machinery:

- systematic positions are folded into the table once on the XLA side:
  ``t_i = P * cum_i - u`` so that ``idx[j] = #{i : t_i < j}`` (integer
  thresholds, no per-chunk position vector);
- for each C-wide output chunk, batched coarse counts ``s = #{t < j0}``
  and ``e = #{t < j0+C-1}`` bracket the source rows the chunk can touch;
- W-wide windows of ``t`` starting at the lane-aligned base below s are
  swept against the chunk's j's (round r covers source rows
  ``[b0+rW, b0+(r+1)W)`` exactly once — data-dependent trip count,
  usually one round: spans are ~C for near-uniform weights).

Four layouts, in increasing measured speed (kernel-only ms at 10,240 x
2,048, one v5e chip, round-5 sweep):

- ``lanes``: count-then-match. Windows are compare-COUNTED to
  finish the searchsorted, then an equality hit mask one-hot-reduces each
  payload column; results accumulate into (P, 128) transposed output
  blocks through a one-hot lane mask (dynamic-lane stores don't lower),
  revisited for 16 grid steps and transposed back by the wrapper.
- ``direct``: the count phase is GONE. Sorted thresholds mean
  ``idx[j] = i  <=>  t[i-1] < j <= t[i]``, so with a pre-shifted
  threshold row (``tm1``) built on the XLA side the source of every
  output is identified by two compares — no count sweep, no scalar
  ``cnt``/``rel`` chain, one control structure per chunk instead of two.
- ``mxu_rows`` (43.1 ms): direct hits + all K channel selections in ONE
  matmul per round on the MXU via :func:`_exact_select_dot` — a stacked
  ``[b1; b2; b3] (3K, W) @ hit^T (W, C)`` single default-precision pass
  over the exact 3-term bf16 split of the payload (bit-equal to the VPU
  path; the earlier HIGHEST-precision form cost 6 passes). The (K, C)
  result stores as K static row slices into this grid step's OWN (G, P)
  output block: no lane-hot read-modify-write, no block revisiting, no
  output transpose.
- ``mxu_shared`` (18.9 ms at W=384 C=128 G=16, production default): the
  chunk loop is OUTER and the G points of a grid block share ONE scalar
  section (bracket, window base, round cond) per chunk — scalar sections
  drop G-fold, and they are what bound mxu_rows at production shapes.
  The 3-term bf16 payload split is hoisted to block-level VMEM scratch,
  written once per grid step, so each (chunk, round, point) is exactly
  two (C, W) compares and one stacked (3K, W) @ (W, C) MXU pass.

Shared Mosaic constraints: block shapes divisible by (8, 128); dynamic
lane-slice starts provably 128-aligned (window starts are computed in
128-block units and multiplied back). A (N, P, K)-blocked formulation
would lane-pad K=7 to 128 — an 18x HBM blowup, observed as a 21 GB OOM.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_G_IN = 8  # points per grid step (input block sublane height)
_G_OUT = 128  # points per output block (lane width)
_C = 128  # output-chunk height (P is padded to a multiple of this)


def _exact_select_dot(colmat, hitf):
    """Exact (K, W) @ (W, C) one-hot select in THREE default-precision passes.

    ``Precision.HIGHEST`` lowers to six bf16 MXU passes (both operands
    split 3-way). Here the hit mask is exactly bf16-representable (0/1),
    so only the payload operand needs the 3-term split ``v = b1 + b2 + b3``
    (8+8+8 >= 24 mantissa bits, each residual exactly representable):
    three default-precision bf16 matmuls with f32 accumulation reconstruct
    every selected value bit-exactly (one nonzero per output column, and
    ``(b1 + b2) + b3 == v`` exactly since the terms' exponents are nested).
    Halves the MXU work of the select stage at identical results.
    """
    K = colmat.shape[0]
    b1 = colmat.astype(jnp.bfloat16)
    r1 = colmat - b1.astype(jnp.float32)
    b2 = r1.astype(jnp.bfloat16)
    b3 = (r1 - b2.astype(jnp.float32)).astype(jnp.bfloat16)
    # One stacked (3K, W) @ (W, C) pass (a 21-row matmul costs the same
    # MXU latency as a 7-row one) instead of three accumulated dots.
    stacked = jnp.concatenate([b1, b2, b3], axis=0)
    h = hitf.astype(jnp.bfloat16)
    sel3 = jax.lax.dot_general(
        stacked, h, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (3K, C)
    return sel3[0:K] + sel3[K : 2 * K] + sel3[2 * K :]


def _kernel(P: int, P_real: int, W: int, K: int, C: int, t_ref, *refs):
    col_refs = refs[:K]
    out_refs = refs[K : K + K]
    s_scr, e_scr = refs[K + K], refs[K + K + 1]
    nch = P // C
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
    thr = C * jax.lax.broadcasted_iota(jnp.int32, (nch, 1), 0)
    for g in range(_G_IN):
        trow = t_ref[g : g + 1, :]
        thr_f = thr.astype(trow.dtype)
        s_scr[g * nch : (g + 1) * nch, 0:1] = jnp.sum(
            (trow < thr_f).astype(jnp.int32), axis=1, keepdims=True
        )
        e_scr[g * nch : (g + 1) * nch, 0:1] = jnp.sum(
            (trow < thr_f + (C - 1)).astype(jnp.int32),
            axis=1,
            keepdims=True,
        )

    out_lanes = jax.lax.broadcasted_iota(jnp.int32, (1, _G_OUT), 1)
    last_blk = (P - W) // 128
    wblk = W // 128
    for g in range(_G_IN):
        lane_hot = (out_lanes == lane0 + g).astype(col_refs[0].dtype)
        for ci, c0 in enumerate(range(0, P, C)):
            jg = c0 + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
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
                hit = (win < jg_f) & valid  # (C, W)
                return cnt + jnp.sum(
                    hit.astype(jnp.int32), axis=1, keepdims=True
                )

            # Round 0 unrolled; the rare wide-span chunk (> W source rows)
            # finishes in a dynamic loop. Spans are ~_C for near-uniform
            # weights and ~0 for degenerate ones, so the static round
            # almost always suffices and the while-loop overhead is paid
            # only when needed.
            n_rounds = (e - b0) // W + 1
            cnt = jnp.full((C, 1), 1, jnp.int32) * s
            cnt = count_round(0, cnt)
            cnt = jax.lax.cond(
                n_rounds > 1,
                lambda c: jax.lax.fori_loop(1, n_rounds, count_round, c),
                lambda c: c,
                cnt,
            )
            cnt = jnp.minimum(cnt, P_real - 1)  # resampler clip semantics
            rel = cnt - b0  # (C, 1), in [0, e - b0]

            def select_round(r, accs):
                sr = jnp.minimum(b0_blk + r * wblk, last_blk) * 128
                rw = cnt - sr
                in_round = (rel >= r * W) & (rel < (r + 1) * W)
                hit = (rw == iota_w) & in_round  # (C, W): <=1 hot per row
                out = []
                for k in range(K):
                    win = col_refs[k][g : g + 1, pl.ds(sr, W)]  # (1, W)
                    sel = jnp.sum(
                        hit.astype(win.dtype) * win, axis=1, keepdims=True
                    )  # (C, 1) — exact: a sum with one nonzero term
                    out.append(accs[k] + sel)
                return tuple(out)

            accs = tuple(
                jnp.zeros((C, 1), col_refs[k].dtype) for k in range(K)
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
                out_refs[k][c0 : c0 + C, :] += accs[k] * lane_hot


def _kernel_direct(P: int, P_real: int, W: int, K: int, C: int,
                   t_ref, tm1_ref, *refs):
    """Direct-hit variant: the count phase is gone.

    Because the thresholds are sorted, ``idx[j] = i`` iff
    ``t[i-1] < j <= t[i]`` — so with a pre-shifted threshold row
    (``tm1[i] = t[i-1]``) each output's source is identified by TWO
    compares instead of a count-then-match pair of window loops. Per
    (chunk, round) this removes the count compare-reduce, the scalar
    ``cnt``/``rel`` dependency chain, and one fori_loop+cond control
    structure — the per-chunk scalar sections are what dominate kernel
    time at production shapes. The clip ``idx = min(idx, P_real-1)``
    becomes a disjunct on the last real source row.
    """
    col_refs = refs[:K]
    out_refs = refs[K : K + K]
    s_scr, e_scr = refs[K + K], refs[K + K + 1]
    nch = P // C
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    steps_per_block = _G_OUT // _G_IN
    j = pl.program_id(0) % steps_per_block
    lane0 = j * _G_IN

    @pl.when(j == 0)
    def _init():
        for k in range(K):
            out_refs[k][...] = jnp.zeros_like(out_refs[k])

    # Batched coarse brackets (same as _kernel): start bound for the
    # window base, end bound for the round count.
    thr = C * jax.lax.broadcasted_iota(jnp.int32, (nch, 1), 0)
    for g in range(_G_IN):
        trow = t_ref[g : g + 1, :]
        thr_f = thr.astype(trow.dtype)
        s_scr[g * nch : (g + 1) * nch, 0:1] = jnp.sum(
            (trow < thr_f).astype(jnp.int32), axis=1, keepdims=True
        )
        e_scr[g * nch : (g + 1) * nch, 0:1] = jnp.sum(
            (trow < thr_f + (C - 1)).astype(jnp.int32),
            axis=1,
            keepdims=True,
        )

    out_lanes = jax.lax.broadcasted_iota(jnp.int32, (1, _G_OUT), 1)
    last_blk = (P - W) // 128
    wblk = W // 128
    for g in range(_G_IN):
        lane_hot = (out_lanes == lane0 + g).astype(col_refs[0].dtype)
        for ci, c0 in enumerate(range(0, P, C)):
            jg_f = (
                c0 + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
            ).astype(jnp.float32)
            s = s_scr[g * nch + ci, 0]
            e = e_scr[g * nch + ci, 0]
            b0_blk = s // 128
            b0 = b0_blk * 128

            def select_round(r, accs):
                sr = jnp.minimum(b0_blk + r * wblk, last_blk) * 128
                win = t_ref[g : g + 1, pl.ds(sr, W)]  # (1, W)
                winm1 = tm1_ref[g : g + 1, pl.ds(sr, W)]  # (1, W)
                gidx = sr + iota_w
                lo = b0 + r * W
                # Row masks (exactly-once [lo, lo+W) strip across rounds,
                # pad-row exclusion, and the `gidx == P_real-1` clip
                # disjunct) are j-independent, so they fold into (1, W)
                # effective windows; the (C, W) work is then exactly two
                # compares and one AND.
                row_ok = (gidx >= lo) & (
                    gidx < jnp.minimum(lo + W, P_real)
                )
                lo_eff = jnp.where(row_ok, winm1, jnp.inf)
                hi_eff = jnp.where(gidx == P_real - 1, jnp.inf, win)
                hit = (lo_eff < jg_f) & (hi_eff >= jg_f)  # (C, W)
                hitf = hit.astype(col_refs[0].dtype)
                out = []
                for k in range(K):
                    cwin = col_refs[k][g : g + 1, pl.ds(sr, W)]
                    sel = jnp.sum(
                        hitf * cwin, axis=1, keepdims=True
                    )  # (C, 1) — exact: a sum with one nonzero term
                    out.append(accs[k] + sel)
                return tuple(out)

            n_rounds = (e + 1 - b0) // W + 1
            accs = tuple(
                jnp.zeros((C, 1), col_refs[k].dtype) for k in range(K)
            )
            accs = select_round(0, accs)
            accs = jax.lax.cond(
                n_rounds > 1,
                lambda a: jax.lax.fori_loop(1, n_rounds, select_round, a),
                lambda a: a,
                accs,
            )
            for k in range(K):
                out_refs[k][c0 : c0 + C, :] += accs[k] * lane_hot


def _kernel_mxu_rows(P: int, P_real: int, W: int, K: int, C: int, G: int,
                     t_ref, tm1_ref, *refs):
    """Row-output MXU variant: no output revisiting, no lane-hot RMW.

    The direct-hit mask is built exactly as in :func:`_kernel_direct`, but
    the K channel selections run as ``cols (K, W) @ hit^T (W, C) -> (K, C)``
    on the MXU, so each chunk's results land as K static (1, C) row-slice
    stores into this grid step's own (G, P) output block. Compared to
    the lane-oriented kernels this removes: the one-hot lane mask and its
    (C, 128) read-modify-write per (chunk, column), the 16-step output
    block revisit, and the final XLA transpose of the outputs. ``G``
    (points per grid step) is tunable — fewer grid steps amortize block
    DMA setup; the per-point work is unchanged.
    """
    col_refs = refs[:K]
    out_refs = refs[K : K + K]
    s_scr, e_scr = refs[K + K], refs[K + K + 1]
    nch = P // C
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

    thr = C * jax.lax.broadcasted_iota(jnp.int32, (nch, 1), 0)
    for g in range(G):
        trow = t_ref[g : g + 1, :]
        thr_f = thr.astype(trow.dtype)
        s_scr[g * nch : (g + 1) * nch, 0:1] = jnp.sum(
            (trow < thr_f).astype(jnp.int32), axis=1, keepdims=True
        )
        e_scr[g * nch : (g + 1) * nch, 0:1] = jnp.sum(
            (trow < thr_f + (C - 1)).astype(jnp.int32),
            axis=1,
            keepdims=True,
        )

    last_blk = (P - W) // 128
    wblk = W // 128
    for g in range(G):
        for ci, c0 in enumerate(range(0, P, C)):
            jg_f = (
                c0 + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
            ).astype(jnp.float32)
            s = s_scr[g * nch + ci, 0]
            e = e_scr[g * nch + ci, 0]
            b0_blk = s // 128
            b0 = b0_blk * 128

            def select_round(r, accs):
                sr = jnp.minimum(b0_blk + r * wblk, last_blk) * 128
                win = t_ref[g : g + 1, pl.ds(sr, W)]  # (1, W)
                winm1 = tm1_ref[g : g + 1, pl.ds(sr, W)]  # (1, W)
                gidx = sr + iota_w
                lo = b0 + r * W
                row_ok = (gidx >= lo) & (
                    gidx < jnp.minimum(lo + W, P_real)
                )
                lo_eff = jnp.where(row_ok, winm1, jnp.inf)
                hi_eff = jnp.where(gidx == P_real - 1, jnp.inf, win)
                hit = (lo_eff < jg_f) & (hi_eff >= jg_f)  # (C, W)
                hitf = hit.astype(jnp.float32)
                # f32 accumulation regardless of payload dtype: a single
                # nonzero term per output, so the value round-trips any
                # narrower payload dtype exactly at the final store.
                colmat = jnp.concatenate(
                    [
                        col_refs[k][g : g + 1, pl.ds(sr, W)]
                        for k in range(K)
                    ],
                    axis=0,
                ).astype(jnp.float32)  # (K, W)
                sel = _exact_select_dot(colmat, hitf)  # (K, C)
                return accs + sel

            n_rounds = (e + 1 - b0) // W + 1
            accs = jnp.zeros((K, C), jnp.float32)
            accs = select_round(0, accs)
            accs = jax.lax.cond(
                n_rounds > 1,
                lambda a: jax.lax.fori_loop(1, n_rounds, select_round, a),
                lambda a: a,
                accs,
            )
            for k in range(K):
                out_refs[k][g : g + 1, c0 : c0 + C] = accs[k : k + 1, :].astype(out_refs[k].dtype)


def _kernel_mxu_shared(P: int, P_real: int, W: int, K: int, C: int, G: int,
                       t_ref, tm1_ref, *refs):
    """Shared-scalar variant: ONE scalar section per (block, chunk).

    At production shapes the mxu_rows kernel is bound not by its vector
    compares (~10 ms of VPU work) but by the N * P/C per-(point, chunk)
    scalar sections — each with its own bracket reads, dynamic window
    base, and round cond (~164k scalar loop iterations at 10,240 x
    2,048). This layout swaps the loop nest: the chunk loop is OUTER and
    the G points of the grid block share a single window base per chunk,
    taken from the min/max of their brackets. Scalar sections drop G-fold
    (N/G * P/C); the per-point hit compares and (K, W) @ (W, C) MXU
    selections are unchanged and still exact.

    Cost model: a block whose G points have similar weight ladders (the
    common case — near-uniform post-resample weights put every point's
    bracket near the chunk diagonal) still runs one round per chunk; a
    block mixing a degenerate row with uniform rows widens the shared
    span and pays extra rounds, bounded by the same fori_loop fallback.
    """
    col_refs = refs[:K]
    out_refs = refs[K : K + K]
    # bf16 scratch (3 per channel): block-level exact 3-way split of the
    # payload, written once per grid step so every (chunk, round) loads
    # pre-split windows and the inner loop is one matmul + two compares.
    s1_refs = refs[2 * K : 3 * K]
    s2_refs = refs[3 * K : 4 * K]
    s3_refs = refs[4 * K : 5 * K]
    nch = P // C
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    last_blk = (P - W) // 128
    wblk = W // 128

    for k in range(K):
        v = col_refs[k][...].astype(jnp.float32)  # (G, P)
        b1 = v.astype(jnp.bfloat16)
        r1 = v - b1.astype(jnp.float32)
        b2 = r1.astype(jnp.bfloat16)
        b3 = (r1 - b2.astype(jnp.float32)).astype(jnp.bfloat16)
        s1_refs[k][...] = b1
        s2_refs[k][...] = b2
        s3_refs[k][...] = b3

    t_full = t_ref[...]  # (G, P) — loaded once, reused by every bracket
    for ci, c0 in enumerate(range(0, P, C)):
        jg_f = (
            c0 + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
        ).astype(jnp.float32)
        lo_cnt = jnp.sum((t_full < float(c0)).astype(jnp.int32), axis=1)
        hi_cnt = jnp.sum(
            (t_full < float(c0 + C - 1)).astype(jnp.int32), axis=1
        )
        s = jnp.min(lo_cnt)  # shared bracket start (block min)
        e = jnp.max(hi_cnt)  # shared bracket end (block max)
        b0_blk = s // 128
        b0 = b0_blk * 128

        def select_round(r, accs):
            sr = jnp.minimum(b0_blk + r * wblk, last_blk) * 128
            win = t_ref[:, pl.ds(sr, W)]  # (G, W) — one load for the block
            winm1 = tm1_ref[:, pl.ds(sr, W)]  # (G, W)
            gidx = sr + iota_w
            lo = b0 + r * W
            row_ok = (gidx >= lo) & (gidx < jnp.minimum(lo + W, P_real))
            clipped = gidx == P_real - 1
            w1 = [s1_refs[k][:, pl.ds(sr, W)] for k in range(K)]  # (G, W)
            w2 = [s2_refs[k][:, pl.ds(sr, W)] for k in range(K)]
            w3 = [s3_refs[k][:, pl.ds(sr, W)] for k in range(K)]
            out = []
            for g in range(G):
                lo_eff = jnp.where(row_ok, winm1[g : g + 1, :], jnp.inf)
                hi_eff = jnp.where(clipped, jnp.inf, win[g : g + 1, :])
                hit = (lo_eff < jg_f) & (hi_eff >= jg_f)  # (C, W)
                colmat = jnp.concatenate(
                    [w1[k][g : g + 1, :] for k in range(K)]
                    + [w2[k][g : g + 1, :] for k in range(K)]
                    + [w3[k][g : g + 1, :] for k in range(K)],
                    axis=0,
                )  # (3K, W) bf16
                sel3 = jax.lax.dot_general(
                    colmat,
                    hit.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (3K, C) — exact: one nonzero per output column, and
                # the 3-term bf16 split reconstructs f32 exactly (see
                # _exact_select_dot).
                sel = sel3[0:K] + sel3[K : 2 * K] + sel3[2 * K :]
                out.append(accs[g] + sel)
            return tuple(out)

        n_rounds = (e + 1 - b0) // W + 1
        accs = tuple(jnp.zeros((K, C), jnp.float32) for _ in range(G))
        accs = select_round(0, accs)
        accs = jax.lax.cond(
            n_rounds > 1,
            lambda a: jax.lax.fori_loop(1, n_rounds, select_round, a),
            lambda a: a,
            accs,
        )
        for g in range(G):
            for k in range(K):
                out_refs[k][g : g + 1, c0 : c0 + C] = accs[g][
                    k : k + 1, :
                ].astype(out_refs[k].dtype)


@functools.partial(
    jax.jit,
    static_argnames=("window", "interpret", "chunk", "layout", "points_block"),
)
def systematic_resample_gather(
    t, cols, window: int = 384, interpret: bool = False, chunk: int = _C,
    layout: str = "mxu_shared", points_block: int = 16,
):
    """Resample payload columns by systematic indices, in one fused pass.

    Arguments:
        t: (N, P) float table ``P * cumsum(w / sum(w)) - u`` (u the
            per-point systematic comb offset in [0, 1)).
        cols: sequence of (N, P) payload columns (same dtype).
        window: source window width per round (rounded to 128).
        interpret: run in the Pallas interpreter (CPU tests).
        chunk: output-chunk height C (rounded to 128).
        layout: kernel variant — 'mxu_shared' (production), 'mxu_rows',
            'direct', or 'lanes' (see module docstring). All four are
            bit-identical.
        points_block: points per grid step ('mxu_shared'/'mxu_rows' —
            the lane-oriented layouts are tied to the 8x128 geometry).

    Returns a list of (N, P) columns with
    ``out[k][n, j] = cols[k][n, idx[n, j]]`` where
    ``idx[n, j] = min(#{i : t[n, i] < j}, P - 1)`` — systematic
    resampling with searchsorted-left tie semantics, exact row copies.
    """
    cols = list(cols)
    N, P = t.shape
    K = len(cols)
    C = max(128, -(-chunk // 128) * 128)
    G = max(8, -(-points_block // 8) * 8)
    Np = -(-N // max(_G_OUT, G)) * max(_G_OUT, G)
    Pp = -(-P // C) * C
    if Np != N or Pp != P:
        # Point padding: +inf thresholds (count 0 -> idx 0), harmless rows
        # sliced off below. Particle padding: thresholds above every j so
        # padded source rows are never counted nor selected (idx <= P-1).
        t = jnp.pad(
            t, ((0, Np - N), (0, Pp - P)), constant_values=float(P + Pp)
        )
        cols = [jnp.pad(c, ((0, Np - N), (0, Pp - P))) for c in cols]
    W = min(-(-window // 128) * 128, Pp)
    row_spec = pl.BlockSpec((_G_IN, Pp), lambda i: (i, 0))
    col_spec = pl.BlockSpec(
        (Pp, _G_OUT), lambda i: (0, i // (_G_OUT // _G_IN))
    )
    if layout in ("mxu_rows", "mxu_shared"):
        # Shifted threshold row: tm1[i] = t[i-1], with -1 (below every
        # output index) in front. Built once on the XLA side so both
        # windows load at the same lane-aligned offsets in the kernel.
        tm1 = jnp.pad(t[:, :-1], ((0, 0), (1, 0)), constant_values=-1.0)
        g_spec = pl.BlockSpec((G, Pp), lambda i: (i, 0))
        if layout == "mxu_shared":
            kern = functools.partial(_kernel_mxu_shared, Pp, P, W, K, C, G)
            outs = pl.pallas_call(
                kern,
                grid=(Np // G,),
                in_specs=[g_spec] * (2 + K),
                out_specs=[g_spec] * K,
                out_shape=[
                    jax.ShapeDtypeStruct((Np, Pp), c.dtype) for c in cols
                ],
                scratch_shapes=[
                    pltpu.VMEM((G, Pp), jnp.bfloat16)
                ] * (3 * K),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024
                ),
                interpret=interpret,
            )(t, tm1, *cols)
            return [o[:N, :P] for o in outs]
        kern = functools.partial(_kernel_mxu_rows, Pp, P, W, K, C, G)
        outs = pl.pallas_call(
            kern,
            grid=(Np // G,),
            in_specs=[g_spec] * (2 + K),
            out_specs=[g_spec] * K,
            out_shape=[
                jax.ShapeDtypeStruct((Np, Pp), c.dtype) for c in cols
            ],
            scratch_shapes=[
                pltpu.VMEM((G * (Pp // C), 1), jnp.int32)
            ] * 2,
            interpret=interpret,
        )(t, tm1, *cols)
        return [o[:N, :P] for o in outs]
    if layout == "direct":
        tm1 = jnp.pad(t[:, :-1], ((0, 0), (1, 0)), constant_values=-1.0)
        kern = functools.partial(_kernel_direct, Pp, P, W, K, C)
        inputs = (t, tm1, *cols)
        n_in = 2 + K
    else:
        kern = functools.partial(_kernel, Pp, P, W, K, C)
        inputs = (t, *cols)
        n_in = 1 + K
    outs = pl.pallas_call(
        kern,
        grid=(Np // _G_IN,),
        in_specs=[row_spec] * n_in,
        out_specs=[col_spec] * K,
        out_shape=[
            jax.ShapeDtypeStruct((Pp, Np), c.dtype) for c in cols
        ],
        scratch_shapes=[
            pltpu.VMEM((_G_IN * (Pp // C), 1), jnp.int32)
        ] * 2,
        # K double-buffered (Pp, 128) output blocks overflow the default
        # 16 MB scoped-VMEM budget at production P; v5e has 128 MB VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)
    return [jnp.transpose(o)[:N, :P] for o in outs]
