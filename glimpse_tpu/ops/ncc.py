"""Template-matching ops: batched sum-of-squared-error (SSE) maps.

Replaces ``cv2.matchTemplate(TM_SQDIFF)`` — the particle filter's hottest
kernel (``/root/reference/src/glimpse/track/tracker.py:609-614``) — with a
batched, MXU-friendly formulation:

    SSE(u, v) = sum_patch S^2  -  2 * (S * T)(u, v)  +  sum T^2

The local energy term is a ``reduce_window`` sum; the correlation term is a
depthwise (grouped) convolution with one template filter per batch element,
which XLA lowers onto the TPU convolution units. A Pallas fused variant
lives in :mod:`glimpse_tpu.kernels`.
"""
import numpy as np


def sse_map_numpy(search: np.ndarray, template: np.ndarray) -> np.ndarray:
    """Single-pair SSE map, NumPy reference implementation.

    ``search`` (sh, sw), ``template`` (th, tw) -> (sh-th+1, sw-tw+1).
    Direct sliding-window computation (golden value for tests).
    """
    sh, sw = search.shape
    th, tw = template.shape
    oh, ow = sh - th + 1, sw - tw + 1
    windows = np.lib.stride_tricks.sliding_window_view(search, (th, tw))
    diff = windows - template
    return np.einsum("uvij,uvij->uv", diff, diff)


def sse_map_batched(search, templates, xp=None, method: str = "conv"):
    """Batched SSE maps.

    Arguments:
        search: Search tiles (N, sh, sw).
        templates: Templates (N, th, tw).
        method: Correlation formulation on the jax path. ``'conv'`` is a
            depthwise grouped convolution (MXU; best steady-state rate at
            particle-filter scale) but XLA:TPU's compile time for
            ``feature_group_count=N`` convs is pathological (measured
            ~240 s at N=512, growing with N). ``'shift'`` unrolls the
            correlation as th*tw shifted multiply-adds (VPU elementwise;
            compiles in seconds) — the right trade for small search/
            template sizes or one-shot stages like match refinement.

    Returns:
        SSE maps (N, sh-th+1, sw-tw+1).
    """
    if xp is np or (xp is None and isinstance(search, np.ndarray)):
        return np.stack(
            [sse_map_numpy(s, t) for s, t in zip(search, templates)]
        )
    import jax
    import jax.numpy as jnp

    N, sh, sw = search.shape
    th, tw = templates.shape[-2:]
    if method == "shift":
        oh, ow = sh - th + 1, sw - tw + 1
        corr = jnp.zeros((N, oh, ow), search.dtype)
        for i in range(th):
            for j in range(tw):
                corr = corr + (
                    search[:, i : i + oh, j : j + ow]
                    * templates[:, i, j][:, None, None]
                )
        t2 = jnp.sum(templates * templates, axis=(-2, -1))
        s2 = jax.lax.reduce_window(
            search * search,
            0.0,
            jax.lax.add,
            window_dimensions=(1, th, tw),
            window_strides=(1, 1, 1),
            padding="VALID",
        )
        return s2 - 2 * corr + t2[:, None, None]
    # Local patch energy: sliding-window sum of S^2.
    s2 = jax.lax.reduce_window(
        search * search,
        0.0,
        jax.lax.add,
        window_dimensions=(1, th, tw),
        window_strides=(1, 1, 1),
        padding="VALID",
    )
    # Correlation: depthwise conv, one filter (template) per batch element.
    corr = jax.lax.conv_general_dilated(
        search[None],            # (1, N, sh, sw)
        templates[:, None],      # (N, 1, th, tw)
        window_strides=(1, 1),
        padding="VALID",
        feature_group_count=N,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0]
    t2 = jnp.sum(templates * templates, axis=(-2, -1))
    return s2 - 2 * corr + t2[:, None, None]


def sse_map(search, template, xp=np):
    """Single-pair SSE map on either backend.

    On the host path this uses OpenCV's ``matchTemplate(TM_SQDIFF)`` when
    available (the reference's kernel, tracker.py:609-614, ~10x faster than
    the sliding-window fallback), with :func:`sse_map_numpy` as the exact
    pure-NumPy fallback and golden reference.
    """
    if xp is np:
        search = np.asarray(search)
        template = np.asarray(template)
        try:
            import cv2

            return cv2.matchTemplate(
                search.astype(np.float32),
                template.astype(np.float32),
                cv2.TM_SQDIFF,
            ).astype(float)
        except ImportError:  # pragma: no cover
            return sse_map_numpy(search, template)
    return sse_map_batched(search[None], template[None], xp=xp)[0]
