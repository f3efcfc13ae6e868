"""Device-batched keypoint descriptor matching.

SURVEY.md section 2.3 prescribes the TPU-native replacement for per-pair
FLANN kNN matching (reference ``optimize.py:2234-2309``): L2 top-k as one
``(n_a, 128) @ (128, n_b)`` matmul on the MXU, with the Lowe ratio test and
mutual-nearest cross-check evaluated on device. Descriptor stacks are padded
to a fixed budget so ONE compiled program serves every image pair in a
sequence — the per-pair cost is one device dispatch instead of a host KD-tree
build + query.

Semantics match :func:`glimpse_tpu.optimize.match_keypoints` (FLANN):
distances are plain L2, the ratio filter is ``d1 / d2 < max_ratio``
(strict), and ``cross_check`` keeps mutual nearest neighbors only.
"""
import functools
from typing import Optional, Tuple

import numpy as np

try:
    import jax
    import jax.numpy as jnp
except ImportError:  # pragma: no cover
    jax = None
    jnp = None


def _ceil_to(n: int, step: int) -> int:
    return -(-n // step) * step


def _match_core(da, db, na, nb, max_ratio, cross_check: bool):
    """Match padded descriptor stacks; returns (best index, ratio, valid).

    ``da`` (Na, D), ``db`` (Nb, D) float32 with rows >= na / nb undefined;
    ``max_ratio`` is a traced scalar (pass jnp.inf to disable).
    """
    ip = jnp.matmul(
        da, db.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    a2 = jnp.sum(da * da, axis=-1)
    b2 = jnp.sum(db * db, axis=-1)
    d2 = jnp.maximum(a2[:, None] + b2[None, :] - 2.0 * ip, 0.0)
    n_a, n_b = da.shape[0], db.shape[0]
    col_ok = jnp.arange(n_b) < nb
    row_ok = jnp.arange(n_a) < na
    big = jnp.float32(np.finfo(np.float32).max)
    d2 = jnp.where(col_ok[None, :], d2, big)
    # Top-2 per row as linear min/argmin passes: lax.top_k lowers to a
    # per-row sort, which dominates the whole match step at these shapes
    # (measured ~450 ms per 32-pair chunk); two VPU reductions do not.
    best = jnp.argmin(d2, axis=1)
    d1sq = jnp.min(d2, axis=1)
    cols = jnp.arange(n_b)
    d2_masked = jnp.where(cols[None, :] == best[:, None], big, d2)
    d2nd_sq = jnp.min(d2_masked, axis=1)
    d1 = jnp.sqrt(d1sq)
    d2nd = jnp.sqrt(jnp.minimum(d2nd_sq, jnp.float32(1e30)))
    ratio = d1 / jnp.maximum(d2nd, jnp.float32(1e-12))
    valid = row_ok & (ratio < max_ratio)
    if cross_check:
        d2_rows = jnp.where(row_ok[:, None], d2, big)
        best_for_b = jnp.argmin(d2_rows, axis=0)  # (Nb,)
        valid = valid & (best_for_b[best] == jnp.arange(n_a))
    return best, ratio, valid


_match_padded = functools.partial(jax.jit, static_argnames=("cross_check",))(
    _match_core
)


@functools.partial(jax.jit, static_argnames=("cross_check",))
def _match_batch(da, db, na, nb, max_ratio, cross_check: bool):
    """Vmapped pair matching: ``da``/``db`` (B, N, D), ``na``/``nb`` (B,).

    One dispatch serves B image pairs — through a remote-tunnel TPU the
    per-dispatch RPC (~30 ms) otherwise dominates each pair's device time.
    """
    return jax.vmap(
        functools.partial(_match_core, cross_check=cross_check),
        in_axes=(0, 0, 0, 0, None),
    )(da, db, na, nb, max_ratio)


class DescriptorMatcher:
    """Pairwise descriptor matcher with one compiled program per pad size.

    Descriptor counts vary per image; stacks are padded up to multiples of
    ``pad_step`` so a whole sequence reuses a handful of compiled programs.
    Padded stacks are cached ON DEVICE (keyed by array identity, bounded
    LRU): in sequence matching every image participates in several pairs,
    so each descriptor stack crosses host->device once, not once per pair
    — through a remote-tunnel TPU the transfer dominates the pair cost.
    The default ``cache_entries`` exceeds the live-image span of a
    ``seq=(1, 8, 64)`` matching window (~128 stacks in flight), measured
    to re-transfer ~0.9 stacks/pair at 96 entries and ~0 at 192.
    """

    def __init__(self, pad_step: int = 1024, cache_entries: int = 192) -> None:
        self.pad_step = pad_step
        self.cache_entries = cache_entries
        self._device_cache = {}  # id(array) -> (weakref-checked array, jnp)
        self._order = []

    def _pad(self, d: np.ndarray, pad_to: Optional[int] = None) -> np.ndarray:
        n = pad_to or _ceil_to(max(len(d), 1), self.pad_step)
        if len(d) == n:
            return np.ascontiguousarray(d, dtype=np.float32)
        out = np.zeros((n, d.shape[1]), dtype=np.float32)
        out[: len(d)] = d
        return out

    def _device_stack(self, d: np.ndarray, pad_to: Optional[int] = None):
        key = (id(d), pad_to)
        hit = self._device_cache.get(key)
        # Guard against id() reuse after garbage collection: keep the host
        # array alive inside the cache entry and require identity.
        if hit is not None and hit[0] is d:
            return hit[1]
        dev = jnp.asarray(self._pad(d, pad_to))
        self._device_cache[key] = (d, dev)
        self._order.append(key)
        while len(self._order) > self.cache_entries:
            old = self._order.pop(0)
            self._device_cache.pop(old, None)
        return dev

    def match_pairs(
        self,
        descriptors,
        pairs,
        max_ratio: Optional[float] = None,
        cross_check: bool = False,
        batch: Optional[int] = None,
    ):
        """Match many image pairs in chunked batched device dispatches.

        ``descriptors``: sequence of per-image (n_i, D) stacks; ``pairs``:
        (M, 2) indices into it. Every stack is padded to ONE common size so
        a single compiled program (per chunk width) serves the whole set,
        and each chunk of pairs costs one dispatch instead of ``batch``.
        Returns a list of ``(pair_indices (m, 2), ratios (m,))`` aligned
        with ``pairs`` — the same contract as :meth:`match` per pair.
        """
        pairs = np.asarray(pairs, dtype=int).reshape(-1, 2)
        empty = (np.empty((0, 2), dtype=int), np.empty(0, dtype=np.float32))
        out = [empty] * len(pairs)
        todo = [
            m
            for m in range(len(pairs))
            if min(len(descriptors[pairs[m, 0]]), len(descriptors[pairs[m, 1]])) >= 2
        ]
        if not todo:
            return out
        used = {int(k) for k in np.unique(pairs[todo])}
        n_pad = _ceil_to(max(len(descriptors[k]) for k in used), self.pad_step)
        if batch is None:
            # Keep the (B, N, N) distance block (+ top-k workspace) within
            # a ~4 GB budget.
            batch = max(1, min(32, 4_000_000_000 // (n_pad * n_pad * 12)))
        ratio_val = np.float32(np.inf if max_ratio is None else max_ratio)
        for start in range(0, len(todo), batch):
            chunk = todo[start : start + batch]
            rows = len(chunk)
            # Pad the final chunk by repeating its last pair so every chunk
            # compiles at the same width; extras are discarded below.
            full = chunk + [chunk[-1]] * (batch - rows)
            da = jnp.stack(
                [self._device_stack(descriptors[pairs[m, 0]], n_pad) for m in full]
            )
            db = jnp.stack(
                [self._device_stack(descriptors[pairs[m, 1]], n_pad) for m in full]
            )
            na = jnp.asarray(
                [len(descriptors[pairs[m, 0]]) for m in full], jnp.int32
            )
            nb = jnp.asarray(
                [len(descriptors[pairs[m, 1]]) for m in full], jnp.int32
            )
            best, ratio, valid = _match_batch(
                da, db, na, nb, ratio_val, bool(cross_check)
            )
            best = np.asarray(best)
            ratio = np.asarray(ratio)
            valid = np.asarray(valid)
            for row, m in enumerate(chunk):
                keep = np.flatnonzero(valid[row])
                out[m] = (
                    np.column_stack([keep, best[row][keep]]),
                    ratio[row][keep],
                )
        return out

    def match(
        self,
        desc_a: np.ndarray,
        desc_b: np.ndarray,
        max_ratio: Optional[float] = None,
        cross_check: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Indices of matches (a_index, b_index) plus ratios.

        Returns ``(pairs (m, 2) int, ratios (m,) float)``.
        """
        if len(desc_a) < 2 or len(desc_b) < 2:
            return (
                np.empty((0, 2), dtype=int), np.empty(0, dtype=np.float32)
            )
        best, ratio, valid = _match_padded(
            self._device_stack(desc_a),
            self._device_stack(desc_b),
            len(desc_a),
            len(desc_b),
            np.float32(np.inf if max_ratio is None else max_ratio),
            bool(cross_check),
        )
        valid = np.asarray(valid)
        keep = np.flatnonzero(valid)
        pairs = np.column_stack([keep, np.asarray(best)[keep]])
        return pairs, np.asarray(ratio)[keep]
