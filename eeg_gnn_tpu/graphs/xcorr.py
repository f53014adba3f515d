"""Correlation ("individual") graph construction.

The reference builds a per-clip dynamic graph from pairwise zero-lag
normalized cross-correlation of the flattened clip signals, computed with
171 sequential ``scipy.signal.correlate`` calls per clip in DataLoader
worker processes (reference ``data/dataloader_detection.py:258-307``,
``data/data_utils.py:174-222``).

TPU-native redesign: zero-lag 'valid' cross-correlation of equal-length
signals is just a dot product, and the MATLAB-style normalization
``sqrt(cxx0*cyy0)`` is the product of signal norms — so the whole adjacency
is one normalized Gram matrix ``|X X^T| / (||x_i|| ||x_j||)``, a single
batched 19x(T*D) matmul that runs on the MXU for thousands of clips at once.
Numerics are identical to the reference (verified by the oracle tests).

Both a host numpy oracle (mirroring the reference loop semantics exactly,
including the degenerate zero-norm case) and a batched jit-friendly ``jnp``
version are provided.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Top-k sparsification
# ---------------------------------------------------------------------------


def keep_topk(adj_mat: np.ndarray, top_k: int = 3, directed: bool = True) -> np.ndarray:
    """Keep the top-k off-diagonal neighbors per row (plus the diagonal).

    Parity: reference ``data/data_utils.py:174-200`` — diagonal is excluded
    from the ranking but always kept in the mask; ties resolve to the lowest
    column index (stable argsort of the negated matrix).
    """
    adj = np.asarray(adj_mat)
    no_self = adj.copy()
    np.fill_diagonal(no_self, 0)
    top_k_idx = (-no_self).argsort(axis=-1)[:, :top_k]
    mask = np.eye(adj.shape[0], dtype=bool)
    rows = np.repeat(np.arange(adj.shape[0]), top_k)
    mask[rows, top_k_idx.reshape(-1)] = True
    if not directed:
        mask[top_k_idx.reshape(-1), rows] = True
    return mask * adj


def keep_topk_jnp(adj, top_k: int = 3, directed: bool = True):
    """Batched jnp top-k sparsification over leading dims of ``adj``.

    Matches :func:`keep_topk` including lowest-index tie-breaking
    (``jax.lax.top_k`` breaks ties toward lower indices, like a stable
    descending argsort).
    """
    import jax

    n = adj.shape[-1]
    eye = jnp.eye(n, dtype=bool)
    no_self = jnp.where(eye, 0.0, adj)
    _, idx = jax.lax.top_k(no_self, top_k)  # (..., N, top_k)
    sel = jax.nn.one_hot(idx, n, dtype=bool).any(axis=-2)  # (..., N, N)
    mask = sel | eye
    if not directed:
        mask = mask | jnp.swapaxes(sel, -1, -2)
    return jnp.where(mask, adj, 0.0)


# ---------------------------------------------------------------------------
# Correlation adjacency
# ---------------------------------------------------------------------------


def comp_xcorr_zero_lag(x: np.ndarray, y: np.ndarray, normalize: bool = True) -> float:
    """Zero-lag 'valid' cross-correlation of two equal-length 1-D signals.

    Parity: reference ``data/data_utils.py:203-222``
    (``scipy.signal.correlate(x, y, mode='valid')`` for equal lengths reduces
    to the inner product; normalization follows MATLAB's xcorr).
    """
    xcorr = float(np.dot(x, y))
    cxx0 = float(np.sum(np.abs(x) ** 2))
    cyy0 = float(np.sum(np.abs(y) ** 2))
    if normalize and cxx0 != 0 and cyy0 != 0:
        xcorr /= (cxx0 * cyy0) ** 0.5
    return xcorr


def correlation_adjacency(
    eeg_clip: np.ndarray, top_k: int | None = 3, swap_nodes=None, apply_swap: bool = False
) -> np.ndarray:
    """Host oracle for the per-clip correlation adjacency.

    Args:
        eeg_clip: (seq_len, num_nodes, input_dim) clip features.
        top_k: neighbors kept per node (None disables sparsification —
            the reference raises instead; we allow dense for testing).
        swap_nodes: reflection-augmentation index pairs.
        apply_swap: QUIRK — in the reference, ``swap_nodes`` only remaps a
            ``sensor_id_to_ind`` dict that is never read afterwards
            (``dataloader_detection.py:278-291``; same dead code in the
            classification and SSL dataloaders), so the reflection
            augmentation has NO effect on the correlation graph. The default
            ``False`` reproduces that observable behavior; ``True`` applies
            the evidently-intended node permutation instead.

    Returns:
        (num_nodes, num_nodes) float32 adjacency with unit diagonal.

    Parity: reference ``data/dataloader_detection.py:258-307``.
    """
    n = eeg_clip.shape[1]
    # (num_nodes, seq_len*input_dim)
    flat = np.transpose(np.asarray(eeg_clip, dtype=np.float64), (1, 0, 2)).reshape(n, -1)

    if apply_swap and swap_nodes is not None:
        perm = np.arange(n)
        for a, b in swap_nodes:
            perm[a], perm[b] = perm[b], perm[a]
        flat = flat[perm]

    adj = np.eye(n, dtype=np.float64)
    for i in range(n):
        for j in range(i + 1, n):
            v = comp_xcorr_zero_lag(flat[i], flat[j], normalize=True)
            adj[i, j] = v
            adj[j, i] = v
    adj = np.abs(adj)
    if top_k is not None:
        adj = keep_topk(adj, top_k=top_k, directed=True)
    return adj.astype(np.float32)


def correlation_adjacency_jnp(eeg_clip, top_k: int | None = 3):
    """Batched on-device correlation adjacency via a normalized Gram matmul.

    Args:
        eeg_clip: (..., seq_len, num_nodes, input_dim) clip features.
        top_k: neighbors kept per node (None -> dense).

    Returns:
        (..., num_nodes, num_nodes) adjacency, unit diagonal, float32.

    Semantics match :func:`correlation_adjacency`: zero-lag normalized
    xcorr Gram, abs, directed top-k with preserved diagonal.
    """
    x = jnp.asarray(eeg_clip)
    n = x.shape[-2]
    # (..., num_nodes, seq_len*input_dim)
    flat = jnp.swapaxes(x, -3, -2).reshape(*x.shape[:-3], n, -1)
    import jax

    flat32 = flat.astype(jnp.float32)
    # HIGHEST precision: on TPU, f32 matmuls otherwise round through
    # bfloat16 passes — graph topology (top-k) is sensitive to near-ties.
    gram = jnp.einsum(
        "...nd,...md->...nm", flat32, flat32,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    energy = jnp.einsum(
        "...nd,...nd->...n", flat32, flat32,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    denom = jnp.sqrt(energy[..., :, None] * energy[..., None, :])
    # Reference skips normalization when either signal has zero energy; the
    # unnormalized zero-lag xcorr of a zero signal is 0 anyway, except the
    # diagonal which the reference pins to 1.
    normed = jnp.where(denom > 0, gram / jnp.where(denom > 0, denom, 1.0), gram)
    eye = jnp.eye(n, dtype=normed.dtype)
    adj = jnp.abs(jnp.where(eye.astype(bool), 1.0, normed))
    if top_k is not None:
        adj = keep_topk_jnp(adj, top_k=top_k, directed=True)
    return adj
