"""Spectral graph supports for diffusion convolution.

Two implementations of the same math:

- host numpy (float64), used at data-pipeline time for the fixed distance
  graph; matches the reference's scipy.sparse formulas bit-for-bit on the
  19x19 scale (reference ``utils.py:205-255``).
- batched ``jnp`` (float32, jit-friendly), used on-device for per-clip
  correlation graphs where thousands of supports are built per batch.

Support families (reference ``data/dataloader_detection.py:335-354``):

- ``laplacian``        -> [scaled Laplacian (2/lmax)*L - I] (ChebNet)
- ``random_walk``      -> [(D^-1 A)^T]
- ``dual_random_walk`` -> [(D^-1 A)^T, (D^-1 A^T)^T]

Note the transposes: the reference emits *transposed* random-walk matrices
so that left-multiplication by the support aggregates over in-neighbors.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

FILTER_NUM_SUPPORTS = {
    "laplacian": 1,
    "random_walk": 1,
    "dual_random_walk": 2,
}


def num_supports_for(filter_type: str) -> int:
    """Number of support matrices for a filter type (reference cell.py:151-158)."""
    return FILTER_NUM_SUPPORTS.get(filter_type, 1)


# ---------------------------------------------------------------------------
# Host (numpy, float64) implementations
# ---------------------------------------------------------------------------


def normalized_laplacian(adj: np.ndarray) -> np.ndarray:
    """L = I - D^-1/2 A^T D^-1/2 with D = diag(A 1).

    Parity: reference ``utils.py:205-217``. The reference computes
    ``I - (A D^-1/2)^T D^-1/2`` which transposes A for asymmetric inputs;
    we reproduce that exactly (callers symmetrize first anyway).
    """
    adj = np.asarray(adj, dtype=np.float64)
    d = adj.sum(axis=1)
    with np.errstate(divide="ignore"):
        d_inv_sqrt = np.power(d, -0.5)
    d_inv_sqrt[np.isinf(d_inv_sqrt)] = 0.0
    n = adj.shape[0]
    return np.eye(n) - (adj * d_inv_sqrt[None, :]).T * d_inv_sqrt[None, :]


def scaled_laplacian(adj: np.ndarray, lambda_max=2, undirected: bool = True) -> np.ndarray:
    """Chebyshev-scaled Laplacian (2/lmax) L - I.

    Parity: reference ``utils.py:240-255``. ``lambda_max=None`` computes the
    largest eigenvalue exactly (the reference uses ARPACK ``eigsh``; at 19x19
    a dense symmetric eigensolve is both exact and faster).
    """
    adj = np.asarray(adj, dtype=np.float64)
    if undirected:
        adj = np.maximum(adj, adj.T)
    L = normalized_laplacian(adj)
    if lambda_max is None:
        # L is symmetric PSD here, so largest-magnitude == largest.
        lambda_max = float(np.linalg.eigvalsh((L + L.T) / 2.0)[-1])
    n = L.shape[0]
    return (2.0 / lambda_max) * L - np.eye(n)


def random_walk(adj: np.ndarray) -> np.ndarray:
    """Row-normalized transition matrix D^-1 A (reference ``utils.py:220-230``)."""
    adj = np.asarray(adj, dtype=np.float64)
    d = adj.sum(axis=1)
    with np.errstate(divide="ignore"):
        d_inv = np.power(d, -1.0)
    d_inv[np.isinf(d_inv)] = 0.0
    return d_inv[:, None] * adj


def compute_supports(adj: np.ndarray, filter_type: str, dtype=np.float32):
    """Build the list of support matrices for a single adjacency.

    Parity: reference ``data/dataloader_detection.py:335-354`` — including the
    ``lambda_max=None`` exact-eigenvalue scaling for the laplacian filter and
    the transposed random-walk conventions.
    """
    if filter_type == "laplacian":
        sup = [scaled_laplacian(adj, lambda_max=None)]
    elif filter_type == "random_walk":
        sup = [random_walk(adj).T]
    elif filter_type == "dual_random_walk":
        sup = [random_walk(adj).T, random_walk(adj.T).T]
    else:
        sup = [scaled_laplacian(adj)]
    return [np.asarray(s, dtype=dtype) for s in sup]


# ---------------------------------------------------------------------------
# Device (jnp, batched, jit-friendly) implementations
# ---------------------------------------------------------------------------


def _bcast_diag_scale(adj, d_pow):
    """Row-sum -> elementwise power with inf->0, batched over leading dims."""
    d = jnp.sum(adj, axis=-1)
    inv = jnp.where(d > 0, jnp.power(jnp.where(d > 0, d, 1.0), d_pow), 0.0)
    return inv


def normalized_laplacian_jnp(adj):
    """Batched L = I - D^-1/2 A^T D^-1/2 over leading dims of ``adj``."""
    inv_sqrt = _bcast_diag_scale(adj, -0.5)
    n = adj.shape[-1]
    eye = jnp.eye(n, dtype=adj.dtype)
    scaled = jnp.swapaxes(adj * inv_sqrt[..., None, :], -1, -2) * inv_sqrt[..., None, :]
    return eye - scaled


def scaled_laplacian_jnp(adj, lambda_max=None, undirected: bool = True):
    """Batched Chebyshev-scaled Laplacian; exact lmax via ``eigvalsh``."""
    if undirected:
        adj = jnp.maximum(adj, jnp.swapaxes(adj, -1, -2))
    L = normalized_laplacian_jnp(adj)
    n = L.shape[-1]
    if lambda_max is None:
        sym = (L + jnp.swapaxes(L, -1, -2)) / 2.0
        lambda_max = jnp.linalg.eigvalsh(sym)[..., -1][..., None, None]
    return (2.0 / lambda_max) * L - jnp.eye(n, dtype=L.dtype)


def random_walk_jnp(adj):
    """Batched row-normalized transition matrix D^-1 A."""
    d_inv = _bcast_diag_scale(adj, -1.0)
    return d_inv[..., :, None] * adj


def compute_supports_jnp(adj, filter_type: str):
    """Batched supports: returns (S, ..., N, N) stacked along a new axis 0.

    ``adj`` may carry arbitrary leading batch dims. Jit-friendly for
    random-walk filters; the laplacian filter uses a batched symmetric
    eigensolve for lambda_max (exact, matches the host path).
    """
    if filter_type == "laplacian":
        sups = [scaled_laplacian_jnp(adj, lambda_max=None)]
    elif filter_type == "random_walk":
        sups = [jnp.swapaxes(random_walk_jnp(adj), -1, -2)]
    elif filter_type == "dual_random_walk":
        adj_t = jnp.swapaxes(adj, -1, -2)
        sups = [
            jnp.swapaxes(random_walk_jnp(adj), -1, -2),
            jnp.swapaxes(random_walk_jnp(adj_t), -1, -2),
        ]
    else:
        sups = [scaled_laplacian_jnp(adj, lambda_max=2.0)]
    return jnp.stack(sups, axis=0)
