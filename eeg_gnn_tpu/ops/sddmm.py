"""SDDMM: sampled dense-dense matrix multiplication for sparse graph scoring.

Computes ``out[e] = <x[rows[e]], y[cols[e]]>`` — the entries of the dense
Gram product ``X @ Y^T`` sampled at a sparse edge set — which is the kernel
behind per-edge correlation scoring. The reference computes each such entry
with a separate host ``scipy.signal.correlate`` call
(``data/data_utils.py:203-222``, driven by the 171-pair loop in
``data/dataloader_detection.py:258-307``); for equal-length zero-lag
'valid' correlation that is exactly a sampled dot product, i.e. SDDMM.

Two device implementations, both differentiable:

- :func:`sddmm_edges` — edge-list XLA version (gather + row-wise dot).
  Right answer for small/irregular edge sets; XLA lowers the gathers to
  dynamic-slices and fuses the multiply-reduce.
- :func:`sddmm_blocksparse` — Pallas TPU kernel over the *nonzero
  128x128 blocks* of the output. Block coordinates are scalar-prefetched
  so each grid step DMAs exactly two (blk, D) row-slabs of X/Y into VMEM
  and runs one MXU dot; zero blocks are never touched. This is the
  TPU-shaped SDDMM: work and HBM traffic scale with the number of
  *occupied blocks*, not with N^2.

When to use which (measured, ``benchmarks/graph_build_results.json``):
at TUSZ montage size (N=19) and every synthetic montage up to N=1024 the
dense Gram matmul (``graphs/xcorr.correlation_adjacency_jnp``) is faster
than anything sparse — one MXU-tiled GEMM beats gather-based sparsity
until the occupied-block fraction is small, which for top-k clip graphs
requires N in the several-thousands. The block-sparse kernel exists for
that regime (and as the named SDDMM the perf plan calls for); the graph
*build* (topology unknown → needs all-pairs scores for top-k) stays dense
by design. See DIVERGENCES.md "SDDMM decision".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sddmm_edges(rows, cols, x, y, normalize: bool = False):
    """Edge-list SDDMM: ``out[e] = <x[rows[e]], y[cols[e]]>``.

    Args:
        rows, cols: (E,) int32 edge endpoints.
        x: (N, D) dense left factor (row features).
        y: (N, D) dense right factor.
        normalize: divide by ``||x_r|| * ||y_c||`` (zero-energy rows keep
            the unnormalized value — reference ``data_utils.py:219-221``
            skips normalization when either autocorrelation is 0).

    Returns:
        (E,) float32 sampled products.
    """
    xr = jnp.take(x, rows, axis=0)           # (E, D)
    yc = jnp.take(y, cols, axis=0)           # (E, D)
    vals = jnp.einsum("ed,ed->e", xr, yc, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    if normalize:
        ex = jnp.einsum("nd,nd->n", x, x, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        ey = jnp.einsum("nd,nd->n", y, y, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        denom = jnp.sqrt(jnp.take(ex, rows) * jnp.take(ey, cols))
        vals = jnp.where(denom > 0, vals / jnp.where(denom > 0, denom, 1.0),
                         vals)
    return vals


# ---------------------------------------------------------------------------
# Block-sparse Pallas kernel
# ---------------------------------------------------------------------------


def edges_to_blocks(rows: np.ndarray, cols: np.ndarray, n: int,
                    block: int = 128):
    """Host-side: bucket an edge list into occupied (block_row, block_col)
    coordinates plus per-edge positions inside their block.

    Returns:
        block_rows: (nnzb,) int32 block-row index of each occupied block.
        block_cols: (nnzb,) int32 block-col index.
        edge_block: (E,) int32 index into the occupied-block list per edge.
        edge_pos:   (E, 2) int32 (row, col) offset of each edge inside its
            block — for gathering edge values out of the kernel's block
            output.
    """
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    br, bc = rows // block, cols // block
    key = br * ((n + block - 1) // block) + bc
    uniq, inverse = np.unique(key, return_inverse=True)
    nb = (n + block - 1) // block
    block_rows = (uniq // nb).astype(np.int32)
    block_cols = (uniq % nb).astype(np.int32)
    edge_pos = np.stack([rows % block, cols % block], axis=1).astype(np.int32)
    return block_rows, block_cols, inverse.astype(np.int32), edge_pos


def _sddmm_block_kernel(br_ref, bc_ref, x_ref, y_ref, out_ref):
    # x_ref: (blk, D) rows of X for this block; y_ref: (blk, D) rows of Y.
    out_ref[0] = jax.lax.dot_general(
        x_ref[:], y_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def sddmm_blocksparse(x, y, block_rows, block_cols, block: int = 128,
                      interpret: bool = False):
    """Block-sparse SDDMM: dense (blk, blk) tiles of ``X @ Y^T`` at the
    occupied block coordinates only.

    Args:
        x, y: (N, D) dense factors; N is padded up to a block multiple and
            D up to a lane multiple internally.
        block_rows, block_cols: (nnzb,) occupied block coordinates
            (:func:`edges_to_blocks`).
        block: square block edge (128 matches the MXU tile).

    Returns:
        (nnzb, block, block) float32 block values; gather edge values with
        ``out[edge_block, edge_pos[:, 0], edge_pos[:, 1]]``.
    """
    n, d = x.shape
    pad_n = (-n) % block
    pad_d = (-d) % 128
    if pad_n or pad_d:
        x = jnp.pad(x, ((0, pad_n), (0, pad_d)))
        y = jnp.pad(y, ((0, pad_n), (0, pad_d)))
    dp = d + pad_d
    nnzb = block_rows.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nnzb,),
        in_specs=[
            pl.BlockSpec((block, dp), lambda i, br, bc: (br[i], 0)),
            pl.BlockSpec((block, dp), lambda i, br, bc: (bc[i], 0)),
        ],
        out_specs=pl.BlockSpec((1, block, block), lambda i, br, bc: (i, 0, 0)),
    )
    return pl.pallas_call(
        _sddmm_block_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nnzb, block, block), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(block_rows, jnp.int32), jnp.asarray(block_cols, jnp.int32),
      x, y)


def sddmm_edges_blocksparse(rows, cols, x, y, n: int, block: int = 128,
                            normalize: bool = False, interpret: bool = False):
    """Edge-list front door over the block-sparse kernel: same contract as
    :func:`sddmm_edges`, with the block bucketing done host-side once per
    topology (rows/cols must be host numpy arrays)."""
    block_rows, block_cols, edge_block, edge_pos = edges_to_blocks(
        np.asarray(rows), np.asarray(cols), n, block)
    blocks = sddmm_blocksparse(x, y, block_rows, block_cols, block=block,
                               interpret=interpret)
    vals = blocks[edge_block, edge_pos[:, 0], edge_pos[:, 1]]
    if normalize:
        ex = jnp.einsum("nd,nd->n", x, x, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        ey = jnp.einsum("nd,nd->n", y, y, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        denom = jnp.sqrt(jnp.take(ex, jnp.asarray(rows))
                         * jnp.take(ey, jnp.asarray(cols)))
        vals = jnp.where(denom > 0, vals / jnp.where(denom > 0, denom, 1.0),
                         vals)
    return vals
