"""DCGRU on edge-partitioned sparse supports: the distributed-SpMM model
path (VERDICT r1 #6 — integrates ``parallel/edge_partition.py`` into a
trainable configuration).

The batch's clip graphs form one block-diagonal ``SparseGraph`` over B*N
nodes (``graphs/sparse.py``); its edges are partitioned across the mesh's
``graph`` axis and node features are node-block-sharded, so every diffusion
step inside the DCGRU cell is a distributed ring SpMM whose boundary
feature exchange rides ICI ``ppermute`` overlapped with local aggregation.

This path exists for *large montages / giant graphs* where the dense
batched 19x19 operator trick stops applying: for the 19-node reference
graphs the dense Pallas path is faster (measured; benchmarks/NOTES.md), so
this module is the scale-out generalization, numerically equal to the
dense encoder (tests/test_sparse_distributed.py) and trainable end-to-end
(gradients flow through the shard_mapped ring).

No reference counterpart (the reference is single-device, SURVEY.md §2.7);
cell math parity: reference model/cell.py:182-210.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eeg_gnn_tpu.models.dcgru import DCGRUConfig, _activation_fn
from eeg_gnn_tpu.parallel.edge_partition import (
    PartitionedGraph,
    edge_partitioned_spmm,
)


def sparse_chebyshev_diffusion(mesh, sgraph: PartitionedGraph, x_flat, k: int,
                               axis_name: str = "graph"):
    """K-step Chebyshev diffusion where every S @ x is a distributed SpMM.

    Args:
        x_flat: (B*N, D) node-flattened features (node-sharded or not;
            edge_partitioned_spmm places them).

    Returns:
        (B*N, D*M) features in reference d-major layout (m fastest), the
        same layout as ``ops/diffusion.chebyshev_diffusion`` + ``_flat``
        for a single support (cell.py:83-96 semantics, A_0 = I).
    """
    feats = [x_flat]
    x0 = x_flat
    if k >= 1:
        x1 = edge_partitioned_spmm(mesh, sgraph, x0, axis_name)
        feats.append(x1)
        for _ in range(2, k + 1):
            x2 = 2.0 * edge_partitioned_spmm(mesh, sgraph, x1, axis_name) - x0
            feats.append(x2)
            x0, x1 = x1, x2
    # (B*N, D, M) -> (B*N, D*M) d-major
    return jnp.stack(feats, axis=-1).reshape(x_flat.shape[0], -1)


def sparse_cell_apply(cfg: DCGRUConfig, params, mesh, sgraph: PartitionedGraph,
                      x_flat, h_flat, axis_name: str = "graph"):
    """One DCGRU step with distributed sparse diffusion.

    Same math as ``models.dcgru.dcgru_cell_apply`` with a single support
    (cell.py:182-210); operands are node-flattened (B*N, D)/(B*N, H).
    """
    act = _activation_fn(cfg.activation)
    h_units = cfg.num_units
    k = cfg.max_diffusion_step

    xh = jnp.concatenate([x_flat, h_flat], axis=-1)
    xh_feat = sparse_chebyshev_diffusion(mesh, sgraph, xh, k, axis_name)
    ru = jax.nn.sigmoid(xh_feat @ params["gate_w"] + params["gate_b"])
    r, u = ru[:, :h_units], ru[:, h_units:]

    xrh = jnp.concatenate([x_flat, r * h_flat], axis=-1)
    xrh_feat = sparse_chebyshev_diffusion(mesh, sgraph, xrh, k, axis_name)
    c = act(xrh_feat @ params["cand_w"] + params["cand_b"])
    return u * h_flat + (1.0 - u) * c


def sparse_encoder_apply(cfgs, params, mesh, sgraph: PartitionedGraph, x_seq,
                         h0=None, axis_name: str = "graph"):
    """Stacked DCGRU encoder whose diffusion runs on the distributed SpMM.

    Args:
        x_seq: (T, B, N, input_dim) time-major input.
        sgraph: block-diagonal graph over B*N nodes (single support),
            pre-partitioned via ``partition_by_dest`` (outside jit).

    Returns:
        (hidden_stack (L, B, N, H), top_seq (T, B, N, H)) — same contract
        as ``models.dcgru.encoder_apply``.
    """
    t, b, n, _ = x_seq.shape
    h_units = cfgs[0].num_units
    x_flat_seq = x_seq.reshape(t, b * n, -1)
    cur = x_flat_seq
    lasts = []
    for cfg, p in zip(cfgs, params):
        h = jnp.zeros((b * n, h_units), x_seq.dtype) if h0 is None else h0

        def step(h, x_t, cfg=cfg, p=p):
            h_new = sparse_cell_apply(cfg, p, mesh, sgraph, x_t, h,
                                      axis_name)
            return h_new, h_new

        h_last, cur = jax.lax.scan(step, h, cur)
        lasts.append(h_last.reshape(b, n, h_units))
    return jnp.stack(lasts), cur.reshape(t, b, n, h_units)


def make_sparse_train_step(cfgs, optimizer, mesh, num_classes: int = 1,
                           axis_name: str = "graph"):
    """Jitted detection train step on the distributed sparse encoder:
    forward (ring SpMM diffusion) -> last state -> per-node FC -> node max
    -> BCE -> grads (through shard_map) -> update. Mirrors the dense
    flagship step's structure (reference train.py:236-275 semantics)."""
    import optax

    from eeg_gnn_tpu.train.losses import bce_with_logits

    def loss_fn(params, sgraph, x_seq, y, valid=None):
        _, top = sparse_encoder_apply(cfgs, params["encoder"], mesh, sgraph,
                                      x_seq, axis_name=axis_name)
        last = top[-1]  # (B, N, H) — fixed-length clips
        hidden = jax.nn.relu(last)
        logits = jnp.max(hidden @ params["fc_w"].T + params["fc_b"], axis=1)
        return bce_with_logits(logits, y, valid=valid), logits

    @jax.jit
    def step(params, opt_state, sgraph, x_seq, y):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, sgraph, x_seq, y)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
