"""Pallas whole-sequence DCGRU recurrence kernels (forward + BPTT).

The XLA scan pays per-iteration op-dispatch latency on tiny ops: with
N=19 nodes and H=64 units, every one of the T=60 sequential steps is a
handful of (B*19, ~200)-sized matmuls — latency-bound, not FLOP-bound
(measured: the scan dominates the training step on TPU v5e). These kernels
run ONE ``pallas_call`` per layer per direction; the grid iterates
(batch-tile, time) sequentially, state lives in VMEM scratch across grid
steps, and Mosaic's automatic pipelining double-buffers the per-timestep
input/output blocks (HBM <-> VMEM DMA overlapped with compute).

Math is identical to ``ops/recurrent.py`` (the operator-stacked scan with
hand-written BPTT — see that module's docstring for the derivation and the
reference citations); the Chebyshev operator stack is materialized as
*block-diagonal* per-tile matrices ``BD[g, m]`` of shape (TB*N, TB*N) so
the per-step operator application is ONE MXU ``dot`` over all TB clips
instead of a batched loop of 19x19 matmuls.

Layouts inside the kernel (everything 2-D, rows = TB*N):

    h, c, cand_x slices:  (TB*N, H)
    ru, gate_x slices:    (TB*N, 2H)
    BD block:             (M, TB*N, TB*N)
    weights:              (M*H, 2H) / (M*H, H)  (m-major rows)

Zero-padding the batch to a tile multiple is safe end-to-end: padded rows
produce garbage forward activations that are never read, and the backward
is linear in the incoming cotangents (zero for padded rows), so weight
gradients get exactly zero contribution from padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eeg_gnn_tpu.ops.recurrent import _act_pair

# MXU passes for the in-kernel f32 matmuls. Mosaic supports DEFAULT (one
# bf16 pass — the same effective precision as the XLA paths' default
# matmul precision; measured 8.5 ms full step) and HIGHEST (exact f32,
# 16.7 ms). DEFAULT matches the rest of the framework; flip for debugging.
_PRECISION = jax.lax.Precision.DEFAULT


def build_block_diag(a_ops, batch_tile: int):
    """(M, B, N, N) operator stack -> (G, M, TB*N, TB*N) block-diagonals.

    B must already be padded to G * batch_tile (pad with zeros).
    """
    m, b, n, _ = a_ops.shape
    g = b // batch_tile
    tiles = a_ops.reshape(m, g, batch_tile, n, n)
    out = jnp.zeros((g, m, batch_tile * n, batch_tile * n), a_ops.dtype)
    for tb in range(batch_tile):
        out = out.at[:, :, tb * n:(tb + 1) * n, tb * n:(tb + 1) * n].set(
            jnp.transpose(tiles[:, :, tb], (1, 0, 2, 3)))
    return out


def _fwd_kernel(bd_ref, wg_ref, wc_ref, bg_ref, bc_ref, h0_ref,
                gx_ref, cx_ref, hseq_ref, ru_ref, c_ref, h_scr,
                *, num_matrices: int, rows: int, h_units: int,
                activation: str):
    act, _ = _act_pair(activation)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[0]

    h = h_scr[:]
    bd = bd_ref[0].reshape(num_matrices * rows, rows)

    feats = jnp.dot(bd, h, preferred_element_type=jnp.float32,
            precision=_PRECISION)
    gate = gx_ref[0] + bg_ref[:]
    for m in range(num_matrices):
        gate = gate + jnp.dot(feats[m * rows:(m + 1) * rows],
                              wg_ref[m * h_units:(m + 1) * h_units],
                              preferred_element_type=jnp.float32,
            precision=_PRECISION)
    ru = jax.nn.sigmoid(gate)
    r, u = ru[:, :h_units], ru[:, h_units:]

    rfeats = jnp.dot(bd, r * h, preferred_element_type=jnp.float32,
            precision=_PRECISION)
    cand = cx_ref[0] + bc_ref[:]
    for m in range(num_matrices):
        cand = cand + jnp.dot(rfeats[m * rows:(m + 1) * rows],
                              wc_ref[m * h_units:(m + 1) * h_units],
                              preferred_element_type=jnp.float32,
            precision=_PRECISION)
    c = act(cand)

    h_new = u * h + (1.0 - u) * c
    h_scr[:] = h_new
    hseq_ref[0] = h_new
    ru_ref[0] = ru.astype(ru_ref.dtype)
    c_ref[0] = c.astype(c_ref.dtype)


def _bwd_kernel(bd_ref, wg_ref, wc_ref, hprev_ref, ru_ref, c_ref, dseq_ref,
                dgx_ref, dcx_ref, dh0_ref, dwg_ref, dwc_ref, dbg_ref,
                dbc_ref, dh_scr, *, num_matrices: int, rows: int,
                h_units: int, activation: str, t_total: int):
    _, act_grad = _act_pair(activation)
    gidx = pl.program_id(0)
    tg = pl.program_id(1)  # 0 .. T-1, walking time BACKWARD via index maps

    @pl.when(jnp.logical_and(gidx == 0, tg == 0))
    def _():
        dwg_ref[:] = jnp.zeros_like(dwg_ref)
        dwc_ref[:] = jnp.zeros_like(dwc_ref)
        dbg_ref[:] = jnp.zeros_like(dbg_ref)
        dbc_ref[:] = jnp.zeros_like(dbc_ref)

    @pl.when(tg == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    bd = bd_ref[0].reshape(num_matrices * rows, rows)
    h_prev = hprev_ref[0]
    ru = ru_ref[0].astype(jnp.float32)
    c = c_ref[0].astype(jnp.float32)
    r, u = ru[:, :h_units], ru[:, h_units:]

    g = dh_scr[:] + dseq_ref[0]
    du = g * (h_prev - c)
    dc = g * (1.0 - u)
    dc_pre = dc * act_grad(c)

    rfeats = jnp.dot(bd, r * h_prev, preferred_element_type=jnp.float32,
            precision=_PRECISION)
    drh = jnp.zeros_like(h_prev)
    for m in range(num_matrices):
        fm = rfeats[m * rows:(m + 1) * rows]
        dwc_ref[m * h_units:(m + 1) * h_units] += jax.lax.dot_general(
            fm, dc_pre, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_PRECISION)
        dr_m = jax.lax.dot_general(
            dc_pre, wc_ref[m * h_units:(m + 1) * h_units],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_PRECISION)  # (rows, H)
        drh = drh + jax.lax.dot_general(
            bd_ref[0][m], dr_m, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_PRECISION)
    dbc_ref[:] += jnp.sum(dc_pre, axis=0, keepdims=True)

    dr = drh * h_prev
    dru_pre = jnp.concatenate([dr, du], axis=1) * ru * (1.0 - ru)

    hfeats = jnp.dot(bd, h_prev, preferred_element_type=jnp.float32,
            precision=_PRECISION)
    dh_prev = g * u + drh * r
    for m in range(num_matrices):
        fm = hfeats[m * rows:(m + 1) * rows]
        dwg_ref[m * h_units:(m + 1) * h_units] += jax.lax.dot_general(
            fm, dru_pre, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_PRECISION)
        dhm_m = jax.lax.dot_general(
            dru_pre, wg_ref[m * h_units:(m + 1) * h_units],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_PRECISION)
        dh_prev = dh_prev + jax.lax.dot_general(
            bd_ref[0][m], dhm_m, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_PRECISION)
    dbg_ref[:] += jnp.sum(dru_pre, axis=0, keepdims=True)

    dgx_ref[0] = dru_pre
    dcx_ref[0] = dc_pre
    dh_scr[:] = dh_prev

    @pl.when(tg == t_total - 1)
    def _():
        dh0_ref[0] = dh_prev


def _pad_rows(x, target):
    if x.shape[0] == target:
        return x
    return jnp.pad(x, ((0, target - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def _legal_tile(batch_tile: int, b: int, n: int) -> int:
    """Smallest tile >= requested whose row block satisfies Mosaic's layout
    rule: when the row axis is blocked (g > 1), the block's sublane dim
    (tile*n) must be divisible by 8; a single block (g == 1, block == full
    array) is always legal."""
    tb = min(batch_tile, b)
    while (-(-b // tb) > 1) and (tb * n) % 8:
        tb += 1
    return tb


def _prep(a_ops, gate_x, cand_x, h0, batch_tile):
    """Pad batch, flatten to row-major (T, G*TB*N, .) layouts, build BD."""
    t, b, n, _ = gate_x.shape
    tb = _legal_tile(batch_tile, b, n)
    g = -(-b // tb)
    bp = g * tb
    if a_ops.shape[1] == 1 and bp > 1:
        a_ops = jnp.broadcast_to(a_ops, (a_ops.shape[0], b) + a_ops.shape[2:])
    if bp != b:
        a_ops = jnp.pad(a_ops, ((0, 0), (0, bp - b), (0, 0), (0, 0)))
        gate_x = jnp.pad(gate_x, ((0, 0), (0, bp - b), (0, 0), (0, 0)))
        cand_x = jnp.pad(cand_x, ((0, 0), (0, bp - b), (0, 0), (0, 0)))
        h0 = jnp.pad(h0, ((0, bp - b), (0, 0), (0, 0)))
    bd = build_block_diag(a_ops, tb)  # (G, M, TB*N, TB*N)
    rows = tb * n
    gx = gate_x.reshape(t, g * rows, -1)
    cx = cand_x.reshape(t, g * rows, -1)
    h0f = h0.reshape(g, rows, -1)
    return bd, gx, cx, h0f, (t, b, n, tb, g, rows)


def _forward(a_ops, gate_x, cand_x, wg_r, wc_r, gate_b, cand_b, h0,
             activation, batch_tile, interpret, residual_dtype=jnp.float32):
    bd, gx, cx, h0f, (t, b, n, tb, g, rows) = _prep(
        a_ops, gate_x, cand_x, h0, batch_tile)
    m = a_ops.shape[0]
    h_units = h0.shape[-1]
    wg_f = wg_r.reshape(m * h_units, -1)
    wc_f = wc_r.reshape(m * h_units, -1)

    kernel = functools.partial(
        _fwd_kernel, num_matrices=m, rows=rows, h_units=h_units,
        activation=activation)
    h_seq, ru_seq, c_seq = pl.pallas_call(
        kernel,
        grid=(g, t),
        in_specs=[
            pl.BlockSpec((1, m, rows, rows), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m * h_units, 2 * h_units), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m * h_units, h_units), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * h_units), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_units), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, h_units), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 2 * h_units), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, h_units), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, h_units), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 2 * h_units), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, h_units), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, g * rows, h_units), jnp.float32),
            jax.ShapeDtypeStruct((t, g * rows, 2 * h_units), residual_dtype),
            jax.ShapeDtypeStruct((t, g * rows, h_units), residual_dtype),
        ],
        scratch_shapes=[pltpu.VMEM((rows, h_units), jnp.float32)],
        interpret=interpret,
    )(bd, wg_f, wc_f, gate_b.reshape(1, -1), cand_b.reshape(1, -1),
      h0f, gx, cx)

    h_seq_out = h_seq.reshape(t, g * tb, n, h_units)[:, :b]
    return h_seq_out, (bd, h_seq, ru_seq, c_seq)


def _backward(bd, wg_r, wc_r, h0f, h_seq_flat, ru_seq, c_seq, d_seq_flat,
              activation, interpret, dims):
    t, b, n, tb, g, rows = dims
    m = bd.shape[1]
    h_units = wc_r.shape[-1]
    wg_f = wg_r.reshape(m * h_units, -1)
    wc_f = wc_r.reshape(m * h_units, -1)

    # h_prev over time: [h0, h_1 .. h_{T-1}]
    h_prev = jnp.concatenate([h0f.reshape(1, g * rows, h_units),
                              h_seq_flat[:-1]], axis=0)

    kernel = functools.partial(
        _bwd_kernel, num_matrices=m, rows=rows, h_units=h_units,
        activation=activation, t_total=t)
    rev = lambda i, j: (t - 1 - j, i, 0)  # walk time backward
    dgx, dcx, dh0, dwg, dwc, dbg, dbc = pl.pallas_call(
        kernel,
        grid=(g, t),
        in_specs=[
            pl.BlockSpec((1, m, rows, rows), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m * h_units, 2 * h_units), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m * h_units, h_units), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, h_units), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 2 * h_units), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, h_units), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, h_units), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, 2 * h_units), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, h_units), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, h_units), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m * h_units, 2 * h_units), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m * h_units, h_units), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * h_units), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_units), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, g * rows, 2 * h_units), jnp.float32),
            jax.ShapeDtypeStruct((t, g * rows, h_units), jnp.float32),
            jax.ShapeDtypeStruct((g, rows, h_units), jnp.float32),
            jax.ShapeDtypeStruct((m * h_units, 2 * h_units), jnp.float32),
            jax.ShapeDtypeStruct((m * h_units, h_units), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * h_units), jnp.float32),
            jax.ShapeDtypeStruct((1, h_units), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((rows, h_units), jnp.float32)],
        interpret=interpret,
    )(bd, wg_f, wc_f, h_prev, ru_seq, c_seq, d_seq_flat)

    dgx = dgx.reshape(t, g * tb, n, 2 * h_units)[:, :b]
    dcx = dcx.reshape(t, g * tb, n, h_units)[:, :b]
    dh0 = dh0.reshape(g * tb, n, h_units)[:b]
    return (dgx, dcx, dwg.reshape(m, h_units, 2 * h_units),
            dwc.reshape(m, h_units, h_units), dbg.reshape(-1),
            dbc.reshape(-1), dh0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def dcgru_layer_recurrence_pallas(a_ops, gate_x, cand_x, wg_r, wc_r, gate_b,
                                  cand_b, h0, activation: str = "tanh",
                                  batch_tile: int = 16,
                                  interpret: bool = False):
    """Whole-sequence DCGRU layer recurrence as two Pallas kernels.

    Same contract as :func:`eeg_gnn_tpu.ops.recurrent.dcgru_layer_recurrence`
    (operator stack in, (h_last, h_seq) out, no gradient for ``a_ops``);
    ``batch_tile`` clips are packed into one block-diagonal operator so each
    timestep is a single MXU dot per conv. ``interpret=True`` runs the
    Mosaic interpreter (CPU tests).
    """
    h_seq, _ = _forward(a_ops, gate_x, cand_x, wg_r, wc_r, gate_b, cand_b,
                        h0, activation, batch_tile, interpret)
    return h_seq[-1], h_seq


def _vjp_fwd(a_ops, gate_x, cand_x, wg_r, wc_r, gate_b, cand_b, h0,
             activation, batch_tile, interpret):
    h_seq, (bd, h_seq_flat, ru_seq, c_seq) = _forward(
        a_ops, gate_x, cand_x, wg_r, wc_r, gate_b, cand_b, h0, activation,
        batch_tile, interpret)
    t, b, n, _ = gate_x.shape
    tb = _legal_tile(batch_tile, b, n)
    g = bd.shape[0]
    rows = tb * n
    h0f = jnp.pad(h0, ((0, g * tb - b), (0, 0), (0, 0))) if g * tb != b else h0
    res = (bd, wg_r, wc_r, h0f.reshape(g, rows, -1), h_seq_flat, ru_seq,
           c_seq, a_ops.shape, (t, b, n, tb, g, rows))
    return (h_seq[-1], h_seq), res


def _vjp_bwd(activation, batch_tile, interpret, res, grads):
    bd, wg_r, wc_r, h0f, h_seq_flat, ru_seq, c_seq, a_shape, dims = res
    t, b, n, tb, g, rows = dims
    d_last, d_seq = grads
    h_units = wc_r.shape[-1]

    d_seq = d_seq.at[-1].add(d_last)
    d_pad = jnp.pad(d_seq, ((0, 0), (0, g * tb - b), (0, 0), (0, 0))) \
        if g * tb != b else d_seq
    d_flat = d_pad.reshape(t, g * rows, h_units)

    dgx, dcx, dwg, dwc, dbg, dbc, dh0 = _backward(
        bd, wg_r, wc_r, h0f, h_seq_flat, ru_seq, c_seq, d_flat, activation,
        interpret, dims)
    # a_ops gradient intentionally zero (supports are data, never trained)
    da = jnp.zeros(a_shape, dgx.dtype)
    return (da, dgx, dcx, dwg, dwc, dbg, dbc, dh0)


dcgru_layer_recurrence_pallas.defvjp(_vjp_fwd, _vjp_bwd)
