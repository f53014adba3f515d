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
reference citations).

Round-2 redesign (replaces the round-1 block-diagonal layout): packing
``batch_tile`` clips into one (TB*N, TB*N) block-diagonal operator made the
per-step MXU work grow *quadratically* in the tile (only TB*N^2 of the
(TB*N)^2 multiplies are useful) and materialized O(B*TB*N^2) mostly-zero
HBM — the measured cause of the superlinear step time above B=128. The
operators are now kept *compact*:

    per-clip stack      (TB * M*Np, Np)   one (M*Np, Np) slab per clip
    shared stack        (M*Np, Np)        batch-broadcast graphs (the
                                          distance-graph flagship) read ONE
                                          slab for every clip

with the node count padded to ``Np = ceil(N/8)*8`` (=24 for the 19-channel
montage) so every in-kernel slab slice is sublane-aligned. Zero rows/cols
on padded nodes keep their garbage activations confined (diffusion can't
leak across zero operator entries; everything else is row-local), and the
backward's padded-row cotangents are exactly zero, so gradients match the
unpadded math.

Per-clip (M*Np, Np) x (Np, H) dots are MXU-*latency*-bound (~100 cycles
each regardless of the 6% useful occupancy), so ``_GROUP`` clips are packed
into one mini block-diagonal per dot — J*Np = 96 <= 128 keeps the
contraction inside ONE K-tile, making the J-fold zero padding free while
cutting the dot count J-fold. (Round 1's mistake was TB-sized block
diagonals: K = TB*N spans many K-tiles and the waste turns *quadratic* in
the tile.) Per timestep the kernel thus runs TB/J mini-block dots per
diffusion plus M large (TB*Np, H) x (H, O) weight GEMMs.

Layouts inside the kernel (everything 2-D or a 3-D scratch whose leading
axis is untiled; rows are clip-major ``tb*Np + n``):

    h, c, cand_x slices:  (TB*Np, H)
    ru, gate_x slices:    (TB*Np, 2H)
    operators:            (TB * M*Np, Np) — ONE stack serves both directions:
                          the backward's A^T-applies are dot_generals
                          contracting dim 0 of the same slabs (round-3
                          change; the round-2 separately-materialized
                          transposed stack doubled operator VMEM + HBM)
    weights:              (M*H, 2H) / (M*H, H)  (m-major rows)
    feats scratch:        (TB*Np, M*H) packed m-in-lanes, so the hidden
                          projections are ONE (rows, M*H) x (M*H, 2H|H) dot
                          per diffusion (K = M*H = 192: 1.5 MXU K-tiles at
                          75% tail utilization) instead of M separate
                          K=64 dots at 50% (round-3 change)

Zero-padding the batch to a tile multiple is safe end-to-end: padded rows
produce garbage forward activations that are never read, and the backward
is linear in the incoming cotangents (zero for padded rows), so weight
gradients get exactly zero contribution from padding.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eeg_gnn_tpu.ops.recurrent import _act_pair


def _device_vmem_bytes() -> int:
    """Per-core VMEM capacity the tile budgets are computed against.

    Every shipped TPU generation provides at least 16 MiB of VMEM per
    core, so that is the default; ``EEG_GNN_TPU_VMEM_BYTES`` overrides it
    for generations with more (so larger tiles become reachable) or for
    testing the tile-selection logic under perturbed budgets. The runtime
    does not expose VMEM capacity directly, hence the env knob rather
    than a query."""
    env = os.environ.get("EEG_GNN_TPU_VMEM_BYTES")
    if env:
        return int(float(env))
    return 16 * 2 ** 20


def vmem_budget_bytes(fraction: float) -> int:
    """Kernel working-set budget as a FRACTION of device VMEM (the
    remainder is headroom for Mosaic's own buffers + estimate error; the
    fractions below reproduce the on-chip-calibrated pass/fail boundary
    on a 16 MiB-VMEM v5e and scale with the device instead of being
    hard-coded byte counts)."""
    return int(fraction * _device_vmem_bytes())


# fraction of VMEM the x-in-kernel bwd working set may claim: calibrated
# on v5e (16 MiB VMEM) where the byte estimate's 10.4 MB compiles and
# 11.3 MB hits a Mosaic oversubscription failure — 0.625 * 16 MiB = 10.5 MB
# splits the observed boundary
_XIN_VMEM_FRACTION = 0.625
# the hoisted path's coarser heuristic undercounts, so it gets a larger
# slice (0.715 * 16 MiB = 12.0 MB — the round-1-calibrated value)
_HOISTED_VMEM_FRACTION = 0.715

# MXU passes for the in-kernel f32 matmuls. Mosaic supports DEFAULT (one
# bf16 pass — the same effective precision as the XLA paths' default
# matmul precision) and HIGHEST (exact f32, ~2x step time; flip for
# debugging).
_PRECISION = jax.lax.Precision.DEFAULT


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_PRECISION)


def _pad_axis(x, axis: int, target: int):
    if x.shape[axis] == target:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - x.shape[axis])
    return jnp.pad(x, pads)


def _legal_tile(batch_tile: int, b: int, n: int = 0) -> int:
    """Clip tile to the batch. Any tile is layout-legal now: the node dim is
    padded to a multiple of 8, so every slab slice is sublane-aligned (the
    round-1 block-diagonal rule requiring (tile*N) % 8 == 0 is gone)."""
    del n
    return max(1, min(batch_tile, b))


def _group_size(tb: int, np_: int) -> int:
    """Clips packed per mini-block-diagonal dot: the largest J dividing the
    tile with J*Np <= 128 (one MXU K-tile — the J-fold zero fill is free on
    latency-bound dots)."""
    j = max(1, 128 // np_)
    while tb % j:
        j -= 1
    return j


def _group_blockdiag(a, j, np_):
    """(M, B, Np, Np) -> (G, (TB/J)*M*J*Np, J*Np) grouped operator stacks.

    Per group of J clips the M slabs are stacked vertically, each slab a
    J-clip block diagonal, so ONE (M*J*Np, J*Np) x (J*Np, H) dot diffuses
    the whole group for every Chebyshev order at once.

    Built as a sum of J shifted pads (one elementwise fusion) rather than a
    chain of dynamic-update-slices — the round-2 ``.at[].set`` chain
    compiled to J serial full-buffer updates and cost ~0.8 ms/step at
    B=128 (profiled), dominating the operator prep.
    """
    m, b, _, _ = a.shape
    ng = b // j
    gr = j * np_
    tiles = a.reshape(m, ng, j, np_, np_)
    out = None
    for ji in range(j):
        blk = jnp.pad(
            tiles[:, :, ji],
            ((0, 0), (0, 0),
             (ji * np_, gr - (ji + 1) * np_),
             (ji * np_, gr - (ji + 1) * np_)))
        out = blk if out is None else out + blk
    return jnp.transpose(out, (1, 0, 2, 3))


def _prep(a_ops, x_proj, h0, batch_tile):
    """Pad batch + nodes, build grouped operator stacks, flatten layouts.

    Returns (a_c, xp, h0f, shared, dims) where
      a_c: operator stack — (M*J*Np, J*Np) if shared else
           (G, (TB/J)*M*J*Np, J*Np); serves both directions (the backward
           contracts dim 0 for the A^T applies)
      xp: (T, G*TB*Np, 3H) — ONE fused [gate | cand] input stream (the
          separate gx/cx streams forced a pair of (T,B,N,·) slices after
          the hoisted GEMM and a concat in its backward, ~0.7 ms/step of
          pure data movement at the flagship shape — round-4 trace)
      h0f: (G, TB*Np, H); dims: (t, b, n, np_, tb, g, j)
    """
    t, b, n, _ = x_proj.shape
    m = a_ops.shape[0]
    np_ = -(-n // 8) * 8
    shared = a_ops.shape[1] == 1
    tb = _legal_tile(batch_tile, b)
    # VMEM cap: the bwd kernel is the high-water mark — double-buffered
    # operator blocks + four input/two output streams + five scratches.
    # Per row (of TB*Np): 8*M*J*Np (a_c, 2 buffers; shared stacks are O(1)
    # and skip this term) + 64*H (streams) + 4*(3M+2)*H (scratches).
    # Shrink the tile until the estimate fits the hoisted-path VMEM
    # budget (a calibrated fraction of device VMEM; 12 MB on a 16 MiB
    # v5e) — tile 64 with M=3, H=64 overflowed in round 1, the measured
    # cause of the batch_tile 32/64 compile failures.
    h_units_est = x_proj.shape[-1] // 3
    j_est = max(1, 128 // np_)
    per_row = ((0 if shared else 8 * m * j_est * np_)
               + 64 * h_units_est + 4 * (3 * m + 2) * h_units_est)
    tb_cap = max(1, int(vmem_budget_bytes(_HOISTED_VMEM_FRACTION)
                        / per_row) // np_)
    tb = min(tb, tb_cap)
    if tb > j_est:  # keep the tile a group multiple for full-width dots
        tb = (tb // j_est) * j_est
    j = _group_size(tb, np_)
    g = -(-b // tb)
    bp = g * tb

    if bp != b:
        x_proj = _pad_axis(x_proj, 1, bp)
        h0 = _pad_axis(h0, 0, bp)
        if not shared:
            a_ops = _pad_axis(a_ops, 1, bp)
    # node padding: zero rows/cols keep padded nodes fully decoupled
    x_proj = _pad_axis(x_proj, 2, np_)
    h0 = _pad_axis(h0, 1, np_)
    a_ops = _pad_axis(_pad_axis(a_ops, 2, np_), 3, np_)

    if shared:
        bd = _group_blockdiag(
            jnp.broadcast_to(a_ops[:, 0:1], (m, j, np_, np_)), j, np_)
        a_c = bd.reshape(m * j * np_, j * np_)
    else:
        bd = _group_blockdiag(a_ops, j, np_)  # (B/J, M, J*Np, J*Np)
        a_c = bd.reshape(g, (tb // j) * m * j * np_, j * np_)

    xp = x_proj.reshape(t, g * tb * np_, -1)
    h0f = h0.reshape(g, tb * np_, -1)
    return a_c, xp, h0f, shared, (t, b, n, np_, tb, g, j)


def _fwd_kernel(a_ref, wg_ref, wc_ref, bg_ref, bc_ref, h0_ref,
                xp_ref, hseq_ref, ru_ref, c_ref, h_scr, feats_scr,
                *, m: int, np_: int, tb: int, j: int, h_units: int,
                activation: str, shared: bool):
    act, _ = _act_pair(activation)
    t = pl.program_id(1)
    gr = j * np_  # rows per clip group

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[0]

    h = h_scr[:]

    def diffuse(x2d):
        """Per-group (M*J*Np, J*Np) x (J*Np, H) dots -> packed feats_scr
        (rows, M*H), m in lanes, matching the (M*H, out) weight rows."""
        a_shared = a_ref[:] if shared else None
        for i in range(tb // j):
            a_blk = a_shared if shared else \
                a_ref[0][i * m * gr:(i + 1) * m * gr]
            f = _dot(a_blk, x2d[i * gr:(i + 1) * gr])  # (M*J*Np, H-ish)
            for mi in range(m):
                feats_scr[i * gr:(i + 1) * gr,
                          mi * h_units:(mi + 1) * h_units] = \
                    f[mi * gr:(mi + 1) * gr]

    xp = xp_ref[0].astype(jnp.float32)  # fused [gate(2H) | cand(H)] slab
    diffuse(h)
    gate = xp[:, : 2 * h_units] + bg_ref[:] + _dot(feats_scr[:], wg_ref[:])
    ru = jax.nn.sigmoid(gate)
    r, u = ru[:, :h_units], ru[:, h_units:]

    diffuse(r * h)
    c = act(xp[:, 2 * h_units:] + bc_ref[:] + _dot(feats_scr[:], wc_ref[:]))

    h_new = u * h + (1.0 - u) * c
    h_scr[:] = h_new
    hseq_ref[0] = h_new.astype(hseq_ref.dtype)
    ru_ref[0] = ru.astype(ru_ref.dtype)
    c_ref[0] = c.astype(c_ref.dtype)


def _bwd_kernel(a_ref, wg_ref, wc_ref, hprev_ref, ru_ref, c_ref,
                dseq_ref, dxp_ref, dh0_ref, dwg_ref, dwc_ref,
                dbg_ref, dbc_ref, dh_scr, hfeats_scr, rfeats_scr, dy_scr,
                adj_scr, *, m: int, np_: int, tb: int, j: int, h_units: int,
                activation: str, t_total: int, shared: bool):
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

    h_prev = hprev_ref[0].astype(jnp.float32)
    ru = ru_ref[0].astype(jnp.float32)
    c = c_ref[0].astype(jnp.float32)
    r, u = ru[:, :h_units], ru[:, h_units:]

    g = dh_scr[:] + dseq_ref[0].astype(jnp.float32)
    du = g * (h_prev - c)
    dc = g * (1.0 - u)
    dc_pre = dc * act_grad(c)

    gr = j * np_  # rows per clip group
    # recompute both diffusions fused: one dot per group over [h_prev | r*h],
    # packed into (rows, M*H) scratches (m in lanes, matching weight rows)
    rh = r * h_prev
    a_shared = a_ref[:] if shared else None
    for i in range(tb // j):
        a_blk = a_shared if shared else \
            a_ref[0][i * m * gr:(i + 1) * m * gr]
        x2 = jnp.concatenate(
            [h_prev[i * gr:(i + 1) * gr], rh[i * gr:(i + 1) * gr]],
            axis=1)
        f = _dot(a_blk, x2)  # (M*J*Np, 2H): [:, :H] = hfeats, [:, H:] = rfeats
        for mi in range(m):
            blk = f[mi * gr:(mi + 1) * gr]
            hfeats_scr[i * gr:(i + 1) * gr,
                       mi * h_units:(mi + 1) * h_units] = blk[:, :h_units]
            rfeats_scr[i * gr:(i + 1) * gr,
                       mi * h_units:(mi + 1) * h_units] = blk[:, h_units:]

    def apply_ops_t():
        """sum_m A_m^T @ dy_scr[:, m-slab] per group -> adj_scr (TB*Np, H).

        A^T is applied by contracting dim 0 of the SAME operator slabs the
        forward uses (no separately materialized transpose)."""
        for i in range(tb // j):
            a_blk = a_shared if shared else \
                a_ref[0][i * m * gr:(i + 1) * m * gr]
            adj_scr[i * gr:(i + 1) * gr, :] = jax.lax.dot_general(
                a_blk, dy_scr[i],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_PRECISION)

    def scatter_dy(dy):
        """(rows, M*H) weight-transpose product -> per-group m-major rows."""
        for i in range(tb // j):
            for mi in range(m):
                dy_scr[i, mi * gr:(mi + 1) * gr, :] = \
                    dy[i * gr:(i + 1) * gr, mi * h_units:(mi + 1) * h_units]

    # candidate path (single packed dots: K = rows for dW, K = H for dy)
    dwc_ref[:] += jax.lax.dot_general(
        rfeats_scr[:], dc_pre, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PRECISION)
    scatter_dy(jax.lax.dot_general(
        dc_pre, wc_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PRECISION))
    dbc_ref[:] += jnp.sum(dc_pre, axis=0, keepdims=True)
    apply_ops_t()
    drh = adj_scr[:]

    dr = drh * h_prev
    dru_pre = jnp.concatenate([dr, du], axis=1) * ru * (1.0 - ru)

    # gate path
    dwg_ref[:] += jax.lax.dot_general(
        hfeats_scr[:], dru_pre, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PRECISION)
    scatter_dy(jax.lax.dot_general(
        dru_pre, wg_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PRECISION))
    dbg_ref[:] += jnp.sum(dru_pre, axis=0, keepdims=True)
    apply_ops_t()

    dh_prev = g * u + drh * r + adj_scr[:]

    # ONE fused x-cotangent stream, written in the ref's (residual)
    # dtype: casting at the kernel write is free, while a post-kernel
    # convert costs a full HBM round-trip of the (T, rows, 3H) stream
    # (~0.7 ms/step at the flagship shape, round-4 trace); the fused slab
    # also kills the downstream dgx/dcx concat in the hoisted GEMM's
    # backward
    dxp_ref[0, :, : 2 * h_units] = dru_pre.astype(dxp_ref.dtype)
    dxp_ref[0, :, 2 * h_units:] = dc_pre.astype(dxp_ref.dtype)
    dh_scr[:] = dh_prev

    @pl.when(tg == t_total - 1)
    def _():
        dh0_ref[0] = dh_prev


def _a_spec(shared, m, np_, tb, j):
    """BlockSpec for the operator stack (serves both directions)."""
    gr = j * np_
    if shared:
        return pl.BlockSpec((m * gr, gr), lambda i, t: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, (tb // j) * m * gr, gr),
                        lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM)


def _forward(a_ops, x_proj, wg_r, wc_r, gate_b, cand_b, h0,
             activation, batch_tile, interpret, residual_dtype=jnp.float32):
    a_c, xp, h0f, shared, dims = _prep(a_ops, x_proj, h0, batch_tile)
    t, b, n, np_, tb, g, j = dims
    m = a_ops.shape[0]
    h_units = h0.shape[-1]
    rows = tb * np_
    wg_f = wg_r.reshape(m * h_units, -1)
    wc_f = wc_r.reshape(m * h_units, -1)

    a_fwd_spec = _a_spec(shared, m, np_, tb, j)
    kernel = functools.partial(
        _fwd_kernel, m=m, np_=np_, tb=tb, j=j, h_units=h_units,
        activation=activation, shared=shared)
    h_seq, ru_seq, c_seq = pl.pallas_call(
        kernel,
        grid=(g, t),
        in_specs=[
            a_fwd_spec,
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
            pl.BlockSpec((1, rows, 3 * h_units), lambda i, j: (j, i, 0),
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
            # h_seq streams in residual_dtype too (bf16 halves its HBM
            # write + the bwd h_prev re-read + the d_seq cotangent stream)
            jax.ShapeDtypeStruct((t, g * rows, h_units), residual_dtype),
            jax.ShapeDtypeStruct((t, g * rows, 2 * h_units), residual_dtype),
            jax.ShapeDtypeStruct((t, g * rows, h_units), residual_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, h_units), jnp.float32),
            pltpu.VMEM((rows, m * h_units), jnp.float32),
        ],
        interpret=interpret,
    )(a_c, wg_f, wc_f, gate_b.reshape(1, -1), cand_b.reshape(1, -1),
      h0f, xp)

    h_seq_out = h_seq.reshape(t, g * tb, np_, h_units)[:, :b, :n]
    return h_seq_out, (a_c, h_seq, ru_seq, c_seq, shared, dims)


def _backward(a_c, wg_r, wc_r, h0f, h_seq_flat, ru_seq, c_seq,
              d_seq_flat, activation, interpret, shared, dims,
              residual_dtype=jnp.float32):
    t, b, n, np_, tb, g, j = dims
    m = wg_r.shape[0]
    h_units = wc_r.shape[-1]
    rows = tb * np_
    wg_f = wg_r.reshape(m * h_units, -1)
    wc_f = wc_r.reshape(m * h_units, -1)

    # h_prev over time: [h0, h_1 .. h_{T-1}] in the h_seq stream dtype
    h_prev = jnp.concatenate(
        [h0f.reshape(1, g * rows, h_units).astype(h_seq_flat.dtype),
         h_seq_flat[:-1]], axis=0)

    a_fwd_spec = _a_spec(shared, m, np_, tb, j)
    kernel = functools.partial(
        _bwd_kernel, m=m, np_=np_, tb=tb, j=j, h_units=h_units,
        activation=activation, t_total=t, shared=shared)
    rev = lambda i, j: (t - 1 - j, i, 0)  # walk time backward
    dxp, dh0, dwg, dwc, dbg, dbc = pl.pallas_call(
        kernel,
        grid=(g, t),
        in_specs=[
            a_fwd_spec,
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
            pl.BlockSpec((1, rows, 3 * h_units), rev,
                         memory_space=pltpu.VMEM),
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
            # fused x-cotangent stream in residual_dtype (see _bwd_kernel
            # write note); param/bias/h0 grads stay f32
            jax.ShapeDtypeStruct((t, g * rows, 3 * h_units), residual_dtype),
            jax.ShapeDtypeStruct((g, rows, h_units), jnp.float32),
            jax.ShapeDtypeStruct((m * h_units, 2 * h_units), jnp.float32),
            jax.ShapeDtypeStruct((m * h_units, h_units), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * h_units), jnp.float32),
            jax.ShapeDtypeStruct((1, h_units), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, h_units), jnp.float32),        # dh carry
            pltpu.VMEM((rows, m * h_units), jnp.float32),    # hfeats packed
            pltpu.VMEM((rows, m * h_units), jnp.float32),    # rfeats packed
            pltpu.VMEM((tb // j, m * j * np_, h_units),
                       jnp.float32),                         # dy per group
            pltpu.VMEM((rows, h_units), jnp.float32),        # A^T apply out
        ],
        interpret=interpret,
    )(a_c, wg_f, wc_f, h_prev, ru_seq, c_seq, d_seq_flat)

    dxp = dxp.reshape(t, g * tb, np_, 3 * h_units)[:, :b, :n]
    dh0 = dh0.reshape(g * tb, np_, h_units)[:b, :n]
    return (dxp, dwg.reshape(m, h_units, 2 * h_units),
            dwc.reshape(m, h_units, h_units), dbg.reshape(-1),
            dbc.reshape(-1), dh0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def dcgru_layer_recurrence_pallas_fused(a_ops, x_proj, wg_r, wc_r, gate_b,
                                        cand_b, h0,
                                        activation: str = "tanh",
                                        batch_tile: int = 16,
                                        interpret: bool = False,
                                        residual_dtype: str = "float32"):
    """Whole-sequence DCGRU layer recurrence as two Pallas kernels, with
    the input contribution as ONE fused ``x_proj = [gate_x | cand_x]``
    (T, B, N, 3H) stream.

    The fused stream lets the hoisted input GEMM's (..., 3H) output feed
    the kernel directly — no gate/cand slice pair on the forward and no
    concat on the backward (those were ~0.7 ms/step of HBM-bound data
    movement at the flagship shape; round-4 trace). Otherwise the same
    contract as :func:`eeg_gnn_tpu.ops.recurrent.dcgru_layer_recurrence`
    (operator stack in, (h_last, h_seq) out, no gradient for ``a_ops``);
    ``batch_tile`` clips are processed per grid step with compact per-clip
    operator slabs (a single shared slab when the stack is
    batch-broadcast). ``interpret=True`` runs the Mosaic interpreter (CPU
    tests). ``residual_dtype="bfloat16"`` halves the HBM traffic of the
    saved ru/c residuals, the x_proj stream (when it arrives as bf16) and
    the backward's x-cotangent stream at ~1e-3 gradient noise — the
    kernel state and all accumulation stay f32.
    """
    h_seq, _ = _forward(a_ops, x_proj, wg_r, wc_r, gate_b, cand_b,
                        h0, activation, batch_tile, interpret,
                        residual_dtype)
    return h_seq[-1], h_seq


def _vjp_fwd(a_ops, x_proj, wg_r, wc_r, gate_b, cand_b, h0,
             activation, batch_tile, interpret, residual_dtype):
    h_seq, (a_c, h_seq_flat, ru_seq, c_seq, shared, dims) = _forward(
        a_ops, x_proj, wg_r, wc_r, gate_b, cand_b, h0, activation,
        batch_tile, interpret, residual_dtype)
    t, b, n, np_, tb, g, j = dims
    rows = tb * np_
    h0p = _pad_axis(_pad_axis(h0, 0, g * tb), 1, np_)
    res = (a_c, wg_r, wc_r, h0p.reshape(g, rows, -1), h_seq_flat,
           ru_seq, c_seq, shared, dims)
    return (h_seq[-1], h_seq), res


def _vjp_bwd(activation, batch_tile, interpret, residual_dtype, res, grads):
    (a_c, wg_r, wc_r, h0f, h_seq_flat, ru_seq, c_seq, shared,
     dims) = res
    t, b, n, np_, tb, g, j = dims
    d_last, d_seq = grads
    h_units = wc_r.shape[-1]
    rows = tb * np_

    d_seq = d_seq.at[-1].add(d_last)
    d_pad = _pad_axis(_pad_axis(d_seq, 1, g * tb), 2, np_)
    d_flat = d_pad.reshape(t, g * rows, h_units)

    dxp, dwg, dwc, dbg, dbc, dh0 = _backward(
        a_c, wg_r, wc_r, h0f, h_seq_flat, ru_seq, c_seq, d_flat,
        activation, interpret, shared, dims,
        residual_dtype=jnp.dtype(residual_dtype))
    # a_ops gradient intentionally zero (supports are data, never trained);
    # cotangent dtypes/shapes must match the (possibly bf16) primal streams
    m = wg_r.shape[0]
    da = jnp.zeros((m, 1 if shared else b, n, n), jnp.float32)
    io = jnp.dtype(residual_dtype)
    return (da, dxp.astype(io), dwg, dwc, dbg, dbc, dh0)


dcgru_layer_recurrence_pallas_fused.defvjp(_vjp_fwd, _vjp_bwd)


def dcgru_layer_recurrence_pallas(a_ops, gate_x, cand_x, wg_r, wc_r, gate_b,
                                  cand_b, h0, activation: str = "tanh",
                                  batch_tile: int = 16,
                                  interpret: bool = False,
                                  residual_dtype: str = "float32"):
    """Separate-stream convenience wrapper over the fused kernel (tests /
    parity harnesses / micro-benches keep the historical gate_x + cand_x
    signature; the model path calls the fused entry directly to avoid
    materializing the split)."""
    x_proj = jnp.concatenate([gate_x, cand_x], axis=-1)
    return dcgru_layer_recurrence_pallas_fused(
        a_ops, x_proj, wg_r, wc_r, gate_b, cand_b, h0, activation,
        batch_tile, interpret, residual_dtype)


# ---------------------------------------------------------------------------
# x-in-kernel variant: the INPUT diffusion + projection run inside the
# recurrence kernels too (round-4; NOTES.md "Round 4" accounting). The
# hoisted-x path above streams a precomputed (T, B, N, 3H) x_proj; at the
# flagship shape the external per-term GEMM family + its layout glue cost
# ~3 ms/step. Here the kernel reads the RAW (T, B, N, D) input stream and
# computes xp itself: the forward fuses the x-diffusion into the same
# per-group A-dot as the state diffusion ([h | x] -> one (M*J*Np, J*Np) x
# (J*Np, H+D) dot), the backward recomputes [h_prev | r*h | x] in one
# widened dot, accumulates dWx like dWh, and fuses the x-cotangent
# A^T-applies with the state ones (dy slabs widened to H+D). Operator-dot
# COUNT is unchanged in both directions; the extra work is the in-kernel
# (rows, M*D) x (M*D, 2H|H) projections, which ride the same MXU pipeline.
# ---------------------------------------------------------------------------


def _xin_tile(batch_tile, b, m, np_, h, d, shared, io_bytes,
              budget_bytes=None):
    """Largest legal tile (multiple of the group size) whose BWD working
    set fits the VMEM budget — computed from direct byte counts (the
    hoisted-path heuristic undercounts the widened scratches here).

    ``budget_bytes`` defaults to a calibrated fraction of the device's
    VMEM (:func:`vmem_budget_bytes`); tests perturb it to sweep the tile
    selection. The terminal candidate is checked too: a shape whose
    MINIMAL tile exceeds the budget raises a clear error instead of
    reaching the Mosaic compiler (ADVICE r4)."""
    if budget_bytes is None:
        budget_bytes = vmem_budget_bytes(_XIN_VMEM_FRACTION)
    j = max(1, 128 // np_)

    def fits(tb):
        jj = _group_size(tb, np_)  # actual grouping for THIS candidate
        rows, gr = tb * np_, jj * np_
        a = 0 if shared else 2 * (tb // jj) * m * gr * gr * 4
        # streams double-buffer per time step; with MORE THAN ONE batch
        # group Mosaic additionally prefetches across the group boundary
        # (~half an extra buffer set — empirically, f32 shared tile 40 at
        # 4 groups OOMs the compiler while one group compiles; tile 35
        # at 4 groups compiles. 2.5x splits that boundary).
        buf = 2.5 if -(-b // tb) > 1 else 2.0
        streams = buf * rows * (5 * h + 2 * d) * io_bytes
        scr = 4 * (rows * (h + 2 * m * h + m * d + h + d)
                   + (tb // jj) * m * gr * (h + d))
        weights = 4 * (3 * m * h * h + 2 * m * h * h + 3 * m * d * h)
        return a + streams + scr + weights <= budget_bytes

    tb = max(1, min(batch_tile, b))
    if tb > j:
        tb = (tb // j) * j
    while tb > j and not fits(tb):
        tb -= j
    while tb > 1 and not fits(tb):
        tb -= 1
    if not fits(tb):
        raise ValueError(
            "DCGRU x-in-kernel recurrence: even the minimal batch tile "
            f"exceeds the VMEM budget (Np={np_}, H={h}, D={d}, M={m}, "
            f"budget={budget_bytes} bytes). Use the hoisted path "
            "(input_fusion=False) or raise EEG_GNN_TPU_VMEM_BYTES if the "
            "device has more VMEM than the 16 MiB baseline.")
    return tb


def xin_tile_for(batch_tile, b, m, n, h, d, shared, io_bytes):
    """Public tile query for callers that want to pre-pad the batch ONCE
    across a layer stack (models/dcgru.encoder_apply): returns the tile
    the x-in-kernel path would choose for this shape."""
    np_ = -(-n // 8) * 8
    return _xin_tile(batch_tile, b, m, np_, h, d, shared, io_bytes)


def _prep_xin(a_ops, x_seq, h0, batch_tile, io_bytes):
    t, b, n, d = x_seq.shape
    m = a_ops.shape[0]
    np_ = -(-n // 8) * 8
    shared = a_ops.shape[1] == 1
    h = h0.shape[-1]
    tb = _xin_tile(batch_tile, b, m, np_, h, d, shared, io_bytes)
    j = _group_size(tb, np_)
    g = -(-b // tb)
    bp = g * tb

    if bp != b:
        x_seq = _pad_axis(x_seq, 1, bp)
        h0 = _pad_axis(h0, 0, bp)
        if not shared:
            a_ops = _pad_axis(a_ops, 1, bp)
    x_seq = _pad_axis(x_seq, 2, np_)
    h0 = _pad_axis(h0, 1, np_)
    a_ops = _pad_axis(_pad_axis(a_ops, 2, np_), 3, np_)

    if shared:
        bd = _group_blockdiag(
            jnp.broadcast_to(a_ops[:, 0:1], (m, j, np_, np_)), j, np_)
        a_c = bd.reshape(m * j * np_, j * np_)
    else:
        bd = _group_blockdiag(a_ops, j, np_)
        a_c = bd.reshape(g, (tb // j) * m * j * np_, j * np_)

    xs = x_seq.reshape(t, g * tb * np_, d)
    h0f = h0.reshape(g, tb * np_, -1)
    return a_c, xs, h0f, shared, (t, b, n, np_, tb, g, j)


def _fwd_kernel_xin(a_ref, wxg_ref, wxc_ref, wg_ref, wc_ref, bg_ref,
                    bc_ref, h0_ref, x_ref, hseq_ref, ru_ref, c_ref,
                    h_scr, feats_scr, xfeats_scr,
                    *, m: int, np_: int, tb: int, j: int, h_units: int,
                    d_in: int, activation: str, shared: bool):
    act, _ = _act_pair(activation)
    t = pl.program_id(1)
    gr = j * np_

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[0]

    h = h_scr[:]
    x = x_ref[0].astype(jnp.float32)
    a_shared = a_ref[:] if shared else None

    def diffuse(x2d, width_split=None):
        """Per-group dots -> packed feats_scr (rows, M*H) (+ optionally
        xfeats_scr (rows, M*D) when diffusing [h | x])."""
        for i in range(tb // j):
            a_blk = a_shared if shared else \
                a_ref[0][i * m * gr:(i + 1) * m * gr]
            f = _dot(a_blk, x2d[i * gr:(i + 1) * gr])
            for mi in range(m):
                blk = f[mi * gr:(mi + 1) * gr]
                feats_scr[i * gr:(i + 1) * gr,
                          mi * h_units:(mi + 1) * h_units] = \
                    blk[:, :h_units]
                if width_split is not None:
                    xfeats_scr[i * gr:(i + 1) * gr,
                               mi * d_in:(mi + 1) * d_in] = \
                        blk[:, h_units:]

    # ONE widened dot per group diffuses state AND input
    diffuse(jnp.concatenate([h, x], axis=1), width_split=h_units)
    xg = _dot(xfeats_scr[:], wxg_ref[:])
    gate = xg + bg_ref[:] + _dot(feats_scr[:], wg_ref[:])
    ru = jax.nn.sigmoid(gate)
    r, u = ru[:, :h_units], ru[:, h_units:]

    diffuse(r * h)
    xc = _dot(xfeats_scr[:], wxc_ref[:])
    c = act(xc + bc_ref[:] + _dot(feats_scr[:], wc_ref[:]))

    h_new = u * h + (1.0 - u) * c
    h_scr[:] = h_new
    hseq_ref[0] = h_new.astype(hseq_ref.dtype)
    ru_ref[0] = ru.astype(ru_ref.dtype)
    c_ref[0] = c.astype(c_ref.dtype)


def _bwd_kernel_xin(a_ref, wxg_ref, wxc_ref, wg_ref, wc_ref, hprev_ref,
                    ru_ref, c_ref, x_ref, dseq_ref,
                    dx_ref, dh0_ref, dwxg_ref, dwxc_ref, dwg_ref, dwc_ref,
                    dbg_ref, dbc_ref,
                    dh_scr, hfeats_scr, rfeats_scr, xfeats_scr, dy_scr,
                    adj_scr,
                    *, m: int, np_: int, tb: int, j: int, h_units: int,
                    d_in: int, activation: str, t_total: int, shared: bool):
    _, act_grad = _act_pair(activation)
    gidx = pl.program_id(0)
    tg = pl.program_id(1)

    @pl.when(jnp.logical_and(gidx == 0, tg == 0))
    def _():
        dwxg_ref[:] = jnp.zeros_like(dwxg_ref)
        dwxc_ref[:] = jnp.zeros_like(dwxc_ref)
        dwg_ref[:] = jnp.zeros_like(dwg_ref)
        dwc_ref[:] = jnp.zeros_like(dwc_ref)
        dbg_ref[:] = jnp.zeros_like(dbg_ref)
        dbc_ref[:] = jnp.zeros_like(dbc_ref)

    @pl.when(tg == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    h_prev = hprev_ref[0].astype(jnp.float32)
    ru = ru_ref[0].astype(jnp.float32)
    c = c_ref[0].astype(jnp.float32)
    x = x_ref[0].astype(jnp.float32)
    r, u = ru[:, :h_units], ru[:, h_units:]

    g = dh_scr[:] + dseq_ref[0].astype(jnp.float32)
    du = g * (h_prev - c)
    dc = g * (1.0 - u)
    dc_pre = dc * act_grad(c)

    gr = j * np_
    a_shared = a_ref[:] if shared else None
    # recompute the three diffusions in ONE widened dot per group:
    # [h_prev | r*h | x] -> hfeats, rfeats (m-in-lanes, M*H) + xfeats (M*D)
    rh = r * h_prev
    for i in range(tb // j):
        a_blk = a_shared if shared else \
            a_ref[0][i * m * gr:(i + 1) * m * gr]
        x2 = jnp.concatenate(
            [h_prev[i * gr:(i + 1) * gr], rh[i * gr:(i + 1) * gr],
             x[i * gr:(i + 1) * gr]], axis=1)
        f = _dot(a_blk, x2)
        for mi in range(m):
            blk = f[mi * gr:(mi + 1) * gr]
            hfeats_scr[i * gr:(i + 1) * gr,
                       mi * h_units:(mi + 1) * h_units] = blk[:, :h_units]
            rfeats_scr[i * gr:(i + 1) * gr,
                       mi * h_units:(mi + 1) * h_units] = \
                blk[:, h_units:2 * h_units]
            xfeats_scr[i * gr:(i + 1) * gr,
                       mi * d_in:(mi + 1) * d_in] = blk[:, 2 * h_units:]

    def apply_ops_t():
        """Fused A^T-apply at width H + D: dy_scr slabs carry the state
        cotangent in lanes [:H] and the x cotangent in [H:]."""
        for i in range(tb // j):
            a_blk = a_shared if shared else \
                a_ref[0][i * m * gr:(i + 1) * m * gr]
            adj_scr[i * gr:(i + 1) * gr, :] = jax.lax.dot_general(
                a_blk, dy_scr[i],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_PRECISION)

    def scatter_dy(dy_h, dy_x):
        """(rows, M*H) + (rows, M*D) weight-transpose products ->
        per-group m-major rows, H+D wide."""
        for i in range(tb // j):
            for mi in range(m):
                dy_scr[i, mi * gr:(mi + 1) * gr, :h_units] = \
                    dy_h[i * gr:(i + 1) * gr,
                         mi * h_units:(mi + 1) * h_units]
                dy_scr[i, mi * gr:(mi + 1) * gr, h_units:] = \
                    dy_x[i * gr:(i + 1) * gr, mi * d_in:(mi + 1) * d_in]

    def wt_dot(dy, w_ref):
        return jax.lax.dot_general(
            dy, w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PRECISION)

    def acc_dot(feats, dy):
        return jax.lax.dot_general(
            feats, dy, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PRECISION)

    # candidate path
    dwc_ref[:] += acc_dot(rfeats_scr[:], dc_pre)
    dwxc_ref[:] += acc_dot(xfeats_scr[:], dc_pre)
    scatter_dy(wt_dot(dc_pre, wc_ref), wt_dot(dc_pre, wxc_ref))
    dbc_ref[:] += jnp.sum(dc_pre, axis=0, keepdims=True)
    apply_ops_t()
    drh = adj_scr[:, :h_units]
    dx = adj_scr[:, h_units:]

    dr = drh * h_prev
    dru_pre = jnp.concatenate([dr, du], axis=1) * ru * (1.0 - ru)

    # gate path
    dwg_ref[:] += acc_dot(hfeats_scr[:], dru_pre)
    dwxg_ref[:] += acc_dot(xfeats_scr[:], dru_pre)
    scatter_dy(wt_dot(dru_pre, wg_ref), wt_dot(dru_pre, wxg_ref))
    dbg_ref[:] += jnp.sum(dru_pre, axis=0, keepdims=True)
    apply_ops_t()

    dh_prev = g * u + drh * r + adj_scr[:, :h_units]
    dx = dx + adj_scr[:, h_units:]

    dx_ref[0] = dx.astype(dx_ref.dtype)
    dh_scr[:] = dh_prev

    @pl.when(tg == t_total - 1)
    def _():
        dh0_ref[0] = dh_prev


def _forward_xin(a_ops, x_seq, wxg_f, wxc_f, wg_r, wc_r, gate_b, cand_b,
                 h0, activation, batch_tile, interpret,
                 residual_dtype=jnp.float32):
    io_bytes = 2 if jnp.dtype(residual_dtype) == jnp.bfloat16 else 4
    a_c, xs, h0f, shared, dims = _prep_xin(a_ops, x_seq, h0, batch_tile,
                                           io_bytes)
    t, b, n, np_, tb, g, j = dims
    m = a_ops.shape[0]
    h_units = h0.shape[-1]
    d_in = x_seq.shape[-1]
    rows = tb * np_
    wg_f = wg_r.reshape(m * h_units, -1)
    wc_f = wc_r.reshape(m * h_units, -1)

    a_fwd_spec = _a_spec(shared, m, np_, tb, j)
    kernel = functools.partial(
        _fwd_kernel_xin, m=m, np_=np_, tb=tb, j=j, h_units=h_units,
        d_in=d_in, activation=activation, shared=shared)
    wspec = lambda r_, c_: pl.BlockSpec((r_, c_), lambda i, jj: (0, 0),
                                        memory_space=pltpu.VMEM)
    h_seq, ru_seq, c_seq = pl.pallas_call(
        kernel,
        grid=(g, t),
        in_specs=[
            a_fwd_spec,
            wspec(m * d_in, 2 * h_units),
            wspec(m * d_in, h_units),
            wspec(m * h_units, 2 * h_units),
            wspec(m * h_units, h_units),
            wspec(1, 2 * h_units),
            wspec(1, h_units),
            pl.BlockSpec((1, rows, h_units), lambda i, jj: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, d_in), lambda i, jj: (jj, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, h_units), lambda i, jj: (jj, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 2 * h_units), lambda i, jj: (jj, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, h_units), lambda i, jj: (jj, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, g * rows, h_units), residual_dtype),
            jax.ShapeDtypeStruct((t, g * rows, 2 * h_units), residual_dtype),
            jax.ShapeDtypeStruct((t, g * rows, h_units), residual_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, h_units), jnp.float32),
            pltpu.VMEM((rows, m * h_units), jnp.float32),
            pltpu.VMEM((rows, m * d_in), jnp.float32),
        ],
        interpret=interpret,
    )(a_c, wxg_f, wxc_f, wg_f, wc_f, gate_b.reshape(1, -1),
      cand_b.reshape(1, -1), h0f, xs)

    h_seq_out = h_seq.reshape(t, g * tb, np_, h_units)[:, :b, :n]
    return h_seq_out, (a_c, xs, h_seq, ru_seq, c_seq, shared, dims)


def _backward_xin(a_c, xs, wxg_f, wxc_f, wg_r, wc_r, h0f, h_seq_flat,
                  ru_seq, c_seq, d_seq_flat, activation, interpret, shared,
                  dims, residual_dtype=jnp.float32):
    t, b, n, np_, tb, g, j = dims
    m = wg_r.shape[0]
    h_units = wc_r.shape[-1]
    d_in = xs.shape[-1]
    rows = tb * np_
    wg_f = wg_r.reshape(m * h_units, -1)
    wc_f = wc_r.reshape(m * h_units, -1)

    h_prev = jnp.concatenate(
        [h0f.reshape(1, g * rows, h_units).astype(h_seq_flat.dtype),
         h_seq_flat[:-1]], axis=0)

    a_fwd_spec = _a_spec(shared, m, np_, tb, j)
    kernel = functools.partial(
        _bwd_kernel_xin, m=m, np_=np_, tb=tb, j=j, h_units=h_units,
        d_in=d_in, activation=activation, t_total=t, shared=shared)
    rev = lambda i, jj: (t - 1 - jj, i, 0)
    wspec = lambda r_, c_: pl.BlockSpec((r_, c_), lambda i, jj: (0, 0),
                                        memory_space=pltpu.VMEM)
    (dx, dh0, dwxg, dwxc, dwg, dwc, dbg, dbc) = pl.pallas_call(
        kernel,
        grid=(g, t),
        in_specs=[
            a_fwd_spec,
            wspec(m * d_in, 2 * h_units),
            wspec(m * d_in, h_units),
            wspec(m * h_units, 2 * h_units),
            wspec(m * h_units, h_units),
            pl.BlockSpec((1, rows, h_units), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 2 * h_units), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, h_units), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, d_in), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, h_units), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, d_in), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, h_units), lambda i, jj: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec(m * d_in, 2 * h_units),
            wspec(m * d_in, h_units),
            wspec(m * h_units, 2 * h_units),
            wspec(m * h_units, h_units),
            wspec(1, 2 * h_units),
            wspec(1, h_units),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, g * rows, d_in), residual_dtype),
            jax.ShapeDtypeStruct((g, rows, h_units), jnp.float32),
            jax.ShapeDtypeStruct((m * d_in, 2 * h_units), jnp.float32),
            jax.ShapeDtypeStruct((m * d_in, h_units), jnp.float32),
            jax.ShapeDtypeStruct((m * h_units, 2 * h_units), jnp.float32),
            jax.ShapeDtypeStruct((m * h_units, h_units), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * h_units), jnp.float32),
            jax.ShapeDtypeStruct((1, h_units), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, h_units), jnp.float32),          # dh carry
            pltpu.VMEM((rows, m * h_units), jnp.float32),      # hfeats
            pltpu.VMEM((rows, m * h_units), jnp.float32),      # rfeats
            pltpu.VMEM((rows, m * d_in), jnp.float32),         # xfeats
            pltpu.VMEM((tb // j, m * j * np_, h_units + d_in),
                       jnp.float32),                           # dy slabs
            pltpu.VMEM((rows, h_units + d_in), jnp.float32),   # A^T out
        ],
        interpret=interpret,
    )(a_c, wxg_f, wxc_f, wg_f, wc_f, h_prev, ru_seq, c_seq, xs,
      d_seq_flat)

    dx = dx.reshape(t, g * tb, np_, d_in)[:, :b, :n]
    dh0 = dh0.reshape(g * tb, np_, h_units)[:b, :n]
    return (dx, dwxg, dwxc, dwg.reshape(m, h_units, 2 * h_units),
            dwc.reshape(m, h_units, h_units), dbg.reshape(-1),
            dbc.reshape(-1), dh0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def dcgru_layer_recurrence_pallas_xin(a_ops, x_seq, wxg_f, wxc_f, wg_r,
                                      wc_r, gate_b, cand_b, h0,
                                      activation: str = "tanh",
                                      batch_tile: int = 16,
                                      interpret: bool = False,
                                      residual_dtype: str = "float32"):
    """Whole-sequence DCGRU layer recurrence with the INPUT diffusion +
    projection fused into the kernels: takes the raw (T, B, N, D) layer
    input stream plus m-major input weights wxg_f (M*D, 2H) / wxc_f
    (M*D, H) — no externally materialized x_proj at all. See the module
    section comment for the fusion structure; numerics match the hoisted
    path (same operator math, f32 accumulation)."""
    h_seq, _ = _forward_xin(a_ops, x_seq, wxg_f, wxc_f, wg_r, wc_r,
                            gate_b, cand_b, h0, activation, batch_tile,
                            interpret, residual_dtype)
    return h_seq[-1], h_seq


def _vjp_fwd_xin(a_ops, x_seq, wxg_f, wxc_f, wg_r, wc_r, gate_b, cand_b,
                 h0, activation, batch_tile, interpret, residual_dtype):
    h_seq, (a_c, xs, h_seq_flat, ru_seq, c_seq, shared, dims) = \
        _forward_xin(a_ops, x_seq, wxg_f, wxc_f, wg_r, wc_r, gate_b,
                     cand_b, h0, activation, batch_tile, interpret,
                     residual_dtype)
    t, b, n, np_, tb, g, j = dims
    rows = tb * np_
    h0p = _pad_axis(_pad_axis(h0, 0, g * tb), 1, np_)
    res = (a_c, xs, wxg_f, wxc_f, wg_r, wc_r, h0p.reshape(g, rows, -1),
           h_seq_flat, ru_seq, c_seq, shared, dims)
    return (h_seq[-1], h_seq), res


def _vjp_bwd_xin(activation, batch_tile, interpret, residual_dtype, res,
                 grads):
    (a_c, xs, wxg_f, wxc_f, wg_r, wc_r, h0f, h_seq_flat, ru_seq, c_seq,
     shared, dims) = res
    t, b, n, np_, tb, g, j = dims
    d_last, d_seq = grads
    h_units = wc_r.shape[-1]
    rows = tb * np_

    d_seq = d_seq.at[-1].add(d_last)
    d_pad = _pad_axis(_pad_axis(d_seq, 1, g * tb), 2, np_)
    d_flat = d_pad.reshape(t, g * rows, h_units)

    dx, dwxg, dwxc, dwg, dwc, dbg, dbc, dh0 = _backward_xin(
        a_c, xs, wxg_f, wxc_f, wg_r, wc_r, h0f, h_seq_flat, ru_seq,
        c_seq, d_flat, activation, interpret, shared, dims,
        residual_dtype=jnp.dtype(residual_dtype))
    m = wg_r.shape[0]
    da = jnp.zeros((m, 1 if shared else b, n, n), jnp.float32)
    return (da, dx.astype(xs.dtype), dwxg.astype(wxg_f.dtype),
            dwxc.astype(wxc_f.dtype), dwg, dwc, dbg, dbc, dh0)


dcgru_layer_recurrence_pallas_xin.defvjp(_vjp_fwd_xin, _vjp_bwd_xin)
