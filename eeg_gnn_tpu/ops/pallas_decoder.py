"""Pallas whole-sequence DCGRU seq2seq DECODER kernels (forward + BPTT).

The decoder's feedback loop (reference ``model/model.py:149-204``, hot
loop #3) is inherently sequential: step t's projected output is step
t+1's layer-0 input, so nothing can be hoisted out of the time loop the
way the encoder hoists its input projection. As an XLA ``lax.scan`` each
of the T_out steps is a pile of tiny latency-bound ops — exactly the
shape the encoder's whole-sequence kernels (``ops/pallas_recurrent.py``)
were built to kill; measured round 4, the scanned decoder dominated the
SSL train step (9.6k clips/s vs 18.5k for the encoder-only detection
step). These kernels run the ENTIRE decoder — all L layers' DCGRU cells
(layer 0 at input width D_out, layers >= 1 sharing ONE cell at width H —
the reference tied-weights quirk, model.py:126-143), the output
projection, and the scheduled-sampling feedback select — as ONE
``pallas_call`` per direction: grid (batch-tile, T_out), per-layer state
in VMEM scratch across grid steps, Mosaic double-buffering the
per-timestep streams.

Structure per timestep (forward):

    in_0   = t==0 ? GO(zeros) : f_{t-1} * x_{t-1} + (1-f_{t-1}) * proj_{t-1}
    for l in 0..L-1:   (xin-style cell, ops/pallas_recurrent.py)
        one widened per-group operator dot diffuses [h_l | in_l]
        ru_l = sigmoid(xg + Wh-proj(feats) + b);  c_l = act(...)
        h_l' = u*h_l + (1-u)*c_l;  in_{l+1} = h_l'
    proj_t = h_{L-1}' @ Wp^T + bp            (in-kernel projection)
    feedback select with the per-step scalar force f_t (precomputed
    OUTSIDE from the same PRNG stream as the XLA scan path, so both
    paths make identical teacher-forcing decisions given one rng)

The backward walks t from T_out-1 down with per-layer dh carries plus a
d_in0 carry that routes the feedback cotangent: at step t,

    dproj_t = dseq_t + (1 - f_t) * din0_{t+1}
    dx_t    = f_t * din0_{t+1}
    dWp    += pre_t^T dproj_t;   dpre = dproj_t @ Wp
    layer L-1 .. 0: xin-style cell backward (recompute the three
        diffusions in one widened dot; dW accumulated in-kernel — layers
        >= 1 all accumulate into the SHARED cell's grads, realizing the
        tied-weight gradient sum); each layer's input cotangent flows
        into the layer below's dh (same step), layer 0's into din0.

Saved residuals: per-layer h/ru/c streams (lane-concatenated slabs),
plus the layer-0 input stream ``in0`` (written by the forward kernel —
recomputing it on the backward would need x_{t-1}/proj_{t-1} at shifted
time indices). Streams ride ``residual_dtype`` (bf16 halves their HBM
traffic); state and all accumulation stay f32.

Dropout before the projection (reference model.py:147,192) is NOT fused:
``models/dcgru.decoder_apply`` falls back to the XLA scan when training
with dropout_rate > 0 (the reference SSL recipes run dropout 0.0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eeg_gnn_tpu.ops.pallas_recurrent import (
    _PRECISION,
    _XIN_VMEM_FRACTION,
    _a_spec,
    _dot,
    _group_blockdiag,
    _group_size,
    _pad_axis,
    vmem_budget_bytes,
)
from eeg_gnn_tpu.ops.recurrent import _act_pair


def _dec_tile(batch_tile, b, m, np_, h, d, n_layers, shared, io_bytes,
              budget_bytes=None):
    """Largest legal tile whose BWD working set fits the VMEM budget
    (direct byte counts, same policy as ``_xin_tile``); raises a clear
    error when even the minimal tile cannot fit."""
    if budget_bytes is None:
        budget_bytes = vmem_budget_bytes(_XIN_VMEM_FRACTION)
    j = max(1, 128 // np_)
    dm = max(d, h)
    ll = n_layers

    def fits(tb):
        jj = _group_size(tb, np_)
        rows, gr = tb * np_, jj * np_
        a = 0 if shared else 2 * (tb // jj) * m * gr * gr * 4
        # streams (double-buffered in+out): h_prev + h + ru + c slabs
        # (5*L*H), in0 + dseq + dx (3*D)
        streams = 2 * rows * (5 * ll * h + 3 * d) * io_bytes
        scr = 4 * (rows * (ll * h + d + 2 * m * h + m * dm + h + dm)
                   + (tb // jj) * m * gr * (h + dm))
        # weights + their grad accumulators (layer0 + shared + proj)
        weights = 2 * 4 * (3 * m * d * h + 9 * m * h * h + h * d)
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
            "DCGRU decoder kernel: even the minimal batch tile exceeds "
            f"the VMEM budget (Np={np_}, H={h}, D={d}, L={n_layers}, "
            f"M={m}, budget={budget_bytes} bytes). Use the XLA decoder "
            "path or raise EEG_GNN_TPU_VMEM_BYTES.")
    return tb


def _prep_dec(a_ops, x_seq, h0_stack, batch_tile, io_bytes):
    """Pad batch + nodes, build grouped operator stacks, flatten layouts.

    Returns (a_c, xs, h0f, shared, dims) with
      xs:  (T, G*rows, D) teacher-forcing input stream
      h0f: (G, rows, L*H) layer-lane-slab initial states (f32)
    """
    t, b, n, d = x_seq.shape
    ll, _, _, h = h0_stack.shape
    m = a_ops.shape[0]
    np_ = -(-n // 8) * 8
    shared = a_ops.shape[1] == 1
    tb = _dec_tile(batch_tile, b, m, np_, h, d, ll, shared, io_bytes)
    j = _group_size(tb, np_)
    g = -(-b // tb)
    bp = g * tb

    if bp != b:
        x_seq = _pad_axis(x_seq, 1, bp)
        h0_stack = _pad_axis(h0_stack, 1, bp)
        if not shared:
            a_ops = _pad_axis(a_ops, 1, bp)
    x_seq = _pad_axis(x_seq, 2, np_)
    h0_stack = _pad_axis(h0_stack, 2, np_)
    a_ops = _pad_axis(_pad_axis(a_ops, 2, np_), 3, np_)

    if shared:
        bd = _group_blockdiag(
            jnp.broadcast_to(a_ops[:, 0:1], (m, j, np_, np_)), j, np_)
        a_c = bd.reshape(m * j * np_, j * np_)
    else:
        bd = _group_blockdiag(a_ops, j, np_)
        a_c = bd.reshape(g, (tb // j) * m * j * np_, j * np_)

    xs = x_seq.reshape(t, g * tb * np_, d)
    # (L, B_pad, Np, H) -> (G, rows, L*H) with lane slab l*H:(l+1)*H
    h0f = jnp.transpose(h0_stack, (1, 2, 0, 3)).astype(jnp.float32)
    h0f = h0f.reshape(g, tb * np_, ll * h)
    return a_c, xs, h0f, shared, (t, b, n, np_, tb, g, j)


def _fwd_kernel_dec(a_ref, wx0g_ref, wx0c_ref, wh0g_ref, wh0c_ref,
                    b0g_ref, b0c_ref, wxsg_ref, wxsc_ref, whsg_ref,
                    whsc_ref, bsg_ref, bsc_ref, wp_ref, bp_ref, h0_ref,
                    x_ref, f_ref,
                    proj_ref, in0_ref, hseq_ref, ru_ref, c_ref,
                    h_scr, in_scr, feats_scr, xfeats_scr,
                    *, m: int, np_: int, tb: int, j: int, h_units: int,
                    d_out: int, n_layers: int, activation: str,
                    shared: bool):
    act, _ = _act_pair(activation)
    t = pl.program_id(1)
    gr = j * np_
    h = h_units

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[0]
        in_scr[:] = jnp.zeros_like(in_scr)  # GO symbol (model.py:168)

    a_shared = a_ref[:] if shared else None

    def diffuse(x2d, d_in):
        """Per-group widened dots: [state (H) | input (d_in)] -> packed
        feats_scr (rows, M*H) + xfeats_scr (rows, M*d_in); d_in=0 means a
        state-only (r*h) diffusion that leaves xfeats untouched."""
        for i in range(tb // j):
            a_blk = a_shared if shared else \
                a_ref[0][i * m * gr:(i + 1) * m * gr]
            fblk = _dot(a_blk, x2d[i * gr:(i + 1) * gr])
            for mi in range(m):
                blk = fblk[mi * gr:(mi + 1) * gr]
                feats_scr[i * gr:(i + 1) * gr,
                          mi * h:(mi + 1) * h] = blk[:, :h]
                if d_in:
                    xfeats_scr[i * gr:(i + 1) * gr,
                               mi * d_in:(mi + 1) * d_in] = blk[:, h:]

    inp = in_scr[:]
    in0_ref[0] = inp.astype(in0_ref.dtype)  # residual for the backward
    out = inp
    for l in range(n_layers):
        d_in = d_out if l == 0 else h
        wxg = wx0g_ref if l == 0 else wxsg_ref
        wxc = wx0c_ref if l == 0 else wxsc_ref
        whg = wh0g_ref if l == 0 else whsg_ref
        whc = wh0c_ref if l == 0 else whsc_ref
        bg = b0g_ref if l == 0 else bsg_ref
        bc = b0c_ref if l == 0 else bsc_ref
        h_prev = h_scr[:, l * h:(l + 1) * h]
        diffuse(jnp.concatenate([h_prev, out], axis=1), d_in)
        xg = _dot(xfeats_scr[:, : m * d_in], wxg[:])
        ru = jax.nn.sigmoid(xg + bg[:] + _dot(feats_scr[:], whg[:]))
        r, u = ru[:, :h], ru[:, h:]
        diffuse(r * h_prev, 0)  # xfeats keeps the input diffusion
        xc = _dot(xfeats_scr[:, : m * d_in], wxc[:])
        c = act(xc + bc[:] + _dot(feats_scr[:], whc[:]))
        h_new = u * h_prev + (1.0 - u) * c
        h_scr[:, l * h:(l + 1) * h] = h_new
        hseq_ref[0, :, l * h:(l + 1) * h] = h_new.astype(hseq_ref.dtype)
        ru_ref[0, :, l * 2 * h:(l + 1) * 2 * h] = ru.astype(ru_ref.dtype)
        c_ref[0, :, l * h:(l + 1) * h] = c.astype(c_ref.dtype)
        out = h_new

    proj = _dot(out, wp_ref[:]) + bp_ref[:]
    proj_ref[0] = proj.astype(proj_ref.dtype)
    # scheduled-sampling feedback: f_t is a per-step SCALAR in {0, 1}
    # (reference draws one random.random() per step, model.py:198-202);
    # the whole (T, 1) force vector lives in SMEM, indexed by grid step
    f_t = f_ref[t, 0]
    in_scr[:] = f_t * x_ref[0].astype(jnp.float32) + (1.0 - f_t) * proj


def _bwd_kernel_dec(a_ref, wx0g_ref, wx0c_ref, wh0g_ref, wh0c_ref,
                    wxsg_ref, wxsc_ref, whsg_ref, whsc_ref, wp_ref,
                    hprev_ref, hseq_ref, ru_ref, c_ref, in0_ref,
                    dseq_ref, f_ref,
                    dx_ref, dh0_ref, dwx0g_ref, dwx0c_ref, dwh0g_ref,
                    dwh0c_ref, db0g_ref, db0c_ref, dwxsg_ref, dwxsc_ref,
                    dwhsg_ref, dwhsc_ref, dbsg_ref, dbsc_ref, dwp_ref,
                    dbp_ref,
                    dh_scr, din_scr, hfeats_scr, rfeats_scr, xfeats_scr,
                    dy_scr, adj_scr,
                    *, m: int, np_: int, tb: int, j: int, h_units: int,
                    d_out: int, n_layers: int, activation: str,
                    t_total: int, shared: bool):
    _, act_grad = _act_pair(activation)
    gidx = pl.program_id(0)
    tg = pl.program_id(1)  # walks time BACKWARD via the rev index maps
    gr = j * np_
    h = h_units

    @pl.when(jnp.logical_and(gidx == 0, tg == 0))
    def _():
        for ref in (dwx0g_ref, dwx0c_ref, dwh0g_ref, dwh0c_ref, db0g_ref,
                    db0c_ref, dwxsg_ref, dwxsc_ref, dwhsg_ref, dwhsc_ref,
                    dbsg_ref, dbsc_ref, dwp_ref, dbp_ref):
            ref[:] = jnp.zeros_like(ref)

    @pl.when(tg == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        din_scr[:] = jnp.zeros_like(din_scr)

    a_shared = a_ref[:] if shared else None

    def acc_dot(feats, dy):
        return jax.lax.dot_general(
            feats, dy, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PRECISION)

    def wt_dot(dy, w_ref):
        return jax.lax.dot_general(
            dy, w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PRECISION)

    # feedback routing: din0 carried from step t+1 splits between the
    # teacher-forcing input x_t and the projection at step t
    f_t = f_ref[t_total - 1 - tg, 0]
    dproj = dseq_ref[0].astype(jnp.float32) + (1.0 - f_t) * din_scr[:]
    dx_ref[0] = (f_t * din_scr[:]).astype(dx_ref.dtype)

    # projection backward (pre = top layer's h at step t)
    pre = hseq_ref[0][:, (n_layers - 1) * h: n_layers * h].astype(
        jnp.float32)
    dwp_ref[:] += acc_dot(pre, dproj)
    dbp_ref[:] += jnp.sum(dproj, axis=0, keepdims=True)
    dcur = wt_dot(dproj, wp_ref)  # (rows, H) into the top layer's h

    for l in range(n_layers - 1, -1, -1):
        d_in = d_out if l == 0 else h
        wxg = wx0g_ref if l == 0 else wxsg_ref
        wxc = wx0c_ref if l == 0 else wxsc_ref
        whg = wh0g_ref if l == 0 else whsg_ref
        whc = wh0c_ref if l == 0 else whsc_ref
        dwxg = dwx0g_ref if l == 0 else dwxsg_ref
        dwxc = dwx0c_ref if l == 0 else dwxsc_ref
        dwhg = dwh0g_ref if l == 0 else dwhsg_ref
        dwhc = dwh0c_ref if l == 0 else dwhsc_ref
        dbg = db0g_ref if l == 0 else dbsg_ref
        dbc = db0c_ref if l == 0 else dbsc_ref

        h_prev = hprev_ref[0][:, l * h:(l + 1) * h].astype(jnp.float32)
        ru = ru_ref[0][:, l * 2 * h:(l + 1) * 2 * h].astype(jnp.float32)
        c = c_ref[0][:, l * h:(l + 1) * h].astype(jnp.float32)
        inp = (in0_ref[0] if l == 0
               else hseq_ref[0][:, (l - 1) * h: l * h]).astype(jnp.float32)
        r, u = ru[:, :h], ru[:, h:]

        g = dh_scr[:, l * h:(l + 1) * h] + dcur
        du = g * (h_prev - c)
        dc = g * (1.0 - u)
        dc_pre = dc * act_grad(c)

        # recompute the three diffusions in ONE widened dot per group:
        # [h_prev | r*h_prev | inp] -> hfeats, rfeats (M*H) + xfeats (M*d)
        rh = r * h_prev
        for i in range(tb // j):
            a_blk = a_shared if shared else \
                a_ref[0][i * m * gr:(i + 1) * m * gr]
            x2 = jnp.concatenate(
                [h_prev[i * gr:(i + 1) * gr], rh[i * gr:(i + 1) * gr],
                 inp[i * gr:(i + 1) * gr]], axis=1)
            fblk = _dot(a_blk, x2)
            for mi in range(m):
                blk = fblk[mi * gr:(mi + 1) * gr]
                hfeats_scr[i * gr:(i + 1) * gr,
                           mi * h:(mi + 1) * h] = blk[:, :h]
                rfeats_scr[i * gr:(i + 1) * gr,
                           mi * h:(mi + 1) * h] = blk[:, h:2 * h]
                xfeats_scr[i * gr:(i + 1) * gr,
                           mi * d_in:(mi + 1) * d_in] = blk[:, 2 * h:]

        def scatter_dy(dy_h, dy_x, d_in=d_in):
            for i in range(tb // j):
                for mi in range(m):
                    dy_scr[i, mi * gr:(mi + 1) * gr, :h] = \
                        dy_h[i * gr:(i + 1) * gr, mi * h:(mi + 1) * h]
                    dy_scr[i, mi * gr:(mi + 1) * gr, h:h + d_in] = \
                        dy_x[i * gr:(i + 1) * gr,
                             mi * d_in:(mi + 1) * d_in]

        def apply_ops_t(d_in=d_in):
            for i in range(tb // j):
                a_blk = a_shared if shared else \
                    a_ref[0][i * m * gr:(i + 1) * m * gr]
                adj_scr[i * gr:(i + 1) * gr, : h + d_in] = \
                    jax.lax.dot_general(
                        a_blk, dy_scr[i, :, : h + d_in],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_PRECISION)

        # candidate path
        dwhc[:] += acc_dot(rfeats_scr[:], dc_pre)
        dwxc[:] += acc_dot(xfeats_scr[:, : m * d_in], dc_pre)
        scatter_dy(wt_dot(dc_pre, whc), wt_dot(dc_pre, wxc))
        dbc[:] += jnp.sum(dc_pre, axis=0, keepdims=True)
        apply_ops_t()
        drh = adj_scr[:, :h]
        dinp = adj_scr[:, h: h + d_in]

        dr = drh * h_prev
        dru_pre = jnp.concatenate([dr, du], axis=1) * ru * (1.0 - ru)

        # gate path
        dwhg[:] += acc_dot(hfeats_scr[:], dru_pre)
        dwxg[:] += acc_dot(xfeats_scr[:, : m * d_in], dru_pre)
        scatter_dy(wt_dot(dru_pre, whg), wt_dot(dru_pre, wxg))
        dbg[:] += jnp.sum(dru_pre, axis=0, keepdims=True)
        apply_ops_t()

        dh_prev = g * u + drh * r + adj_scr[:, :h]
        dinp = dinp + adj_scr[:, h: h + d_in]
        dh_scr[:, l * h:(l + 1) * h] = dh_prev
        if l == 0:
            din_scr[:] = dinp  # routes to x/proj at step t-1
        else:
            dcur = dinp  # flows into the layer below's h at THIS step

    @pl.when(tg == t_total - 1)
    def _():
        dh0_ref[0] = dh_scr[:]


def _forward_dec(a_ops, x_seq, force, wx0g, wx0c, wh0g, wh0c, b0g, b0c,
                 wxsg, wxsc, whsg, whsc, bsg, bsc, wp, bp, h0_stack,
                 n_layers, activation, batch_tile, interpret,
                 residual_dtype=jnp.float32):
    io_bytes = 2 if jnp.dtype(residual_dtype) == jnp.bfloat16 else 4
    a_c, xs, h0f, shared, dims = _prep_dec(a_ops, x_seq, h0_stack,
                                           batch_tile, io_bytes)
    t, b, n, np_, tb, g, j = dims
    m = a_ops.shape[0]
    h = h0_stack.shape[-1]
    d = x_seq.shape[-1]
    ll = n_layers
    rows = tb * np_
    f2 = force.reshape(t, 1).astype(jnp.float32)

    wspec = lambda r_, c_: pl.BlockSpec((r_, c_), lambda i, jj: (0, 0),
                                        memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _fwd_kernel_dec, m=m, np_=np_, tb=tb, j=j, h_units=h, d_out=d,
        n_layers=ll, activation=activation, shared=shared)
    proj, in0, h_seq, ru_seq, c_seq = pl.pallas_call(
        kernel,
        grid=(g, t),
        in_specs=[
            _a_spec(shared, m, np_, tb, j),
            wspec(m * d, 2 * h), wspec(m * d, h),
            wspec(m * h, 2 * h), wspec(m * h, h),
            wspec(1, 2 * h), wspec(1, h),
            wspec(m * h, 2 * h), wspec(m * h, h),
            wspec(m * h, 2 * h), wspec(m * h, h),
            wspec(1, 2 * h), wspec(1, h),
            wspec(h, d), wspec(1, d),
            pl.BlockSpec((1, rows, ll * h), lambda i, jj: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, d), lambda i, jj: (jj, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), lambda i, jj: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, d), lambda i, jj: (jj, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, d), lambda i, jj: (jj, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, ll * h), lambda i, jj: (jj, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, ll * 2 * h), lambda i, jj: (jj, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, ll * h), lambda i, jj: (jj, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, g * rows, d), residual_dtype),
            jax.ShapeDtypeStruct((t, g * rows, d), residual_dtype),
            jax.ShapeDtypeStruct((t, g * rows, ll * h), residual_dtype),
            jax.ShapeDtypeStruct((t, g * rows, ll * 2 * h),
                                 residual_dtype),
            jax.ShapeDtypeStruct((t, g * rows, ll * h), residual_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, ll * h), jnp.float32),   # h stack
            pltpu.VMEM((rows, d), jnp.float32),        # feedback input
            pltpu.VMEM((rows, m * h), jnp.float32),
            pltpu.VMEM((rows, m * max(d, h)), jnp.float32),
        ],
        interpret=interpret,
    )(a_c, wx0g, wx0c, wh0g, wh0c, b0g.reshape(1, -1), b0c.reshape(1, -1),
      wxsg, wxsc, whsg, whsc, bsg.reshape(1, -1), bsc.reshape(1, -1),
      wp, bp.reshape(1, -1), h0f, xs.astype(residual_dtype), f2)

    proj_out = proj.reshape(t, g * tb, np_, d)[:, :b, :n]
    return proj_out, (a_c, h0f, h_seq, ru_seq, c_seq, in0, f2, shared,
                      dims)


def _backward_dec(a_c, wx0g, wx0c, wh0g, wh0c, wxsg, wxsc, whsg, whsc,
                  wp, h0f, h_seq, ru_seq, c_seq, in0, f2, d_seq_flat,
                  n_layers, activation, interpret, shared, dims,
                  residual_dtype=jnp.float32):
    t, b, n, np_, tb, g, j = dims
    h = wh0g.shape[1] // 2  # wh0g is (M*H, 2H)
    m = wh0g.shape[0] // h
    d = wp.shape[1]
    ll = n_layers
    rows = tb * np_

    h_prev = jnp.concatenate(
        [h0f.reshape(1, g * rows, ll * h).astype(h_seq.dtype),
         h_seq[:-1]], axis=0)

    rev = lambda i, jj: (t - 1 - jj, i, 0)
    wspec = lambda r_, c_: pl.BlockSpec((r_, c_), lambda i, jj: (0, 0),
                                        memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _bwd_kernel_dec, m=m, np_=np_, tb=tb, j=j, h_units=h, d_out=d,
        n_layers=ll, activation=activation, t_total=t, shared=shared)
    outs = pl.pallas_call(
        kernel,
        grid=(g, t),
        in_specs=[
            _a_spec(shared, m, np_, tb, j),
            wspec(m * d, 2 * h), wspec(m * d, h),
            wspec(m * h, 2 * h), wspec(m * h, h),
            wspec(m * h, 2 * h), wspec(m * h, h),
            wspec(m * h, 2 * h), wspec(m * h, h),
            wspec(h, d),
            pl.BlockSpec((1, rows, ll * h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, ll * h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, ll * 2 * h), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, ll * h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, d), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, d), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), lambda i, jj: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, d), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, ll * h), lambda i, jj: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec(m * d, 2 * h), wspec(m * d, h),
            wspec(m * h, 2 * h), wspec(m * h, h),
            wspec(1, 2 * h), wspec(1, h),
            wspec(m * h, 2 * h), wspec(m * h, h),
            wspec(m * h, 2 * h), wspec(m * h, h),
            wspec(1, 2 * h), wspec(1, h),
            wspec(h, d), wspec(1, d),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, g * rows, d), residual_dtype),
            jax.ShapeDtypeStruct((g, rows, ll * h), jnp.float32),
            jax.ShapeDtypeStruct((m * d, 2 * h), jnp.float32),
            jax.ShapeDtypeStruct((m * d, h), jnp.float32),
            jax.ShapeDtypeStruct((m * h, 2 * h), jnp.float32),
            jax.ShapeDtypeStruct((m * h, h), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((m * h, 2 * h), jnp.float32),
            jax.ShapeDtypeStruct((m * h, h), jnp.float32),
            jax.ShapeDtypeStruct((m * h, 2 * h), jnp.float32),
            jax.ShapeDtypeStruct((m * h, h), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((h, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, ll * h), jnp.float32),   # dh carry stack
            pltpu.VMEM((rows, d), jnp.float32),        # din0 carry
            pltpu.VMEM((rows, m * h), jnp.float32),    # hfeats
            pltpu.VMEM((rows, m * h), jnp.float32),    # rfeats
            pltpu.VMEM((rows, m * max(d, h)), jnp.float32),  # xfeats
            pltpu.VMEM((tb // j, m * j * np_, h + max(d, h)),
                       jnp.float32),                   # dy slabs
            pltpu.VMEM((rows, h + max(d, h)), jnp.float32),  # A^T out
        ],
        interpret=interpret,
    )(a_c, wx0g, wx0c, wh0g, wh0c, wxsg, wxsc, whsg, whsc, wp,
      h_prev, h_seq, ru_seq, c_seq, in0, d_seq_flat, f2)

    (dx, dh0, dwx0g, dwx0c, dwh0g, dwh0c, db0g, db0c, dwxsg, dwxsc,
     dwhsg, dwhsc, dbsg, dbsc, dwp, dbp) = outs
    dx = dx.reshape(t, g * tb, np_, d)[:, :b, :n]
    dh0 = dh0.reshape(g * tb, np_, ll * h)[:b, :n]
    # (B, N, L*H) -> (L, B, N, H)
    dh0 = jnp.moveaxis(
        dh0.reshape(b, n, ll, h), 2, 0)
    return (dx, dh0, dwx0g, dwx0c, dwh0g, dwh0c, db0g.reshape(-1),
            db0c.reshape(-1), dwxsg, dwxsc, dwhsg, dwhsc,
            dbsg.reshape(-1), dbsc.reshape(-1), dwp, dbp.reshape(-1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(18, 19, 20, 21, 22))
def dcgru_decoder_pallas(a_ops, x_seq, force, wx0g, wx0c, wh0g, wh0c,
                         b0g, b0c, wxsg, wxsc, whsg, whsc, bsg, bsc,
                         wp, bp, h0_stack,
                         num_layers: int = 2, activation: str = "tanh",
                         batch_tile: int = 16, interpret: bool = False,
                         residual_dtype: str = "float32"):
    """Whole-sequence DCGRU seq2seq decoder as two Pallas kernels.

    Args:
        a_ops: (M, B_or_1, N, N) Chebyshev operator stack (no gradient).
        x_seq: (T_out, B, N, D) teacher-forcing ground-truth stream.
        force: (T_out,) {0, 1} float per-step scalar force indicators
            (precomputed OUTSIDE from the rng — see
            ``models/dcgru.decoder_apply``; no gradient).
        wx0g/wx0c: (M*D, 2H)/(M*D, H) m-major layer-0 input weights;
        wh0g/wh0c: (M*H, 2H)/(M*H, H) m-major layer-0 hidden weights;
        b0g/b0c: layer-0 biases; wxsg..bsc: the SHARED cell (layers >= 1
            — pass zeros when num_layers == 1; their grads return zero).
        wp: (H, D) projection (``proj_w.T``); bp: (D,).
        h0_stack: (L, B, N, H) encoder final states.

    Returns:
        (T_out, B, N, D) projected predictions.

    Parity: identical math to the ``lax.scan`` path in
    ``models/dcgru.decoder_apply`` (reference ``DCGRUDecoder.forward``,
    model.py:149-204) given the same ``force`` vector; gradients are the
    hand-derived BPTT including the tied-shared-weight accumulation.
    """
    proj, _ = _forward_dec(a_ops, x_seq, force, wx0g, wx0c, wh0g, wh0c,
                           b0g, b0c, wxsg, wxsc, whsg, whsc, bsg, bsc,
                           wp, bp, h0_stack, num_layers, activation,
                           batch_tile, interpret,
                           jnp.dtype(residual_dtype))
    return proj


def _vjp_fwd_dec(a_ops, x_seq, force, wx0g, wx0c, wh0g, wh0c, b0g, b0c,
                 wxsg, wxsc, whsg, whsc, bsg, bsc, wp, bp, h0_stack,
                 num_layers, activation, batch_tile, interpret,
                 residual_dtype):
    proj, (a_c, h0f, h_seq, ru_seq, c_seq, in0, f2, shared, dims) = \
        _forward_dec(a_ops, x_seq, force, wx0g, wx0c, wh0g, wh0c, b0g,
                     b0c, wxsg, wxsc, whsg, whsc, bsg, bsc, wp, bp,
                     h0_stack, num_layers, activation, batch_tile,
                     interpret, jnp.dtype(residual_dtype))
    # dtype/shape carriers ride as zero-size arrays (residual leaves must
    # be JAX types, not dtype objects)
    res = (a_c, wx0g, wx0c, wh0g, wh0c, wxsg, wxsc, whsg, whsc, wp,
           h0f, h_seq, ru_seq, c_seq, in0, f2, shared, dims,
           jnp.zeros((0,), x_seq.dtype), jnp.zeros((0,) + a_ops.shape),
           jnp.zeros((0,), h0_stack.dtype))
    return proj, res


def _vjp_bwd_dec(num_layers, activation, batch_tile, interpret,
                 residual_dtype, res, d_proj):
    (a_c, wx0g, wx0c, wh0g, wh0c, wxsg, wxsc, whsg, whsc, wp, h0f,
     h_seq, ru_seq, c_seq, in0, f2, shared, dims, x_proto, a_proto,
     h0_proto) = res
    x_dtype, h0_dtype = x_proto.dtype, h0_proto.dtype
    a_shape = a_proto.shape[1:]
    t, b, n, np_, tb, g, j = dims
    rows = tb * np_
    d = wp.shape[1]

    d_pad = _pad_axis(_pad_axis(d_proj, 1, g * tb), 2, np_)
    d_flat = d_pad.reshape(t, g * rows, d).astype(jnp.dtype(residual_dtype))

    (dx, dh0, dwx0g, dwx0c, dwh0g, dwh0c, db0g, db0c, dwxsg, dwxsc,
     dwhsg, dwhsc, dbsg, dbsc, dwp, dbp) = _backward_dec(
        a_c, wx0g, wx0c, wh0g, wh0c, wxsg, wxsc, whsg, whsc, wp, h0f,
        h_seq, ru_seq, c_seq, in0, f2, d_flat, num_layers, activation,
        interpret, shared, dims, jnp.dtype(residual_dtype))

    da = jnp.zeros(a_shape, jnp.float32)
    dforce = jnp.zeros((t,), jnp.float32)
    return (da, dx.astype(x_dtype), dforce, dwx0g, dwx0c, dwh0g, dwh0c,
            db0g, db0c, dwxsg, dwxsc, dwhsg, dwhsc, dbsg, dbsc, dwp,
            dbp, dh0.astype(h0_dtype))


dcgru_decoder_pallas.defvjp(_vjp_fwd_dec, _vjp_bwd_dec)
