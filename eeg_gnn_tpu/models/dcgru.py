"""DCGRU: Diffusion-Convolutional GRU cell, encoder and decoder.

Reference semantics: ``model/cell.py:121-225`` (cell), ``model/model.py:48-109``
(encoder), ``model/model.py:112-204`` (decoder). Re-designed for TPU:

- The encoder runs each layer as a ``lax.scan`` over time instead of a
  Python double loop (reference hot loop #1, SURVEY.md §3.6).
- The input-dependent ~60% of each cell's FLOPs (diffusing the layer input
  and projecting it through the input rows of the gate/candidate weights)
  does not depend on the recurrent state, so it is hoisted out of the scan
  and executed as one large batched GEMM over all timesteps — big
  MXU-friendly matmuls outside, only the small state-dependent matmuls
  inside the sequential scan. Numerics are identical (matmul distributes
  over the [inputs, state] feature concat).
- The decoder keeps the reference's per-step feedback (inherently
  sequential) as a ``lax.scan`` whose step runs all layers, with scheduled
  sampling driven by per-step PRNG splits instead of Python ``random``.

Parameter layout matches reference checkpoints exactly (weight row
``d*M + m``; see ``ops/diffusion.py``), including the decoder quirk that
layers >= 1 share one set of cell weights (reference model.py:126-143).

Reference init quirk, reproduced deliberately: ``DiffusionGraphConv`` is
always constructed with the default ``bias_start=0.0`` — the ``bias_start=1.0``
passed by ``DCGRUCell.forward`` (cell.py:197) is an unused argument of the
*forward* method, so gate biases really init to zero.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from eeg_gnn_tpu.ops.diffusion import chebyshev_diffusion


@dataclasses.dataclass(frozen=True)
class DCGRUConfig:
    """Static configuration of a DCGRU cell."""

    input_dim: int
    num_units: int
    max_diffusion_step: int
    num_nodes: int
    num_supports: int
    activation: str = "tanh"  # 'tanh' | 'relu' | 'linear'
    use_pallas: bool = False  # fused Pallas kernel for in-scan diffusion
    scan_unroll: int = 1      # lax.scan unroll factor (amortizes loop overhead)
    compute_dtype: str = "float32"  # 'bfloat16' runs the hoisted GEMMs on
    # the MXU in bf16 with f32 accumulation (params/state stay f32)
    recurrence: str = "pallas"  # 'naive': per-step chebyshev_diffusion with
    # XLA auto-adjoint; 'stacked': precomputed Chebyshev operator stack with
    # hand-written BPTT (ops/recurrent.py) — fewer/larger ops per scan step;
    # 'pallas': whole-sequence Mosaic kernels (ops/pallas_recurrent.py),
    # TPU only — silently falls back to 'stacked' on other backends
    batch_tile: int = 32  # clips per grid step in the whole-sequence Pallas
    # kernels (measured best; auto-clamped to the VMEM budget and rounded to
    # a group multiple in ops/pallas_recurrent._prep)
    input_fusion: bool = False  # run the INPUT diffusion + projection
    # inside the Pallas kernels too (dcgru_layer_recurrence_pallas_xin):
    # no externally materialized x_proj. Perf-experimental knob; numerics
    # match the hoisted path (interpreter + on-chip parity gated).

    @property
    def num_matrices(self) -> int:
        return self.num_supports * self.max_diffusion_step + 1


def _activation_fn(name: Optional[str]):
    if name in (None, "tanh"):
        return jnp.tanh
    if name == "relu":
        return jax.nn.relu
    if name == "linear":
        return lambda x: x
    raise ValueError(f"unknown activation {name!r}")


def xavier_normal(key, shape, gain: float, dtype=jnp.float32):
    """Xavier-normal init, matching ``nn.init.xavier_normal_`` semantics
    (reference cell.py:47: gain=1.414)."""
    fan_in, fan_out = shape[0], shape[1]
    std = gain * (2.0 / (fan_in + fan_out)) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


def init_dcgru_cell(key, cfg: DCGRUConfig, dtype=jnp.float32) -> Dict[str, Any]:
    """Init one cell's params in reference layout (cell.py:40-48)."""
    d_total = cfg.input_dim + cfg.num_units
    m = cfg.num_matrices
    k_gate, k_cand = jax.random.split(key)
    return {
        "gate_w": xavier_normal(k_gate, (d_total * m, 2 * cfg.num_units), 1.414, dtype),
        "gate_b": jnp.zeros((2 * cfg.num_units,), dtype),
        "cand_w": xavier_normal(k_cand, (d_total * m, cfg.num_units), 1.414, dtype),
        "cand_b": jnp.zeros((cfg.num_units,), dtype),
    }


def _split_weight(cfg: DCGRUConfig, w):
    """Split a (D_total*M, out) weight into input rows / hidden rows.

    Rows are ordered (d, m) with d-major over the concat [inputs, state], so
    the first ``input_dim*M`` rows consume diffused inputs and the rest
    consume the diffused state. Static slices — free under XLA.
    """
    cut = cfg.input_dim * cfg.num_matrices
    return w[:cut], w[cut:]


def _flat(stacked):
    """(..., N, D, M) -> (..., N, D*M) in reference d-major layout."""
    return stacked.reshape(*stacked.shape[:-2], -1)


def dcgru_cell_apply(cfg: DCGRUConfig, params, supports, x, h):
    """One DCGRU step with full reference semantics (cell.py:182-210).

    Args:
        supports: (S, ..., N, N); x: (..., N, input_dim); h: (..., N, num_units).

    Returns:
        new hidden state (..., N, num_units) — the reference returns
        (output, new_state) but they are the same tensor.
    """
    act = _activation_fn(cfg.activation)
    h_units = cfg.num_units

    xh = jnp.concatenate([x, h], axis=-1)
    xh_feat = _flat(chebyshev_diffusion(supports, xh, cfg.max_diffusion_step))

    ru = jax.nn.sigmoid(jnp.matmul(xh_feat, params["gate_w"]) + params["gate_b"])
    r, u = ru[..., :h_units], ru[..., h_units:]

    xrh = jnp.concatenate([x, r * h], axis=-1)
    xrh_feat = _flat(chebyshev_diffusion(supports, xrh, cfg.max_diffusion_step))
    c = act(jnp.matmul(xrh_feat, params["cand_w"]) + params["cand_b"])

    return u * h + (1.0 - u) * c


def dcgru_cell_apply_ops(cfg: DCGRUConfig, w_gate_r, w_cand_r, gate_b,
                         cand_b, a_ops, x, h):
    """One DCGRU step on a precomputed Chebyshev operator stack.

    Same math as :func:`dcgru_cell_apply` up to float associativity
    (operators composed before application; see ``ops/recurrent.py``), but
    each diffusion is ONE batched matmul instead of re-running the K-step
    Chebyshev recurrence — this is the fast path for the decoder scan where
    the data-dependent feedback (reference model.py:182-202, hot loop #3)
    prevents hoisting the input projection out of the loop.

    Args:
        w_gate_r / w_cand_r: (M, D_total, 2H/H) rearranged weights
            (:func:`eeg_gnn_tpu.ops.recurrent.rearrange_hidden_weight` on the
            full (D_total*M, O) reference-layout weight).
        a_ops: (M, B_or_1, N, N) operator stack
            (:func:`eeg_gnn_tpu.ops.recurrent.chebyshev_operators`).
    """
    from eeg_gnn_tpu.ops.recurrent import _apply_ops, _contract_w

    act = _activation_fn(cfg.activation)
    h_units = cfg.num_units

    xh = jnp.concatenate([x, h], axis=-1)
    ru = jax.nn.sigmoid(_contract_w(_apply_ops(a_ops, xh), w_gate_r) + gate_b)
    r, u = ru[..., :h_units], ru[..., h_units:]

    xrh = jnp.concatenate([x, r * h], axis=-1)
    c = act(_contract_w(_apply_ops(a_ops, xrh), w_cand_r) + cand_b)

    return u * h + (1.0 - u) * c


def _layer_scan(cfg: DCGRUConfig, params, supports, x_seq, h0):
    """Scan one DCGRU layer over time with the input work hoisted out.

    Args:
        x_seq: (T, B, N, input_dim) layer input sequence.
        h0: (B, N, num_units) initial state.

    Returns:
        (h_last, h_seq) with h_seq (T, B, N, num_units).
    """
    act = _activation_fn(cfg.activation)
    h_units = cfg.num_units
    k = cfg.max_diffusion_step

    wx_gate, wh_gate = _split_weight(cfg, params["gate_w"])
    wx_cand, wh_cand = _split_weight(cfg, params["cand_w"])

    # Hoisted: diffuse inputs for all T at once and project to the fused
    # (..., 3H) gate|cand contribution as a SUM of per-term GEMMs,
    # sum_m (T_m x) @ W_m, instead of materializing the (..., D, M)
    # Chebyshev stack and one (Din*M, 3H) GEMM — the 5-D stack's
    # concatenate + layout copies (and their backward mirrors) cost
    # ~1 ms/step at the flagship shape (round-4 trace); the per-term sum
    # has identical f32-accumulated math with the same M matmul FLOPs.
    bf16 = cfg.compute_dtype == "bfloat16"
    wx = jnp.concatenate([wx_gate, wx_cand], axis=1)  # (Din*M, 3H)
    din = x_seq.shape[-1]
    m_total = cfg.num_matrices
    # weight rows are (d, m) d-major: W_m = rows d*M + m
    wx_terms = wx.reshape(din, m_total, -1)
    if bf16:
        # bf16 end to end through the hoisted path: the diffusion terms
        # materialize in bf16 and the FLOPs-dominant GEMMs run bf16 on the
        # MXU with f32 accumulation; x_proj then streams to the recurrence
        # in bf16.
        supports_c = supports.astype(jnp.bfloat16)
        x_c = x_seq.astype(jnp.bfloat16)
        wx_terms = wx_terms.astype(jnp.bfloat16)
    else:
        supports_c, x_c = supports, x_seq

    def term_gemm(feat, mi):
        return jnp.matmul(feat, wx_terms[:, mi],
                          preferred_element_type=jnp.float32)

    def compute_x_proj():
        # same term recurrence (and deliberate cross-support carry-over
        # quirk) as ops/diffusion.chebyshev_diffusion
        x_proj = term_gemm(x_c, 0)
        mi = 1
        if k > 0:
            x0_, x1_ = x_c, None
            for s in supports_c:
                x1_ = jnp.matmul(s, x0_)
                x_proj = x_proj + term_gemm(x1_, mi)
                mi += 1
                for _ in range(2, k + 1):
                    x2 = 2.0 * jnp.matmul(s, x1_) - x0_
                    x_proj = x_proj + term_gemm(x2, mi)
                    mi += 1
                    x1_, x0_ = x2, x1_
        if bf16:
            x_proj = x_proj.astype(jnp.bfloat16)
        return x_proj

    recurrence = cfg.recurrence
    if recurrence == "pallas" and jax.default_backend() != "tpu":
        recurrence = "stacked"  # same math; Mosaic kernels are TPU-only

    if recurrence in ("stacked", "pallas") and not cfg.use_pallas:
        from eeg_gnn_tpu.ops.recurrent import (
            chebyshev_operators,
            dcgru_layer_recurrence,
            rearrange_hidden_weight,
        )

        m = cfg.num_matrices
        a_ops = chebyshev_operators(
            supports.astype(jnp.float32) if bf16 else supports, k)
        if a_ops.ndim == 3:  # shared (N, N) graph: broadcast batch dim
            a_ops = a_ops[:, None]
        a_ops = jax.lax.stop_gradient(a_ops)
        wh_args = (
            rearrange_hidden_weight(wh_gate, h_units, m),
            rearrange_hidden_weight(wh_cand, h_units, m),
            params["gate_b"], params["cand_b"], h0,
        )
        if recurrence == "pallas" and getattr(cfg, "input_fusion", False):
            from eeg_gnn_tpu.ops.pallas_recurrent import (
                dcgru_layer_recurrence_pallas_xin,
            )

            # x-in-kernel: the RAW input streams into the kernel and the
            # input diffusion + projection run inside it — no externally
            # materialized x_proj at all (reference-layout (d, m)-major
            # input weights rearranged m-major for the packed in-kernel
            # dots)
            wxg_f = wx_gate.reshape(din, m_total, -1).transpose(
                1, 0, 2).reshape(m_total * din, -1)
            wxc_f = wx_cand.reshape(din, m_total, -1).transpose(
                1, 0, 2).reshape(m_total * din, -1)
            h_last, h_seq = dcgru_layer_recurrence_pallas_xin(
                a_ops, x_c, wxg_f, wxc_f, *wh_args, cfg.activation,
                cfg.batch_tile, False,
                "bfloat16" if bf16 else "float32")
        elif recurrence == "pallas":
            from eeg_gnn_tpu.ops.pallas_recurrent import (
                dcgru_layer_recurrence_pallas_fused,
            )

            # the fused (T,B,N,3H) x_proj streams straight into the kernel
            # (no gate/cand split; bf16 inputs + ru/c residuals at half
            # HBM); state and accumulation stay f32.
            h_last, h_seq = dcgru_layer_recurrence_pallas_fused(
                a_ops, compute_x_proj(), *wh_args, cfg.activation,
                cfg.batch_tile, False,
                "bfloat16" if bf16 else "float32")
        else:
            x_proj = compute_x_proj()
            gate_x = x_proj[..., : 2 * h_units].astype(jnp.float32)
            cand_x = x_proj[..., 2 * h_units:].astype(jnp.float32)
            h_last, h_seq = dcgru_layer_recurrence(
                a_ops, gate_x, cand_x, *wh_args, cfg.activation)
        return h_last, h_seq

    if cfg.use_pallas and supports.ndim == 4:
        # Fused Pallas path: diffusion + GEMM in one VMEM-resident kernel.
        from eeg_gnn_tpu.ops.pallas_kernels import (
            fused_diffusion_conv,
            rearrange_weight,
        )

        m = cfg.num_matrices
        wh_gate_r = rearrange_weight(wh_gate, cfg.num_units, m)
        wh_cand_r = rearrange_weight(wh_cand, cfg.num_units, m)

        def hidden_gate(h):
            return fused_diffusion_conv(supports, h, wh_gate_r,
                                        params["gate_b"], k)

        def hidden_cand(rh):
            return fused_diffusion_conv(supports, rh, wh_cand_r,
                                        params["cand_b"], k)
    else:
        def hidden_gate(h):
            h_feat = _flat(chebyshev_diffusion(supports, h, k))
            return jnp.matmul(h_feat, wh_gate) + params["gate_b"]

        def hidden_cand(rh):
            rh_feat = _flat(chebyshev_diffusion(supports, rh, k))
            return jnp.matmul(rh_feat, wh_cand) + params["cand_b"]

    x_proj = compute_x_proj()
    gate_x = x_proj[..., : 2 * h_units].astype(jnp.float32)
    cand_x = x_proj[..., 2 * h_units:].astype(jnp.float32)

    def step(h, inp):
        gx, cx = inp
        ru = jax.nn.sigmoid(gx + hidden_gate(h))
        r, u = ru[..., :h_units], ru[..., h_units:]
        c = act(cx + hidden_cand(r * h))
        h_new = u * h + (1.0 - u) * c
        return h_new, h_new

    h_last, h_seq = jax.lax.scan(step, h0, (gate_x, cand_x),
                                 unroll=cfg.scan_unroll)
    return h_last, h_seq


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encoder_configs(input_dim, num_units, max_diffusion_step, num_nodes,
                    num_supports, num_layers, activation="tanh",
                    use_pallas=False, scan_unroll=1,
                    compute_dtype="float32", recurrence="pallas",
                    batch_tile=32, input_fusion=False):
    """Per-layer cell configs: layer 0 consumes input_dim, the rest num_units
    (reference model.py:58-79)."""
    mk = lambda d: DCGRUConfig(d, num_units, max_diffusion_step, num_nodes,
                               num_supports, activation, use_pallas,
                               scan_unroll, compute_dtype, recurrence,
                               batch_tile, input_fusion)
    return [mk(input_dim)] + [mk(num_units)] * (num_layers - 1)


def encoder_init(key, cfgs, dtype=jnp.float32):
    keys = jax.random.split(key, len(cfgs))
    return [init_dcgru_cell(k, c, dtype) for k, c in zip(keys, cfgs)]


def encoder_apply(cfgs, params, supports, x_seq, h0=None):
    """Stacked DCGRU encoder over a full sequence.

    Args:
        cfgs: per-layer DCGRUConfig list.
        params: per-layer cell param list.
        supports: (S, ..., N, N).
        x_seq: (T, B, N, input_dim) — time-major like the reference's
            internal layout (model.py:81-102).
        h0: optional (L, B, N, num_units) initial states (zeros by default,
            reference cell.py:223-225).

    Returns:
        (hidden_stack, top_seq): (L, B, N, H) last state per layer and the
        top layer's full output sequence (T, B, N, H).
    """
    t, b, n, _ = x_seq.shape
    h_units = cfgs[0].num_units
    dtype = x_seq.dtype

    # Padded fast path: when the stack runs the whole-sequence Pallas
    # kernels, pad the node axis ONCE (19 -> 24) and keep every inter-layer
    # tensor in the kernel's padded layout — the per-layer pad/slice pairs
    # (and their backward mirrors) were ~20% of the measured train step.
    # Zero rows/cols on padded supports keep padded nodes fully decoupled,
    # so slicing the final outputs recovers the unpadded math exactly.
    n_orig = n
    np_ = -(-n // 8) * 8
    on_pallas = (cfgs[0].recurrence == "pallas"
                 and not cfgs[0].use_pallas
                 and jax.default_backend() == "tpu")
    padded = np_ != n and on_pallas
    if padded:
        x_seq = jnp.pad(x_seq, ((0, 0), (0, 0), (0, np_ - n), (0, 0)))
        pads = [(0, 0)] * (supports.ndim - 2) + [(0, np_ - n), (0, np_ - n)]
        supports = jnp.pad(supports, pads)
        if h0 is not None:
            h0 = jnp.pad(h0, ((0, 0), (0, 0), (0, np_ - n), (0, 0)))
        n = np_

    # Batch padding ONCE across the stack (round-5 trace finding): the
    # x-in-kernel wrappers pad the batch to a tile multiple and slice it
    # back per call, so between layers the full (T, B, Np, H) stream paid
    # a slice+pad HBM round-trip each direction (~0.4 ms/step at the
    # flagship shape, B=128 -> 144 at tile 36). Pad once here with the
    # SMALLEST tile any layer will choose (layer 0's input width differs
    # from the rest), pin every layer to that tile, and slice once at the
    # end — the kernels' inner pad/slice become no-ops. Padded rows
    # produce garbage activations that are never read and contribute
    # exactly zero gradient (see ops/pallas_recurrent.py module notes).
    b_orig = b
    batch_padded = False
    if on_pallas and getattr(cfgs[0], "input_fusion", False):
        from eeg_gnn_tpu.ops.pallas_recurrent import xin_tile_for

        m_total = cfgs[0].num_matrices
        shared_graph = supports.ndim == 3
        io_bytes = 2 if cfgs[0].compute_dtype == "bfloat16" else 4
        widths = {c.input_dim for c in cfgs}
        tb = min(xin_tile_for(cfgs[0].batch_tile, b, m_total, n_orig,
                              h_units, d, shared_graph, io_bytes)
                 for d in widths)
        bp = -(-b // tb) * tb
        if tb != cfgs[0].batch_tile or bp != b:
            cfgs = [dataclasses.replace(c, batch_tile=tb) for c in cfgs]
        if bp != b:
            batch_padded = True
            x_seq = jnp.pad(x_seq, ((0, 0), (0, bp - b), (0, 0), (0, 0)))
            if supports.ndim == 4:
                supports = jnp.pad(
                    supports, ((0, 0), (0, bp - b), (0, 0), (0, 0)))
            if h0 is not None:
                h0 = jnp.pad(h0, ((0, 0), (0, bp - b), (0, 0), (0, 0)))
            b = bp

    cur = x_seq
    lasts = []
    for i, (cfg, p) in enumerate(zip(cfgs, params)):
        # recurrent STATE is always f32 (the Pallas kernels accumulate in
        # f32 scratch even in bf16 mode); x may arrive bf16 — e.g. the
        # loader casts before H2D to halve transfer bytes — without
        # touching state precision
        h_init = (
            jnp.zeros((b, n, h_units), jnp.float32) if h0 is None else h0[i]
        )
        h_last, cur = _layer_scan(cfg, p, supports, cur, h_init)
        lasts.append(h_last)
    # last-state stack is tiny: keep it in the input dtype so downstream
    # consumers (SSL decoder state) see unchanged precision even when the
    # kernel streams h_seq in bf16
    stack = jnp.stack(lasts, axis=0).astype(dtype)
    if padded or batch_padded:
        stack = stack[:, :b_orig, :n_orig]
        cur = cur[:, :b_orig, :n_orig]
    return stack, cur


# ---------------------------------------------------------------------------
# Decoder (seq2seq with scheduled sampling)
# ---------------------------------------------------------------------------


def decoder_init(key, input_dim, num_units, max_diffusion_step, num_nodes,
                 num_supports, num_layers, output_dim, activation="tanh",
                 dtype=jnp.float32):
    """Decoder params. QUIRK reproduced: layers >= 1 share ONE cell
    (reference model.py:126-143) — stored once under 'shared'; gradients
    w.r.t. the shared leaf accumulate across layers automatically.

    The projection layer keeps torch ``nn.Linear`` layout: weight
    (output_dim, num_units), applied as ``x @ W.T + b``.
    """
    k0, ks, kp, kb = jax.random.split(key, 4)
    cfg0 = DCGRUConfig(input_dim, num_units, max_diffusion_step, num_nodes,
                       num_supports, activation)
    cfg_shared = DCGRUConfig(num_units, num_units, max_diffusion_step,
                             num_nodes, num_supports, activation)
    params = {"layer0": init_dcgru_cell(k0, cfg0, dtype)}
    if num_layers > 1:
        params["shared"] = init_dcgru_cell(ks, cfg_shared, dtype)
    # torch Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both.
    bound = 1.0 / (num_units ** 0.5)
    params["proj_w"] = jax.random.uniform(kp, (output_dim, num_units), dtype,
                                          -bound, bound)
    params["proj_b"] = jax.random.uniform(kb, (output_dim,), dtype, -bound, bound)
    return params, (cfg0, cfg_shared)


def decoder_apply(cfgs, params, supports, dec_inputs, h0_stack, num_layers,
                  *, teacher_forcing_ratio=None, dropout_rate=0.0,
                  rng=None, training=False):
    """Seq2seq DCGRU decoder with GO-symbol start and scheduled sampling.

    Args:
        cfgs: (cfg_layer0, cfg_shared) as returned by :func:`decoder_init`.
        dec_inputs: (T_out, B, N, output_dim) ground-truth sequence
            (teacher-forcing inputs), time-major.
        h0_stack: (L, B, N, H) encoder final hidden states.
        teacher_forcing_ratio: None disables sampling (eval semantics,
            reference model.py:198-202); otherwise the per-step probability
            of feeding ground truth.
        dropout_rate/rng/training: dropout before the projection layer
            (reference model.py:147,192).

    Returns:
        (T_out, B, N, output_dim) predictions.

    Parity: reference ``DCGRUDecoder.forward`` (model.py:149-204). The
    per-step Bernoulli draw uses JAX PRNG (statistically equivalent to the
    reference's Python ``random.random()``; exact stream parity is
    impossible and not required — golden tests run with forcing off).

    TPU fast path: on a TPU backend with ``cfg0.recurrence == 'pallas'``
    (and no active dropout — the one un-fused piece), the WHOLE decoder —
    all layers' cells, the projection, the feedback select — runs as two
    whole-sequence Pallas kernels (``ops/pallas_decoder.py``). The
    per-step force draws are precomputed from the SAME key stream the
    scan path uses, so both paths make the same teacher-forcing
    decisions for one rng (outputs match up to kernel-vs-XLA float
    associativity; parity-gated on chip).
    """
    from eeg_gnn_tpu.ops.recurrent import (
        chebyshev_operators,
        rearrange_hidden_weight,
    )

    cfg0, cfg_shared = cfgs
    t_out, b, n, out_dim = dec_inputs.shape
    h_units = cfg0.num_units
    use_tf = teacher_forcing_ratio is not None
    use_dropout = training and dropout_rate > 0.0
    if rng is None:
        rng = jax.random.PRNGKey(0)
    step_keys = jax.random.split(rng, t_out)
    # per-step scalar draws, hoisted out of the loop (identical stream to
    # the historical in-scan split: k_tf, k_drop = split(step_key))
    split_keys = jax.vmap(jax.random.split)(step_keys)  # (T, 2, key)
    tf_keys, drop_keys = split_keys[:, 0], split_keys[:, 1]
    if use_tf:
        draws = jax.vmap(lambda k: jax.random.uniform(k, ()))(tf_keys)
        force = (draws < teacher_forcing_ratio).astype(jnp.float32)
    else:
        force = jnp.zeros((t_out,), jnp.float32)

    proj_w_t = params["proj_w"].T  # (H, output_dim)

    # Hoist the Chebyshev operator composition out of the feedback loop
    # (reference hot loop #3, model.py:182-202): each in-scan diffusion is
    # then one batched matmul instead of a K-step recurrence.
    m = cfg0.num_matrices
    a_ops = chebyshev_operators(supports, cfg0.max_diffusion_step)
    if a_ops.ndim == 3:
        a_ops = a_ops[:, None]
    a_ops = jax.lax.stop_gradient(a_ops)

    recurrence = cfg0.recurrence
    if recurrence == "pallas" and jax.default_backend() != "tpu":
        recurrence = "stacked"  # Mosaic kernels are TPU-only
    if recurrence == "pallas" and not use_dropout:
        return _decoder_pallas(cfg0, cfg_shared, params, a_ops, dec_inputs,
                               force, h0_stack, num_layers, proj_w_t)

    def cell_weights(i):
        cfg_i = cfg0 if i == 0 else cfg_shared
        p_i = params["layer0"] if i == 0 else params["shared"]
        d_total = cfg_i.input_dim + cfg_i.num_units
        return (cfg_i,
                rearrange_hidden_weight(p_i["gate_w"], d_total, m),
                rearrange_hidden_weight(p_i["cand_w"], d_total, m),
                p_i["gate_b"], p_i["cand_b"])

    cells = [cell_weights(i) for i in range(num_layers)]

    # carry stays f32 (the cells keep state/accumulation in f32 even under
    # bf16 compute); bf16 dec_inputs (e.g. a bf16-storage HBM cache) would
    # otherwise mismatch the scan carry dtype
    go = jnp.zeros((b, n, out_dim), jnp.float32)

    def step(carry, inp):
        h_stack, cur = carry
        x_t, f_t, k_drop = inp
        new_h = []
        out = cur
        for i in range(num_layers):
            cfg_i, wg_r, wc_r, gb, cb = cells[i]
            h_i = dcgru_cell_apply_ops(cfg_i, wg_r, wc_r, gb, cb, a_ops,
                                       out, h_stack[i])
            out = h_i
            new_h.append(h_i)
        h_stack = jnp.stack(new_h, axis=0)

        pre = out  # (B, N, H)
        if use_dropout:
            keep = 1.0 - dropout_rate
            mask = jax.random.bernoulli(k_drop, keep, pre.shape)
            pre = jnp.where(mask, pre / keep, 0.0)
        projected = jnp.matmul(pre, proj_w_t) + params["proj_b"]  # (B,N,out_dim)

        nxt = jnp.where(f_t > 0, x_t, projected)
        return (h_stack, nxt), projected

    (_, _), outputs = jax.lax.scan(
        step, (h0_stack.astype(jnp.float32), go),
        (dec_inputs, force, drop_keys))
    return outputs


def _decoder_pallas(cfg0, cfg_shared, params, a_ops, dec_inputs, force,
                    h0_stack, num_layers, proj_w_t, interpret=False):
    """Dispatch to the whole-sequence Pallas decoder kernels: rearrange
    reference-layout cell weights to the kernels' m-major packing (input
    rows -> (M*D, O); hidden rows -> (M*H, O)) and pass zeros for the
    shared cell when num_layers == 1."""
    from eeg_gnn_tpu.ops.pallas_decoder import dcgru_decoder_pallas
    from eeg_gnn_tpu.ops.recurrent import rearrange_hidden_weight

    m = cfg0.num_matrices
    h = cfg0.num_units
    d = cfg0.input_dim  # decoder layer-0 input width == output_dim

    def split_mmajor(p_cell, d_in):
        cut = d_in * m
        wx_g = p_cell["gate_w"][:cut].reshape(d_in, m, -1)
        wx_c = p_cell["cand_w"][:cut].reshape(d_in, m, -1)
        wxg = wx_g.transpose(1, 0, 2).reshape(m * d_in, -1)
        wxc = wx_c.transpose(1, 0, 2).reshape(m * d_in, -1)
        whg = rearrange_hidden_weight(p_cell["gate_w"][cut:], h, m)
        whc = rearrange_hidden_weight(p_cell["cand_w"][cut:], h, m)
        return (wxg, wxc, whg.reshape(m * h, -1), whc.reshape(m * h, -1),
                p_cell["gate_b"], p_cell["cand_b"])

    wx0g, wx0c, wh0g, wh0c, b0g, b0c = split_mmajor(params["layer0"], d)
    if num_layers > 1:
        wxsg, wxsc, whsg, whsc, bsg, bsc = split_mmajor(params["shared"], h)
    else:
        wxsg = jnp.zeros((m * h, 2 * h), jnp.float32)
        wxsc = jnp.zeros((m * h, h), jnp.float32)
        whsg, whsc = wxsg, wxsc
        bsg = jnp.zeros((2 * h,), jnp.float32)
        bsc = jnp.zeros((h,), jnp.float32)

    rdt = ("bfloat16" if cfg0.compute_dtype == "bfloat16" else "float32")
    out = dcgru_decoder_pallas(
        a_ops, dec_inputs, force, wx0g, wx0c, wh0g, wh0c, b0g, b0c,
        wxsg, wxsc, whsg, whsc, bsg, bsc, proj_w_t, params["proj_b"],
        h0_stack.astype(jnp.float32), num_layers, cfg0.activation,
        cfg0.batch_tile, interpret, rdt)
    return out.astype(jnp.float32)
