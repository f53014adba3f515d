"""Pallas TPU kernels for the diffusion-convolution hot path.

``fused_diffusion_conv`` computes the whole diffusion graph convolution —
Chebyshev recurrence over per-clip supports, feature stacking, and the
(D*M, O) output GEMM — in one kernel. Versus the XLA path
(``ops/diffusion.py``), the stacked diffusion features (B, N, D*M) never
round-trip through HBM: each Chebyshev term is consumed by its weight block
immediately in VMEM, and the MXU sees (TB*N, D) x (D, O) GEMM tiles.

Weight layout: the reference-layout (D*M, O) weight is rearranged once on
the host to (M, D, O) (``rearrange_weight``) so each diffusion order's
weight block is contiguous. Numerics match ``diffusion_conv`` exactly,
including the cross-support Chebyshev state carry-over quirk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def rearrange_weight(w, input_dim: int, num_matrices: int):
    """(D*M, O) reference-layout weight (row = d*M + m) -> (M, D, O)."""
    d, m = input_dim, num_matrices
    return jnp.transpose(w.reshape(d, m, -1), (1, 0, 2))


def _kernel(sup_ref, x_ref, w_ref, b_ref, out_ref, *, num_supports: int,
            max_diffusion_step: int):
    """One batch tile: supports (S, TB, N, N), x (TB, N, D), w (M, D, O)."""
    x0 = x_ref[:]  # (TB, N, D)
    tb, n, d = x0.shape
    o = w_ref.shape[-1]

    def mm(feats, w_m):
        # (TB*N, D) @ (D, O) on the MXU
        return jnp.dot(feats.reshape(tb * n, d), w_m,
                       preferred_element_type=jnp.float32)

    def smul(s, v):
        # batched (TB, N, N) @ (TB, N, D)
        return jax.lax.dot_general(
            s, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    acc = mm(x0, w_ref[0])
    m_idx = 1
    # Chebyshev recurrence with the reference's cross-support state
    # carry-over (see ops/diffusion.py QUIRK note).
    xk0, xk1 = x0, None
    for s_i in range(num_supports):
        sup = sup_ref[s_i]  # (TB, N, N)
        xk1 = smul(sup, xk0)
        acc = acc + mm(xk1, w_ref[m_idx])
        m_idx += 1
        for _ in range(2, max_diffusion_step + 1):
            x2 = 2.0 * smul(sup, xk1) - xk0
            acc = acc + mm(x2, w_ref[m_idx])
            m_idx += 1
            xk1, xk0 = x2, xk1

    out_ref[:] = acc.reshape(tb, n, o) + b_ref[0]


def _fused_forward(supports, x, w_mdo, bias, max_diffusion_step: int,
                   batch_tile: int, interpret: bool):
    s, b, n, _ = supports.shape
    m, d, o = w_mdo.shape
    tb = min(batch_tile, b)
    pad = (-b) % tb
    if pad:
        supports = jnp.pad(supports, ((0, 0), (0, pad), (0, 0), (0, 0)))
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    bp = b + pad

    kernel = functools.partial(_kernel, num_supports=s,
                               max_diffusion_step=max_diffusion_step)
    out = pl.pallas_call(
        kernel,
        grid=(bp // tb,),
        in_specs=[
            pl.BlockSpec((s, tb, n, n), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d, o), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, n, o), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n, o), jnp.float32),
        interpret=interpret,
    )(supports, x, w_mdo, bias.reshape(1, -1))
    return out[:b]


def _restore_weight(w_mdo):
    """(M, D, O) -> reference (D*M, O) layout (inverse of rearrange_weight)."""
    m, d, o = w_mdo.shape
    return jnp.transpose(w_mdo, (1, 0, 2)).reshape(d * m, o)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused(supports, x, w_mdo, bias, max_diffusion_step, batch_tile,
           interpret):
    return _fused_forward(supports, x, w_mdo, bias, max_diffusion_step,
                          batch_tile, interpret)


def _fused_fwd(supports, x, w_mdo, bias, max_diffusion_step, batch_tile,
               interpret):
    out = _fused_forward(supports, x, w_mdo, bias, max_diffusion_step,
                         batch_tile, interpret)
    return out, (supports, x, w_mdo, bias)


def _fused_bwd(max_diffusion_step, batch_tile, interpret, residuals, g):
    """Backward via the XLA diffusion-conv transpose (numerically identical
    forward; XLA generates the adjoint, including the cross-support
    Chebyshev carry-over's non-trivial transpose)."""
    from eeg_gnn_tpu.ops.diffusion import diffusion_conv

    supports, x, w_mdo, bias = residuals

    def ref(s_, x_, w_, b_):
        return diffusion_conv(s_, x_, _restore_weight(w_), b_,
                              max_diffusion_step)

    _, vjp = jax.vjp(ref, supports, x, w_mdo, bias)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_diffusion_conv(supports, x, w_mdo, bias, max_diffusion_step: int,
                         batch_tile: int = 16, interpret: bool = False):
    """Fused diffusion conv via Pallas (differentiable).

    Args:
        supports: (S, B, N, N) per-clip stacked supports.
        x: (B, N, D) node features.
        w_mdo: (M, D, O) weight from :func:`rearrange_weight`.
        bias: (O,).
        batch_tile: clips per kernel program (B is padded up internally).

    Returns:
        (B, N, O), numerically equal to ``ops.diffusion.diffusion_conv``.
        Reverse-mode AD is supported via a custom VJP whose backward runs
        the XLA adjoint of the identical computation.
    """
    return _fused(supports, x, w_mdo, bias, max_diffusion_step, batch_tile,
                  interpret)
