"""Diffusion graph convolution primitives.

The heart of the DCRNN model family: K-step Chebyshev-style diffusion over
graph supports followed by a dense feature transform (reference
``model/cell.py:17-118``).

TPU-native design notes:

- Supports are applied with broadcasted ``jnp.matmul`` so the same code path
  handles a shared (N, N) support, per-sample (B, N, N) supports, and extra
  leading time axes — XLA lowers all of them to batched MXU matmuls.
- The stacked diffusion features keep the reference's exact memory layout
  (feature-major, diffusion-order-minor) so reference checkpoints load
  unchanged: row ``d*M + m`` of the weight corresponds to input feature
  ``d`` diffused by matrix ``m``.
- Because matmul distributes over feature concatenation, callers can diffuse
  the input block and the hidden block separately (and hoist the
  input-dependent work out of the temporal scan) with identical numerics —
  see ``models/dcgru.py``.
"""

from __future__ import annotations

import jax.numpy as jnp


def chebyshev_diffusion(supports, x, max_diffusion_step: int):
    """Stack K-step diffusion features.

    Args:
        supports: (S, ..., N, N) stacked support matrices; leading batch dims
            (after S) must broadcast against x's batch dims.
        x: (..., N, D) node features.
        max_diffusion_step: K; 0 returns just the identity feature.

    Returns:
        (..., N, D, M) with M = S*K + 1. Matrix order matches the reference
        concat order (``cell.py:76-96``): [identity, s0@1..s0@K, s1@1..s1@K].

    QUIRK reproduced deliberately (cell.py:83-93): the reference's
    ``x1, x0 = x2, x1`` rebinding is NOT reset between supports, so with
    multiple supports and K >= 2 the second support's recurrence seeds from
    the first support's leftover diffusion state instead of the original
    features (e.g. for dual_random_walk K=2 the stacked terms are
    [x, S0 x, 2 S0^2 x - x, S1 S0 x, 2 S1^2 S0 x - S0 x]). The shipped
    correlation-graph checkpoints are trained under this recurrence, so we
    transcribe the exact state carry-over.
    """
    feats = [x]
    if max_diffusion_step > 0:
        x0_, x1_ = x, None
        for s in supports:
            x1_ = jnp.matmul(s, x0_)
            feats.append(x1_)
            for _ in range(2, max_diffusion_step + 1):
                x2 = 2.0 * jnp.matmul(s, x1_) - x0_
                feats.append(x2)
                x1_, x0_ = x2, x1_
    return jnp.stack(feats, axis=-1)


def diffusion_conv(supports, x, weight, bias, max_diffusion_step: int):
    """Full diffusion graph convolution: diffuse -> flatten -> GEMM + bias.

    Args:
        supports: (S, ..., N, N) stacked supports.
        x: (..., N, D) node features (already the concat [inputs, state] if
            used as a DCGRU gate transform).
        weight: (D*M, out) in reference layout (row = d*M + m).
        bias: (out,).

    Returns:
        (..., N, out).

    Parity: reference ``DiffusionGraphConv.forward`` (model/cell.py:66-118),
    which reshapes to feature-major/matrix-minor before its GEMM.
    """
    stacked = chebyshev_diffusion(supports, x, max_diffusion_step)
    flat = stacked.reshape(*stacked.shape[:-2], -1)  # (..., N, D*M), d-major
    return jnp.matmul(flat, weight) + bias
