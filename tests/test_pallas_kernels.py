"""Pallas fused diffusion-conv kernel vs the XLA reference path.

Runs in interpreter mode on CPU (numerics identical to compiled Mosaic);
the TPU-compiled path is exercised by bench.py on hardware.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from eeg_gnn_tpu.ops.diffusion import diffusion_conv
from eeg_gnn_tpu.ops.pallas_kernels import fused_diffusion_conv, rearrange_weight


@pytest.mark.parametrize("s,k,d,o,b", [
    (1, 2, 164, 128, 8),    # laplacian gate (paper config)
    (2, 2, 164, 64, 8),     # dual_random_walk candidate
    (1, 1, 36, 16, 5),      # tiny, batch not divisible by tile
    (2, 3, 20, 24, 4),      # deeper diffusion
])
def test_fused_matches_xla(rng, s, k, d, o, b):
    n = 19
    m = s * k + 1
    sup = rng.randn(s, b, n, n).astype(np.float32) * 0.3
    x = rng.randn(b, n, d).astype(np.float32)
    w = rng.randn(d * m, o).astype(np.float32) * 0.05
    bias = rng.randn(o).astype(np.float32)

    ref = np.asarray(diffusion_conv(jnp.asarray(sup), jnp.asarray(x),
                                    jnp.asarray(w), jnp.asarray(bias), k))
    w_r = rearrange_weight(jnp.asarray(w), d, m)
    out = np.asarray(fused_diffusion_conv(
        jnp.asarray(sup), jnp.asarray(x), w_r, jnp.asarray(bias), k,
        batch_tile=4, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_rearrange_weight_layout(rng):
    d, m, o = 5, 3, 4
    w = rng.randn(d * m, o).astype(np.float32)
    w_r = np.asarray(rearrange_weight(jnp.asarray(w), d, m))
    for di in range(d):
        for mi in range(m):
            np.testing.assert_array_equal(w_r[mi, di], w[di * m + mi])


def test_fused_kernel_gradients_match_xla(rng):
    """Custom VJP: grads through the fused kernel equal the XLA path's."""
    import jax

    s, k, d, o, b, n = 1, 2, 12, 8, 4, 19
    m = s * k + 1
    sup = jnp.asarray(rng.randn(s, b, n, n).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    w = jnp.asarray(rng.randn(d * m, o).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(o).astype(np.float32))
    w_r = rearrange_weight(w, d, m)

    def loss_pl(x_, w_r_, b_):
        out = fused_diffusion_conv(sup, x_, w_r_, b_, k, batch_tile=4,
                                   interpret=True)
        return jnp.sum(out ** 2)

    def loss_xla(x_, w_, b_):
        return jnp.sum(diffusion_conv(sup, x_, w_, b_, k) ** 2)

    gx_p, gw_p, gb_p = jax.grad(loss_pl, argnums=(0, 1, 2))(x, w_r, bias)
    gx_x, gw_x, gb_x = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w, bias)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_x), rtol=1e-4,
                               atol=1e-4)
    # weight grad comes back in (M, D, O) layout
    np.testing.assert_allclose(
        np.asarray(rearrange_weight(gw_x, d, m)), np.asarray(gw_p),
        rtol=1e-4, atol=1e-4)
