"""Pallas fused bilinear pooling vs the XLA reference implementation
(interpret mode on CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from hawkeye_tpu.ops.bilinear import bilinear_pool
from hawkeye_tpu.ops.pallas_bilinear import bilinear_pool_fused, gram_signed_sqrt


def test_forward_matches_xla():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 4, 256), jnp.float32)
    got = np.asarray(bilinear_pool_fused(x))
    want = np.asarray(bilinear_pool(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_forward_tiled_channels():
    # C=512 triggers the 256-wide tiling path (2x2 tile grid)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 2, 2, 512), jnp.float32)
    got = np.asarray(gram_signed_sqrt(x.reshape(1, 4, 512)))
    flat = np.asarray(x).reshape(4, 512)
    g = flat.T @ flat / 4.0
    want = np.sign(g) * np.sqrt(np.abs(g) + 1e-5)
    np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-5)


def test_custom_vjp_matches_autodiff():
    x = jnp.asarray(np.random.RandomState(2).rand(2, 3, 3, 256), jnp.float32)

    def f_fused(x):
        return (bilinear_pool_fused(x) ** 2).sum()

    def f_ref(x):
        return (bilinear_pool(x) ** 2).sum()

    g1 = np.asarray(jax.grad(f_fused)(x))
    g2 = np.asarray(jax.grad(f_ref)(x))
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-6)
