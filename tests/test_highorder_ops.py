"""High-order pooling kernels vs small numpy oracles (SURVEY §4 item (a))."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg as sla

from hawkeye_tpu.ops import (
    bilinear_pool,
    compact_bilinear_pool,
    covariance_pool,
    make_sketch_matrix,
    mpn_cov_pool,
    newton_schulz_sqrt,
    triu_vec,
)


def test_bilinear_pool_oracle():
    rng = np.random.RandomState(0)
    x = rng.rand(2, 4, 5, 8).astype(np.float32)
    got = np.asarray(bilinear_pool(jnp.asarray(x)))
    for b in range(2):
        flat = x[b].reshape(20, 8)
        gram = flat.T @ flat / 20.0
        v = gram.reshape(-1)
        v = np.sign(v) * np.sqrt(np.abs(v) + 1e-5)
        v = v / np.linalg.norm(v)
        np.testing.assert_allclose(got[b], v, rtol=1e-4, atol=1e-5)


def test_bilinear_pool_grad_finite():
    x = jnp.ones((1, 3, 3, 4))
    g = jax.grad(lambda x: bilinear_pool(x).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


def test_count_sketch_properties():
    m = make_sketch_matrix(16, 32, seed_h=1, seed_s=3)
    assert m.shape == (16, 32)
    # exactly one nonzero per input row, values ±1
    nz = (m != 0).sum(axis=1)
    assert (nz == 1).all()
    assert set(np.unique(m[m != 0])) <= {-1.0, 1.0}
    # deterministic
    m2 = make_sketch_matrix(16, 32, seed_h=1, seed_s=3)
    np.testing.assert_array_equal(m, m2)


def test_cbp_approximates_bilinear_inner_product():
    """Count-sketch CBP preserves <vec(xx^T), vec(yy^T)> ≈ <x,y>² in
    expectation — check correlation on aggregate with a moderate d."""
    rng = np.random.RandomState(0)
    c, d = 32, 512
    s1 = jnp.asarray(make_sketch_matrix(c, d, 1, 3))
    s2 = jnp.asarray(make_sketch_matrix(c, d, 5, 7))
    x = rng.rand(4, 1, 1, c).astype(np.float32)
    v = np.asarray(compact_bilinear_pool(jnp.asarray(x), s1, s2,
                                         signed_sqrt=False, l2_normalize=False))
    # oracle: exact bilinear inner products
    exact = np.zeros((4, 4))
    approx = np.zeros((4, 4))
    for i in range(4):
        for j in range(4):
            exact[i, j] = (x[i].reshape(-1) @ x[j].reshape(-1)) ** 2
            approx[i, j] = v[i] @ v[j]
    corr = np.corrcoef(exact.reshape(-1), approx.reshape(-1))[0, 1]
    assert corr > 0.95, f"CBP inner products decorrelated: {corr}"


def test_cbp_shapes_and_norm():
    c, d = 8, 64
    s1 = jnp.asarray(make_sketch_matrix(c, d, 1, 3))
    s2 = jnp.asarray(make_sketch_matrix(c, d, 5, 7))
    x = jnp.asarray(np.random.RandomState(1).rand(2, 3, 3, c), jnp.float32)
    v = compact_bilinear_pool(x, s1, s2)
    assert v.shape == (2, d)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(v, axis=-1)), 1.0,
                               rtol=1e-4)


def test_cbp_gram_form_matches_positionwise():
    """The Gram-form contraction (via_gram=True, the default) is the same
    function as the per-position spectral product — values and gradients."""
    rng = np.random.RandomState(2)
    c, d = 24, 128
    s1 = jnp.asarray(make_sketch_matrix(c, d, 1, 3))
    s2 = jnp.asarray(make_sketch_matrix(c, d, 5, 7))
    x = jnp.asarray(rng.rand(3, 5, 7, c) - 0.3, jnp.float32)

    # raw descriptor: both orders are the same linear-algebraic function,
    # strict f32 closeness
    def raw(x, via):
        return compact_bilinear_pool(x, s1, s2, via_gram=via,
                                     signed_sqrt=False, l2_normalize=False)

    vg, vp = raw(x, True), raw(x, False)
    np.testing.assert_allclose(np.asarray(vg), np.asarray(vp),
                               rtol=1e-5, atol=1e-4)
    gg = jax.grad(lambda x: (raw(x, True) ** 2).sum())(x)
    gp = jax.grad(lambda x: (raw(x, False) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gp),
                               rtol=1e-4, atol=1e-4)

    # full epilogue: signed-sqrt has unbounded slope at 0, so f32 reorder
    # noise on near-zero bins blows up RELATIVE error — check absolute
    def full(x, via):
        return compact_bilinear_pool(x, s1, s2, via_gram=via)

    np.testing.assert_allclose(np.asarray(full(x, True)),
                               np.asarray(full(x, False)), atol=5e-4)


def test_covariance_pool_oracle():
    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 4, 5).astype(np.float32)
    got = np.asarray(covariance_pool(jnp.asarray(x)))
    for b in range(2):
        flat = x[b].reshape(12, 5)
        want = np.cov(flat.T, bias=True)
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-5)


def test_newton_schulz_matches_scipy_sqrtm():
    rng = np.random.RandomState(0)
    c = 16
    a = rng.rand(c, c).astype(np.float32)
    spd = a @ a.T / c + np.eye(c, dtype=np.float32)
    got = np.asarray(newton_schulz_sqrt(jnp.asarray(spd[None]), num_iters=7))[0]
    want = sla.sqrtm(spd.astype(np.float64)).real
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_mpn_cov_pool_shape_and_grad():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 4, 12), jnp.float32)
    v = mpn_cov_pool(x)
    assert v.shape == (2, 12 * 13 // 2)

    g = jax.grad(lambda x: mpn_cov_pool(x).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


def test_triu_vec():
    m = jnp.arange(9.0).reshape(1, 3, 3)
    v = np.asarray(triu_vec(m))
    np.testing.assert_array_equal(v[0], [0, 1, 2, 4, 5, 8])


def test_newton_schulz_coupled_batched_matches_sequential():
    """The [2B,C,C] coupled-pair bmm (round-5 MPN dispatch cut) must be
    numerically identical to the two separate [B,C,C] bmms — value AND
    gradient (the chain is differentiated by autodiff)."""
    rng = np.random.RandomState(5)
    x = rng.randn(3, 12, 16).astype(np.float32)
    spd = np.einsum("bik,bjk->bij", x, x) + 0.1 * np.eye(12, dtype=np.float32)
    mats = jnp.asarray(spd)

    def loss(m, coupled):
        return jnp.sum(newton_schulz_sqrt(m, 5, coupled_batched=coupled) ** 2)

    v1, g1 = jax.value_and_grad(lambda m: loss(m, True))(mats)
    v2, g2 = jax.value_and_grad(lambda m: loss(m, False))(mats)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                               atol=1e-6)
