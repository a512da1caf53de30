"""Padding rows (weight 0, appended by prepare_batch to reach a device
multiple) must not bias pair-based losses/mining (ADVICE r1, medium)."""

import numpy as np

import jax.numpy as jnp

from hawkeye_tpu.losses.mamc import npairs_mamc
from hawkeye_tpu.models.methods.apinet import mine_pairs


def test_npairs_mamc_ignores_padding():
    rng = np.random.RandomState(0)
    parts = rng.randn(6, 2, 8).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 2, 2], np.int32)

    base = float(npairs_mamc(jnp.asarray(parts), jnp.asarray(labels)))

    # pad by duplicating the last row (prepare_batch convention), weight 0
    parts_p = np.concatenate([parts, parts[-1:], parts[-1:]], axis=0)
    labels_p = np.concatenate([labels, labels[-1:], labels[-1:]])
    w = np.array([1, 1, 1, 1, 1, 1, 0, 0], np.float32)
    padded = float(npairs_mamc(jnp.asarray(parts_p), jnp.asarray(labels_p),
                               weights=jnp.asarray(w)))
    assert np.isclose(base, padded, rtol=1e-5), (base, padded)

    # and WITHOUT the mask the padded duplicates change the loss (the bug)
    unmasked = float(npairs_mamc(jnp.asarray(parts_p), jnp.asarray(labels_p)))
    assert not np.isclose(base, unmasked, rtol=1e-3)


def test_cin_contrastive_masks_padding_and_survives_duplicates():
    """Pairs touching weight-0 padding contribute nothing, and exact
    duplicate pairs (padding copies the last real row) must not NaN the
    gradient (jnp.linalg.norm's d=0 singularity; torch hides it via
    PairwiseDistance eps)."""
    import jax

    from hawkeye_tpu.losses.cin import CINLoss

    loss_fn = CINLoss({"alpha": 2.0, "beta": 0.5})
    rng = np.random.RandomState(2)
    z = rng.randn(8, 4).astype(np.float32)
    z[6] = z[7] = z[5]  # padding duplicates the last real row
    labels = np.array([0, 1, 0, 1, 0, 1, 1, 1], np.int32)
    logits = rng.randn(8, 2).astype(np.float32)
    w = np.array([1, 1, 1, 1, 1, 1, 0, 0], np.float32)

    def run(zv):
        batch = {"label": jnp.asarray(labels), "weight": jnp.asarray(w)}
        out = {"logits": jnp.asarray(logits), "pair_embed": zv}
        return loss_fn(out, batch)

    val, grad = jax.value_and_grad(run)(jnp.asarray(z))
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()

    # perturbing ONLY the padded rows leaves the loss unchanged
    z2 = z.copy()
    z2[6:] += 3.21
    assert np.isclose(float(val), float(run(jnp.asarray(z2))), rtol=1e-6)


def test_mine_pairs_never_selects_padding():
    rng = np.random.RandomState(1)
    emb = rng.randn(6, 16).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 2, 2], np.int32)
    emb_p = np.concatenate([emb, emb[-1:], emb[-1:]], axis=0)
    labels_p = np.concatenate([labels, labels[-1:], labels[-1:]])
    valid = jnp.asarray([True] * 6 + [False] * 2)

    intra, inter = mine_pairs(jnp.asarray(emb_p), jnp.asarray(labels_p),
                              valid=valid)
    intra, inter = np.asarray(intra), np.asarray(inter)
    assert (intra[:6] < 6).all(), intra
    assert (inter[:6] < 6).all(), inter

    # padded row 6/7 duplicate row 5 exactly (distance 0) — without the mask
    # they'd win the intra argmin for row 5's class peers
    intra_u, inter_u = mine_pairs(jnp.asarray(emb_p), jnp.asarray(labels_p))
    assert (np.asarray(intra_u)[:6] >= 6).any() or (
        np.asarray(inter_u)[:6] >= 6).any()

    # valid rows still get sensible neighbors vs the unpadded mining
    intra0, inter0 = mine_pairs(jnp.asarray(emb), jnp.asarray(labels))
    np.testing.assert_array_equal(intra[:6], np.asarray(intra0))
    np.testing.assert_array_equal(inter[:6], np.asarray(inter0))
