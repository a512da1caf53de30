"""Device TrivialAugmentWide ops vs PIL semantics."""

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image, ImageEnhance, ImageOps

from hawkeye_tpu.data import ta_wide_device as tad


def _apply_op(op_idx, mag, img_f32):
    """Run the device pipeline with a forced op/magnitude on one image."""
    x = jnp.asarray(img_f32)[None]
    op = jnp.asarray([op_idx])
    m = jnp.asarray([mag], jnp.float32)

    # reproduce ta_wide's internals with forced choices
    out = x
    geo = (op >= tad._SHEAR_X) & (op <= tad._ROTATE)
    grids = tad._affine_grids(op, m, x.shape[1], x.shape[2])
    from hawkeye_tpu.ops.resample import grid_sample_bilinear

    warped = grid_sample_bilinear(out, grids)
    out = jnp.where(geo[:, None, None, None], warped, out)
    s = m[:, None, None, None]

    def select(idx, val):
        return jnp.where((op == idx)[:, None, None, None], val, out)

    out = select(tad._BRIGHT, jnp.clip(out * (1.0 + s * 0.99), 0, 1))
    gray = (out @ tad._GRAY_W)[..., None]
    out = select(tad._COLOR, jnp.clip(gray + (1.0 + s * 0.99) * (out - gray), 0, 1))
    mean_gray = gray.mean(axis=(1, 2, 3), keepdims=True)
    out = select(tad._CONTRAST,
                 jnp.clip(mean_gray + (1.0 + s * 0.99) * (out - mean_gray), 0, 1))
    thresh = (1.0 - jnp.abs(m))[:, None, None, None]
    out = select(tad._SOLARIZE, jnp.where(out >= thresh, 1.0 - out, out))
    lo = out.min(axis=(1, 2), keepdims=True)
    hi = out.max(axis=(1, 2), keepdims=True)
    out = select(tad._AUTOCONTRAST, (out - lo) / jnp.maximum(hi - lo, 1e-6))
    return np.asarray(out[0])


def _img():
    rng = np.random.RandomState(0)
    return (rng.rand(24, 24, 3) * 255).astype(np.uint8)


def test_brightness_matches_pil():
    u8 = _img()
    got = _apply_op(tad._BRIGHT, 0.4, u8.astype(np.float32) / 255.0)
    want = np.asarray(
        ImageEnhance.Brightness(Image.fromarray(u8)).enhance(1 + 0.4 * 0.99),
        np.float32) / 255.0
    assert np.abs(got - want).mean() < 0.01


def test_solarize_matches_pil():
    u8 = _img()
    mag = 0.5  # threshold = 127.5
    got = _apply_op(tad._SOLARIZE, mag, u8.astype(np.float32) / 255.0)
    want = np.asarray(ImageOps.solarize(Image.fromarray(u8), int(255 * 0.5)),
                      np.float32) / 255.0
    assert np.abs(got - want).mean() < 0.02


def test_autocontrast_matches_pil():
    rng = np.random.RandomState(1)
    u8 = (rng.rand(24, 24, 3) * 128 + 64).astype(np.uint8)  # compressed range
    got = _apply_op(tad._AUTOCONTRAST, 0.0, u8.astype(np.float32) / 255.0)
    want = np.asarray(ImageOps.autocontrast(Image.fromarray(u8)),
                      np.float32) / 255.0
    assert np.abs(got - want).mean() < 0.02


def test_translate_matches_pil():
    u8 = _img()
    mag = 0.25  # 8 px
    got = _apply_op(tad._TRANS_X, mag, u8.astype(np.float32) / 255.0)
    want = np.asarray(
        Image.fromarray(u8).transform((24, 24), Image.AFFINE, (1, 0, 8, 0, 1, 0),
                                      resample=Image.BILINEAR),
        np.float32) / 255.0
    assert np.abs(got - want).mean() < 0.03


def test_full_ta_wide_runs_and_differs():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
    out = tad.ta_wide(jax.random.PRNGKey(0), x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.abs(out).max()) <= 1.0 + 1e-5
    out2 = tad.ta_wide(jax.random.PRNGKey(1), x)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_equalize_flattens_histogram():
    rng = np.random.RandomState(2)
    # heavily skewed distribution
    x = jnp.asarray((rng.rand(1, 64, 64, 3) ** 3), jnp.float32)
    eq = np.asarray(tad._equalize_cdf(x))
    # equalized values should be near-uniform: std of percentile spacing small
    hist, _ = np.histogram(eq.reshape(-1), bins=10, range=(0, 1))
    assert hist.std() / hist.mean() < 0.35, hist
