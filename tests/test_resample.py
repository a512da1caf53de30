import jax
import jax.numpy as jnp
import numpy as np

from hawkeye_tpu.ops.resample import (
    crop_resize_bilinear,
    grid_sample_bilinear,
    resize_bilinear,
)


def _np_bilinear_crop_resize(img, box, oh, ow):
    """Reference oracle: align_corners=False bilinear crop+resize, HWC."""
    y0, x0, ch, cw = box
    h, w, c = img.shape
    out = np.zeros((oh, ow, c), np.float32)
    for i in range(oh):
        for j in range(ow):
            sy = np.clip(y0 + (i + 0.5) * ch / oh - 0.5, 0, h - 1)
            sx = np.clip(x0 + (j + 0.5) * cw / ow - 0.5, 0, w - 1)
            yy0, xx0 = int(np.floor(sy)), int(np.floor(sx))
            yy1, xx1 = min(yy0 + 1, h - 1), min(xx0 + 1, w - 1)
            fy, fx = sy - yy0, sx - xx0
            out[i, j] = (
                img[yy0, xx0] * (1 - fy) * (1 - fx)
                + img[yy0, xx1] * (1 - fy) * fx
                + img[yy1, xx0] * fy * (1 - fx)
                + img[yy1, xx1] * fy * fx
            )
    return out


def test_crop_resize_matches_oracle():
    rng = np.random.RandomState(0)
    imgs = rng.rand(2, 17, 23, 3).astype(np.float32)
    boxes = np.array([[2.0, 3.0, 10.0, 12.0], [0.0, 0.0, 17.0, 23.0]], np.float32)
    got = np.asarray(crop_resize_bilinear(jnp.asarray(imgs), jnp.asarray(boxes), 8, 9))
    for b in range(2):
        want = _np_bilinear_crop_resize(imgs[b], boxes[b], 8, 9)
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-5)


def test_identity_resize():
    rng = np.random.RandomState(1)
    imgs = rng.rand(1, 8, 8, 2).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(imgs), 8, 8))
    np.testing.assert_allclose(got, imgs, rtol=1e-5, atol=1e-6)


def test_upscale_downscale_shapes_and_range():
    rng = np.random.RandomState(2)
    imgs = rng.rand(3, 32, 32, 3).astype(np.float32)
    up = resize_bilinear(jnp.asarray(imgs), 64, 48)
    assert up.shape == (3, 64, 48, 3)
    assert float(up.min()) >= -1e-5 and float(up.max()) <= 1 + 1e-5


def test_grid_sample_identity_and_oob():
    rng = np.random.RandomState(3)
    imgs = rng.rand(2, 6, 7, 3).astype(np.float32)
    ys = np.arange(6, dtype=np.float32)
    xs = np.arange(7, dtype=np.float32)
    grid = np.stack(np.meshgrid(ys, xs, indexing="ij"), axis=-1)[None].repeat(2, 0)
    got = np.asarray(grid_sample_bilinear(jnp.asarray(imgs), jnp.asarray(grid)))
    np.testing.assert_allclose(got, imgs, rtol=1e-5, atol=1e-6)
    # fully out-of-bounds grid -> zeros
    grid_oob = np.full((2, 4, 4, 2), -10.0, np.float32)
    got = np.asarray(grid_sample_bilinear(jnp.asarray(imgs), jnp.asarray(grid_oob)))
    assert np.allclose(got, 0.0)


def test_crop_resize_jits_and_grads():
    imgs = jnp.ones((2, 16, 16, 3))
    boxes = jnp.array([[0.0, 0.0, 16.0, 16.0], [4.0, 4.0, 8.0, 8.0]])

    def f(x):
        return crop_resize_bilinear(x, boxes, 8, 8).sum()

    g = jax.jit(jax.grad(f))(imgs)
    assert g.shape == imgs.shape
    assert np.isfinite(np.asarray(g)).all()


def test_grid_sample_bf16_error_bound():
    """S3N warps in bf16 (a documented speed tradeoff,
    models/methods/s3n.py ~L235); pin the accuracy cost vs the f32 path:
    elementwise error must stay within a few bf16 ulps of the input range."""
    r = np.random.RandomState(0)
    img = r.randn(2, 64, 64, 3).astype(np.float32) * 1.5
    gy, gx = np.meshgrid(np.linspace(2, 61, 48), np.linspace(1, 62, 48),
                         indexing="ij")
    grid = np.stack([gy + r.rand(48, 48) * 0.7,
                     gx + r.rand(48, 48) * 0.7], -1)
    grid = grid[None].repeat(2, 0).astype(np.float32)
    o32 = np.asarray(grid_sample_bilinear(jnp.asarray(img),
                                          jnp.asarray(grid)))
    o16 = np.asarray(grid_sample_bilinear(
        jnp.asarray(img, jnp.bfloat16), jnp.asarray(grid)).astype(jnp.float32))
    err = np.abs(o32 - o16)
    scale = np.abs(img).max()
    # bf16 eps = 2^-8; 4-tap interpolation accumulates a few ulps
    assert err.max() <= 8 * 2.0**-8 * scale, err.max()
    assert err.mean() <= 2.0**-8 * scale, err.mean()
