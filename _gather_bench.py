import time, functools
import jax, jax.numpy as jnp, numpy as np

B, H, W, C = 8, 448, 448, 3
host = np.random.RandomState(0)
img = jax.device_put(host.rand(B, H, W, C).astype(np.float32))
# smooth random grid in pixels
gy = jax.device_put((host.rand(B, H, W) * (H - 1)).astype(np.float32))
gx = jax.device_put((host.rand(B, H, W) * (W - 1)).astype(np.float32))

def cur(images, y, x):
    h, w = images.shape[1:3]
    y0 = jnp.floor(y); x0 = jnp.floor(x)
    wy1 = (y - y0)[..., None]; wx1 = (x - x0)[..., None]
    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = jax.vmap(lambda im, yy, xx: im[yy, xx])(images, yc, xc)
        return vals * valid[..., None].astype(images.dtype)
    v00 = tap(y0, x0); v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0); v11 = tap(y0 + 1, x0 + 1)
    top = v00 * (1 - wx1) + v01 * wx1
    bot = v10 * (1 - wx1) + v11 * wx1
    return top * (1 - wy1) + bot * wy1

def packed(images, y, x):
    b, h, w, c = images.shape
    y0 = jnp.floor(y); x0 = jnp.floor(x)
    wy1 = (y - y0)[..., None]; wx1 = (x - x0)[..., None]
    xp = jnp.pad(images, ((0,0),(1,1),(1,1),(0,0)))
    pk = jnp.concatenate([xp[:, :-1, :-1], xp[:, :-1, 1:],
                          xp[:, 1:, :-1], xp[:, 1:, 1:]], -1)  # [b,h+1,w+1,4c]
    iy = jnp.clip(y0 + 1, 0, h).astype(jnp.int32)
    ix = jnp.clip(x0 + 1, 0, w).astype(jnp.int32)
    v = jax.vmap(lambda p, yy, xx: p[yy, xx])(pk, iy, ix)  # [b,H,W,4c]
    v00, v01, v10, v11 = jnp.split(v, 4, axis=-1)
    ok = ((y0 >= -1) & (y0 <= h - 1) & (x0 >= -1) & (x0 <= w - 1))[..., None]
    top = v00 * (1 - wx1) + v01 * wx1
    bot = v10 * (1 - wx1) + v11 * wx1
    return (top * (1 - wy1) + bot * wy1) * ok.astype(images.dtype)

def bench(f, name):
    jf = jax.jit(f)
    o = jf(img, gy, gx); float(o.sum())
    # correctness vs current
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(20):
        acc = acc + jf(img, gy + i * 1e-6, gx).sum()
    float(acc)
    dt = (time.perf_counter() - t0) / 20 * 1e3
    print(f"{name}: {dt:.2f} ms")
    return o

a = bench(cur, "current 4-tap")
b = bench(packed, "packed 1-tap")
print("max abs diff:", float(jnp.abs(a - b).max()))

def packed_flat(images, y, x):
    b, h, w, c = images.shape
    y0 = jnp.floor(y); x0 = jnp.floor(x)
    wy1 = (y - y0)[..., None]; wx1 = (x - x0)[..., None]
    xp = jnp.pad(images, ((0,0),(1,1),(1,1),(0,0)))
    pk = jnp.concatenate([xp[:, :-1, :-1], xp[:, :-1, 1:],
                          xp[:, 1:, :-1], xp[:, 1:, 1:]], -1)
    pk = pk.reshape(b, (h + 1) * (w + 1), 4 * c)
    iy = jnp.clip(y0 + 1, 0, h).astype(jnp.int32)
    ix = jnp.clip(x0 + 1, 0, w).astype(jnp.int32)
    flat = (iy * (w + 1) + ix).reshape(b, h * w)
    v = jnp.take_along_axis(pk, flat[..., None], axis=1)  # [b,HW,4c]
    v = v.reshape(b, h, w, 4 * c)
    v00, v01, v10, v11 = jnp.split(v, 4, axis=-1)
    ok = ((y0 >= -1) & (y0 <= h - 1) & (x0 >= -1) & (x0 <= w - 1))[..., None]
    top = v00 * (1 - wx1) + v01 * wx1
    bot = v10 * (1 - wx1) + v11 * wx1
    return (top * (1 - wy1) + bot * wy1) * ok.astype(images.dtype)

c_ = bench(packed_flat, "packed flat-idx")
print("flat diff:", float(jnp.abs(a - c_).max()))

imgbf = img.astype(jnp.bfloat16)
def packed_bf(images, y, x):
    return packed(images, y, x)
jf = jax.jit(packed_bf)
o = jf(imgbf, gy, gx); float(o.sum().astype(jnp.float32))
t0 = time.perf_counter()
acc = jnp.zeros((), jnp.float32)
for i in range(20):
    acc = acc + jf(imgbf, gy + i * 1e-6, gx).sum().astype(jnp.float32)
float(acc)
print(f"packed bf16: {(time.perf_counter()-t0)/20*1e3:.2f} ms")
