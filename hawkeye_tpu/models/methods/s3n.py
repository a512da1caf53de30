"""S3N: selective sparse sampling.

Reference: ``model/methods/S3N.py`` — class response maps from the raw
classifier's weights (CAM, ``:292-295``), entropy-gated selection of the
top-1 vs mean-of-top-5 map, peak finding (``:57-98``), per-peak Gaussian
kernels accumulated into a saliency map and its complement (``:204-290``),
attention-warped resampling grids (``create_grid``, ``:169-202``), two extra
backbone passes on the zoomed / complementary views, and four classifiers.
Phase ``p`` switches peak selection per epoch (``Examples/S3N.py:60-66``).

TPU design: every dynamic structure is a masked dense computation —
peaks are a static mask; "for each peak add a Gaussian" is one [HW, H, W]
contraction weighted by the mask; the stochastic/max phases are mask
variants; the warping grid is built with a fixed Gaussian blur conv and
sampled with the batched bilinear gather (``ops/resample.grid_sample_
bilinear``). One compiled program per phase value.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.peaks import peak_mask
from ...ops.resample import grid_sample_bilinear, resize_bilinear
from ...registry import BACKBONE, MODEL


def _gaussian_2d(size, fwhm=13.0):
    x = np.arange(size, dtype=np.float32)
    y = x[:, None]
    x0 = y0 = size // 2
    return np.exp(-4 * np.log(2) * ((x - x0) ** 2 + (y - y0) ** 2) / fwhm**2)


def saliency_from_peaks(score_map, mask, theta, base, weight_by="score"):
    """Accumulate per-peak Gaussian kernels over a [B, G, G] score map.

    theta: [B, G, G] per-position kernel radius (radius(sqrt(score))).
    weight: score (zoom map) or 1/score (inverse map).
    Returns [B, G, G] saliency (reference ``generate_map`` accumulation,
    with kernels normalized to peak 1 like ``KernelGenerator``).
    """
    b, g, _ = score_map.shape
    ii = jnp.arange(g, dtype=jnp.float32)
    # pairwise squared distances between all grid positions: [G, G]
    dy = (ii[:, None] - ii[None, :]) ** 2  # (row dist²)
    dx = dy
    # kernel for peak at (py,px) evaluated at (iy,ix):
    #   exp(-((iy-py)² + (ix-px)²) / (2 (θ·G)²))
    pow2 = jnp.maximum((theta * g) ** 2, 1e-8)  # [B, G, G]
    if weight_by == "score":
        w = score_map
    else:
        w = 1.0 / jnp.maximum(score_map, 1e-6)
    w = w * mask.astype(score_map.dtype)
    # contribution[b,iy,ix] = Σ_{py,px} w[b,py,px]
    #                          · exp(-(dy[iy,py]+dx[ix,px]) · inv2p[b,py,px]).
    # The exp FACTORS over the two axes — exp(-(a+b)c) = exp(-ac)·exp(-bc) —
    # so instead of materializing the [B, G, G, G, G] tensor (whose 31-wide
    # minor dims pad to full lanes and whose broadcast-backward was 30 ms/
    # step at 23 GB/s), build the two factor tensors [B, G, G·G] and contract
    # on the MXU as a batched matmul over the flattened peak axis.
    inv2p = (1.0 / (2.0 * pow2)).reshape(b, 1, g * g)  # [B, 1, PQ]
    # Ey[b, iy, (py,px)] = exp(-dy[iy,py] · inv2p[b,py,px])
    ey = jnp.exp(-jnp.repeat(dy, g, axis=1).reshape(1, g, g * g) * inv2p)
    # Ex[b, ix, (py,px)] = exp(-dx[ix,px] · inv2p[b,py,px]), weighted by w
    ex = jnp.exp(-jnp.tile(dx, (1, g)).reshape(1, g, g * g) * inv2p)
    ex = ex * w.reshape(b, 1, g * g)
    sal = jnp.einsum("bip,bjp->bij", ey, ex)  # [B, G, G] (MXU)
    return base + sal


class ScaleParam(nn.Module):
    init_value: float

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", lambda k: jnp.asarray([self.init_value],
                                                          jnp.float32))
        return x * scale[0]


class S3N(nn.Module):
    num_classes: int
    image_size: int = 448
    base_ratio: float = 0.09
    radius_init: float = 0.12
    radius_inv_init: float = 0.3
    grid_size: int = 31
    padding_size: int = 30
    backbone_name: str = "resnet50"
    dtype: Any = jnp.bfloat16
    # Run the zoom + inverse warped views through ONE 2B-batch backbone call
    # instead of two B-batch calls (the views are data-independent of each
    # other; the recipe's bs8 half-fills the chip at 448²). EXACT in both
    # modes: eval trivially; train because the backbone's GroupedBatchNorm
    # computes batch statistics per view half and folds the running-average
    # update sequentially in view order — the same math as the reference's
    # two separate passes (S3N.py:292-315). Default ON (+34% at the recipe
    # shape); parity vs the two-pass path pinned by tests/test_s3n_fused.py.
    fused_warp_pass: bool = True

    def setup(self):
        kwargs = {}
        if not self.backbone_name.startswith("vgg"):
            kwargs["grouped_bn"] = True  # per-view stats for the fused pass
        self.backbone = BACKBONE.get(self.backbone_name)(
            num_classes=0, dtype=self.dtype, name="backbone", **kwargs)
        self.raw_classifier = nn.Dense(self.num_classes, dtype=jnp.float32,
                                       name="raw_classifier")
        self.sampler_buffer = _Buffer(dtype=self.dtype, name="sampler_buffer")
        self.sampler_classifier = nn.Dense(self.num_classes, dtype=jnp.float32,
                                           name="sampler_classifier")
        self.sampler_buffer1 = _Buffer(dtype=self.dtype, name="sampler_buffer1")
        self.sampler_classifier1 = nn.Dense(self.num_classes,
                                            dtype=jnp.float32,
                                            name="sampler_classifier1")
        self.con_classifier = nn.Dense(self.num_classes, dtype=jnp.float32,
                                       name="con_classifier")
        self.radius = ScaleParam(self.radius_init, name="radius")
        self.radius_inv = ScaleParam(self.radius_inv_init, name="radius_inv")
        # trainable blur filter initialized to a fwhm-13 Gaussian
        # (reference S3N.py:137-139; trained at 1e-5 x lr)
        k = 2 * self.padding_size + 1
        self.blur_kernel = self.param(
            "blur_kernel",
            lambda key: jnp.asarray(_gaussian_2d(k, 13.0)[..., None, None]))

    def _blur(self, x):
        """x: [B, G+2P, G+2P] → valid conv with the 61×61 filter → [B, G, G].

        A 1-in/1-out-channel conv runs at ~0.1 TF/s on the TPU conv path
        (nothing to put on the MXU lanes), costing ~10 ms/step across the six
        blur calls. Reformulated as an einsum over vertically-unfolded input
        rows against a Toeplitz expansion of the (trainable) kernel — a
        [G², K·(G+2P)]×[K·(G+2P), G]-shaped batched contraction the MXU
        eats. Identical math: out[b,i,j] = Σ_{r,c} x[b,i+r,j+c] K[r,c]."""
        k = self.blur_kernel[..., 0, 0]                       # [K, K]
        ksz = k.shape[0]
        g = self.grid_size
        wpad = x.shape[2]                                     # G + 2P
        # vertical unfold: rows[b, i, r, :] = x[b, i+r, :]  → [B, G, K, W]
        rows = jnp.stack([x[:, r:r + g, :] for r in range(ksz)], axis=2)
        # Toeplitz kernel: T[r, w, j] = K[r, w-j] for 0 <= w-j < K
        wj = jnp.arange(wpad)[:, None] - jnp.arange(g)[None, :]  # [W, G]
        valid = (wj >= 0) & (wj < ksz)
        t = jnp.where(valid, k[:, jnp.clip(wj, 0, ksz - 1)], 0.0)  # [K, W, G]
        return jnp.einsum("birw,rwj->bij", rows.astype(k.dtype), t)

    def _create_grid(self, sal):
        """Saliency [B, G, G] → pixel-space sampling grid [B, S, S, 2].

        Reference ``create_grid``: replication-pad, P-basis coordinate maps,
        attention-weighted mean coordinates via the Gaussian filter,
        normalize to [-1, 1], upsample to the input size.
        """
        g, p = self.grid_size, self.padding_size
        padded = jnp.pad(sal, ((0, 0), (p, p), (p, p)), mode="edge")
        coords = (jnp.arange(g + 2 * p, dtype=jnp.float32) - p) / (g - 1.0)
        px = jnp.broadcast_to(coords[None, :], (g + 2 * p, g + 2 * p))
        py = jnp.broadcast_to(coords[:, None], (g + 2 * p, g + 2 * p))
        denom = self._blur(padded)
        gx = self._blur(padded * px[None]) / jnp.maximum(denom, 1e-8)
        gy = self._blur(padded * py[None]) / jnp.maximum(denom, 1e-8)
        gx = jnp.clip(gx * 2.0 - 1.0, -1.0, 1.0)
        gy = jnp.clip(gy * 2.0 - 1.0, -1.0, 1.0)
        grid = jnp.stack([gy, gx], axis=-1)  # [B, G, G, 2] normalized
        # align_corners=True: reference create_grid interpolation (S3N.py:198)
        grid = resize_bilinear(grid, self.image_size, self.image_size,
                               align_corners=True)
        # normalized (align_corners=True) → pixel coordinates
        s = self.image_size
        return (grid + 1.0) * 0.5 * (s - 1)

    def _decide_map(self, crm):
        """Entropy-gated response-map selection (reference generate_map head)."""
        pooled = crm.mean(axis=(1, 2))  # [B, C]
        probs = jax.nn.softmax(pooled, axis=-1)
        k = min(5, probs.shape[-1])
        top_p, top_idx = jax.lax.top_k(probs, k)
        gate = (top_p * jnp.log(jnp.maximum(top_p, 1e-12))).sum(-1)  # [B]
        maps = jnp.take_along_axis(
            crm, top_idx[:, None, None, :], axis=-1)  # [B, G, G, 5]
        decide = jnp.where((gate > -0.2)[:, None, None],
                           maps[..., 0], maps.mean(-1))
        lo = decide.min(axis=(1, 2), keepdims=True)
        hi = decide.max(axis=(1, 2), keepdims=True)
        return (decide - lo) / jnp.maximum(hi - lo, 1e-8)

    def __call__(self, x, train: bool = False, p: int = 0):
        stages = self.backbone(x, train=train)
        feature_raw = stages["c5"]
        pooled_raw = stages["pool"]
        agg_origin = self.raw_classifier(pooled_raw)

        # CAM from the classifier weights (reference copies them into a 1x1
        # conv; functionally identical einsum), under stop_gradient
        w = jax.lax.stop_gradient(
            self.raw_classifier.variables["params"]["kernel"])
        bias = jax.lax.stop_gradient(
            self.raw_classifier.variables["params"]["bias"])
        crm = jnp.einsum("bhwc,ck->bhwk",
                         jax.lax.stop_gradient(feature_raw.astype(jnp.float32)),
                         w) + bias
        # align_corners=True: reference CRM interpolation (S3N.py:301-302)
        crm = resize_bilinear(crm, self.grid_size, self.grid_size,
                              align_corners=True)
        score_map = self._decide_map(crm)  # [B, G, G] in [0,1]

        mask = peak_mask(score_map[:, None], 3)[:, 0]  # [B, G, G]
        if p == 1:
            u = jax.random.uniform(self.make_rng("dropout"), score_map.shape)
            keep = score_map > u
            mask_zoom = mask & keep
            mask_inv = mask & ~keep
        elif p == 2:
            flat = jnp.where(mask, score_map, -jnp.inf).reshape(
                score_map.shape[0], -1)
            zoom_onehot = jax.nn.one_hot(jnp.argmax(flat, -1), flat.shape[1],
                                         dtype=bool)
            flat_inv = jnp.where(mask, score_map, jnp.inf).reshape(
                score_map.shape[0], -1)
            inv_onehot = jax.nn.one_hot(jnp.argmin(flat_inv, -1),
                                        flat.shape[1], dtype=bool)
            mask_zoom = zoom_onehot.reshape(mask.shape)
            mask_inv = inv_onehot.reshape(mask.shape)
        else:
            mask_zoom = mask
            mask_inv = mask

        theta = self.radius(jnp.sqrt(jnp.maximum(score_map, 1e-8)))
        theta_inv = self.radius_inv(jnp.sqrt(jnp.maximum(score_map, 1e-8)))
        sal_zoom = saliency_from_peaks(score_map, mask_zoom, theta,
                                       self.base_ratio, "score")
        sal_inv = saliency_from_peaks(score_map, mask_inv, theta_inv,
                                      self.base_ratio, "inv")

        grid_zoom = self._create_grid(sal_zoom)
        grid_inv = self._create_grid(sal_inv)
        # warp in the compute dtype (bf16 on TPU, f32 under the CPU parity
        # tests): the 4-tap tensor is [B, 12, S²] — halving its bytes halves
        # the warp's forward+backward fusions, and the backbone consumes the
        # result in this dtype anyway (saves a 13 ms/step layout-hostile
        # convert at 448²)
        x_src = x.astype(self.dtype)
        x_zoom = grid_sample_bilinear(x_src, grid_zoom)
        x_inv = grid_sample_bilinear(x_src, grid_inv)

        if self.fused_warp_pass:
            # bn_groups=2: per-view batch statistics inside the single
            # 2B-batch call (zoom half first, matching the reference's
            # zoom-then-inverse sequential running-stats update)
            c5 = self.backbone(jnp.concatenate([x_zoom, x_inv], axis=0),
                               train=train,
                               **({"bn_groups": 2} if train and
                                  not self.backbone_name.startswith("vgg")
                                  else {}))["c5"]
            c5_zoom, c5_inv = jnp.split(c5, 2, axis=0)
        else:
            c5_zoom = self.backbone(x_zoom, train=train)["c5"]
            c5_inv = self.backbone(x_inv, train=train)["c5"]
        feat_d = self.sampler_buffer(c5_zoom, train)
        agg_sampler = self.sampler_classifier(feat_d.mean(axis=(1, 2)))
        feat_c = self.sampler_buffer1(c5_inv, train)
        agg_sampler1 = self.sampler_classifier1(feat_c.mean(axis=(1, 2)))

        aggregation = self.con_classifier(jnp.concatenate([
            pooled_raw.astype(jnp.float32),
            feat_d.mean(axis=(1, 2)),
            feat_c.mean(axis=(1, 2)),
        ], axis=1))

        return {
            "logits": aggregation,
            "agg_origin": agg_origin,
            "agg_sampler": agg_sampler,
            "agg_sampler1": agg_sampler1,
        }


class _Buffer(nn.Module):
    """Conv(3x3, stride 2) + BN + ReLU (reference sampler_buffer)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x).astype(jnp.float32)


@MODEL.register(name="S3N")
def build_s3n(config):
    return S3N(
        num_classes=int(config.num_classes),
        image_size=int(config.get("image_size", 448)),
        base_ratio=float(config.get("base_ratio", 0.09)),
        radius_init=float(config.get("radius", 0.12)),
        radius_inv_init=float(config.get("radius_inv", 0.3)),
        backbone_name=config.get("backbone", "resnet50"),
        fused_warp_pass=bool(config.get("fused_warp_pass", True)),
    )
