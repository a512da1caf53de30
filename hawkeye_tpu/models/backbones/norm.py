"""Grouped (per-view) BatchNorm for fused multi-view backbone passes.

Methods like S3N run the same backbone over several same-shape views of a
batch (reference ``model/methods/S3N.py:292-315`` runs zoom and inverse
passes sequentially). Fusing those passes into ONE widened-batch call is the
big TPU win at small recipe batch sizes (the views are data-independent),
but plain BatchNorm would then pool batch statistics across the views —
diverging from the reference's separate-pass semantics in train mode.

``GroupedBatchNorm`` restores exactness: with ``groups=G`` it computes batch
statistics independently per contiguous batch group (view), normalizes each
group with its own statistics, and folds the running-average update
SEQUENTIALLY in group order — exactly the update the reference's G separate
passes produce (``s' = m·s + (1-m)·v`` applied per view in view order).
With ``groups=1`` it is numerically identical to ``flax.linen.BatchNorm``
(same f32 stats, fast variance, dtype promotion rules; parity-pinned by
``tests/test_grouped_bn.py``), and the parameter/stats tree matches
(``scale``/``bias``, ``batch_stats/{mean,var}``) so checkpoints are
interchangeable.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import lax
from flax.linen import dtypes as _dtypes


class GroupedBatchNorm(nn.Module):
    """Drop-in BatchNorm whose train-mode statistics are computed per batch
    group. ``groups`` must evenly divide the batch; group ``i`` is rows
    ``[i*B/G, (i+1)*B/G)``. For UNEQUAL contiguous groups (e.g. NTS-Net's
    fused global+parts pass: sizes ``(B, B*M)``), set ``group_sizes``
    instead — it overrides ``groups``. Eval mode ignores grouping (running
    stats)."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    param_dtype: Any = jnp.float32
    axis_name: str | None = None
    groups: int = 1
    group_sizes: tuple | None = None

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones_init(), (feat,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (feat,),
                          self.param_dtype)

        def affine(xx, mean, var):
            # flax._normalize semantics: x - mean promotes to f32 (stats are
            # f32), then cast like canonicalize_dtype(x, scale, bias, dtype)
            fshape = (1,) * (xx.ndim - 1) + (feat,)
            mul = lax.rsqrt(var + self.epsilon) * scale.reshape(fshape)
            y = (xx - mean) * mul + bias.reshape(fshape)
            return jnp.asarray(
                y, _dtypes.canonicalize_dtype(x, scale, bias,
                                              dtype=self.dtype))

        if self.use_running_average:
            fshape = (1,) * (x.ndim - 1) + (feat,)
            return affine(x, ra_mean.value.reshape(fshape),
                          ra_var.value.reshape(fshape))

        b = x.shape[0]
        if self.group_sizes is not None:
            return self._unequal_groups(x, ra_mean, ra_var, affine)
        g = int(self.groups)
        assert b % g == 0, f"batch {b} not divisible by bn groups {g}"
        xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        xg = xf.reshape((g, b // g) + x.shape[1:])
        axes = tuple(range(1, xg.ndim - 1))  # all but group + feature
        mu = xg.mean(axes)                   # [G, C]
        mu2 = jnp.square(xg).mean(axes)      # fast variance: E[x²]-E[x]²
        if self.axis_name is not None and not self.is_initializing():
            stacked = lax.pmean(jnp.stack([mu, mu2], 0), self.axis_name)
            mu, mu2 = stacked[0], stacked[1]
        var = jnp.maximum(mu2 - jnp.square(mu), 0.0)  # [G, C]

        if not self.is_initializing():
            m = jnp.asarray(self.momentum, jnp.float32)
            rm, rv = ra_mean.value, ra_var.value
            for gi in range(g):  # sequential fold == reference's G passes
                rm = m * rm + (1.0 - m) * mu[gi]
                rv = m * rv + (1.0 - m) * var[gi]
            ra_mean.value = rm
            ra_var.value = rv

        gshape = (g,) + (1,) * (xg.ndim - 2) + (feat,)
        yg = affine(xg, mu.reshape(gshape), var.reshape(gshape))
        return yg.reshape(x.shape)

    def _unequal_groups(self, x, ra_mean, ra_var, affine):
        """Per-group stats over static contiguous slices of unequal sizes.

        Group ``i`` is rows ``[sum(sizes[:i]), sum(sizes[:i+1]))``; each is
        normalized with its own statistics and the running average folds
        sequentially in group order — identical to running the groups as
        separate passes (the reference's NTS-Net global-then-parts order,
        ``model/methods/NTS_Net/NTSNet.py:43-57``)."""
        sizes = tuple(int(s) for s in self.group_sizes)
        assert sum(sizes) == x.shape[0], \
            f"group_sizes {sizes} don't sum to batch {x.shape[0]}"
        xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        axes = tuple(range(xf.ndim - 1))  # all but feature
        mus, var_list, ys = [], [], []
        off = 0
        for s in sizes:
            xs = xf[off:off + s]
            off += s
            mu = xs.mean(axes)
            mu2 = jnp.square(xs).mean(axes)
            if self.axis_name is not None and not self.is_initializing():
                stacked = lax.pmean(jnp.stack([mu, mu2], 0), self.axis_name)
                mu, mu2 = stacked[0], stacked[1]
            var = jnp.maximum(mu2 - jnp.square(mu), 0.0)
            mus.append(mu)
            var_list.append(var)
            fshape = (1,) * (xs.ndim - 1) + (x.shape[-1],)
            ys.append(affine(xs, mu.reshape(fshape), var.reshape(fshape)))

        if not self.is_initializing():
            m = jnp.asarray(self.momentum, jnp.float32)
            rm, rv = ra_mean.value, ra_var.value
            for mu, var in zip(mus, var_list):
                rm = m * rm + (1.0 - m) * mu
                rv = m * rv + (1.0 - m) * var
            ra_mean.value = rm
            ra_var.value = rv
        return jnp.concatenate(ys, axis=0)
