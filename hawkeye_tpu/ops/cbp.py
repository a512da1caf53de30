"""Compact bilinear pooling (count-sketch + FFT).

Reference semantics: ``model/methods/CBCNN.py:38-164`` — two fixed count
sketches (random hash h ∈ [d], sign s ∈ {±1}, seeds fixed for
reproducibility) project C-dim features to d-dim; the bilinear outer product
is computed implicitly via FFT: ``ifft(fft(Ψ1(x)) * fft(Ψ2(x))).real``,
sum-pooled over spatial positions, then signed-sqrt + L2.

TPU design deltas:
- The sketch Ψ(x) = s ⊙ scatter_h(x) is materialized as a dense [C, d]
  matrix (the reference builds the same dense matrix,
  ``CBCNN.py:137-164``) so the projection is an MXU matmul.
- The rFFT is folded into the sketch projection: since the sketch matrices
  are fixed, ``rfft(x @ S) == x @ rfft(S)`` — precomputing ``rfft(S)``
  [C, d//2+1] turns the per-position length-d FFT over B·H·W rows (the
  dominant cost of the naive transcription; TPU FFTs are slow) into two
  MXU matmuls per branch (real and imaginary parts).
- The spatial sum-pool moves BEFORE the inverse transform (the irfft is
  linear), so only one length-d irfft per IMAGE remains instead of one per
  position. The math is identical to the reference order (sum of per-
  position products: the product is still taken per position, only the
  inverse transform of the pooled spectrum is shared).
- Gram-form contraction (round 4, default): the pooled spectrum is a
  quadratic form in the Gram matrix —

      V̂[f] = Σ_p (x_pᵀ ŝ1[:,f]) (x_pᵀ ŝ2[:,f]) = ŝ1[:,f]ᵀ M ŝ2[:,f],
      M = Σ_p x_p x_pᵀ   (the plain bilinear-pool Gram, [C, C])

  so when C < H·W (CBCNN recipe: C=512, HW=784, K=3001) the per-position
  projections never need materializing: one [B,C,C] Gram matmul (6.6 GF)
  + complex [B,C,C]@[C,K] (50 GF) + a cheap per-frequency contraction
  replace four [B·HW,C]@[C,K] matmuls (154 GF) and their 600 MB of
  [B,HW,K] intermediates. Same function, bit-comparable output (both
  orders accumulate in f32), identical gradients by linearity.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def make_sketch_matrix(in_dim: int, out_dim: int, seed_h: int, seed_s: int,
                       dtype=np.float32):
    """Dense count-sketch matrix [in_dim, out_dim]: one ±1 per row at a
    hashed column (fixed seeds → fixed sketch, reference seeds 1/3/5/7)."""
    rng_h = np.random.RandomState(seed_h)
    rng_s = np.random.RandomState(seed_s)
    h = rng_h.randint(0, out_dim, size=in_dim)
    s = rng_s.randint(0, 2, size=in_dim) * 2 - 1
    m = np.zeros((in_dim, out_dim), dtype)
    m[np.arange(in_dim), h] = s.astype(dtype)
    return m


def make_irdft_half(d: int):
    """Half-spectrum inverse-rDFT matrices for an even length d.

    The TPU has no fast FFT: XLA lowers ``irfft`` to a custom-call measured
    at ~6 ms/step for the CBCNN recipe's [16, 6000] spectra (fwd irfft +
    bwd rfft together ~5.8 ms of the 65 ms step). Since the length is fixed,
    the transform is just a matmul — and the rDFT symmetry
    ``cos θ_{f,d-t} = cos θ_{f,t}``, ``sin θ_{f,d-t} = -sin θ_{f,t}`` lets
    both output halves share ONE [K, K] cosine and ONE [K, K] sine matrix
    (K = d//2+1):

        P = sr @ C,  Q = si @ S          # [B, K] each
        v[0:K]   = P + Q
        v[d-t]   = P[t] - Q[t],  t = 1..K-2   (i.e. reversed (P-Q)[1:K-1])

    with C[f,t] = w_f cos(2πft/d)/d, S[f,t] = -w_f sin(2πft/d)/d and
    w_f = 2 except w_0 = w_{K-1} = 1. Returns (C, S) as np.float32 —
    pass them to ``compact_bilinear_pool(irdft=...)`` as DEVICE-RESIDENT
    buffers (flax variables / function arguments), NOT trace-time
    constants: jit'd literal constants of this size are re-staged every
    dispatch on remote runtimes."""
    assert d % 2 == 0, "irdft matmul path assumes even length"
    k = d // 2 + 1
    f = np.arange(k, dtype=np.float64)[:, None]
    t = np.arange(k, dtype=np.float64)[None, :]
    w = np.full((k, 1), 2.0)
    w[0, 0] = 1.0
    w[-1, 0] = 1.0
    ang = 2.0 * np.pi * f * t / d
    cos_m = (np.cos(ang) * w / d).astype(np.float32)
    sin_m = (-np.sin(ang) * w / d).astype(np.float32)
    return cos_m, sin_m


def _irdft_apply(sr, si, irdft):
    # HIGHEST precision: these matmuls replace an EXACT f32 irfft
    # custom-call; default (bf16-pass) precision showed ~1e-3 abs deviation
    # on O(1) inputs. The [B,K]@[K,K] products are HBM-bound on the 36 MB
    # weight read, so the extra passes are ~free (rel err now 4.5e-7).
    cos_m, sin_m = irdft
    k = sr.shape[-1]
    hi = jax.lax.Precision.HIGHEST
    p = jnp.matmul(sr, cos_m, precision=hi)  # [B, K]
    q = jnp.matmul(si, sin_m, precision=hi)
    front = p + q                       # v[0 .. K-1]
    back = (p - q)[:, 1:k - 1][:, ::-1]  # v[K .. d-1] reversed symmetry
    return jnp.concatenate([front, back], axis=-1)


class _Spectrum:
    """Host-precomputed rfft of a fixed sketch matrix (.real/.imag are
    numpy f32 — they embed as literal constants under jit)."""

    __slots__ = ("real", "imag")

    def __init__(self, real, imag):
        self.real, self.imag = real, imag


def _spectrum(sketch):
    if isinstance(sketch, np.ndarray):
        f = np.fft.rfft(sketch.astype(np.float32), axis=-1)
        return _Spectrum(f.real.astype(np.float32),
                         f.imag.astype(np.float32))
    # traced/device input (tests, dynamic sketches): on-device FFT
    return jnp.fft.rfft(sketch.astype(jnp.float32), axis=-1)


def compact_bilinear_pool(features, sketch1, sketch2, *, signed_sqrt=True,
                          l2_normalize=True, eps=1e-10, via_gram=True,
                          irdft=None):
    # eps default matches the reference's signed sqrt (CBCNN.py:133)
    """[B, H, W, C] → [B, d] compact bilinear descriptor.

    sketch1/sketch2: [C, d] dense count-sketch matrices (jnp arrays).
    ``via_gram`` picks the Gram-form contraction (module docstring) — the
    same function with ~2.7× fewer FLOPs when C < H·W; set False for the
    per-position formulation (the direct transcription, kept as the parity
    oracle and for C ≫ H·W shapes).
    """
    b, h, w, c = features.shape
    d = sketch1.shape[1]
    x = features.reshape(b, h * w, c).astype(jnp.float32)
    # rfft of the FIXED sketches: [C, d//2+1]. MUST happen on host (numpy)
    # when the sketch is a host array: XLA lowers fft to a custom-call it
    # cannot constant-fold, so a traced jnp.fft.rfft of the constant sketch
    # re-ran every step — profiled at ~11 ms/step (14.5%) of the CBCNN
    # recipe step before this was hoisted.
    fs1 = _spectrum(sketch1)
    fs2 = _spectrum(sketch2)
    if via_gram:
        gram = jax.lax.dot_general(
            x, x, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [B, C, C]
        # W[k,b,d] = Σ_c ŝ2[c,k]·M[b,c,d] — one dot_general whose output
        # order is exactly (lhs free K, rhs free B,D): the per-frequency
        # contraction below then reduces over the MINOR (lane) axis d.
        # (The earlier [B,C,K] form reduced over the middle axis — profiled
        # at ~130 GB/s effective on the VPU, ~4 ms/step at the recipe shape.)
        wr = jnp.einsum("ck,bcd->kbd", fs2.real, gram)  # [K, B, C]  (MXU)
        wi = jnp.einsum("ck,bcd->kbd", fs2.imag, gram)
        # V̂[f] = ŝ1[:,f]ᵀ (M ŝ2[:,f]): frequency-diagonal, so elementwise×
        # lane-reduce, not a matmul; M symmetric ⇒ ŝ2-side W works for both
        s1r = fs1.real.T[:, None, :]  # [K, 1, C]
        s1i = fs1.imag.T[:, None, :]
        sr = (s1r * wr - s1i * wi).sum(-1).T  # [B, K]
        si = (s1r * wi + s1i * wr).sum(-1).T
    else:
        f1r, f1i = x @ fs1.real, x @ fs1.imag  # [B, HW, K]  (MXU)
        f2r, f2i = x @ fs2.real, x @ fs2.imag
        # per-position complex product, sum-pooled over positions
        sr = (f1r * f2r - f1i * f2i).sum(axis=1)  # [B, K]
        si = (f1r * f2i + f1i * f2r).sum(axis=1)
    if irdft is not None:
        # fixed-length inverse transform as two MXU matmuls
        # (make_irdft_half); matrices must be device-resident buffers
        v = _irdft_apply(sr, si, irdft)  # [B, d]
    else:
        v = jnp.fft.irfft(jax.lax.complex(sr, si), n=d, axis=-1)  # [B, d]
    if signed_sqrt:
        v = jnp.sign(v) * jnp.sqrt(jnp.abs(v) + eps)
    if l2_normalize:
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return v
