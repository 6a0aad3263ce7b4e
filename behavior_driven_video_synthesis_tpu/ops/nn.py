"""NN primitives, NHWC / TPU-native.

Re-designs of the reference's building blocks (/root/reference/lib/modules.py)
as flax.linen modules with channels-last layout (NHWC — the native TPU conv
layout), fp32 parameters and a configurable compute dtype (bf16 by default in
training configs) so convs hit the MXU at full tile throughput.

Blocks:
  * NormConv2d      — weight-norm conv + learned per-channel gamma/beta
                      (reference lib/modules.py:120-145)
  * L2NormConv2d    — L2-normalized-kernel conv with data-dependent init
                      (reference lib/modules.py:42-101)
  * LayerNormConv2d — conv + instance norm (reference lib/modules.py:104-117)
  * Downsample      — stride-2 3x3 conv (reference lib/modules.py:148-161)
  * Upsample        — subpixel (conv->4c + depth_to_space) or bilinear
                      (reference lib/modules.py:164-182)
  * VunetRNB        — pre-activation residual block w/ optional fused aux
                      input (reference lib/modules.py:185-233)
  * FullyConnectedNet — LeakyReLU MLP used by flow couplings
                      (reference lib/modules.py:236-257)
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def space_to_depth(x, block_size: int = 2):
    """NHWC space->depth with torch-compatible channel ordering.

    output[..., (i*bs + j)*C + c] = input[..., h*bs+i, w*bs+j, c]
    (matches reference lib/modules.py:11-21 modulo NCHW->NHWC).
    """
    n, h, w, c = x.shape
    bs = block_size
    x = x.reshape(n, h // bs, bs, w // bs, bs, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // bs, w // bs, bs * bs * c)


def depth_to_space(x, block_size: int = 2):
    """NHWC depth->space, inverse of :func:`space_to_depth`.

    Channel factored as (i, j, C') in C-order, matching reference
    lib/modules.py:24-34.
    """
    n, h, w, c = x.shape
    bs = block_size
    cc = c // (bs * bs)
    x = x.reshape(n, h, w, bs, bs, cc)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * bs, w * bs, cc)


def _conv(x, kernel, bias, stride, padding, dtype):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=dn,
    )
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def _conv_d2s_transpose(x, kernel, dtype):
    """depth_to_space(conv(x, kernel, pad=1), 2) as ONE transposed conv.

    The subpixel upsample (conv to 4C then pixel shuffle; reference
    lib/modules.py:164-182) emits its output in a (H, W, 2, 2, C)-factored
    channel layout that XLA must physically relayout to (2H, 2W, C) — the
    depth_to_space copies are ~8% of pipeline device time (profiled).  The
    identical map is a stride-2 transposed conv with a 6x6 kernel whose
    (u, v) tap holds W[p, q, :, (i*2+j)*C + c] for i = (u+1)%2,
    p = (u-1+i)//2 (each output-parity phase reads its own 3x3 of the
    original kernel), lowered here as an input-dilated conv — the
    interleaved output is produced directly, no relayout.  Exact: conv is
    linear and every (u, v) tap maps to exactly one (p, q, i, j).
    """
    _, _, cin, c4 = kernel.shape
    c = c4 // 4
    u = jnp.arange(6)
    i = (u + 1) % 2
    p = (u - 1 + i) // 2
    kr = kernel.reshape(3, 3, cin, 2, 2, c)
    # non-adjacent advanced indices -> broadcast dims (6, 6) move to the
    # front, slices (cin, c) follow: (6, 6, cin, c)
    k6 = kr[p[:, None], p[None, :], :, i[:, None], i[None, :], :]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, k6.shape, ("NHWC", "HWIO", "NHWC")
    )
    return jax.lax.conv_general_dilated(
        x.astype(dtype), k6.astype(dtype),
        window_strides=(1, 1),
        padding=[(3, 3), (3, 3)],
        lhs_dilation=(2, 2),
        dimension_numbers=dn,
    )


def _conv_int8(x, kernel, bias, stride, padding, dtype, ax=None):
    """int8-quantized conv: per-tensor symmetric activation scale, per-
    output-channel symmetric weight scale, int8 x int8 -> int32 on the MXU
    (2x the bf16 rate on v5e), dequant fused into the epilogue.

    `ax`: the activation scale (scalar).  Pass a CALIBRATED static scale in
    serving: a dynamic max-reduce costs an extra full pass over the
    activation tensor AND stops the quantize from fusing into its producer
    — measured on the real chip, dynamic scales made the e2e pipeline
    SLOWER than bf16 even though the isolated conv is 2.4x faster.  With a
    static scale the (mul, round, convert-to-int8) chain fuses into the
    producing elementwise op, so quantization is bandwidth-free.

    Isolated conv speedups at the pipeline's hot shapes (B=128, honest
    feedback-loop timing): 256^2xC32 2.40x, 128^2xC64 2.49x, 64^2xC128
    1.85x over bf16.  Numerics: ~1% relative error per conv — measured
    end-to-end by tests/test_quant.py against the f32 path.
    """
    if ax is None:
        ax = jnp.max(jnp.abs(x.astype(jnp.float32))) + 1e-12
    inv = (127.0 / ax).astype(x.dtype)
    # int8 magnitudes (<=127) are exact in bf16, so quantize in x's dtype:
    # one fused elementwise chain, no f32 upcast pass
    x_i8 = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    kf = kernel.astype(jnp.float32)
    aw = jnp.max(jnp.abs(kf), axis=(0, 1, 2), keepdims=True) + 1e-12
    w_i8 = jnp.round(kf * (127.0 / aw)).astype(jnp.int8)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        x_i8, w_i8,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (ax * aw.reshape(1, 1, 1, -1)
                                 / (127.0 * 127.0))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


class NormConv2d(nn.Module):
    """Weight-normalized conv with learned per-channel scale/shift.

    W = g * V / ||V||  (norm over kh,kw,cin per output channel, torch
    weight_norm semantics), then y = gamma * (conv(x, W) + b) + beta.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    # "int8": dynamic per-call activation scale (self-contained, but the
    #   max-reduce costs a full extra pass per conv — for tests/fallback);
    # "int8_static": calibrated scale from the "quant" variable collection
    #   (running amax updated whenever "quant" is mutable) — the serving
    #   mode: quantize fuses into the producer, zero extra bandwidth.
    quant: str = "none"
    # Skip quantization for convs whose input height exceeds this (0 = no
    # limit).  At the largest scale the quantize passes cost about as much
    # HBM time as the int8 MXU rate saves (profiled: 256^2xC32 conv 2.6 ms
    # int8 vs 4.1 ms bf16 per 125-frame chunk, but ~2.9 ms of marginal
    # quantize/dequant passes), and those convs sit nearest the output
    # where quantization error is most visible — so gating them off is
    # quality-for-free at neutral speed.  Shapes are static under jit:
    # this is a compile-time branch.
    quant_max_hw: int = 0
    # Fuse a trailing depth_to_space(., 2) into the conv as a transposed
    # conv (see _conv_d2s_transpose).  Param shapes are UNCHANGED
    # (features = 4*C_out), so checkpoints are interchangeable with the
    # subpixel formulation; the affine epilogue becomes parity-positional.
    d2s_transpose: bool = False
    dtype: Dtype = jnp.float32

    def _quant_active(self, x) -> bool:
        """int8 serving quantization applies to the 3x3 workhorse convs
        only: 1x1 convs (latent heads, aux fusers, out heads) are cheap and
        numerically sensitive, and tiny-fan-out heads (features < 8, e.g.
        the RGB out conv) gain nothing on the MXU."""
        return (self.quant in ("int8", "int8_static")
                and not self.d2s_transpose
                and self.kernel_size >= 3 and self.features >= 8
                and (self.quant_max_hw <= 0
                     or x.shape[1] <= self.quant_max_hw))

    def _act_scale(self, x, name: str):
        """Activation amax for the int8 path.  In "int8_static" mode a
        running amax lives in the "quant" collection: calibration = any
        apply with mutable=["quant"] (uses the batch's own scale and folds
        it into the stored one); serving reads the stored scale."""
        if self.quant != "int8_static":
            return None  # dynamic: computed inside _conv_int8
        var = self.variable("quant", name,
                            lambda: jnp.zeros((), jnp.float32))
        if self.is_mutable_collection("quant"):
            dyn = jnp.max(jnp.abs(x.astype(jnp.float32))) + 1e-12
            var.value = jnp.maximum(var.value, dyn)
            return dyn
        return var.value

    @nn.compact
    def __call__(self, x, aux=None):
        """aux: optional second input that the caller would otherwise
        concatenate onto x's channels.  conv(concat(x, aux), K) is computed
        as conv(x, K[:cx]) + conv(aux, K[cx:]) — exactly equivalent (conv is
        linear in the input; the weight norm runs over the FULL fan-in
        first), but ~10% faster on TPU at the early VUNet scales because
        the concatenated tensor is never materialized in HBM.  Params are
        identical to the concat formulation, so checkpoints convert 1:1."""
        cin = x.shape[-1] + (0 if aux is None else aux.shape[-1])
        k = self.kernel_size
        v = self.param(
            "v",
            nn.initializers.he_normal(in_axis=(0, 1, 2), out_axis=3),
            (k, k, cin, self.features),
            jnp.float32,
        )
        g = self.param(
            "g",
            lambda _key: jnp.sqrt(
                jnp.sum(jax.lax.stop_gradient(v) ** 2, axis=(0, 1, 2))
            ),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        gamma = self.param("gamma", nn.initializers.ones, (self.features,),
                           jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.features,),
                          jnp.float32)

        v_norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True) + 1e-12)
        kernel = v * (g / v_norm)
        if self.d2s_transpose:
            assert (aux is None and self.stride == 1
                    and self.kernel_size == 3 and self.padding == 1
                    and self.features % 4 == 0), (
                "d2s_transpose supports the subpixel-upsample conv shape "
                "only (3x3, stride 1, pad 1, features divisible by 4)")
            y = _conv_d2s_transpose(x, kernel, self.dtype)
            n, h2, w2, c = y.shape
            # channel g = (i*2+j)*C + cc of the subpixel conv lands at
            # output parity (i, j): the per-4C affine becomes positional
            def par(pv):
                return pv.reshape(2, 2, c)[None, None, :, None, :, :] \
                    .astype(self.dtype)
            y = y.reshape(n, h2 // 2, 2, w2 // 2, 2, c)
            y = par(gamma) * (y + par(bias)) + par(beta)
            return y.reshape(n, h2, w2, c)
        if self._quant_active(x):
            if aux is None:
                y = _conv_int8(x, kernel, bias, self.stride, self.padding,
                               self.dtype, ax=self._act_scale(x, "ax"))
            else:
                cx = x.shape[-1]
                y = _conv_int8(x, kernel[:, :, :cx], bias, self.stride,
                               self.padding, self.dtype,
                               ax=self._act_scale(x, "ax"))
                y = y + _conv_int8(aux, kernel[:, :, cx:], None, self.stride,
                                   self.padding, self.dtype,
                                   ax=self._act_scale(aux, "ax_aux"))
        elif aux is None:
            y = _conv(x, kernel, bias, self.stride, self.padding, self.dtype)
        else:
            cx = x.shape[-1]
            y = _conv(x, kernel[:, :, :cx], bias, self.stride, self.padding,
                      self.dtype)
            y = y + _conv(aux, kernel[:, :, cx:], None, self.stride,
                          self.padding, self.dtype)
        return gamma.astype(self.dtype) * y + beta.astype(self.dtype)


class L2NormConv2d(nn.Module):
    """Conv whose kernel is L2-normalized per output channel (no magnitude
    param), with learned gamma/beta.  Data-dependent init of gamma/beta
    (normalize first-batch activations) is done by `init_gamma_beta`.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel_size
        w = self.param(
            "w",
            nn.initializers.normal(stddev=0.05),
            (k, k, cin, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
            if self.use_bias
            else None
        )
        gamma = self.param("gamma", nn.initializers.ones, (self.features,),
                           jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        w_norm = jnp.sqrt(jnp.sum(w * w, axis=(0, 1, 2), keepdims=True) + 1e-12)
        kernel = w / w_norm
        y = _conv(x, kernel, bias, self.stride, self.padding, self.dtype)
        return gamma.astype(self.dtype) * y + beta.astype(self.dtype)


class NormDense(nn.Module):
    """Weight-normalized dense + learned per-feature gamma/beta.

    Equivalent of the reference's trick of running a 1x1 NormConv2d over a
    (B, C, 1, 1) tensor (pose_behavior_rnn.py:157-158,186-195) — here simply
    a weight-norm linear, which is what that conv lowers to.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        v = self.param("v", nn.initializers.he_normal(),
                       (cin, self.features), jnp.float32)
        g = self.param(
            "g",
            lambda _key: jnp.sqrt(
                jnp.sum(jax.lax.stop_gradient(v) ** 2, axis=0)
            ),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        gamma = self.param("gamma", nn.initializers.ones, (self.features,),
                           jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        v_norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True) + 1e-12)
        kernel = v * (g / v_norm)
        y = x.astype(self.dtype) @ kernel.astype(self.dtype) + bias.astype(self.dtype)
        return gamma.astype(self.dtype) * y + beta.astype(self.dtype)


class LayerNormConv2d(nn.Module):
    """Conv followed by (non-affine) instance normalization over H,W."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=self.padding,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        mean = jnp.mean(y, axis=(1, 2), keepdims=True)
        var = jnp.var(y, axis=(1, 2), keepdims=True)
        return (y - mean) * jax.lax.rsqrt(var + 1e-5)


CONV_LAYERS = {
    "l1": NormConv2d,
    "l2": L2NormConv2d,
    "ln": LayerNormConv2d,
}


class Downsample(nn.Module):
    """Stride-2 3x3 conv."""

    features: int
    conv_layer: Callable = NormConv2d
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return self.conv_layer(
            self.features, kernel_size=3, stride=2, padding=1,
            dtype=self.dtype,
        )(x)


class Upsample(nn.Module):
    """2x upsample: subpixel (conv to 4*C then depth-to-space) or
    conv + bilinear resize.

    transpose=True computes the identical subpixel map as one transposed
    conv (NormConv2d.d2s_transpose), skipping the depth_to_space relayout.
    Same param tree either way (flax names by class, and the kernel keeps
    its (3, 3, cin, 4C) shape), so the flag can be flipped on any
    checkpoint."""

    features: int
    subpixel: bool = True
    conv_layer: Callable = NormConv2d
    transpose: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.subpixel:
            if self.transpose:
                return self.conv_layer(4 * self.features, kernel_size=3,
                                       padding=1, d2s_transpose=True,
                                       dtype=self.dtype)(x)
            y = self.conv_layer(4 * self.features, kernel_size=3, padding=1,
                                dtype=self.dtype)(x)
            return depth_to_space(y, 2)
        y = self.conv_layer(self.features, kernel_size=3, padding=1,
                            dtype=self.dtype)(x)
        n, h, w, c = y.shape
        return jax.image.resize(y, (n, 2 * h, 2 * w, c), method="bilinear")


def packed_dropout(key, rate: float, x, bits: int = 8):
    """Dropout from PACKED random bits: `bits` random bits per element
    instead of the 32 that `jax.random.bernoulli` materializes.

    The rng tensor an elementwise dropout writes+reads to HBM is the cost
    that survives switching the PRNG to the hardware rng-bit-generator
    (CVBAE_RECONCILE.json: threefry 92.7 -> rbg 101.8 -> no-dropout 130.5
    img/s): 4 bytes/element of mask bits against bf16 activations of 2
    bytes/element.  Packing 8 bits/element cuts that traffic 4x.

    The keep threshold is quantized to K/2^bits (K = round((1-rate)*2^bits))
    and the survivors are scaled by the ACTUAL keep probability 2^bits/K,
    so E[out] == E[x] exactly; the realized drop rate differs from `rate`
    by <= 2^-(bits+1) (0.05 -> 13/256 = 0.0508 at bits=8).

    Layout matters on TPU: the words are drawn over the SUBLANE axis
    (dim -2, W for NHWC) and unpacked with a repeat + iota-shift that
    fuses into the select — never a minor-dim reshape, which would force
    a 4-lane padded intermediate and a relayout copy (measured SLOWER
    than the 32-bit mask it was replacing).  Falls back to plain 32-bit
    masks when the sublane axis doesn't divide.

    OUTCOME (measured, chip, B=12/256px cvbae step, CVBAE_RECONCILE.json):
    even with the sublane-axis unpack this is ~2-3% SLOWER end-to-end
    than plain nn.Dropout under rbg keys (99.7 vs 101.6 img/s bench
    config; 94.8 vs 97.3 production config) — XLA already fuses the
    32-bit mask chain into the surrounding elementwise ops, so the 4x
    bit-traffic saving never materializes as HBM time while the unpack
    adds VPU work.  Kept as an opt-in (`training.dropout_impl: packed`)
    experiment; the VUNet default is "flax".
    """
    if rate <= 0.0:
        return x
    assert bits in (8, 16)
    per = 32 // bits
    mx = 1 << bits
    k_keep = max(1, min(mx - 1, round((1.0 - rate) * mx)))
    scale = mx / k_keep
    if x.ndim >= 2 and x.shape[-2] % per == 0:
        shape32 = x.shape[:-2] + (x.shape[-2] // per, x.shape[-1])
        raw = jax.random.bits(key, shape32, jnp.uint32)
        raw = jnp.repeat(raw, per, axis=-2)
        pos = jax.lax.broadcasted_iota(jnp.uint32, x.shape, x.ndim - 2)
        sub = (raw >> ((pos % per) * jnp.uint32(bits))) & jnp.uint32(mx - 1)
    else:
        sub = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(mx - 1)
    mask = sub < k_keep
    return jnp.where(mask, x * jnp.asarray(scale, x.dtype),
                     jnp.zeros((), x.dtype))


class PackedDropout(nn.Module):
    """flax wrapper over :func:`packed_dropout` (rng collection
    "dropout"), drop-in for nn.Dropout in the RNB elementwise chain."""

    rate: float
    deterministic: bool = False

    @nn.compact
    def __call__(self, x):
        if self.deterministic or self.rate <= 0.0:
            return x
        return packed_dropout(self.make_rng("dropout"), self.rate, x)


def bits_dropout(key, rate: float, x):
    """Dropout as ONE integer compare on raw 32-bit rng words, with the
    mask REGENERATED in the backward pass instead of saved.

    Profiling the 256px cvbae train step (B=12, rbg keys) showed flax
    ``nn.Dropout``'s cost is NOT the rng bits (3.4 ms/step): it is the
    f32 ``_bernoulli`` chain (u32 -> f32 convert, scale, max, compare:
    ~10 ms of ``maximum_compare_fusion``) plus ~8.5 ms of relayout
    copies from carrying the bool mask to the backward pass as a
    residual.  This variant removes both:

      * keep = ``bits < round((1-rate) * 2^32)`` — a single u32 compare
        fused straight into the select; no float conversion.  The
        realized keep probability is exact to 2^-32, and survivors are
        scaled by its true inverse, so E[out] == E[x].
      * a ``jax.custom_vjp`` saves only the KEY: the backward pass
        re-runs the same generator (same key, same shape -> identical
        bits) and applies the identical mask to the cotangent.  No bool
        residual, no residual HBM traffic, no relayout copies; with
        ``core.rng.rbg_key`` keys the regeneration is hardware-rate.
    """
    if rate <= 0.0:
        return x
    if rate >= 1.0:
        # matches flax nn.Dropout's rate=1 contract (everything dropped);
        # without this, keep=0 makes scale a trace-time ZeroDivisionError
        return jnp.zeros_like(x)
    thresh = int(min(2 ** 32 - 1, round((1.0 - rate) * 2 ** 32)))
    keep = thresh / 2 ** 32
    scale = 1.0 / keep

    def apply_mask(key, v):
        m = jax.random.bits(key, v.shape, jnp.uint32) < jnp.uint32(thresh)
        return jnp.where(m, v * jnp.asarray(scale, v.dtype),
                         jnp.zeros((), v.dtype))

    @jax.custom_vjp
    def f(x, key):
        return apply_mask(key, x)

    def fwd(x, key):
        return apply_mask(key, x), key

    def bwd(key, ct):
        return apply_mask(key, ct), None

    f.defvjp(fwd, bwd)
    return f(x, key)


class BitsDropout(nn.Module):
    """flax wrapper over :func:`bits_dropout` (rng collection "dropout"),
    drop-in for nn.Dropout in the RNB elementwise chain."""

    rate: float
    deterministic: bool = False

    @nn.compact
    def __call__(self, x):
        if self.deterministic or self.rate <= 0.0:
            return x
        return bits_dropout(self.make_rng("dropout"), self.rate, x)


class VunetRNB(nn.Module):
    """Pre-activation residual block, optionally fusing an auxiliary input.

    out = x + conv(act(dropout([x] or [x, 1x1conv(act(a))])))
    (reference lib/modules.py:185-233).  The elementwise chain fuses into the
    conv under XLA; a Pallas variant lives in ops/pallas for cases XLA
    doesn't fuse.
    """

    channels: int
    residual: bool = False  # true => expects auxiliary input a
    kernel_size: int = 3
    activate: bool = True
    conv_layer: Callable = NormConv2d
    dropout_prob: float = 0.0
    # "flax": nn.Dropout (default); "packed": 8-bit packed-bit masks
    # (see packed_dropout) — measured ~2-3% SLOWER e2e than flax under
    # rbg keys (CVBAE_RECONCILE.json), kept as an opt-in experiment
    dropout_impl: str = "flax"
    act_fn: Optional[Callable] = None  # override (ref passes LeakyReLU)
    dtype: Dtype = jnp.float32

    def _make_dropout(self, train: bool):
        if self.dropout_impl == "packed":
            return PackedDropout(self.dropout_prob,
                                 deterministic=not train)
        if self.dropout_impl == "bits":
            return BitsDropout(self.dropout_prob,
                               deterministic=not train)
        if self.dropout_impl not in ("flax", "pallas", "pallas_sharded"):
            raise ValueError(
                f"unknown dropout_impl {self.dropout_impl!r}; expected "
                "'flax', 'packed', 'bits', 'pallas', or 'pallas_sharded'")
        return nn.Dropout(self.dropout_prob, deterministic=not train)

    def _fused_act_dropout(self):
        """act+dropout as ONE call when dropout_impl == 'pallas': the
        fused in-register-PRNG kernel (ops/pallas/elu_dropout.py) on a
        single TPU, the equivalent XLA elu + bits_dropout composition
        elsewhere (CPU tests).  A Mosaic custom call is NOT partitionable
        by GSPMD, so multi-chip train steps must use
        'pallas_sharded' — same fused semantics, but forced onto the XLA
        composition so the step shards (elu_dropout(sharded=True)).
        None when the site doesn't qualify: the kernel computes ELU
        specifically, so a custom act_fn or activate=False keeps the
        unfused path."""
        if (self.dropout_impl not in ("pallas", "pallas_sharded")
                or self.act_fn is not None or not self.activate):
            return None
        from .pallas.elu_dropout import elu_dropout

        sharded = self.dropout_impl == "pallas_sharded"

        def fused(v):
            return elu_dropout(v, self.make_rng("dropout"),
                               self.dropout_prob, sharded=sharded)
        return fused

    @nn.compact
    def __call__(self, x, a=None, train: bool = False):
        # train is positional-or-keyword so nn.remat(static_argnums=(3,))
        # can mark it static (kwargs cannot be static under jax.checkpoint)
        if self.act_fn is not None:
            act = self.act_fn if self.activate else (lambda v: v)
        else:
            act = nn.elu if self.activate else (lambda v: v)

        fused = (self._fused_act_dropout()
                 if train and self.dropout_prob > 0.0 else None)

        def make_main_conv():
            return self.conv_layer(
                self.channels,
                kernel_size=self.kernel_size,
                padding=self.kernel_size // 2,
                dtype=self.dtype,
            )

        if a is not None:
            assert self.residual
            # construction order (1x1 first, main conv second) fixes the
            # flax auto-names — checkpoints depend on it
            a = act(a)
            a = self.conv_layer(self.channels, kernel_size=1,
                                dtype=self.dtype)(a)
            conv = make_main_conv()
            if fused is not None:
                hx, ha = fused(x), fused(a)
            else:
                hx, ha = act(x), act(a)
                if self.dropout_prob > 0.0:
                    drop = self._make_dropout(train)
                    hx, ha = drop(hx), drop(ha)
            if isinstance(conv, NormConv2d):
                # conv(concat(hx, ha)) computed as two convs on the sliced
                # kernel — exact, and skips materializing the concat
                h = conv(hx, aux=ha)
            else:
                h = conv(jnp.concatenate([hx, ha], axis=-1))
            return x + h
        if fused is not None:
            h = fused(x)
        else:
            h = act(x)
            if self.dropout_prob > 0.0:
                h = self._make_dropout(train)(h)
        return x + make_main_conv()(h)


class FullyConnectedNet(nn.Module):
    """LeakyReLU MLP: dim -> hidden x(depth+1) -> out_dim, optional tanh.

    Used by flow couplings (reference lib/modules.py:236-257)."""

    dim: int
    depth: int
    hidden_dim: int = 256
    use_tanh: bool = False
    out_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        h = nn.leaky_relu(h)
        for _ in range(self.depth):
            h = nn.Dense(self.hidden_dim, dtype=self.dtype,
                         param_dtype=jnp.float32)(h)
            h = nn.leaky_relu(h)
        out = self.dim if self.out_dim is None else self.out_dim
        h = nn.Dense(out, dtype=self.dtype, param_dtype=jnp.float32)(h)
        if self.use_tanh:
            h = jnp.tanh(h)
        return h


class BasicUnConnectedNet(nn.Module):
    """Per-dimension MLP: every input scalar runs through the same
    1-in/`factor`-out LeakyReLU net independently (the reference builds this
    from kernel-1 Conv1d layers, lib/modules.py:614-643).  Output layout is
    factor-major — out[b, f*dim + d] — matching the reference's
    (B, factor, dim) reshape.

    On TPU the per-scalar net is a batched matmul over B*dim rows, which XLA
    tiles onto the MXU directly; no conv machinery needed.
    """

    dim: int
    depth: int
    hidden_dim: int = 256
    use_tanh: bool = False
    out_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert x.ndim == 2
        out_dim = self.dim if self.out_dim is None else self.out_dim
        assert out_dim % self.dim == 0
        factor = out_dim // self.dim
        h = x[..., None]                       # (B, dim, 1)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=jnp.float32)(h)
        h = nn.leaky_relu(h)
        for _ in range(self.depth):
            h = nn.Dense(self.hidden_dim, dtype=self.dtype,
                         param_dtype=jnp.float32)(h)
            h = nn.leaky_relu(h)
        h = nn.Dense(factor, dtype=self.dtype, param_dtype=jnp.float32)(h)
        if self.use_tanh:
            h = jnp.tanh(h)
        h = jnp.swapaxes(h, 1, 2)              # (B, factor, dim)
        return h.reshape(x.shape[0], out_dim)


class FeatureLayer(nn.Module):
    """One encoder scale: 4x4/stride-2 conv (no bias) + per-channel affine
    norm + LeakyReLU(0.2) (reference lib/modules.py:646-676).

    Channel algebra preserved: out = wm * 64 * min(2**scale, 16).  The
    reference's 'AN' norm is ActNorm with data-dependent init; here the
    affine is initialized from the first batch's per-channel statistics over
    (B, H, W) via flax's param-init-on-first-call, which is the same
    normalize-the-first-batch contract without torch's init hook.
    """

    scale: int
    in_channels: Optional[int] = None
    width_multiplier: float = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = int(self.width_multiplier * 64 * min(2 ** self.scale, 16))
        h = nn.Conv(out_ch, (4, 4), strides=(2, 2), padding=1,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        hs = jax.lax.stop_gradient(h)
        loc = self.param(
            "loc", lambda _k: -jnp.mean(hs, axis=(0, 1, 2)))
        scale = self.param(
            "scale",
            lambda _k: 1.0 / (jnp.std(hs, axis=(0, 1, 2), ddof=1) + 1e-6))
        return nn.leaky_relu(scale * (h + loc), 0.2)


class DenseEncoderLayer(nn.Module):
    """Bottleneck-to-vector head: a conv whose kernel covers the whole
    spatial extent (reference lib/modules.py:679-708) == flatten + Dense,
    which is exactly how it is lowered here (one MXU matmul instead of a
    degenerate full-frame conv).
    """

    out_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x.reshape(x.shape[0], -1)
        return nn.Dense(self.out_size, dtype=self.dtype,
                        param_dtype=jnp.float32)(h)
