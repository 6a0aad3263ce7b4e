"""VUNet: the appearance/shape image synthesizer, NHWC TPU-native.

Re-design of /root/reference/models/vunets.py: four sub-networks

  * EncUp   — bottom-up appearance encoder (2 RNBs/scale + stride-2 down,
              nf doubling to nf_max)                        (ref :109-148)
  * EncDown — top-down posterior over n_latent_scales: per scale fuse an
              appearance skip, emit latent params, sample z, fuse
              (skip, z), subpixel-upsample                  (ref :159-219,
              alter variant with sigmoid-squashed logstd     :520-597)
  * DecUp   — bottom-up shape/stickman encoder               (ref :222-261)
  * DecDown — top-down generator; at latent scales either the 4-group
              space-to-depth autoregressive prior ("org", ref :600-783) or a
              single z-injection RNB ("alter", ref :264-424), then
              skip-fused RNBs and upsampling

Wrappers `VUNet` expose forward (posterior samples), test_forward (prior
samples), transfer (posterior means) — matching VunetOrg/VunetAlter
(ref :81-106, :490-515).

Scale bookkeeping (ref :20-33): n_scales = 1 + round(log2(spatial_size)) -
bottleneck_factor; the appearance branch loses box_factor scales when the
input is the part-stack (n_channels_x > 3).

All convs are NHWC; compute dtype configurable (bf16 to hit MXU tiles).
Latent sampling draws from the "sample" RNG collection; dropout from
"dropout".
"""
from __future__ import annotations

from functools import partial
from typing import Any, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.nn import (
    CONV_LAYERS,
    Downsample,
    NormConv2d,
    Upsample,
    VunetRNB,
    space_to_depth,
    depth_to_space,
)

Dtype = Any


def compute_n_scales(spatial_size: int, bottleneck_factor: int,
                     n_scales_cfg: int = 0) -> int:
    if n_scales_cfg >= 6:
        return n_scales_cfg
    return 1 + int(np.round(np.log2(spatial_size))) - bottleneck_factor


# Rematerialization (jax.checkpoint / nn.remat): the backward pass
# recomputes the wrapped block instead of storing its intermediates — the
# standard TPU memory-for-FLOPs trade, intended to let the cvbae train
# batch grow past the HBM knee.  Two granularities (training.remat):
#   "rnb"    — checkpoint every VunetRNB (2 convs).
#   "subnet" — checkpoint the four subnets (eu/ed/du/dd) wholesale: only
#              the subnet boundary lists are stored; each subnet forward
#              is recomputed once in backward.
# HONEST STATUS (examples/remat_memory.py, XLA:CPU buffer assignment,
# 128px B=8): temp memory went UP with both modes (+11% rnb, +13% subnet)
# — on the CPU lowering the backward temp arena is dominated by conv
# workspaces, not stored activations, and the prevent_cse barriers block
# fusions.  The TPU lowering accounts differently (MXU convs carry no
# im2col workspaces); whether remat pays on the chip is decided by the
# queued B-sweep (examples/profile_train.py --remat).  Default stays off.
# static_argnums marks the positional bool flags static (kwargs cannot be
# static under jax.checkpoint).  The __name__ override keeps flax
# auto-naming (and thus the param tree) IDENTICAL to the plain classes,
# so remat can be flipped on any trained checkpoint (guarded by
# tests/test_vunet_training.py::test_remat_is_numerically_identical).
_REMAT_RNB = nn.remat(VunetRNB, static_argnums=(3,))
_REMAT_RNB.__name__ = "VunetRNB"


def _rnb_cls(remat: bool):
    return _REMAT_RNB if remat else VunetRNB


class EncUp(nn.Module):
    """Bottom-up encoder producing a list of per-scale features."""

    n_scales: int
    nf_start: int
    nf_max: int
    conv_layer: Any = NormConv2d
    dropout_prob: float = 0.0
    dropout_impl: str = "flax"  # "packed" opt-in; see ops.nn.packed_dropout
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        rnb = _rnb_cls(self.remat)
        hs = []
        nf = self.nf_start
        h = self.conv_layer(nf, kernel_size=1, dtype=self.dtype)(x)
        for i in range(self.n_scales):
            for _ in range(2):
                h = rnb(channels=nf, conv_layer=self.conv_layer,
                        dropout_prob=self.dropout_prob,
                        dropout_impl=self.dropout_impl,
                        dtype=self.dtype)(h, None, train)
                hs.append(h)
            if i + 1 < self.n_scales:
                nf = min(2 * nf, self.nf_max)
                h = Downsample(features=nf, conv_layer=self.conv_layer,
                               dtype=self.dtype)(h)
        return hs


class EncDown(nn.Module):
    """Top-down posterior: consumes appearance skips from the smallest scale
    upward, emitting latent parameters and posterior samples per scale."""

    nf: int
    n_latent_scales: int = 2
    variant: str = "org"  # "org": fixed std 1 | "alter": learned logstd
    conv_layer: Any = NormConv2d
    dropout_prob: float = 0.0
    dropout_impl: str = "flax"  # "packed" opt-in; see ops.nn.packed_dropout
    upsample_transpose: bool = False
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, gs: List[jnp.ndarray], train: bool = False):
        rnb = _rnb_cls(self.remat)
        gs = list(gs)
        nf = self.nf
        hs, means, logstds, zs = [], [], [], []

        h = self.conv_layer(nf, kernel_size=1, dtype=self.dtype)(gs[-1])
        for i in range(self.n_latent_scales):
            h = rnb(channels=nf, residual=True,
                    conv_layer=self.conv_layer,
                    dropout_prob=self.dropout_prob,
                    dropout_impl=self.dropout_impl,
                    dtype=self.dtype)(h, gs.pop(), train)
            hs.append(h)

            mu = self.conv_layer(nf, kernel_size=3, padding=1,
                                 dtype=self.dtype)(h)
            means.append(mu)
            eps = jax.random.normal(self.make_rng("sample"), mu.shape,
                                    mu.dtype)
            if self.variant == "alter":
                logstd = self.conv_layer(nf, kernel_size=3, padding=1,
                                         dtype=self.dtype)(h)
                logstd = jax.nn.sigmoid(logstd)
                logstds.append(logstd)
                z = mu + jnp.exp(logstd) * eps
            else:
                z = mu + eps  # fixed stddev 1 (ref latent_sample :151-156)
            zs.append(z)

            gz = jnp.concatenate([gs.pop(), z], axis=-1)
            h = rnb(channels=nf, residual=True,
                    conv_layer=self.conv_layer,
                    dropout_prob=self.dropout_prob,
                    dropout_impl=self.dropout_impl,
                    dtype=self.dtype)(h, gz, train)
            hs.append(h)

            h = Upsample(features=nf, subpixel=True,
                         conv_layer=self.conv_layer,
                         transpose=self.upsample_transpose,
                         dtype=self.dtype)(h)

        h = rnb(channels=nf, residual=True, conv_layer=self.conv_layer,
                dropout_prob=self.dropout_prob,
                dropout_impl=self.dropout_impl,
                dtype=self.dtype)(h, gs.pop(), train)
        hs.append(h)
        return hs, means, logstds, zs


class DecDown(nn.Module):
    """Top-down generator: fuse shape skips; inject latents at the first
    n_latent_scales scales (train: posterior z; test: prior sample;
    transfer: posterior mean)."""

    n_scales: int
    nf_in: int
    nf_last: int
    nf_out: int = 3
    n_latent_scales: int = 2
    subpixel_upsampling: bool = True
    variant: str = "org"  # "org": 4-group AR prior | "alter": plain injection
    conv_layer: Any = NormConv2d
    dropout_prob: float = 0.0
    dropout_impl: str = "flax"  # "packed" opt-in; see ops.nn.packed_dropout
    upsample_transpose: bool = False
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, gs: List[jnp.ndarray],
                 zs_posterior: Optional[List[jnp.ndarray]],
                 training: bool, train: bool = False):
        """training=True consumes zs_posterior; else samples the prior.

        `training` is positional-required (not keyword-only — nn.remat's
        static_argnums needs it positional) so every call site must state
        posterior-vs-prior intent explicitly.

        Returns (img_params, hs, prior_params, prior_samples).
        """
        rnb = _rnb_cls(self.remat)
        gs = list(gs)
        zs_posterior = list(zs_posterior) if zs_posterior else []
        hs, ps, zs = [], [], []

        nf = self.nf_in
        h = self.conv_layer(nf, kernel_size=1, dtype=self.dtype)(gs[-1])
        for i in range(self.n_scales):
            h = rnb(channels=nf, residual=True,
                    conv_layer=self.conv_layer,
                    dropout_prob=self.dropout_prob,
                    dropout_impl=self.dropout_impl,
                    dtype=self.dtype)(h, gs.pop(), train)
            hs.append(h)

            if i < self.n_latent_scales:
                if self.variant == "alter":
                    if training:
                        z = zs_posterior.pop(0)
                    else:
                        z = jax.random.normal(self.make_rng("sample"),
                                              h.shape, h.dtype)
                    h = rnb(channels=nf, residual=True,
                            conv_layer=self.conv_layer,
                            dropout_prob=self.dropout_prob,
                            dropout_impl=self.dropout_impl,
                            dtype=self.dtype)(h, z, train)
                else:
                    h, p, z_prior = self._autoregressive_scale(
                        h, zs_posterior.pop(0) if training else None,
                        nf, train=train)
                    ps.append(p)
                    zs.append(z_prior)
            h = rnb(channels=nf, residual=True,
                    conv_layer=self.conv_layer,
                    dropout_prob=self.dropout_prob,
                    dropout_impl=self.dropout_impl,
                    dtype=self.dtype)(h, gs.pop(), train)
            hs.append(h)

            if i + 1 < self.n_scales:
                out_c = min(self.nf_in,
                            self.nf_last * 2 ** (self.n_scales - (i + 2)))
                subpixel = (self.subpixel_upsampling
                            or i < self.n_latent_scales)
                h = Upsample(features=out_c, subpixel=subpixel,
                             conv_layer=self.conv_layer,
                             transpose=subpixel and self.upsample_transpose,
                             dtype=self.dtype)(h)
                nf = out_c

        assert not gs
        if training:
            assert not zs_posterior

        img = self.conv_layer(self.nf_out, kernel_size=3, padding=1,
                              dtype=self.dtype)(hs[-1])
        return img, hs, ps, zs

    def _autoregressive_scale(self, h, z_posterior, nf, *, train: bool):
        """The 4-group space-to-depth autoregressive prior
        (reference vunets.py:718-757): split the latent into 4 spatial
        subsampling groups; predict each group's prior mean from features
        that have seen the previous groups' (posterior at train / sampled at
        test) values.  Fixed 4-iteration unroll."""
        rnb = _rnb_cls(self.remat)
        training = z_posterior is not None
        if training:
            z_groups_post = jnp.split(space_to_depth(z_posterior, 2), 4,
                                      axis=-1)
        pre = rnb(channels=nf, conv_layer=self.conv_layer,
                  dropout_prob=self.dropout_prob,
                  dropout_impl=self.dropout_impl,
                  dtype=self.dtype)(h, None, train)
        p_features = space_to_depth(pre, 2)

        p_groups, z_groups = [], []
        for l in range(4):
            p_group = self.conv_layer(nf, kernel_size=3, padding=1,
                                      dtype=self.dtype)(p_features)
            p_groups.append(p_group)
            eps = jax.random.normal(self.make_rng("sample"), p_group.shape,
                                    p_group.dtype)
            z_group = p_group + eps
            z_groups.append(z_group)
            feedback = z_groups_post[l] if training else z_group
            if l + 1 < 4:
                p_features = rnb(channels=4 * nf, residual=True,
                                 conv_layer=self.conv_layer,
                                 dropout_prob=self.dropout_prob,
                                 dropout_impl=self.dropout_impl,
                                 dtype=self.dtype)(
                    p_features, feedback, train)

        p = depth_to_space(jnp.concatenate(p_groups, axis=-1), 2)
        z_prior = depth_to_space(jnp.concatenate(z_groups, axis=-1), 2)

        z = z_posterior if training else z_prior
        h = jnp.concatenate([h, z], axis=-1)
        h = self.conv_layer(nf, kernel_size=1, dtype=self.dtype)(h)
        return h, p, z_prior


# Subnet-granularity remat (training.remat: "subnet" — see the note at
# _REMAT_RNB).  In VUNet.setup the subnets are bound to attribute names
# (eu/ed/du/dd), so the param tree is attribute-named and identical either
# way; the __name__ override just keeps reprs clean.
_REMAT_ENC_UP = nn.remat(EncUp, static_argnums=(2,))
_REMAT_ENC_UP.__name__ = "EncUp"
_REMAT_ENC_DOWN = nn.remat(EncDown, static_argnums=(2,))
_REMAT_ENC_DOWN.__name__ = "EncDown"
_REMAT_DEC_DOWN = nn.remat(DecDown, static_argnums=(3, 4))
_REMAT_DEC_DOWN.__name__ = "DecDown"


class VUNet(nn.Module):
    """Full VUNet with org/alter variants.

    modes: __call__ (training posterior path), test_forward (prior
    sampling), transfer (posterior means — appearance transfer).
    """

    spatial_size: int = 256
    n_channels_x: int = 3
    nf_start: int = 32
    nf_max: int = 128
    n_latent_scales: int = 2
    bottleneck_factor: int = 2
    box_factor: int = 2
    n_scales_cfg: int = 0
    subpixel_upsampling: bool = True
    conv_layer_type: str = "l1"
    variant: str = "alter"  # "org" | "alter"
    dropout_prob: float = 0.0
    dropout_impl: str = "flax"  # "packed" opt-in; see ops.nn.packed_dropout
    quant: str = "none"  # "int8": dynamically-quantized serving convs
    quant_max_hw: int = 0  # skip quant for convs with input H above this
    # Fuse subpixel upsamples into transposed convs (same params/numerics,
    # skips the depth_to_space relayout copies; needs the l1 conv layer)
    upsample_transpose: bool = False
    # backward rematerialization (memory-for-FLOPs; see note at _REMAT_RNB):
    # False | "subnet" (recommended) | "rnb"/True (per-block, for ablation)
    remat: Any = False
    dtype: Dtype = jnp.float32

    @property
    def n_scales(self) -> int:
        return compute_n_scales(self.spatial_size, self.bottleneck_factor,
                                self.n_scales_cfg)

    @property
    def n_scales_x(self) -> int:
        return (self.n_scales - self.box_factor
                if self.n_channels_x > 3 else self.n_scales)

    def setup(self):
        assert self.remat in (False, True, "rnb", "subnet"), (
            "training.remat must be one of false/true/'rnb'/'subnet', got "
            f"{self.remat!r}")
        conv_layer = CONV_LAYERS[self.conv_layer_type]
        conv_layer_pf = conv_layer
        if self.quant != "none":
            # post-training quantized serving: the same f32 weight-norm
            # params, but the 3x3 workhorse convs of the PER-FRAME path
            # (du + dd — what transfer_cached runs for every video frame)
            # execute int8 on the MXU (see ops/nn._conv_int8).  The
            # appearance encode path (eu + ed) runs once per video and
            # feeds the latents, so it stays full precision.  "int8_static"
            # additionally needs a calibration pass (see calibrate()).
            assert conv_layer is NormConv2d, (
                "quantized serving requires the l1 (NormConv2d) conv layer")
            conv_layer_pf = partial(NormConv2d, quant=self.quant,
                                    quant_max_hw=self.quant_max_hw)
        subnet_remat = self.remat == "subnet"
        rnb_remat = self.remat is True or self.remat == "rnb"
        enc_up_cls = _REMAT_ENC_UP if subnet_remat else EncUp
        enc_down_cls = _REMAT_ENC_DOWN if subnet_remat else EncDown
        dec_down_cls = _REMAT_DEC_DOWN if subnet_remat else DecDown
        self.eu = enc_up_cls(
            n_scales=self.n_scales_x, nf_start=self.nf_start,
            nf_max=self.nf_max, conv_layer=conv_layer,
            dropout_prob=self.dropout_prob,
            dropout_impl=self.dropout_impl, remat=rnb_remat,
            dtype=self.dtype,
        )
        if self.upsample_transpose:
            assert conv_layer is NormConv2d, (
                "upsample_transpose requires the l1 (NormConv2d) conv layer")
        self.ed = enc_down_cls(
            nf=self.nf_max, n_latent_scales=self.n_latent_scales,
            variant=self.variant, conv_layer=conv_layer,
            dropout_prob=self.dropout_prob,
            dropout_impl=self.dropout_impl,
            upsample_transpose=self.upsample_transpose, remat=rnb_remat,
            dtype=self.dtype,
        )
        self.du = enc_up_cls(
            n_scales=self.n_scales, nf_start=self.nf_start,
            nf_max=self.nf_max, conv_layer=conv_layer_pf,
            dropout_prob=self.dropout_prob,
            dropout_impl=self.dropout_impl, remat=rnb_remat,
            dtype=self.dtype,
        )
        self.dd = dec_down_cls(
            n_scales=self.n_scales, nf_in=self.nf_max,
            nf_last=self.nf_start, nf_out=3,
            n_latent_scales=self.n_latent_scales,
            subpixel_upsampling=self.subpixel_upsampling,
            variant=self.variant, conv_layer=conv_layer_pf,
            dropout_prob=self.dropout_prob,
            dropout_impl=self.dropout_impl,
            upsample_transpose=self.upsample_transpose, remat=rnb_remat,
            dtype=self.dtype,
        )

    def __call__(self, x, c, *, train: bool = False):
        """x: appearance image (NHWC); c: stickman (NHWC).

        Returns (imgs, posterior_means, posterior_logstds_or_None,
        prior_params, activations)."""
        hs = self.eu(x, train)
        es, means, logstds, zs_posterior = self.ed(hs, train)
        gs = self.du(c, train)
        imgs, ds, ps, _ = self.dd(gs, zs_posterior, True, train)
        activations = (hs, es, gs, ds)
        return imgs, means, logstds, ps, activations

    def test_forward(self, c):
        """Sample appearance from the prior given only the stickman."""
        gs = self.du(c, False)
        imgs, _, _, _ = self.dd(gs, None, False, False)
        return imgs

    def transfer(self, x, c):
        """Appearance transfer: posterior means instead of samples."""
        hs = self.eu(x, False)
        _, means, _, _ = self.ed(hs, False)
        gs = self.du(c, False)
        imgs, _, _, _ = self.dd(gs, list(means), True, False)
        return imgs

    def encode_means(self, x):
        """Posterior means only (for probes / transfer caching)."""
        hs = self.eu(x, False)
        _, means, logstds, _ = self.ed(hs, False)
        return means, logstds

    def transfer_cached(self, means, c):
        """Appearance transfer from PRE-COMPUTED posterior means: runs only
        the shape encoder + generator (du + dd).  Video synthesis with a
        fixed appearance encodes the appearance ONCE per video instead of
        once per frame — eu+ed drop out of the per-frame cost entirely
        (a TPU-serving optimization absent from the reference, which
        re-encodes per frame; data_conversions_3d.py:1161-1173)."""
        gs = self.du(c, False)
        imgs, _, _, _ = self.dd(gs, list(means), True, False)
        return imgs


def vunet_from_config(config, variant: str,
                      n_channels_x: Optional[int] = None, **overrides):
    """Build a VUNet exactly as the training driver does
    (experiments/shape_and_pose_net.py:_build_models) from a run config —
    the single source of truth shared by training, cross-model rendering
    (--synth_model) and serving (bdvs-generate), so a dumped config.yaml
    always reconstructs the identical param tree.  ``overrides`` add
    serving-only knobs (quant, upsample_transpose, dtype, ...)."""
    arch = config.get("architecture", {}) if config else {}
    data = config.get("data", {}) if config else {}
    training = config.get("training", {}) if config else {}
    if n_channels_x is None:
        n_channels_x = 30 if bool(data.get("inplane_normalize", False)) \
            else 3
    kw = dict(
        spatial_size=int(data.get("spatial_size", 256)),
        n_channels_x=n_channels_x,
        nf_start=int(arch.get("nf_start", 32)),
        nf_max=int(arch.get("nf_max", 128)),
        n_latent_scales=int(arch.get("n_latent_scales", 2)),
        bottleneck_factor=int(data.get("bottleneck_factor", 2)),
        box_factor=int(data.get("box_factor", 2)),
        n_scales_cfg=int(arch.get("n_scales", 0)),
        subpixel_upsampling=bool(arch.get("subpixel_upsampling", True)),
        conv_layer_type=str(arch.get("conv_layer_type", "l1")),
        variant=variant,
        dropout_prob=float(training.get("dropout_prob", 0.0)),
        dropout_impl=str(training.get("dropout_impl", "flax")),
        # False | "subnet" | "rnb" (YAML true -> per-RNB, kept for ablation)
        remat=training.get("remat", False) or False,
        dtype=jnp.bfloat16 if bool(training.get("bf16", True))
        else jnp.float32,
    )
    kw.update(overrides)
    return VUNet(**kw)


def calibrate_quant(model: "VUNet", variables, means, stickman):
    """One PTQ calibration pass for a quant="int8_static" VUNet.

    Runs transfer_cached on representative (means, stickman) inputs with
    the "quant" collection mutable, folding the batch's per-conv activation
    amax into the stored running scales.  Returns the variables dict with
    the calibrated "quant" collection.  Call once (or a few times over
    diverse batches) before serving; serving applies then read the static
    scales and the quantize chain fuses into its producers (zero extra
    bandwidth — see ops/nn._conv_int8).
    """
    _, mut = model.apply(variables, means, stickman, mutable=["quant"],
                         method=model.transfer_cached)
    return {**variables, **mut}


class VunetRegressor(nn.Module):
    """Latent->2D-pose probe (reference vunets.py:786-825): conv embedders
    over each latent map, concat, MLP to keypoints."""

    n_out: int
    latent_widths: List[int]
    nf_max: int = 128
    linear_width_factor: int = 1
    n_linear: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, embeddings: List[jnp.ndarray]):
        outs = []
        for i, e in enumerate(reversed(embeddings)):
            w = self.latent_widths[i]
            y = nn.Conv(self.linear_width_factor * self.nf_max, (w, w),
                        padding="VALID", dtype=self.dtype,
                        param_dtype=jnp.float32)(e)
            outs.append(nn.relu(y).reshape(y.shape[0], -1))
        h = jnp.concatenate(outs, axis=-1)
        width = h.shape[-1]
        for i in range(self.n_linear):
            if i < self.n_linear - 1:
                width = max(width // 2, self.n_out)
                h = nn.relu(nn.Dense(width, dtype=self.dtype,
                                     param_dtype=jnp.float32)(h))
            else:
                h = nn.Dense(self.n_out, dtype=self.dtype,
                             param_dtype=jnp.float32)(h)
        return h
