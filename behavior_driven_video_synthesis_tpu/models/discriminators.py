"""Sequence discriminators / temporal-conv action classifiers.

Equivalents of /root/reference/models/pose_discriminator.py:

  * SequenceDisc        — LSTM real/fake disc with BCE + feature-matching
                          hooks (ref :62-180)
  * SequenceDiscConv    — temporal-conv disc (ref :183-238)
  * SequenceDiscMichael — 1D-conv ResNet (GroupNorm) used as the
                          velocity-based action classifier in the behavior
                          experiment (ref :284-411;
                          experiments/behavior_net.py:296)
  * MIDisc              — MLP mutual-information discriminator (ref :8-29)

Sequences are (B, T, C) channels-last; 1D convs run over the time axis.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.recurrent import LSTM, GRUCell  # noqa: F401  (GRU variant)

Dtype = Any


class _BasicBlock1D(nn.Module):
    """Conv1d-GN-ReLU x2 residual block (ref BasicBlock :252-283)."""

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.planes, (3,), strides=(self.stride,), padding=1,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        y = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3,), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=self.dtype)(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (3,), strides=(self.stride,),
                               padding=1, use_bias=False, dtype=self.dtype,
                               param_dtype=jnp.float32)(x)
            residual = nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=self.dtype)(residual)
        return nn.relu(y + residual)


class SequenceDiscMichael(nn.Module):
    """1D-conv ResNet over velocity sequences -> (logits, feature maps)."""

    layers: Sequence[int] = (2, 1, 1, 1)
    out_dim: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, T, n_kps) — typically frame-difference 'velocities'."""
        h = nn.Conv(64, (3,), padding=1, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        h = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=self.dtype)(h)
        h = nn.relu(h)
        for i, planes in enumerate((64, 32)):
            n_blocks = self.layers[i]
            h = _BasicBlock1D(planes, stride=2, dtype=self.dtype)(h)
            for _ in range(1, n_blocks):
                h = _BasicBlock1D(planes, stride=1, dtype=self.dtype)(h)
        feat = h
        out = h.reshape(h.shape[0], -1)
        logits = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                          param_dtype=jnp.float32)(out)
        return logits, feat


class SequenceDisc(nn.Module):
    """Recurrent real/fake discriminator; returns (logit, rnn features).

    input_type: "poses" feeds raw poses, "changes" frame diffs, "combined"
    their concat along time (ref :119-141)."""

    dim_hidden_rnn: int = 256
    n_layers_class: int = 2
    dim_hidden_class: int = 128
    input_type: str = "poses"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.input_type == "changes":
            x = x[:, 1:] - x[:, :-1]
        elif self.input_type == "combined":
            x = jnp.concatenate([x[:, 1:] - x[:, :-1], x[:, 1:]], axis=-1)
        _, (h, _) = LSTM(self.dim_hidden_rnn, dtype=self.dtype)(
            x, return_sequences=False)
        feats = [h]
        for _ in range(self.n_layers_class):
            h = nn.relu(nn.Dense(self.dim_hidden_class, dtype=self.dtype,
                                 param_dtype=jnp.float32)(h))
            feats.append(h)
        logit = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32)(h)
        return logit, feats


class SequenceDiscConv(nn.Module):
    """Two-stage temporal-conv discriminator (ref :183-238)."""

    n_kps: int
    seq_len: int
    temp_window: int = 10
    temp_stride: int = 5
    n_filter: int = 16
    n_layers_class: int = 2
    dim_hidden_class: int = 128
    use_sigmoid: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, T, n_kps)."""
        # stage 1: conv spanning all keypoints x a temporal window
        h = x.transpose(0, 2, 1)[..., None]  # (B, n_kps, T, 1)
        h = nn.Conv(self.n_filter, (self.n_kps, self.temp_window),
                    strides=(1, self.temp_stride), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.relu(h)  # (B, 1, n_out, n_filter)
        # stage 2: conv spanning all temporal positions x 3 filters
        h = h.transpose(0, 2, 3, 1)  # (B, n_out, n_filter, 1)
        h = nn.Conv(self.n_filter, (h.shape[1], 3), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = h.reshape(h.shape[0], -1)
        for _ in range(self.n_layers_class):
            h = nn.relu(nn.Dense(self.dim_hidden_class, dtype=self.dtype,
                                 param_dtype=jnp.float32)(h))
        h = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32)(h)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        return h


class MIDisc(nn.Module):
    """LeakyReLU MLP discriminator (mutual-information estimator head)."""

    n_layers: int = 2
    hidden_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x
        for _ in range(self.n_layers):
            h = nn.leaky_relu(
                nn.Dense(self.hidden_dim, dtype=self.dtype,
                         param_dtype=jnp.float32)(h), 0.2)
        return nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32)(h)


class MIDiscConv(nn.Module):
    """1x1-conv MI discriminator over flat latents (reference
    models/pose_discriminator.py:32-59 `MIDiscConv1`): an L2NormConv
    feature extractor of LeakyReLU VunetRNB blocks + a LeakyReLU/conv
    classifier whose output is summed over [C, H, W] into a (B, 1) logit.
    Kernel-1 convs on (B, 1, 1, C) maps are Dense layers on TPU — the
    residual blocks are kept so converted checkpoints map one-to-one."""

    n_layers: int = 2
    hidden_dim: int = 256
    dropout_prob: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from ..ops.nn import L2NormConv2d, VunetRNB
        if x.ndim != 4:
            x = x.reshape(x.shape[0], 1, 1, -1)
        leaky = lambda v: nn.leaky_relu(v, 0.01)  # torch default slope
        h = L2NormConv2d(self.hidden_dim, kernel_size=1, dtype=self.dtype)(x)
        for _ in range(self.n_layers):
            h = VunetRNB(self.hidden_dim, kernel_size=1,
                         conv_layer=L2NormConv2d,
                         dropout_prob=self.dropout_prob,
                         act_fn=leaky,
                         dtype=self.dtype)(h, train=train)
        h = leaky(h)
        h = L2NormConv2d(self.hidden_dim, kernel_size=1, dtype=self.dtype)(h)
        # sum over [H, W, C] -> (B, 1) logit (pose_discriminator.py:58-59)
        return jnp.sum(h, axis=(1, 2, 3))[:, None]


class ResnetBlock2D(nn.Module):
    """Pre-activated GroupNorm conv resblock (reference
    models/pose_discriminator.py:414-470, unused helper)."""

    n_out: int
    n_hidden: int = 0
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nin = x.shape[-1]
        n_hidden = self.n_hidden or self.n_out
        res = x
        if nin != self.n_out or self.stride > 1:
            res = nn.Conv(self.n_out, (self.kernel_size, self.kernel_size),
                          strides=self.stride, padding=self.kernel_size // 2,
                          dtype=self.dtype, param_dtype=jnp.float32)(x)
        h = nn.GroupNorm(num_groups=max(1, nin // 8), epsilon=1e-5, dtype=self.dtype)(x)
        h = nn.Conv(n_hidden, (self.kernel_size, self.kernel_size),
                    strides=self.stride, padding=self.kernel_size // 2,
                    dtype=self.dtype, param_dtype=jnp.float32)(nn.relu(h))
        h = nn.GroupNorm(num_groups=max(1, n_hidden // 8), epsilon=1e-5,
                         dtype=self.dtype)(h)
        h = nn.Conv(self.n_out, (self.kernel_size, self.kernel_size),
                    padding=self.kernel_size // 2, dtype=self.dtype,
                    param_dtype=jnp.float32)(nn.relu(h))
        return h + res


class SelfAttention2D(nn.Module):
    """SAGAN-style self-attention with max-pooled keys/values (reference
    models/pose_discriminator.py:473-533, unused helper).  NHWC; the
    attention matmuls run on the MXU via einsum."""

    down_factor: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        inter = C // self.down_factor
        conv = lambda c, name: nn.Conv(
            c, (1, 1), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        f = conv(inter, "Wf")(x).reshape(B, H * W, inter)
        g = conv(inter, "Wg")(x)
        g = nn.max_pool(g, (2, 2), strides=(2, 2))
        g = g.reshape(B, -1, inter)
        h = conv(C // 2, "Wh")(x)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = h.reshape(B, -1, C // 2)
        attn = jax.nn.softmax(jnp.einsum("bqc,bkc->bqk", f, g), axis=-1)
        v = jnp.einsum("bqk,bkc->bqc", attn, h).reshape(B, H, W, C // 2)
        v = conv(C, "Wv")(v)
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, 1))
        return x + beta * v
