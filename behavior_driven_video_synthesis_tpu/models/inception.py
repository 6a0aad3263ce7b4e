"""InceptionV3 feature extractor for IS / FID, NHWC flax.

Equivalent of the reference's `FIDInceptionModel`
(/root/reference/models/imagenet_pretrained.py:64-111): torchvision
inception_v3 trunk up to Mixed_7c, global-average-pooled to 2048-d features;
`logits=True` additionally applies the 1000-way fc for Inception Score.

The architecture follows the torchvision/tf-slim InceptionV3 used by the
standard FID protocol (BasicConv2d = conv + BN(eps=1e-3) + relu;
A/B/C/D/E mixed blocks).  Weights load from a torchvision state_dict via
`load_torchvision_inception` (offline conversion; no egress here), else
random init (machinery-complete, scores not literature-comparable).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BasicConv2d(nn.Module):
    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: Any = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=pad, use_bias=False, name="conv",
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, name="bn",
                         dtype=self.dtype)(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1", dtype=self.dtype)(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2",
                         dtype=self.dtype)(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1",
                         dtype=self.dtype)(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2",
                         dtype=self.dtype)(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3",
                         dtype=self.dtype)(b3)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                         count_include_pad=False)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool",
                         dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3",
                         dtype=self.dtype)(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1",
                         dtype=self.dtype)(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2",
                         dtype=self.dtype)(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3",
                         dtype=self.dtype)(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1", dtype=self.dtype)(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7_2", dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7_3", dtype=self.dtype)(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1",
                         dtype=self.dtype)(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_2", dtype=self.dtype)(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_3", dtype=self.dtype)(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_4", dtype=self.dtype)(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_5", dtype=self.dtype)(bd)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                         count_include_pad=False)
        bp = BasicConv2d(192, (1, 1), name="branch_pool",
                         dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1", dtype=self.dtype)(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2",
                         dtype=self.dtype)(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1",
                         dtype=self.dtype)(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7x3_2", dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7x3_3", dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4",
                         dtype=self.dtype)(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1", dtype=self.dtype)(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name="branch3x3_2a", dtype=self.dtype)(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name="branch3x3_2b", dtype=self.dtype)(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1",
                         dtype=self.dtype)(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2",
                         dtype=self.dtype)(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name="branch3x3dbl_3a", dtype=self.dtype)(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name="branch3x3dbl_3b", dtype=self.dtype)(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                         count_include_pad=False)
        bp = BasicConv2d(192, (1, 1), name="branch_pool",
                         dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Trunk to Mixed_7c -> (B, 2048) pooled features; optional 1000-way
    logits.  Input: NHWC in [-1, 1], resized to 299x299 by the caller (or
    pass any HxW >= 75; the trunk is fully convolutional)."""

    with_logits: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x.astype(self.dtype)
        h = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3",
                        dtype=self.dtype)(h)
        h = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3", dtype=self.dtype)(h)
        h = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3",
                        dtype=self.dtype)(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1", dtype=self.dtype)(h)
        h = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3",
                        dtype=self.dtype)(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = InceptionA(32, name="Mixed_5b", dtype=self.dtype)(h)
        h = InceptionA(64, name="Mixed_5c", dtype=self.dtype)(h)
        h = InceptionA(64, name="Mixed_5d", dtype=self.dtype)(h)
        h = InceptionB(name="Mixed_6a", dtype=self.dtype)(h)
        h = InceptionC(128, name="Mixed_6b", dtype=self.dtype)(h)
        h = InceptionC(160, name="Mixed_6c", dtype=self.dtype)(h)
        h = InceptionC(160, name="Mixed_6d", dtype=self.dtype)(h)
        h = InceptionC(192, name="Mixed_6e", dtype=self.dtype)(h)
        h = InceptionD(name="Mixed_7a", dtype=self.dtype)(h)
        h = InceptionE(name="Mixed_7b", dtype=self.dtype)(h)
        h = InceptionE(name="Mixed_7c", dtype=self.dtype)(h)
        feats = jnp.mean(h, axis=(1, 2))  # global average pool -> (B, 2048)
        if self.with_logits:
            logits = nn.Dense(1000, name="fc", dtype=self.dtype,
                              param_dtype=jnp.float32)(feats)
            return feats, logits
        return feats


def load_torchvision_inception(state_dict) -> Dict:
    """torchvision `inception_v3(pretrained=True).state_dict()` -> flax
    variables ({"params": ..., "batch_stats": ...})."""
    params: Dict = {}
    batch_stats: Dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(leaf)

    for key, val in state_dict.items():
        val = np.asarray(val)
        parts = key.split(".")
        if parts[0] == "fc":
            if parts[1] == "weight":
                put(params, ["fc", "kernel"], val.T)
            else:
                put(params, ["fc", "bias"], val)
            continue
        if parts[0].startswith("AuxLogits"):
            continue
        # e.g. Mixed_5b.branch1x1.conv.weight / .bn.weight ...
        module_path = parts[:-2]
        layer, leaf = parts[-2], parts[-1]
        if layer == "conv" and leaf == "weight":
            put(params, module_path + ["conv", "kernel"],
                val.transpose(2, 3, 1, 0))
        elif layer == "bn":
            if leaf == "weight":
                put(params, module_path + ["bn", "scale"], val)
            elif leaf == "bias":
                put(params, module_path + ["bn", "bias"], val)
            elif leaf == "running_mean":
                put(batch_stats, module_path + ["bn", "mean"], val)
            elif leaf == "running_var":
                put(batch_stats, module_path + ["bn", "var"], val)
    return {"params": params, "batch_stats": batch_stats}
