"""VUNet forward parity against an independent numpy oracle.

The oracle re-implements the reference's VunetAlter math (weight-norm conv
+ per-channel affine, pre-activation aux RNBs, stride-2 downsample,
subpixel upsample, the alter z-injection generator — reference
models/vunets.py:109-597) directly from the REFERENCE-NAMED state dict that
``vunet_alter_reference_state_dict`` exports.  Matching outputs proves the
whole conv/wiring stack end-to-end, not just the parameter round-trip.

Covers the deterministic paths: eu/du encoders and the transfer generator
(dd with posterior means — no sampling)."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from behavior_driven_video_synthesis_tpu.models.convert import (
    vunet_alter_reference_state_dict,
)
from behavior_driven_video_synthesis_tpu.models.vunet import VUNet

S, NF0, NFMAX, NLAT = 16, 4, 8, 2
N_SCALES = 3  # 1 + log2(16) - bottleneck_factor(2)


# -- numpy oracle -----------------------------------------------------------

def _elu(x):
    return np.where(x > 0, x, np.expm1(np.minimum(x, 0.0)))


def _conv(sd, prefix, x, stride=1):
    """Weight-norm conv + gamma/beta affine (reference NormConv2d:
    lib/modules.py:120-145).  sd kernels are OIHW torch layout."""
    v = sd[f"{prefix}.conv.weight_v"].astype(np.float64)
    g = sd[f"{prefix}.conv.weight_g"].reshape(-1).astype(np.float64)
    bias = sd[f"{prefix}.conv.bias"].astype(np.float64)
    gamma = sd[f"{prefix}.gamma"].reshape(-1).astype(np.float64)
    beta = sd[f"{prefix}.beta"].reshape(-1).astype(np.float64)
    norm = np.sqrt((v ** 2).sum(axis=(1, 2, 3), keepdims=True) + 1e-12)
    k = v * (g.reshape(-1, 1, 1, 1) / norm)          # OIHW
    k = k.transpose(2, 3, 1, 0)                      # -> HWIO
    kh, kw = k.shape[:2]
    pad = kh // 2
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    n, H, W, _ = x.shape
    oh = (H + 2 * pad - kh) // stride + 1
    ow = (W + 2 * pad - kw) // stride + 1
    y = np.zeros((n, oh, ow, k.shape[-1]))
    for a in range(kh):
        for b in range(kw):
            xs = xp[:, a:a + oh * stride:stride, b:b + ow * stride:stride]
            y += np.einsum("nhwc,co->nhwo", xs, k[a, b])
    return gamma * (y + bias) + beta


def _rnb(sd, prefix, x, aux=None):
    if aux is not None:
        a = _conv(sd, f"{prefix}.nin", _elu(aux))
        h = np.concatenate([x, a], axis=-1)
    else:
        h = x
    return x + _conv(sd, f"{prefix}.conv", _elu(h))


def _depth_to_space(x, bs=2):
    n, h, w, c = x.shape
    cc = c // (bs * bs)
    x = x.reshape(n, h, w, bs, bs, cc).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * bs, w * bs, cc)


def _enc_up(sd, ref, x, n_scales):
    hs = []
    nf = NF0
    h = _conv(sd, f"{ref}.nin", x)
    for i in range(n_scales):
        for k in range(2):
            h = _rnb(sd, f"{ref}.blocks.{2 * i + k}", h)
            hs.append(h)
        if i + 1 < n_scales:
            nf = min(2 * nf, NFMAX)
            h = _conv(sd, f"{ref}.downs.{i}.down", h, stride=2)
    return hs


def _dec_down_transfer(sd, gs, means):
    """dd with posterior means (alter variant, training path) — the
    deterministic transfer generator."""
    gs, zs = list(gs), list(means)
    h = _conv(sd, "dd.nin", gs[-1])
    hs = []
    nf = NFMAX
    for i in range(N_SCALES):
        h = _rnb(sd, f"dd.blocks.{2 * i}", h, aux=gs.pop())
        hs.append(h)
        if i < NLAT:
            h = _rnb(sd, f"dd.auto_blocks.{i}", h, aux=zs.pop(0))
        h = _rnb(sd, f"dd.blocks.{2 * i + 1}", h, aux=gs.pop())
        hs.append(h)
        if i + 1 < N_SCALES:
            nf = min(NFMAX, NF0 * 2 ** (N_SCALES - (i + 2)))
            h = _depth_to_space(_conv(sd, f"dd.ups.{i}.up", h))
    return _conv(sd, "dd.out_conv", hs[-1])


# -- the test ---------------------------------------------------------------

@pytest.fixture(scope="module")
def model_and_sd():
    model = VUNet(spatial_size=S, nf_start=NF0, nf_max=NFMAX,
                  n_latent_scales=NLAT, variant="alter",
                  dtype=jnp.float32)
    key = jr.PRNGKey(0)
    x = jr.normal(jr.PRNGKey(1), (2, S, S, 3)) * 0.5
    variables = model.init({"params": key, "sample": key}, x, x)
    sd = vunet_alter_reference_state_dict(
        variables, n_scales=N_SCALES, n_scales_x=N_SCALES,
        n_latent_scales=NLAT)
    return model, variables, sd


def test_enc_up_matches_oracle(model_and_sd):
    model, variables, sd = model_and_sd
    x = np.asarray(jr.normal(jr.PRNGKey(2), (2, S, S, 3))) * 0.5
    ours = model.apply(variables, jnp.asarray(x),
                       method=lambda m, v: m.eu(v))
    theirs = _enc_up(sd, "eu", x, N_SCALES)
    assert len(ours) == len(theirs) == 2 * N_SCALES
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o), t, atol=2e-4)


def test_transfer_generator_matches_oracle(model_and_sd):
    """du + dd on posterior means — the deterministic appearance-transfer
    path (the serving hot path)."""
    model, variables, sd = model_and_sd
    c = np.asarray(jr.normal(jr.PRNGKey(3), (2, S, S, 3))) * 0.5
    # means from OUR encoder (any arrays of the right shapes would do —
    # the compared region consumes them as plain inputs)
    app = jnp.asarray(np.asarray(jr.normal(jr.PRNGKey(4),
                                           (2, S, S, 3))) * 0.5)
    means, _ = model.apply(variables, app, rngs={"sample": jr.PRNGKey(5)},
                           method=model.encode_means)
    ours = model.apply(variables, means, jnp.asarray(c),
                       method=model.transfer_cached)

    gs = _enc_up(sd, "du", c, N_SCALES)
    img = _dec_down_transfer(sd, gs, [np.asarray(m, np.float64)
                                      for m in means])
    assert np.asarray(ours).shape == img.shape == (2, S, S, 3)
    np.testing.assert_allclose(np.asarray(ours), img, atol=5e-4)


# -- org variant: the 4-group space-to-depth autoregressive prior -----------

def _space_to_depth(x, bs=2):
    n, h, w, c = x.shape
    x = x.reshape(n, h // bs, bs, w // bs, bs, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // bs, w // bs, bs * bs * c)


def _dec_down_org_training(sd, gs, zs_posterior):
    """dd (org) on posterior z — deterministic: the AR feedback consumes the
    posterior groups (reference vunets.py:718-757)."""
    gs, zs = list(gs), list(zs_posterior)
    h = _conv(sd, "dd.nin", gs[-1])
    hs, ps = [], []
    for i in range(N_SCALES):
        h = _rnb(sd, f"dd.blocks.{2 * i}", h, aux=gs.pop())
        hs.append(h)
        if i < NLAT:
            z_post = zs.pop(0)
            zg = np.split(_space_to_depth(z_post, 2), 4, axis=-1)
            pre = _rnb(sd, f"dd.auto_blocks.l_{i}.0", h)
            p_feat = _space_to_depth(pre, 2)
            p_groups = []
            for l in range(4):
                p_groups.append(_conv(sd, f"dd.auto_lp.l_{i}.{l}", p_feat))
                if l + 1 < 4:
                    p_feat = _rnb(sd, f"dd.auto_blocks.l_{i}.{l + 1}",
                                  p_feat, aux=zg[l])
            ps.append(_depth_to_space(np.concatenate(p_groups, axis=-1), 2))
            h = np.concatenate([h, z_post], axis=-1)
            h = _conv(sd, f"dd.latent_nins.l_{i}", h)
        h = _rnb(sd, f"dd.blocks.{2 * i + 1}", h, aux=gs.pop())
        hs.append(h)
        if i + 1 < N_SCALES:
            h = _depth_to_space(_conv(sd, f"dd.ups.{i}.up", h))
    return _conv(sd, "dd.out_conv", hs[-1]), ps


def test_org_ar_prior_matches_oracle():
    """The org variant's training generator — including the 4-group
    autoregressive prior with posterior feedback — against the oracle."""
    from behavior_driven_video_synthesis_tpu.models.convert import (
        vunet_org_reference_state_dict,
    )

    model = VUNet(spatial_size=S, nf_start=NF0, nf_max=NFMAX,
                  n_latent_scales=NLAT, variant="org", dtype=jnp.float32)
    key = jr.PRNGKey(0)
    x = jr.normal(jr.PRNGKey(1), (2, S, S, 3)) * 0.5
    variables = model.init({"params": key, "sample": key}, x, x)
    sd = vunet_org_reference_state_dict(
        variables, n_scales=N_SCALES, n_scales_x=N_SCALES,
        n_latent_scales=NLAT)

    c = np.asarray(jr.normal(jr.PRNGKey(3), (2, S, S, 3))) * 0.5
    app = jr.normal(jr.PRNGKey(4), (2, S, S, 3)) * 0.5

    # posterior zs from OUR encoder (fixed key); fed identically to both
    hs = model.apply(variables, app, method=lambda m, v: m.eu(v))
    _, _, _, zs = model.apply(variables, hs,
                              rngs={"sample": jr.PRNGKey(5)},
                              method=lambda m, h: m.ed(h))
    gs_ours = model.apply(variables, jnp.asarray(c),
                          method=lambda m, v: m.du(v))
    img_ours, _, ps_ours, _ = model.apply(
        variables, gs_ours, zs, rngs={"sample": jr.PRNGKey(6)},
        method=lambda m, g, z: m.dd(g, z, training=True))

    gs = _enc_up(sd, "du", c, N_SCALES)
    img, ps = _dec_down_org_training(
        sd, gs, [np.asarray(z, np.float64) for z in zs])
    # oracle runs f64, ours f32: the AR chain is the deepest path, so
    # allow a slightly wider accumulation tolerance
    np.testing.assert_allclose(np.asarray(img_ours), img, atol=2e-3)
    assert len(ps_ours) == len(ps) == NLAT
    for po, pt in zip(ps_ours, ps):
        np.testing.assert_allclose(np.asarray(po), pt, atol=2e-3)
