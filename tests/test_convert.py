"""Torch-checkpoint conversion parity.

Oracles: a torch model replicating the reference ResidualBehaviorNet
architecture exactly (nn.LSTM + weight-norm 1x1 conv heads + nn.LSTMCell
residual rollout — pose_behavior_rnn.py:125-210,463-626), and a numpy
re-implementation of the flow forward.  Converted state dicts must produce
matching outputs from our flax models.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from behavior_driven_video_synthesis_tpu.models import (  # noqa: E402
    ResidualBehaviorNet,
)
from behavior_driven_video_synthesis_tpu.models.convert import (  # noqa: E402
    convert_behavior_net,
    convert_latent_flow,
)
from behavior_driven_video_synthesis_tpu.models.flows import (  # noqa: E402
    LatentFlow,
)

K, H, B, T = 12, 16, 3, 6


class TorchRefBehaviorNet(nn.Module):
    """Reference-architecture torch model with reference param names."""

    class BEnc(nn.Module):
        def __init__(self):
            super().__init__()
            self.rnn = nn.LSTM(K, H, 1, batch_first=True)
            self.mu_fn = self._norm_conv()
            self.std_fn = self._norm_conv()

        @staticmethod
        def _norm_conv():
            m = nn.Module()
            m.beta = nn.Parameter(torch.zeros(1, H, 1, 1))
            m.gamma = nn.Parameter(torch.ones(1, H, 1, 1) * 1.3)
            m.conv = torch.nn.utils.weight_norm(
                nn.Conv2d(H, H, 1), name="weight")
            return m

        def head(self, m, pre):
            x = pre[:, :, None, None]
            out = m.conv(x)
            return (m.gamma * out + m.beta)[:, :, 0, 0]

        def forward(self, x):
            _, (h_n, _) = self.rnn(x)
            pre = h_n[-1]
            return self.head(self.mu_fn, pre), self.head(self.std_fn, pre)

    class Dec(nn.Module):
        def __init__(self):
            super().__init__()
            self.rnn = nn.LSTMCell(K, H)
            self.n_out = nn.Linear(H, K)

        def forward(self, b, x0, length):
            h = c = b
            x = x0
            xs = []
            for _ in range(length):
                h, c = self.rnn(x, (h, c))
                x = x + self.n_out(h)
                xs.append(x)
            return torch.stack(xs, dim=1)

    def __init__(self):
        super().__init__()
        self.b_enc = self.BEnc()
        self.decoder = self.Dec()


def test_behavior_net_conversion_numerics(rng):
    torch.manual_seed(0)
    ref = TorchRefBehaviorNet()
    x = rng.randn(B, T, K).astype(np.float32)
    with torch.no_grad():
        mu_t, logstd_t = ref.b_enc(torch.from_numpy(x))
        xs_t = ref.decoder(mu_t, torch.from_numpy(x[:, 0]), T)

    variables = convert_behavior_net(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    model = ResidualBehaviorNet(n_kps=K, dim_hidden_b=H)
    b, mu, logstd, pre = model.apply(
        variables, jnp.asarray(x), sample=False,
        rngs={"sample": jax.random.PRNGKey(0)}, method=model.infer_b)
    np.testing.assert_allclose(np.asarray(mu), mu_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(logstd), logstd_t.numpy(),
                               atol=1e-5)
    xs, _ = model.apply(variables, jnp.asarray(mu_t.numpy()),
                        jnp.asarray(x), T, method=model.generate_seq)
    np.testing.assert_allclose(np.asarray(xs), xs_t.numpy(), atol=1e-4)


def _numpy_flow_forward(sd, x, n_flows, hidden_depth):
    """Numpy oracle of the reference flow forward (ActNorm -> 2 couplings
    with half-swap -> shuffle), even dims."""
    C = x.shape[1]
    d1 = C // 2

    def mlp(prefix, v, use_tanh):
        n_dense = hidden_depth + 2
        h = v
        for j in range(n_dense):
            w = sd[f"{prefix}.main.{2 * j}.weight"]
            b = sd[f"{prefix}.main.{2 * j}.bias"]
            h = h @ w.T + b
            if j < n_dense - 1:
                h = np.where(h > 0, h, 0.01 * h)  # leaky_relu
        return np.tanh(h) if use_tanh else h

    for i in range(n_flows):
        ref = f"flow.sub_layers.{i}"
        loc = sd[f"{ref}.norm_layer.loc"].reshape(-1)
        scale = sd[f"{ref}.norm_layer.scale"].reshape(-1)
        x = scale * (x + loc)
        for j in range(2):
            if j % 2 != 0:
                x = np.concatenate([x[:, d1:], x[:, :d1]], axis=1)
            xa, xb = x[:, :d1], x[:, d1:]
            s = mlp(f"{ref}.coupling.s.{j}", xa, True)
            t = mlp(f"{ref}.coupling.t.{j}", xa, False)
            x = np.concatenate([xa, xb * np.exp(s) + t], axis=1)
        perm = sd[f"{ref}.shuffle.forward_shuffle_idx"]
        x = x[:, perm]
    return x


def test_flow_conversion_numerics(rng):
    C, n_flows, depth = 10, 3, 2
    # build a reference-shaped random state dict
    sd = {}
    for i in range(n_flows):
        ref = f"flow.sub_layers.{i}"
        sd[f"{ref}.norm_layer.loc"] = rng.randn(1, C, 1, 1).astype(
            np.float32) * 0.3
        sd[f"{ref}.norm_layer.scale"] = (
            rng.rand(1, C, 1, 1).astype(np.float32) + 0.5)
        dims = [C // 2] + [24] * (depth + 1) + [C // 2]
        for group in ("s", "t"):
            for j in range(2):
                for lidx in range(depth + 2):
                    sd[f"{ref}.coupling.{group}.{j}.main.{2 * lidx}.weight"] \
                        = rng.randn(dims[lidx + 1], dims[lidx]).astype(
                            np.float32) * 0.2
                    sd[f"{ref}.coupling.{group}.{j}.main.{2 * lidx}.bias"] \
                        = rng.randn(dims[lidx + 1]).astype(np.float32) * 0.1
        sd[f"{ref}.shuffle.forward_shuffle_idx"] = rng.permutation(C)

    x = rng.randn(4, C).astype(np.float32)
    ref_out = _numpy_flow_forward(sd, x.copy(), n_flows, depth)

    variables = convert_latent_flow(sd, n_flows=n_flows, hidden_depth=depth)
    flow = LatentFlow(flow_in_channels=C, flow_mid_channels=24,
                      flow_hidden_depth=depth, n_flows=n_flows)
    z, logdet = flow.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(z), ref_out, atol=1e-4)
    # converted flow still exactly invertible
    back = flow.apply(variables, z, method=flow.reverse)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-3)


def test_vunet_alter_conversion_roundtrip(rng):
    """our params -> reference state dict -> our params must round-trip
    exactly, covering every parameter (structure + layout transforms)."""
    from behavior_driven_video_synthesis_tpu.models.convert import (
        convert_vunet_alter,
        vunet_alter_reference_state_dict,
    )
    from behavior_driven_video_synthesis_tpu.models.vunet import VUNet

    model = VUNet(spatial_size=32, nf_start=8, nf_max=16, variant="alter")
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sample": jax.random.PRNGKey(1)}, x, x)
    n_scales = model.n_scales
    sd = vunet_alter_reference_state_dict(
        variables, n_scales=n_scales, n_scales_x=model.n_scales_x)
    # torch layouts present
    assert sd["eu.nin.conv.weight_v"].shape == (8, 3, 1, 1)  # OIHW
    back = convert_vunet_alter(sd, n_scales=n_scales,
                               n_scales_x=model.n_scales_x)

    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back["params"]))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]),
                                      err_msg=str(path))

    # converted params drive the model identically
    out1 = model.apply(variables, x, x,
                       rngs={"sample": jax.random.PRNGKey(2)})[0]
    out2 = model.apply(back, x, x,
                       rngs={"sample": jax.random.PRNGKey(2)})[0]
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_vunet_org_conversion_roundtrip(rng):
    """org variant (4-group AR prior) converter round-trips exactly."""
    from behavior_driven_video_synthesis_tpu.models.convert import (
        convert_vunet_org,
        vunet_org_reference_state_dict,
    )
    from behavior_driven_video_synthesis_tpu.models.vunet import VUNet

    model = VUNet(spatial_size=32, nf_start=8, nf_max=16, variant="org")
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sample": jax.random.PRNGKey(1)}, x, x)
    sd = vunet_org_reference_state_dict(
        variables, n_scales=model.n_scales, n_scales_x=model.n_scales_x)
    assert any(k.startswith("dd.auto_lp.l_0.") for k in sd)
    assert any(k.startswith("dd.latent_nins.l_1") for k in sd)
    back = convert_vunet_org(sd, n_scales=model.n_scales,
                             n_scales_x=model.n_scales_x)
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back["params"]))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]),
                                      err_msg=str(path))
    out1 = model.apply(variables, x, x,
                       rngs={"sample": jax.random.PRNGKey(2)})[0]
    out2 = model.apply(back, x, x,
                       rngs={"sample": jax.random.PRNGKey(2)})[0]
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
