"""Dormant-surface parity: modules the reference defines but never trains
(RIM, concat/conditional-embedder flow, MIDiscConv, 2D attention/resblock
helpers, per-dim MLP).  They complete the SURVEY §2 inventory."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from behavior_driven_video_synthesis_tpu.models.rim import (
    RIM,
    RIMCell,
    GroupDense,
    GroupGRUCell,
    GroupLSTMCell,
)
from behavior_driven_video_synthesis_tpu.models.discriminators import (
    MIDiscConv,
    ResnetBlock2D,
    SelfAttention2D,
)
from behavior_driven_video_synthesis_tpu.models.flows.concat import (
    ConditionalTransformer,
    DenseEmbedder,
    Embedder,
)
from behavior_driven_video_synthesis_tpu.ops.nn import (
    BasicUnConnectedNet,
    DenseEncoderLayer,
    FeatureLayer,
)


class TestRIM:
    def test_group_dense_is_independent_per_block(self):
        """Each block's output depends only on its own slice."""
        m = GroupDense(4, 3, num_blocks=5)
        x = jr.normal(jr.PRNGKey(0), (2, 5, 4))
        p = m.init(jr.PRNGKey(1), x)
        y0 = m.apply(p, x)
        x2 = x.at[:, 3].add(1.0)
        y1 = m.apply(p, x2)
        diff = np.abs(np.asarray(y1 - y0)).sum(axis=(0, 2))
        assert diff[3] > 0 and np.all(diff[np.arange(5) != 3] == 0)

    def test_cell_topk_keeps_inactive_state(self):
        """Only k of N units may change state in a step (reference
        blocked_grad + mask semantics, rim.py:262-290)."""
        cell = RIMCell(input_size=8, hidden_size=16, num_units=6, k=2)
        x = jr.normal(jr.PRNGKey(0), (3, 8))
        h = jr.normal(jr.PRNGKey(1), (3, 6, 16))
        c = jr.normal(jr.PRNGKey(2), (3, 6, 16))
        p = cell.init(jr.PRNGKey(3), x, h, c)
        h2, c2 = cell.apply(p, x, h, c)
        changed = np.any(np.asarray(h2 != h), axis=-1).sum(axis=1)
        assert np.all(changed <= 2)
        changed_c = np.any(np.asarray(c2 != c), axis=-1).sum(axis=1)
        assert np.all(changed_c <= 2)

    def test_rim_shapes_lstm_bidirectional(self):
        m = RIM(input_size=12, hidden_size=16, num_units=4, k=2,
                rnn_cell="LSTM", n_layers=2, bidirectional=True)
        x = jr.normal(jr.PRNGKey(0), (5, 3, 12))
        p = m.init({"params": jr.PRNGKey(1)}, x, key=jr.PRNGKey(2))
        out, h, c = m.apply(p, x, key=jr.PRNGKey(2))
        assert out.shape == (5, 3, 2 * 4 * 16)
        assert h.shape == (4, 3, 64) and c.shape == (4, 3, 64)

    def test_rim_gru_jits(self):
        m = RIM(input_size=12, hidden_size=8, num_units=4, k=2,
                rnn_cell="GRU")
        x = jr.normal(jr.PRNGKey(0), (5, 3, 12))
        p = m.init({"params": jr.PRNGKey(1)}, x, key=jr.PRNGKey(2))
        out, h = jax.jit(lambda p, x: m.apply(p, x, key=jr.PRNGKey(2)))(p, x)
        assert out.shape == (5, 3, 32) and np.all(np.isfinite(out))

    def test_grouped_cells_match_scalar_math(self):
        """Grouped LSTM == running the gate equations per unit."""
        cell = GroupLSTMCell(4, 3, num_units=2)
        x = jr.normal(jr.PRNGKey(0), (1, 2, 4))
        h = jnp.zeros((1, 2, 3))
        c = jnp.zeros((1, 2, 3))
        p = cell.init(jr.PRNGKey(1), x, h, c)
        h2, c2 = cell.apply(p, x, h, c)
        wi = p["params"]["GroupDense_0"]["w"]
        wh = p["params"]["GroupDense_1"]["w"]
        for u in range(2):
            pre = np.asarray(x)[0, u] @ np.asarray(wi)[u] \
                + np.asarray(h)[0, u] @ np.asarray(wh)[u]
            gates = 1 / (1 + np.exp(-pre[:9]))
            g = np.tanh(pre[9:])
            i, f, o = gates[:3], gates[3:6], gates[6:]
            c_ref = np.asarray(c)[0, u] * f + i * g
            h_ref = o * np.tanh(c_ref)
            np.testing.assert_allclose(np.asarray(h2)[0, u], h_ref,
                                       atol=1e-5)


class TestConcatFlow:
    def test_dense_cond_roundtrip(self):
        ct = ConditionalTransformer(
            in_channels=10, mid_channels=64, hidden_depth=1, n_flows=3,
            conditioning_spatial_size=1, conditioning_in_channels=5)
        x = jr.normal(jr.PRNGKey(0), (4, 10))
        cond = jr.normal(jr.PRNGKey(2), (4, 5))
        p = ct.init(jr.PRNGKey(1), x, cond)
        z, logdet = ct.apply(p, x, cond)
        assert z.shape == (4, 10) and logdet.shape == (4,)
        xr = ct.apply(p, z, cond, reverse=True)
        np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-5)

    def test_image_cond_roundtrip_and_embedder_algebra(self):
        ct = ConditionalTransformer(
            in_channels=10, mid_channels=64, hidden_depth=1, n_flows=2,
            conditioning_spatial_size=16, conditioning_in_channels=3,
            embedder_down=2, conditioning_option="sequential")
        x = jr.normal(jr.PRNGKey(0), (4, 10))
        cond = jr.normal(jr.PRNGKey(3), (4, 16, 16, 3))
        p = ct.init(jr.PRNGKey(1), x, cond)
        z, _ = ct.apply(p, x, cond)
        xr = ct.apply(p, z, cond, reverse=True)
        np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-5)

    def test_conditioning_actually_conditions(self):
        ct = ConditionalTransformer(
            in_channels=6, mid_channels=32, hidden_depth=1, n_flows=2,
            conditioning_spatial_size=1, conditioning_in_channels=4)
        x = jr.normal(jr.PRNGKey(0), (2, 6))
        c1 = jr.normal(jr.PRNGKey(1), (2, 4))
        c2 = c1 + 1.0
        p = ct.init(jr.PRNGKey(2), x, c1)
        z1, _ = ct.apply(p, x, c1)
        z2, _ = ct.apply(p, x, c2)
        assert np.abs(np.asarray(z1 - z2)).max() > 1e-4

    def test_sample(self):
        ct = ConditionalTransformer(
            in_channels=6, mid_channels=32, hidden_depth=1, n_flows=2,
            conditioning_spatial_size=1, conditioning_in_channels=4)
        x = jr.normal(jr.PRNGKey(0), (2, 6))
        c = jr.normal(jr.PRNGKey(1), (2, 4))
        p = ct.init(jr.PRNGKey(2), x, c)
        s = ct.apply(p, jr.PRNGKey(3), (2, 6), c, method=ct.sample)
        assert s.shape == (2, 6) and np.all(np.isfinite(s))

    def test_dense_embedder_given_dims(self):
        de = DenseEmbedder(5, 12, given_dims=(5, 8, 12))
        x = jnp.ones((3, 5))
        p = de.init(jr.PRNGKey(0), x)
        assert de.apply(p, x).shape == (3, 12)

    def test_embedder_channel_algebra(self):
        """FeatureLayer widths follow 64*min(2^scale, 16) (reference
        lib/modules.py:646-676)."""
        emb = Embedder(in_channels=3, emb_dim=20, n_down=3)
        x = jnp.ones((2, 32, 32, 3))
        p = emb.init(jr.PRNGKey(0), x)
        assert emb.apply(p, x).shape == (2, 20)
        fl = FeatureLayer(2)
        pf = fl.init(jr.PRNGKey(0), jnp.ones((2, 16, 16, 128)))
        y = fl.apply(pf, jnp.ones((2, 16, 16, 128)))
        assert y.shape == (2, 8, 8, 256)


class TestSmallModules:
    def test_basic_unconnected_net_per_dim_independence(self):
        """Output block d depends only on input dim d, layout factor-major
        (reference lib/modules.py:614-643)."""
        m = BasicUnConnectedNet(dim=6, depth=1, hidden_dim=16, out_dim=12)
        x = jnp.zeros((1, 6))
        p = m.init(jr.PRNGKey(0), x)
        y0 = m.apply(p, x)
        y1 = m.apply(p, x.at[0, 2].set(5.0))
        diff = np.abs(np.asarray(y1 - y0))[0]  # (12,) = 2 factors x 6 dims
        changed = np.nonzero(diff > 0)[0]
        assert set(changed.tolist()) <= {2, 8}  # dim 2 in both factor blocks

    def test_dense_encoder_layer(self):
        m = DenseEncoderLayer(out_size=7)
        x = jnp.ones((2, 4, 4, 5))
        p = m.init(jr.PRNGKey(0), x)
        assert m.apply(p, x).shape == (2, 7)

    def test_midisc_conv(self):
        # (B, 1) summed logit, matching reference pose_discriminator.py:58-59
        m = MIDiscConv(n_layers=2, hidden_dim=32)
        x = jnp.ones((4, 10))
        p = m.init(jr.PRNGKey(0), x)
        out = m.apply(p, x)
        assert out.shape == (4, 1)
        assert np.isfinite(np.asarray(out)).all()

    def test_resnet_block_2d(self):
        m = ResnetBlock2D(n_out=24, stride=2)
        x = jr.normal(jr.PRNGKey(0), (2, 8, 8, 16))
        p = m.init(jr.PRNGKey(1), x)
        assert m.apply(p, x).shape == (2, 4, 4, 24)
        ident = ResnetBlock2D(n_out=16)
        pi = ident.init(jr.PRNGKey(1), x)
        assert ident.apply(pi, x).shape == x.shape

    def test_self_attention_2d(self):
        m = SelfAttention2D(down_factor=4)
        x = jr.normal(jr.PRNGKey(0), (2, 8, 8, 16))
        p = m.init(jr.PRNGKey(1), x)
        y = m.apply(p, x)
        # beta starts at 0 -> identity at init (reference gamma/beta zeros)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
