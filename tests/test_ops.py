"""Primitive op tests: torch-parity for recurrent cells and norm convs,
inverse properties for space/depth reshuffles."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from behavior_driven_video_synthesis_tpu.ops import (
    NormConv2d,
    NormDense,
    L2NormConv2d,
    FullyConnectedNet,
    VunetRNB,
    Upsample,
    Downsample,
    space_to_depth,
    depth_to_space,
    LSTM,
    LSTMCell,
    GRUCell,
)

torch = pytest.importorskip("torch")


class TestSpaceDepth:
    def test_inverse(self, rng):
        x = jnp.asarray(rng.randn(2, 8, 8, 12).astype(np.float32))
        np.testing.assert_allclose(
            depth_to_space(space_to_depth(x, 2), 2), x, atol=0
        )

    def test_torch_parity(self, rng):
        """Channel ordering must match the reference's NCHW reshuffle
        (lib/modules.py:11-34) transposed to NHWC."""
        x = rng.randn(2, 4, 6, 8).astype(np.float32)  # NCHW, c=4
        n, c, h, w = x.shape
        bs = 2
        t = torch.from_numpy(x)
        # reference SpaceToDepth
        v = t.view(n, c, h // bs, bs, w // bs, bs)
        v = v.permute(0, 3, 5, 1, 2, 4).contiguous()
        ref_s2d = v.view(n, c * bs * bs, h // bs, w // bs).numpy()
        ours = space_to_depth(jnp.asarray(x.transpose(0, 2, 3, 1)), bs)
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref_s2d, atol=0
        )
        # reference DepthToSpace on the packed tensor
        t2 = torch.from_numpy(ref_s2d)
        n2, c2, h2, w2 = t2.shape
        v2 = t2.view(n2, bs, bs, c2 // bs ** 2, h2, w2)
        v2 = v2.permute(0, 3, 4, 1, 5, 2).contiguous()
        ref_d2s = v2.view(n2, c2 // bs ** 2, h2 * bs, w2 * bs).numpy()
        ours2 = depth_to_space(
            jnp.asarray(ref_s2d.transpose(0, 2, 3, 1)), bs
        )
        np.testing.assert_allclose(
            np.asarray(ours2).transpose(0, 3, 1, 2), ref_d2s, atol=0
        )


class TestRecurrentParity:
    def test_lstm_full_sequence(self, rng):
        B, T, D, H = 3, 7, 11, 16
        x = rng.randn(B, T, D).astype(np.float32)
        tl = torch.nn.LSTM(D, H, 1, batch_first=True)
        with torch.no_grad():
            out_t, (h_t, c_t) = tl(torch.from_numpy(x))

        model = LSTM(hidden=H)
        params = {
            "params": {
                "w_ih": jnp.asarray(tl.weight_ih_l0.detach().numpy().T),
                "w_hh": jnp.asarray(tl.weight_hh_l0.detach().numpy().T),
                "b_ih": jnp.asarray(tl.bias_ih_l0.detach().numpy()),
                "b_hh": jnp.asarray(tl.bias_hh_l0.detach().numpy()),
            }
        }
        hs, (h_f, c_f) = model.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(hs, out_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(h_f, h_t[0].numpy(), atol=1e-5)
        np.testing.assert_allclose(c_f, c_t[0].numpy(), atol=1e-5)

    def test_lstm_lengths_match_truncation(self, rng):
        B, T, D, H = 4, 10, 6, 8
        x = rng.randn(B, T, D).astype(np.float32)
        model = LSTM(hidden=H)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        lengths = jnp.array([10, 7, 3, 1])
        _, (h_f, _) = model.apply(params, jnp.asarray(x), lengths)
        for i, L in enumerate([10, 7, 3, 1]):
            _, (h_i, _) = model.apply(params, jnp.asarray(x[i:i + 1, :L]))
            np.testing.assert_allclose(h_f[i], h_i[0], atol=1e-5)

    def test_lstm_cell(self, rng):
        B, D, H = 5, 9, 12
        x = rng.randn(B, D).astype(np.float32)
        h0 = rng.randn(B, H).astype(np.float32)
        c0 = rng.randn(B, H).astype(np.float32)
        tc = torch.nn.LSTMCell(D, H)
        with torch.no_grad():
            h_t, c_t = tc(torch.from_numpy(x),
                          (torch.from_numpy(h0), torch.from_numpy(c0)))
        cell = LSTMCell(hidden=H)
        params = {
            "params": {
                "w_ih": jnp.asarray(tc.weight_ih.detach().numpy().T),
                "w_hh": jnp.asarray(tc.weight_hh.detach().numpy().T),
                "b_ih": jnp.asarray(tc.bias_ih.detach().numpy()),
                "b_hh": jnp.asarray(tc.bias_hh.detach().numpy()),
            }
        }
        (h_n, c_n), _ = cell.apply(params, (jnp.asarray(h0), jnp.asarray(c0)),
                                   jnp.asarray(x))
        np.testing.assert_allclose(h_n, h_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(c_n, c_t.numpy(), atol=1e-5)

    def test_gru_cell(self, rng):
        B, D, H = 5, 9, 12
        x = rng.randn(B, D).astype(np.float32)
        h0 = rng.randn(B, H).astype(np.float32)
        tc = torch.nn.GRUCell(D, H)
        with torch.no_grad():
            h_t = tc(torch.from_numpy(x), torch.from_numpy(h0))
        cell = GRUCell(hidden=H)
        params = {
            "params": {
                "w_ih": jnp.asarray(tc.weight_ih.detach().numpy().T),
                "w_hh": jnp.asarray(tc.weight_hh.detach().numpy().T),
                "b_ih": jnp.asarray(tc.bias_ih.detach().numpy()),
                "b_hh": jnp.asarray(tc.bias_hh.detach().numpy()),
            }
        }
        h_n, _ = cell.apply(params, jnp.asarray(h0), jnp.asarray(x))
        np.testing.assert_allclose(h_n, h_t.numpy(), atol=1e-5)


class TestNormConv:
    def test_torch_weight_norm_parity(self, rng):
        """NormConv2d == torch weight_norm(Conv2d) + gamma/beta
        (reference lib/modules.py:120-145) with copied weights."""
        B, C, H, W, F, K = 2, 5, 8, 8, 7, 3
        x = rng.randn(B, C, H, W).astype(np.float32)
        conv = torch.nn.utils.weight_norm(
            torch.nn.Conv2d(C, F, K, 1, 1), name="weight"
        )
        gamma = rng.randn(F).astype(np.float32)
        beta = rng.randn(F).astype(np.float32)
        with torch.no_grad():
            y_t = conv(torch.from_numpy(x))
            y_t = torch.from_numpy(gamma)[None, :, None, None] * y_t + \
                torch.from_numpy(beta)[None, :, None, None]
        # copy: torch v (F, C, K, K) -> HWIO; torch g (F,1,1,1) -> (F,)
        v_t = conv.weight_v.detach().numpy().transpose(2, 3, 1, 0)
        g_t = conv.weight_g.detach().numpy().reshape(-1)
        params = {
            "params": {
                "v": jnp.asarray(v_t),
                "g": jnp.asarray(g_t),
                "bias": jnp.asarray(conv.bias.detach().numpy()),
                "gamma": jnp.asarray(gamma),
                "beta": jnp.asarray(beta),
            }
        }
        model = NormConv2d(features=F, kernel_size=K, padding=1)
        y = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(y).transpose(0, 3, 1, 2), y_t.numpy(), atol=1e-5
        )

    def test_init_identity_scale(self, rng):
        """At init, g = ||v|| so the normalized kernel equals v."""
        x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
        model = NormConv2d(features=6, kernel_size=3, padding=1)
        params = model.init(jax.random.PRNGKey(0), x)
        v = params["params"]["v"]
        g = params["params"]["g"]
        np.testing.assert_allclose(
            g, np.sqrt((np.asarray(v) ** 2).sum(axis=(0, 1, 2))), rtol=1e-6
        )

    def test_l2norm_conv_unit_norm(self, rng):
        x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
        model = L2NormConv2d(features=6, kernel_size=3, padding=1,
                             use_bias=False)
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        assert y.shape == (2, 8, 8, 6)


class TestBlocks:
    def test_rnb_shapes_and_residual(self, rng):
        x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
        block = VunetRNB(channels=8)
        params = block.init(jax.random.PRNGKey(0), x)
        y = block.apply(params, x)
        assert y.shape == x.shape

    def test_rnb_aux(self, rng):
        x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
        a = jnp.asarray(rng.randn(2, 16, 16, 12).astype(np.float32))
        block = VunetRNB(channels=8, residual=True)
        params = block.init(jax.random.PRNGKey(0), x, a)
        y = block.apply(params, x, a)
        assert y.shape == x.shape

    def test_up_down_shapes(self, rng):
        x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
        down = Downsample(features=16)
        p = down.init(jax.random.PRNGKey(0), x)
        y = down.apply(p, x)
        assert y.shape == (2, 8, 8, 16)
        up = Upsample(features=4, subpixel=True)
        p = up.init(jax.random.PRNGKey(0), y)
        z = up.apply(p, y)
        assert z.shape == (2, 16, 16, 4)

    def test_mlp(self, rng):
        x = jnp.asarray(rng.randn(4, 10).astype(np.float32))
        net = FullyConnectedNet(dim=10, depth=2, hidden_dim=32, out_dim=5,
                                use_tanh=True)
        p = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(p, x)
        assert y.shape == (4, 5)
        assert np.abs(np.asarray(y)).max() <= 1.0

    def test_norm_dense(self, rng):
        x = jnp.asarray(rng.randn(4, 10).astype(np.float32))
        net = NormDense(features=6)
        p = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(p, x)
        assert y.shape == (4, 6)


class TestSubpixelTranspose:
    """Upsample(transpose=True) fuses the depth_to_space into a transposed
    conv — identical params, identical map (ops/nn._conv_d2s_transpose)."""

    def _upsample_pair(self, rng, h=8, cin=6, cout=4):
        x = jnp.asarray(rng.randn(2, h, h, cin).astype(np.float32))
        up = Upsample(features=cout, subpixel=True)
        up_t = Upsample(features=cout, subpixel=True, transpose=True)
        p = up.init(jax.random.PRNGKey(0), x)
        # mutate params away from the benign init state (gamma=1, beta=0,
        # bias=0) so the positional epilogue is actually exercised
        cp = jax.tree_util.tree_map(lambda a: np.array(a), p)
        cp["params"]["NormConv2d_0"]["bias"] += \
            rng.randn(4 * cout).astype(np.float32)
        cp["params"]["NormConv2d_0"]["gamma"] *= \
            (1 + 0.3 * rng.randn(4 * cout).astype(np.float32))
        cp["params"]["NormConv2d_0"]["beta"] += \
            rng.randn(4 * cout).astype(np.float32)
        return x, up, up_t, cp, p

    def test_same_param_tree(self, rng):
        x, up, up_t, _, p = self._upsample_pair(rng)
        p_t = up_t.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(p) == \
            jax.tree_util.tree_structure(p_t)
        for a, b in zip(jax.tree_util.tree_leaves(p),
                        jax.tree_util.tree_leaves(p_t)):
            assert a.shape == b.shape

    def test_matches_subpixel_exactly(self, rng):
        x, up, up_t, cp, _ = self._upsample_pair(rng)
        y = np.asarray(up.apply(cp, x))
        y_t = np.asarray(up_t.apply(cp, x))
        assert y_t.shape == y.shape
        np.testing.assert_allclose(y_t, y, atol=2e-5, rtol=1e-5)

    def test_odd_spatial(self, rng):
        x, up, up_t, cp, _ = self._upsample_pair(rng, h=7)
        np.testing.assert_allclose(np.asarray(up_t.apply(cp, x)),
                                   np.asarray(up.apply(cp, x)),
                                   atol=2e-5, rtol=1e-5)

    def test_vunet_transfer_matches(self, rng):
        """Flipping upsample_transpose on a whole VUNet changes nothing
        but the lowering: same variables, same transfer output."""
        from behavior_driven_video_synthesis_tpu.models.vunet import VUNet

        key = jax.random.PRNGKey(0)
        x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
        kw = dict(spatial_size=32, nf_start=4, nf_max=8, variant="alter")
        m = VUNet(**kw)
        m_t = VUNet(**kw, upsample_transpose=True)
        v = m.init({"params": key, "sample": key}, x, x)
        outs = []
        for mod in (m, m_t):
            outs.append(np.asarray(mod.apply(
                v, x, x, rngs={"sample": key}, method=mod.transfer)))
        # identical math, different float reassociation; random-init
        # activations reach ~1e3, so scale the tolerance to the output
        tol = 1e-5 * float(np.abs(outs[0]).max())
        np.testing.assert_allclose(outs[1], outs[0], atol=tol, rtol=1e-4)


class TestPackedDropout:
    """ops.nn.packed_dropout: packed-bit masks with unbiased scaling."""

    def test_keep_rate_and_unbiasedness(self):
        import jax
        import jax.numpy as jnp
        from behavior_driven_video_synthesis_tpu.ops.nn import packed_dropout

        x = jnp.ones((301, 277))
        for bits in (8, 16):
            mx = 1 << bits
            k_keep = round(0.95 * mx)
            y = packed_dropout(jax.random.PRNGKey(0), 0.05, x, bits=bits)
            kept = float(jnp.mean((y > 0).astype(jnp.float32)))
            assert abs(kept - k_keep / mx) < 0.01
            # survivors scaled by the ACTUAL keep prob -> E[y] == E[x]
            assert abs(float(jnp.mean(y)) - 1.0) < 0.02

    def test_zero_rate_identity_and_grads(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from behavior_driven_video_synthesis_tpu.ops.nn import packed_dropout

        x = jnp.arange(24.0).reshape(4, 6)
        assert packed_dropout(jax.random.PRNGKey(0), 0.0, x) is x
        g = jax.grad(lambda v: jnp.sum(
            packed_dropout(jax.random.PRNGKey(1), 0.5, v)))(jnp.ones((997,)))
        vals = set(np.unique(np.asarray(g)).tolist())
        assert vals <= {0.0, 2.0}  # 1/keep for keep=128/256

    def test_rnb_dropout_impl_param_compatible(self):
        """packed vs flax dropout produce the SAME param tree (the impl only
        changes the mask stream), so the knob is safe on any checkpoint."""
        import jax
        import jax.numpy as jnp
        from behavior_driven_video_synthesis_tpu.ops.nn import VunetRNB

        x = jnp.ones((2, 8, 8, 4))
        trees = []
        for impl in ("packed", "flax"):
            rnb = VunetRNB(channels=4, dropout_prob=0.3, dropout_impl=impl)
            v = rnb.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)}, x, train=True)
            trees.append(jax.tree_util.tree_structure(v["params"]))
            y = rnb.apply(v, x, train=True,
                          rngs={"dropout": jax.random.PRNGKey(2)})
            assert y.shape == x.shape
        assert trees[0] == trees[1]


class TestBitsDropout:
    """ops.nn.bits_dropout: u32-threshold masks, backward regenerates."""

    def test_keep_rate_and_unbiasedness(self):
        import jax
        import jax.numpy as jnp
        from behavior_driven_video_synthesis_tpu.ops.nn import bits_dropout

        x = jnp.ones((301, 277))
        y = bits_dropout(jax.random.PRNGKey(0), 0.05, x)
        kept = float(jnp.mean((y > 0).astype(jnp.float32)))
        assert abs(kept - 0.95) < 0.01
        assert abs(float(jnp.mean(y)) - 1.0) < 0.02
        assert bits_dropout(jax.random.PRNGKey(0), 0.0, x) is x

    def test_backward_mask_matches_forward(self):
        """The custom VJP regenerates the SAME mask for the cotangent:
        grad of sum(dropout(x)) must equal the forward keep pattern
        scaled by 1/keep — exactly what saving the mask would give."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from behavior_driven_video_synthesis_tpu.ops.nn import bits_dropout

        key = jax.random.PRNGKey(7)
        x = jnp.ones((513, 129))
        f = lambda v: bits_dropout(key, 0.25, v)
        y = f(x)
        g = jax.grad(lambda v: jnp.sum(f(v)))(x)
        # positions kept in forward (y > 0) carry grad scale; dropped = 0
        np.testing.assert_allclose(np.asarray(g), np.asarray(y),
                                   rtol=1e-6)

    def test_value_matches_plain_autodiff_version(self):
        """The custom-vjp forward equals the plain (non-custom) masked
        computation with the same key, under jit."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from behavior_driven_video_synthesis_tpu.ops.nn import bits_dropout

        key = jax.random.PRNGKey(3)
        rate = 0.1
        thresh = round((1 - rate) * 2 ** 32)
        scale = 2 ** 32 / thresh
        x = jnp.asarray(np.random.RandomState(0).randn(64, 33), jnp.float32)
        y = jax.jit(lambda v: bits_dropout(key, rate, v))(x)
        m = jax.random.bits(key, x.shape, jnp.uint32) < jnp.uint32(thresh)
        ref = jnp.where(m, x * scale, 0.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-6)

    def test_rnb_bits_impl_param_compatible(self):
        import jax
        import jax.numpy as jnp
        from behavior_driven_video_synthesis_tpu.ops.nn import VunetRNB

        x = jnp.ones((2, 8, 8, 4))
        trees = []
        for impl in ("bits", "flax"):
            rnb = VunetRNB(channels=4, dropout_prob=0.3, dropout_impl=impl)
            v = rnb.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)}, x, train=True)
            trees.append(jax.tree_util.tree_structure(v["params"]))
            y = rnb.apply(v, x, train=True,
                          rngs={"dropout": jax.random.PRNGKey(2)})
            assert y.shape == x.shape
        assert trees[0] == trees[1]
