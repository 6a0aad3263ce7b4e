"""Flow tests: exact invertibility, analytic logdet vs autodiff jacobian,
ActNorm data-dependent init, odd-dimension support."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from behavior_driven_video_synthesis_tpu.models.flows import (
    ActNorm,
    DoubleCoupling,
    Shuffle,
    UnconditionalFlow,
    LatentFlow,
    flow_loss,
    gaussian_reference_nll,
)


def _init(model, key, *args):
    return model.init({"params": key}, *args)


class TestActNorm:
    def test_data_dependent_init(self, rng):
        x = jnp.asarray((rng.randn(256, 10) * 3.0 + 5.0).astype(np.float32))
        an = ActNorm()
        variables = _init(an, jax.random.PRNGKey(0), x)
        y, logdet = an.apply(variables, x)
        np.testing.assert_allclose(np.asarray(y).mean(0), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(y).std(0, ddof=1), 1.0,
                                   atol=1e-3)
        assert logdet.shape == (256,)

    def test_invertible(self, rng):
        x = jnp.asarray(rng.randn(16, 10).astype(np.float32))
        an = ActNorm()
        variables = _init(an, jax.random.PRNGKey(0), x)
        y, _ = an.apply(variables, x)
        back = an.apply(variables, y, reverse=True)
        np.testing.assert_allclose(back, x, atol=1e-5)


@pytest.mark.parametrize("C", [8, 7])  # even and odd dims
class TestCoupling:
    def test_invertible(self, rng, C):
        x = jnp.asarray(rng.randn(8, C).astype(np.float32))
        dc = DoubleCoupling(in_channels=C, hidden_dim=32)
        variables = _init(dc, jax.random.PRNGKey(0), x)
        y, logdet = dc.apply(variables, x)
        back = dc.apply(variables, y, reverse=True)
        np.testing.assert_allclose(back, x, atol=1e-4)

    def test_logdet_vs_jacobian(self, rng, C):
        x = jnp.asarray(rng.randn(3, C).astype(np.float32))
        dc = DoubleCoupling(in_channels=C, hidden_dim=16)
        variables = _init(dc, jax.random.PRNGKey(0), x)

        def f(v):
            y, _ = dc.apply(variables, v[None])
            return y[0]

        _, logdet = dc.apply(variables, x)
        for i in range(3):
            J = jax.jacfwd(f)(x[i])
            _, ref_ld = np.linalg.slogdet(np.asarray(J))
            np.testing.assert_allclose(logdet[i], ref_ld, atol=1e-3)


class TestShuffle:
    def test_invertible_and_volume_preserving(self, rng):
        x = jnp.asarray(rng.randn(4, 13).astype(np.float32))
        sh = Shuffle(in_channels=13)
        variables = _init(sh, jax.random.PRNGKey(0), x)
        y, logdet = sh.apply(variables, x)
        np.testing.assert_allclose(logdet, 0.0, atol=0)
        back = sh.apply(variables, y, reverse=True)
        np.testing.assert_allclose(back, x, atol=0)
        # actually permutes
        assert np.abs(np.asarray(y - x)).max() > 0


class TestFullFlow:
    def test_invertible_stack(self, rng):
        C = 17
        x = jnp.asarray(rng.randn(8, C).astype(np.float32))
        flow = UnconditionalFlow(in_channels=C, hidden_dim=32, n_flows=4)
        variables = _init(flow, jax.random.PRNGKey(0), x)
        z, logdet = flow.apply(variables, x)
        assert z.shape == x.shape and logdet.shape == (8,)
        back = flow.apply(variables, z, reverse=True)
        np.testing.assert_allclose(back, x, atol=2e-3)

    def test_logdet_full_stack(self, rng):
        C = 5
        x = jnp.asarray(rng.randn(2, C).astype(np.float32))
        flow = UnconditionalFlow(in_channels=C, hidden_dim=16, n_flows=3)
        variables = _init(flow, jax.random.PRNGKey(0), x)

        def f(v):
            z, _ = flow.apply(variables, v[None])
            return z[0]

        _, logdet = flow.apply(variables, x)
        for i in range(2):
            J = jax.jacfwd(f)(x[i])
            _, ref_ld = np.linalg.slogdet(np.asarray(J))
            np.testing.assert_allclose(logdet[i], ref_ld, atol=1e-3)

    def test_latent_flow_api(self, rng):
        C = 24
        x = jnp.asarray(rng.randn(16, C).astype(np.float32))
        lf = LatentFlow(flow_in_channels=C, flow_mid_channels=48, n_flows=3)
        variables = _init(lf, jax.random.PRNGKey(0), x)
        z, logdet = lf.apply(variables, x)
        loss = flow_loss(z, logdet)
        ref = gaussian_reference_nll(z)
        assert np.isfinite(float(loss)) and np.isfinite(float(ref))
        samples = lf.apply(variables, jax.random.PRNGKey(1), 5,
                           method=lf.sample)
        assert samples.shape == (5, C)

    def test_jit_forward_reverse(self, rng):
        C = 16
        x = jnp.asarray(rng.randn(8, C).astype(np.float32))
        flow = UnconditionalFlow(in_channels=C, hidden_dim=32, n_flows=4)
        variables = _init(flow, jax.random.PRNGKey(0), x)
        fwd = jax.jit(lambda v, a: flow.apply(v, a))
        rev = jax.jit(lambda v, a: flow.apply(v, a, reverse=True))
        z, _ = fwd(variables, x)
        np.testing.assert_allclose(rev(variables, z), x, atol=2e-3)


@pytest.mark.parametrize("ctype", ["gin", "nice"])
class TestVolumePreservingVariants:
    def test_invertible_and_volume_preserving(self, rng, ctype):
        C = 8
        x = jnp.asarray(rng.randn(8, C).astype(np.float32))
        flow = UnconditionalFlow(in_channels=C, hidden_dim=32, n_flows=3,
                                 coupling_type=ctype)
        variables = flow.init({"params": jax.random.PRNGKey(0)}, x)
        z, logdet = flow.apply(variables, x)
        back = flow.apply(variables, z, reverse=True)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                   atol=2e-3)
        # couplings are volume preserving: only ActNorm contributes logdet,
        # which is constant across the batch
        assert np.allclose(np.asarray(logdet), np.asarray(logdet)[0])


class TestConditionalFlow:
    """Conditional (embedding-fed) flow path — reference
    models/flow/blocks.py:8-56 / :452-492 / :655-689."""

    def _make(self, rng, C=8, E=6, n_flows=3, option="none"):
        from behavior_driven_video_synthesis_tpu.models.flows import (
            ConditionalFlow,
        )

        x = jnp.asarray(rng.randn(4, C).astype(np.float32))
        emb = jnp.asarray(rng.randn(4, E).astype(np.float32))
        flow = ConditionalFlow(in_channels=C, embedding_dim=E,
                               hidden_dim=32, n_flows=n_flows,
                               conditioning_option=option)
        variables = _init(flow, jax.random.PRNGKey(0), x, emb)
        return flow, variables, x, emb

    @pytest.mark.parametrize("option", ["none", "parallel", "sequential"])
    def test_invertible(self, rng, option):
        flow, variables, x, emb = self._make(rng, option=option)
        z, logdet = flow.apply(variables, x, emb)
        assert logdet.shape == (4,)
        back = flow.apply(variables, z, emb, reverse=True)
        np.testing.assert_allclose(back, x, atol=2e-3)

    def test_conditioning_matters(self, rng):
        flow, variables, x, emb = self._make(rng)
        z1, _ = flow.apply(variables, x, emb)
        z2, _ = flow.apply(variables, x, emb + 1.0)
        assert np.abs(np.asarray(z1 - z2)).max() > 1e-3

    def test_logdet_vs_jacobian(self, rng):
        # NOTE: matches the reference semantics where InvLeakyRelu reports
        # zero logdet — so compare against the jacobian of the flow with
        # activation="none" (exact), not "lrelu".
        from behavior_driven_video_synthesis_tpu.models.flows import (
            ConditionalFlow,
        )

        C, E = 6, 4
        x = jnp.asarray(rng.randn(2, C).astype(np.float32))
        emb = jnp.asarray(rng.randn(2, E).astype(np.float32))
        flow = ConditionalFlow(in_channels=C, embedding_dim=E,
                               hidden_dim=16, n_flows=2, activation="none")
        variables = _init(flow, jax.random.PRNGKey(0), x, emb)

        def f(v, e):
            z, _ = flow.apply(variables, v[None], e[None])
            return z[0]

        _, logdet = flow.apply(variables, x, emb)
        for i in range(2):
            J = jax.jacfwd(f)(x[i], emb[i])
            _, ref_ld = np.linalg.slogdet(np.asarray(J))
            np.testing.assert_allclose(logdet[i], ref_ld, atol=1e-3)


class TestMADE:
    """MADE autoregressive MLP — reference lib/modules.py:503-611."""

    def test_autoregressive_jacobian(self, rng):
        from behavior_driven_video_synthesis_tpu.models.flows import (
            ARFullyConnectedNet,
        )

        nin = 6
        net = ARFullyConnectedNet(nin=nin, hidden_sizes=[32, 32],
                                  nout=2 * nin, natural_ordering=True)
        x = jnp.asarray(rng.randn(1, nin).astype(np.float32))
        variables = _init(net, jax.random.PRNGKey(0), x)

        J = jax.jacfwd(lambda v: net.apply(variables, v[None])[0])(x[0])
        J = np.asarray(J).reshape(2, nin, nin)  # two output chunks
        for chunk in J:
            # output j may depend only on inputs < j (natural ordering)
            assert np.allclose(np.triu(chunk), 0.0, atol=1e-7), \
                "MADE mask leaks future inputs"

    def test_conditional_trunk(self, rng):
        from behavior_driven_video_synthesis_tpu.models.flows import (
            ARFullyConnectedNet,
        )

        net = ARFullyConnectedNet(nin=4, hidden_sizes=[16], nout=4,
                                  ncond=3, natural_ordering=True)
        x = jnp.asarray(rng.randn(2, 4).astype(np.float32))
        y = jnp.asarray(rng.randn(2, 3).astype(np.float32))
        variables = net.init({"params": jax.random.PRNGKey(0)}, x, y)
        out1 = net.apply(variables, x, y)
        out2 = net.apply(variables, x, y + 1.0)
        assert out1.shape == (2, 4)
        assert np.abs(np.asarray(out1 - out2)).max() > 1e-4


class TestRQSCoupling:
    """Rational-quadratic spline coupling — reference
    models/flow/nsf_flow.py:23-168."""

    def test_spline_roundtrip_and_tails(self, rng):
        from behavior_driven_video_synthesis_tpu.models.flows.spline import (
            rational_quadratic_spline,
        )

        D, K = 5, 8
        x = jnp.asarray(np.concatenate(
            [rng.randn(8, D), np.array([[10.0] * D])]).astype(np.float32))
        w = jnp.asarray(rng.randn(9, D, K).astype(np.float32))
        h = jnp.asarray(rng.randn(9, D, K).astype(np.float32))
        d = jnp.asarray(rng.randn(9, D, K - 1).astype(np.float32))
        y, ld = rational_quadratic_spline(x, w, h, d)
        back, ld_inv = rational_quadratic_spline(y, w, h, d, inverse=True)
        np.testing.assert_allclose(back, x, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ld) + np.asarray(ld_inv), 0.0,
                                   atol=1e-4)
        # outside the tail bound: identity with zero logdet
        np.testing.assert_allclose(y[-1], x[-1], atol=0)
        np.testing.assert_allclose(ld[-1], 0.0, atol=0)

    @pytest.mark.parametrize("C", [8, 7])
    def test_coupling_invertible(self, rng, C):
        from behavior_driven_video_synthesis_tpu.models.flows import (
            RQSCoupling,
        )

        x = jnp.asarray((rng.randn(6, C) * 0.5).astype(np.float32))
        rq = RQSCoupling(in_channels=C, hidden_dim=32)
        variables = _init(rq, jax.random.PRNGKey(0), x)
        y, logdet = rq.apply(variables, x)
        assert logdet.shape == (6,)
        back = rq.apply(variables, y, reverse=True)
        np.testing.assert_allclose(back, x, atol=1e-4)

    def test_coupling_logdet_vs_jacobian(self, rng):
        from behavior_driven_video_synthesis_tpu.models.flows import (
            RQSCoupling,
        )

        C = 6
        x = jnp.asarray((rng.randn(2, C) * 0.5).astype(np.float32))
        rq = RQSCoupling(in_channels=C, hidden_dim=16)
        variables = _init(rq, jax.random.PRNGKey(0), x)

        def f(v):
            y, _ = rq.apply(variables, v[None])
            return y[0]

        _, logdet = rq.apply(variables, x)
        for i in range(2):
            J = jax.jacfwd(f)(x[i])
            _, ref_ld = np.linalg.slogdet(np.asarray(J))
            np.testing.assert_allclose(logdet[i], ref_ld, atol=1e-3)

    def test_full_flow_with_rqs(self, rng):
        C = 10
        x = jnp.asarray((rng.randn(4, C) * 0.5).astype(np.float32))
        flow = UnconditionalFlow(in_channels=C, hidden_dim=32, n_flows=3,
                                 coupling_type="rqs")
        variables = _init(flow, jax.random.PRNGKey(0), x)
        z, logdet = flow.apply(variables, x)
        back = flow.apply(variables, z, reverse=True)
        np.testing.assert_allclose(back, x, atol=2e-3)
