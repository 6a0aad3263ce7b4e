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
