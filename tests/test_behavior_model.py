"""Behavior cVAE model tests: shapes, residual rollout property, latent
seeding, prior sampling, probe heads."""
import numpy as np

import jax
import jax.numpy as jnp

from behavior_driven_video_synthesis_tpu.models import (
    BehaviorEncoder,
    ResidualDecoder,
    ResidualBehaviorNet,
    Classifier,
    ClassifierAction,
    ClassifierActionBeta,
    Regressor,
    RegressorFly,
    FCResnet,
)

B, T, K, H = 4, 12, 51, 64


def _x(rng, b=B, t=T, k=K):
    return jnp.asarray(rng.randn(b, t, k).astype(np.float32))


class TestBehaviorEncoder:
    def test_output_shapes(self, rng):
        enc = BehaviorEncoder(dim_hidden=H)
        x = _x(rng)
        params = enc.init({"params": jax.random.PRNGKey(0),
                           "sample": jax.random.PRNGKey(1)}, x)
        b, mu, logstd, pre = enc.apply(
            params, x, rngs={"sample": jax.random.PRNGKey(2)}
        )
        assert b.shape == mu.shape == logstd.shape == pre.shape == (B, H)

    def test_sample_mode_is_prior(self, rng):
        """sample=True must return a pure N(0,1) draw independent of x
        (reference BEncoder._sample, pose_behavior_rnn.py:209-210)."""
        enc = BehaviorEncoder(dim_hidden=H)
        x1, x2 = _x(rng), _x(rng)
        params = enc.init({"params": jax.random.PRNGKey(0),
                           "sample": jax.random.PRNGKey(1)}, x1)
        key = jax.random.PRNGKey(7)
        b1, *_ = enc.apply(params, x1, sample=True, rngs={"sample": key})
        b2, *_ = enc.apply(params, x2, sample=True, rngs={"sample": key})
        np.testing.assert_allclose(b1, b2, atol=0)

    def test_reparam_uses_mu_logstd(self, rng):
        enc = BehaviorEncoder(dim_hidden=H)
        x = _x(rng, b=256)
        params = enc.init({"params": jax.random.PRNGKey(0),
                           "sample": jax.random.PRNGKey(1)}, x)
        key = jax.random.PRNGKey(3)
        b, mu, logstd, _ = enc.apply(params, x, rngs={"sample": key})
        # deterministic given the same rng key
        b2, *_ = enc.apply(params, x, rngs={"sample": key})
        np.testing.assert_allclose(b, b2, atol=0)
        # different key -> different sample
        b3, *_ = enc.apply(params, x,
                           rngs={"sample": jax.random.PRNGKey(4)})
        assert np.abs(np.asarray(b - b3)).max() > 1e-6
        # implied eps = (b - mu) / exp(logstd) must be ~N(0,1)
        eps = np.asarray((b - mu) / jnp.exp(logstd))
        assert abs(eps.mean()) < 0.02 and abs(eps.std() - 1.0) < 0.02


class TestResidualDecoder:
    def test_rollout_shapes(self, rng):
        dec = ResidualDecoder(n_kps=K, dim_hidden=H)
        b = jnp.asarray(rng.randn(B, H).astype(np.float32))
        x0 = jnp.asarray(rng.randn(B, K).astype(np.float32))
        params = dec.init(jax.random.PRNGKey(0), b, x0, 5)
        xs, cs = dec.apply(params, b, x0, 5)
        assert xs.shape == (B, 5, K)
        assert cs.shape == (B, 5, K)

    def test_residual_chain(self, rng):
        """cs must be the shifted pose chain: cs[0]=x0, cs[t]=xs[t-1]."""
        dec = ResidualDecoder(n_kps=K, dim_hidden=H)
        b = jnp.asarray(rng.randn(B, H).astype(np.float32))
        x0 = jnp.asarray(rng.randn(B, K).astype(np.float32))
        params = dec.init(jax.random.PRNGKey(0), b, x0, 6)
        xs, cs = dec.apply(params, b, x0, 6)
        np.testing.assert_allclose(cs[:, 0], x0, atol=1e-6)
        np.testing.assert_allclose(cs[:, 1:], xs[:, :-1], atol=1e-6)

    def test_b_seeds_state(self, rng):
        """Different b must give different rollouts from the same pose."""
        dec = ResidualDecoder(n_kps=K, dim_hidden=H)
        b1 = jnp.asarray(rng.randn(B, H).astype(np.float32))
        b2 = jnp.asarray(rng.randn(B, H).astype(np.float32))
        x0 = jnp.asarray(rng.randn(B, K).astype(np.float32))
        params = dec.init(jax.random.PRNGKey(0), b1, x0, 4)
        xs1, _ = dec.apply(params, b1, x0, 4)
        xs2, _ = dec.apply(params, b2, x0, 4)
        assert np.abs(np.asarray(xs1 - xs2)).max() > 1e-4

    def test_gru_variant(self, rng):
        dec = ResidualDecoder(n_kps=K, dim_hidden=H, rnn_type="gru")
        b = jnp.asarray(rng.randn(B, H).astype(np.float32))
        x0 = jnp.asarray(rng.randn(B, K).astype(np.float32))
        params = dec.init(jax.random.PRNGKey(0), b, x0, 4)
        xs, _ = dec.apply(params, b, x0, 4)
        assert xs.shape == (B, 4, K)


class TestResidualBehaviorNet:
    def test_forward(self, rng):
        net = ResidualBehaviorNet(n_kps=K, dim_hidden_b=H)
        x1, x2 = _x(rng), _x(rng)
        params = net.init({"params": jax.random.PRNGKey(0),
                           "sample": jax.random.PRNGKey(1)}, x1, x2, T)
        xs, cs, b, mu, logstd, pre = net.apply(
            params, x1, x2, T, rngs={"sample": jax.random.PRNGKey(2)}
        )
        assert xs.shape == (B, T, K)
        assert b.shape == (B, H)

    def test_jit_forward(self, rng):
        net = ResidualBehaviorNet(n_kps=K, dim_hidden_b=H)
        x1, x2 = _x(rng), _x(rng)
        params = net.init({"params": jax.random.PRNGKey(0),
                           "sample": jax.random.PRNGKey(1)}, x1, x2, T)

        @jax.jit
        def fwd(p, a, b_, key):
            return net.apply(p, a, b_, T, rngs={"sample": key})

        xs, *_ = fwd(params, x1, x2, jax.random.PRNGKey(2))
        assert xs.shape == (B, T, K)

    def test_generate_seq_transfer(self, rng):
        """generate_seq decodes an externally supplied b (transfer path)."""
        net = ResidualBehaviorNet(n_kps=K, dim_hidden_b=H)
        x1, x2 = _x(rng), _x(rng)
        params = net.init({"params": jax.random.PRNGKey(0),
                           "sample": jax.random.PRNGKey(1)}, x1, x2, T)
        b = jnp.asarray(rng.randn(B, H).astype(np.float32))
        xs, cs = net.apply(params, b, x2, 8, method=net.generate_seq)
        assert xs.shape == (B, 8, K)


class TestProbes:
    def test_all_probe_shapes(self, rng):
        x = _x(rng)
        b = jnp.asarray(rng.randn(B, H).astype(np.float32))
        k0 = jax.random.PRNGKey(0)

        cl = Classifier(n_classes=2)
        assert cl.apply(cl.init(k0, x), x).shape == (B, 2)

        ca = ClassifierAction(n_classes=15)
        logits, feat = ca.apply(ca.init(k0, x), x)
        assert logits.shape == (B, 15) and feat.shape == (B, 128)

        cb = ClassifierActionBeta(n_classes=15)
        assert cb.apply(cb.init(k0, b), b).shape == (B, 15)

        rg = Regressor(n_out=K)
        assert rg.apply(rg.init(k0, b), b).shape == (B, K)

        t_onehot = jax.nn.one_hot(jnp.zeros(B, jnp.int32), 50)
        rf = RegressorFly(n_out=K, seq_length=50)
        assert rf.apply(rf.init(k0, b, t_onehot), b, t_onehot).shape == (B, K)

        fr = FCResnet(out_dim=32)
        assert fr.apply(fr.init(k0, b), b).shape == (B, 32)


class TestPallasRolloutKernel:
    def test_interpret_matches_decoder(self, rng):
        """The Pallas rollout (interpret mode on CPU) must reproduce the
        ResidualDecoder scan exactly (bf16 weight tolerance)."""
        from behavior_driven_video_synthesis_tpu.models.behavior import (
            decoder_rollout_kernel,
        )
        dec = ResidualDecoder(n_kps=K, dim_hidden=H)
        b = jnp.asarray(rng.randn(B, H).astype(np.float32) * 0.1)
        x0 = jnp.asarray(rng.randn(B, K).astype(np.float32))
        params = dec.init(jax.random.PRNGKey(0), b, x0, 7)
        ref, _ = dec.apply(params, b, x0, 7)
        out = decoder_rollout_kernel(params["params"], b, x0, 7,
                                     use_pallas=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-2, rtol=1e-2)
        # exact-path fallback
        out2 = decoder_rollout_kernel(params["params"], b, x0, 7,
                                      use_pallas=False)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                                   atol=1e-5)
