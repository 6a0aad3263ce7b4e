"""VUNet shape algebra and mode tests across size/factor combinations."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from behavior_driven_video_synthesis_tpu.models.vunet import (
    VUNet,
    compute_n_scales,
)


def make_rngs(seed=0):
    k = jax.random.PRNGKey(seed)
    return {"params": k, "sample": jax.random.fold_in(k, 1),
            "dropout": jax.random.fold_in(k, 2)}


def build(variant="alter", spatial=32, n_channels_x=3, box_factor=2,
          bottleneck_factor=2, nf_start=8, nf_max=16, dropout=0.0):
    model = VUNet(
        spatial_size=spatial, n_channels_x=n_channels_x,
        nf_start=nf_start, nf_max=nf_max, bottleneck_factor=bottleneck_factor,
        box_factor=box_factor, variant=variant, dropout_prob=dropout,
    )
    x_size = spatial // 2 ** box_factor if n_channels_x > 3 else spatial
    x = jnp.zeros((2, x_size, x_size, n_channels_x))
    c = jnp.zeros((2, spatial, spatial, 3))
    variables = model.init(make_rngs(), x, c)
    return model, variables, x, c


class TestScaleAlgebra:
    def test_n_scales_formula(self):
        assert compute_n_scales(256, 2) == 7
        assert compute_n_scales(128, 2) == 6
        assert compute_n_scales(128, 1) == 7
        assert compute_n_scales(32, 2) == 4
        assert compute_n_scales(16, 3, n_scales_cfg=6) == 6


@pytest.mark.parametrize("variant", ["alter", "org"])
class TestForward:
    def test_training_forward(self, variant):
        model, variables, x, c = build(variant)
        imgs, means, logstds, ps, acts = model.apply(
            variables, x, c, rngs=make_rngs(1))
        assert imgs.shape == (2, 32, 32, 3)
        assert len(means) == 2
        # latent maps live at bottleneck resolution then 2x
        assert means[0].shape == (2, 4, 4, 16)
        assert means[1].shape == (2, 8, 8, 16)
        if variant == "alter":
            assert len(logstds) == 2
            # sigmoid-squashed logstd in (0, 1)
            assert float(jnp.min(logstds[0])) >= 0.0
            assert float(jnp.max(logstds[0])) <= 1.0
        else:
            assert len(ps) == 2  # autoregressive prior params

    def test_test_forward_prior(self, variant):
        model, variables, x, c = build(variant)
        imgs = model.apply(variables, c, rngs=make_rngs(2),
                           method=model.test_forward)
        assert imgs.shape == (2, 32, 32, 3)

    def test_transfer(self, variant):
        model, variables, x, c = build(variant)
        imgs = model.apply(variables, x, c, rngs=make_rngs(3),
                           method=model.transfer)
        assert imgs.shape == (2, 32, 32, 3)

    def test_transfer_reproducible_given_key(self, variant):
        """Transfer decodes from posterior MEANS, but the encoder trunk still
        samples z internally (scale-1 stats depend on the scale-0 sample —
        reference EncDown.forward, vunets.py:191-219), so outputs are only
        deterministic for a fixed rng key."""
        model, variables, x, c = build(variant)
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(2, 32, 32, 3).astype(np.float32))
        i1 = model.apply(variables, x, c, rngs=make_rngs(4),
                         method=model.transfer)
        i2 = model.apply(variables, x, c, rngs=make_rngs(4),
                         method=model.transfer)
        np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=0)


class TestInplaneBranch:
    def test_box_factor_shapes(self):
        """Part-stack appearance input (30ch at spatial/2^box_factor)."""
        # n_scales_x must be >= n_latent_scales + 1 so the appearance stack
        # can feed every latent scale (2 skips/scale + 1 final)
        model, variables, x, c = build(
            variant="alter", spatial=64, n_channels_x=30, box_factor=2)
        assert x.shape == (2, 16, 16, 30)
        imgs, means, logstds, _, _ = model.apply(
            variables, x, c, rngs=make_rngs(1))
        assert imgs.shape == (2, 64, 64, 3)
        # appearance branch loses box_factor scales but bottoms out at the
        # same bottleneck resolution
        assert model.n_scales_x == model.n_scales - 2


class TestJit:
    def test_jit_train_and_transfer(self):
        model, variables, x, c = build("alter")

        @jax.jit
        def fwd(v, x, c, key):
            return model.apply(
                v, x, c,
                rngs={"sample": key, "dropout": jax.random.fold_in(key, 1)},
            )[0]

        imgs = fwd(variables, x, c, jax.random.PRNGKey(0))
        assert imgs.shape == (2, 32, 32, 3)

        @jax.jit
        def tr(v, x, c, key):
            return model.apply(v, x, c, rngs={"sample": key},
                               method=model.transfer)

        assert tr(variables, x, c, jax.random.PRNGKey(1)).shape == (2, 32, 32, 3)
