"""cvbae/org-vunet train-step tests on tiny synthetic images, plus
perceptual/inception model smoke tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from behavior_driven_video_synthesis_tpu.core import Config
from behavior_driven_video_synthesis_tpu.models.vunet import (
    VUNet,
    VunetRegressor,
)
from behavior_driven_video_synthesis_tpu.models.perceptual import (
    PerceptualVGG19,
    feature_names,
    save_npz_params,
    load_npz_params,
)
from behavior_driven_video_synthesis_tpu.models.inception import (
    InceptionV3Features,
)
from behavior_driven_video_synthesis_tpu.train.vunet_exp import (
    create_vunet_state,
    make_cvbae_train_step,
    make_org_vunet_train_step,
)

S = 32  # spatial size for tests
B = 2


def _batch(rng, with_reg=True):
    batch = {
        "pose_img": jnp.asarray(
            rng.rand(B, S, S, 3).astype(np.float32) * 2 - 1),
        "stickman": jnp.asarray(
            rng.rand(B, S, S, 3).astype(np.float32) * 2 - 1),
    }
    batch["app_img"] = batch["pose_img"]
    if with_reg:
        batch["reg_imgs"] = jnp.asarray(
            rng.rand(B, 2, S, S, 3).astype(np.float32) * 2 - 1)
        batch["reg_targets"] = jnp.asarray(
            rng.rand(B, 2, 17, 2).astype(np.float32))
    return batch


@pytest.fixture(scope="module")
def vgg():
    model = PerceptualVGG19()
    x = jnp.zeros((1, S, S, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


class TestPerceptual:
    def test_pyramid_names_and_shapes(self, vgg, rng):
        model, variables = vgg
        x = jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32) * 2 - 1)
        feats = model.apply(variables, x)
        assert list(feats.keys()) == feature_names()
        assert feats["relu1_2"].shape == (B, S, S, 64)
        assert feats["relu5_2"].shape == (B, S // 16, S // 16, 512)

    def test_npz_roundtrip(self, vgg, tmp_path):
        model, variables = vgg
        p = str(tmp_path / "vgg.npz")
        save_npz_params(variables, p)
        loaded = load_npz_params(p)
        for name, lp in variables["params"].items():
            for k in lp:
                np.testing.assert_array_equal(
                    np.asarray(lp[k]), np.asarray(loaded["params"][name][k]))


@pytest.mark.e2e  # heavy VGG/train-step compiles; slow tier
class TestInception:
    def test_features_and_logits(self, rng):
        model = InceptionV3Features(with_logits=True)
        # 75x75 is the minimum valid input; keeps CPU test fast
        x = jnp.asarray(rng.rand(1, 75, 75, 3).astype(np.float32) * 2 - 1)
        variables = model.init(jax.random.PRNGKey(0), x)
        feats, logits = model.apply(variables, x)
        assert feats.shape == (1, 2048)
        assert logits.shape == (1, 1000)


@pytest.mark.e2e  # heavy VGG/train-step compiles; slow tier
class TestCvbaeStep:
    def test_loss_decreases(self, vgg, rng):
        vgg_model, vgg_vars = vgg
        config = Config({
            "architecture": {"cvae": False},
            "training": {"ll_weight": 1.0, "vgg_weights": [1.0] * 6,
                         "weight_regressor": 4.0, "train_regressor": True,
                         "gamma_step": 1e-4, "information_max": 50.0,
                         "n_init_batches": 1},
        })
        vunet = VUNet(spatial_size=S, nf_start=8, nf_max=16,
                      variant="alter", dropout_prob=0.0)
        regressor = VunetRegressor(n_out=34, latent_widths=[8, 4], nf_max=16)
        txs = {"vunet": optax.adam(2e-3), "regressor": optax.adam(1e-3)}
        batch = _batch(rng)
        state = create_vunet_state(jax.random.PRNGKey(0), vunet, regressor,
                                   vgg_model, txs, batch)
        step = jax.jit(make_cvbae_train_step(vunet, regressor, vgg_model,
                                             vgg_vars, txs, config))
        losses = []
        key = jax.random.PRNGKey(1)
        for i in range(12):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
            losses.append(float(metrics["likelihood_loss"]))
        assert losses[-1] < losses[0], (losses[0], losses[-1])
        assert np.isfinite(float(metrics["kl_loss"]))
        assert float(metrics["grad_norm"]) > 0.0
        assert float(metrics["loss_reg"]) >= 0.0

    def test_org_vunet_step(self, vgg, rng):
        vgg_model, vgg_vars = vgg
        config = Config({
            "architecture": {"cvae": False},
            "training": {"ll_weight": 1.0, "vgg_weights": [1.0] * 6},
        })
        vunet = VUNet(spatial_size=S, nf_start=8, nf_max=16, variant="org")
        txs = {"vunet": optax.adam(2e-3)}
        batch = _batch(rng, with_reg=False)
        state = create_vunet_state(jax.random.PRNGKey(0), vunet, None,
                                   vgg_model, {"vunet": txs["vunet"]}, batch)
        step = jax.jit(make_org_vunet_train_step(vunet, vgg_model, vgg_vars,
                                                 txs, config,
                                                 total_steps=100))
        key = jax.random.PRNGKey(1)
        losses = []
        for i in range(6):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
            losses.append(float(metrics["likelihood_loss"]))
        assert losses[-1] < losses[0]
        # kl ramp floors at kl_init (reference clips to [kl_init, 1.0],
        # experiments/vunet.py:258-266) before half of total steps
        assert abs(float(metrics["kl_weight"]) - 1e-6) < 1e-9


@pytest.mark.e2e  # heavy VGG/train-step compiles; slow tier
class TestGanBranch:
    def test_cvbae_with_patchgan(self, vgg, rng):
        """use_gan path: disc trains, generator gets the GAN term, losses
        stay finite and the vunet still improves."""
        import optax
        from behavior_driven_video_synthesis_tpu.models.synth_discriminators \
            import PatchGANDiscriminator
        vgg_model, vgg_vars = vgg
        config = Config({
            "architecture": {"cvae": False},
            "training": {"ll_weight": 1.0, "vgg_weights": [1.0] * 6,
                         "train_regressor": False, "gamma_step": 1e-4,
                         "information_max": 50.0, "n_init_batches": 1,
                         "gan_weight": 0.1, "grad_pen": True,
                         "lambda_gp": 1.0, "bf16": False},
        })
        vunet = VUNet(spatial_size=S, nf_start=8, nf_max=16,
                      variant="alter")
        disc = PatchGANDiscriminator(ndf=8, n_layers=2)
        txs = {"vunet": optax.adam(2e-3), "disc": optax.adam(2e-3)}
        batch = _batch(rng, with_reg=False)
        state = create_vunet_state(jax.random.PRNGKey(0), vunet, None,
                                   vgg_model, txs, batch, disc_model=disc)
        assert state.gan is not None
        step = jax.jit(make_cvbae_train_step(vunet, None, vgg_model,
                                             vgg_vars, txs, config,
                                             disc_model=disc))
        key = jax.random.PRNGKey(1)
        d0 = jax.tree_util.tree_leaves(state.gan.disc.params)
        for i in range(4):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["gen_gan_loss"]))
        assert np.isfinite(float(metrics["dloss"]))
        assert "gp" in metrics
        d1 = jax.tree_util.tree_leaves(state.gan.disc.params)
        assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
                   for a, b in zip(d0, d1))


class TestLaplacianPerceptual:
    """Weight-free perceptual substitute (see WEIGHTS.md)."""

    def test_pyramid_names_shapes_deterministic(self, rng):
        from behavior_driven_video_synthesis_tpu.models.perceptual import (
            LaplacianPyramidFeatures,
        )

        model = LaplacianPyramidFeatures()
        x = jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32) * 2 - 1)
        variables = model.init(jax.random.PRNGKey(0), x)
        feats = model.apply(variables, x)
        assert list(feats.keys()) == feature_names()
        f2 = model.apply(variables, x)
        for k in feats:
            np.testing.assert_array_equal(np.asarray(feats[k]),
                                          np.asarray(f2[k]))

    def test_bandpass_detects_blur(self, rng):
        """A blurred copy must differ from the original in the band-pass
        levels — the property the perceptual likelihood exists for."""
        from behavior_driven_video_synthesis_tpu.models.perceptual import (
            LaplacianPyramidFeatures,
        )
        from behavior_driven_video_synthesis_tpu.train.losses import (
            vgg_loss,
        )

        model = LaplacianPyramidFeatures()
        x = np.asarray(rng.rand(1, S, S, 3), np.float32) * 2 - 1
        blurred = x.copy()
        for _ in range(2):  # box blur
            blurred = 0.25 * (np.roll(blurred, 1, 1)
                              + np.roll(blurred, -1, 1)
                              + np.roll(blurred, 1, 2)
                              + np.roll(blurred, -1, 2))
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        ft = model.apply(variables, jnp.asarray(x))
        fp = model.apply(variables, jnp.asarray(blurred))
        losses = vgg_loss(ft, fp, [1.0] * 6)
        # band-pass levels see the blur much more than the raw-pixel level
        band = sum(float(losses[k]) for k in list(losses)[1:])
        assert band > 4 * float(losses["input"])

    def test_cvbae_step_with_laplacian(self, rng):
        """The cvbae train step runs unchanged with the laplacian feature
        net in place of VGG (training.perceptual: laplacian)."""
        from behavior_driven_video_synthesis_tpu.models.perceptual import (
            LaplacianPyramidFeatures,
        )

        feat = LaplacianPyramidFeatures()
        fvars = feat.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)))
        vunet = VUNet(spatial_size=S, nf_start=4, nf_max=8, variant="alter")
        config = Config({
            "architecture": {"cvae": False},
            "training": {"ll_weight": 1.0, "vgg_weights": [1.0] * 6,
                         "train_regressor": False, "gamma_step": 1e-5,
                         "information_max": 10.0, "n_init_batches": 1},
        })
        txs = {"vunet": optax.adam(5e-4)}
        batch = _batch(np.random.RandomState(0), with_reg=False)
        state = create_vunet_state(jax.random.PRNGKey(1), vunet, None,
                                   feat, txs, batch)
        step = jax.jit(make_cvbae_train_step(vunet, None, feat, fvars, txs,
                                             config))
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))


@pytest.mark.parametrize("mode", ["rnb", "subnet"])
def test_remat_is_numerically_identical(mode):
    """`VUNet(remat=...)` must produce the SAME param tree, near-bitwise
    loss, and numerically equivalent gradients as remat=False — it only
    changes what the backward pass stores (jax.checkpoint per RNB or per
    subnet), so it can be flipped on any trained checkpoint via
    training.remat.  Gradients are compared at a tight tolerance, not
    bitwise: the rematerialized forward is a separately fused/reassociated
    XLA program (measured max rel diff ~2e-6 in f32)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from behavior_driven_video_synthesis_tpu.models.vunet import VUNet

    kw = dict(spatial_size=32, nf_start=4, nf_max=8, n_latent_scales=2,
              bottleneck_factor=2, variant="alter", dropout_prob=0.1)
    m0 = VUNet(**kw, remat=False)
    m1 = VUNet(**kw, remat=mode)
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32) * 0.3
    c = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32) * 0.3
    rngs = {"params": key, "sample": jax.random.fold_in(key, 1)}
    v0 = m0.init(rngs, x, c)
    v1 = m1.init(rngs, x, c)
    assert jax.tree_util.tree_structure(v0) == \
        jax.tree_util.tree_structure(v1), "remat changed the param tree"

    def loss(m, p):
        ar = {"sample": jax.random.fold_in(key, 2),
              "dropout": jax.random.fold_in(key, 3)}
        imgs, means, logstds, _, _ = m.apply(p, x, c, train=True, rngs=ar)
        return (jnp.mean(imgs.astype(jnp.float32) ** 2)
                + sum(jnp.mean(mu.astype(jnp.float32) ** 2)
                      for mu in means))

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(v0)
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(v1)
    # bitwise loss equality held when written, but XLA does not guarantee
    # it across versions/hosts for two differently-fused programs — allow
    # low-order-bit drift
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    def _close(a, b):
        a, b = np.asarray(a), np.asarray(b)
        # near-zero entries see absolute noise from cancellation of the
        # leaf's large terms, so scale atol to the leaf's magnitude
        atol = 1e-5 * max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=atol)

    jax.tree_util.tree_map(_close, g0, g1)


def test_grad_accum_matches_manual_average():
    """training.grad_accum must equal: per-microbatch grads (with the
    step's fold_in(i) rng schedule) averaged, then ONE optimizer update.
    Verified against an independent re-derivation of the cvbae loss."""
    from behavior_driven_video_synthesis_tpu.models.perceptual import (
        LaplacianPyramidFeatures,
    )
    from behavior_driven_video_synthesis_tpu.models.vunet import VUNet
    from behavior_driven_video_synthesis_tpu.train.losses import (
        compute_kl_with_prior,
        vgg_loss,
    )
    from behavior_driven_video_synthesis_tpu.train.vunet_exp import (
        create_vunet_state,
        make_cvbae_train_step,
    )

    S, B, ACC = 32, 4, 2
    vunet = VUNet(spatial_size=S, nf_start=4, nf_max=8, n_latent_scales=2,
                  bottleneck_factor=2, variant="alter")
    vgg = LaplacianPyramidFeatures()
    vgg_vars = vgg.init(jax.random.PRNGKey(1), jnp.zeros((1, S, S, 3)))
    rng = np.random.RandomState(0)
    batch = {
        "app_img": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
        "pose_img": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
        "stickman": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
    }
    config = Config({
        "architecture": {"cvae": False},
        "training": {"ll_weight": 1.0, "train_regressor": False,
                     "gamma_step": 1e-5, "information_max": 10.0,
                     "n_init_batches": 0, "grad_accum": ACC},
    })
    txs = {"vunet": optax.adam(5e-4)}
    key = jax.random.PRNGKey(0)
    state0 = create_vunet_state(key, vunet, None, vgg, txs, batch,
                                gamma_init=0.1)
    # state.step starts at 0 == n_init_batches, so the KL term is ON this
    # step (jnp.where(step >= n_init, ...) — the reference's 1-based
    # "iteration > n_init_batches" gate); keep the oracle consistent
    step = jax.jit(make_cvbae_train_step(vunet, None, vgg, vgg_vars, txs,
                                         config))
    step_key = jax.random.PRNGKey(7)
    state1, metrics = step(state0, batch, step_key)

    # independent oracle: same rng schedule, explicit python loop
    k_s, k_d, _ = jax.random.split(step_key, 3)

    def manual_loss(params, a, s, t, ks, kd):
        out, means, logstds, _, _ = vunet.apply(
            {"params": params}, a, s, rngs={"sample": ks, "dropout": kd},
            train=True)
        ll = sum(vgg_loss(vgg.apply(vgg_vars, t),
                          vgg.apply(vgg_vars, out.astype(t.dtype)),
                          [1.0] * 6).values())
        kl = compute_kl_with_prior(means, logstds)
        return ll + jnp.where(state0.step >= 0, state0.gamma * kl, 0.0)

    msz = B // ACC
    g_acc = None
    for i in range(ACC):
        sl = slice(i * msz, (i + 1) * msz)
        g_i = jax.grad(manual_loss)(
            state0.vunet.params, batch["app_img"][sl],
            batch["stickman"][sl], batch["pose_img"][sl],
            jax.random.fold_in(k_s, i), jax.random.fold_in(k_d, i))
        g_acc = g_i if g_acc is None else jax.tree_util.tree_map(
            jnp.add, g_acc, g_i)
    g_avg = jax.tree_util.tree_map(lambda g: g / ACC, g_acc)
    updates, _ = txs["vunet"].update(
        g_avg, state0.vunet.opt_state, state0.vunet.params)
    want = optax.apply_updates(state0.vunet.params, updates)

    def _close(a, b):
        a, b = np.asarray(a), np.asarray(b)
        atol = 1e-6 * max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=atol)

    jax.tree_util.tree_map(_close, state1.vunet.params, want)
    assert np.isfinite(float(metrics["loss"]))


def test_org_grad_accum_matches_manual_average():
    """Same oracle as test_grad_accum_matches_manual_average but for the
    org-VUNet step (make_org_vunet_train_step): grad_accum microbatch
    grads averaged into ONE update must match an independent python-loop
    re-derivation with the same fold_in(i) rng schedule — in particular
    the (app, shape, target) microbatch tuple must land on loss_fn's
    parameters in the right order."""
    from behavior_driven_video_synthesis_tpu.core.schedules import kl_ramp
    from behavior_driven_video_synthesis_tpu.models.perceptual import (
        LaplacianPyramidFeatures,
    )
    from behavior_driven_video_synthesis_tpu.models.vunet import VUNet
    from behavior_driven_video_synthesis_tpu.train.losses import (
        compute_kl_loss,
        vgg_loss,
    )
    from behavior_driven_video_synthesis_tpu.train.vunet_exp import (
        create_vunet_state,
        make_org_vunet_train_step,
    )

    S, B, ACC, TOTAL = 32, 4, 2, 4
    vunet = VUNet(spatial_size=S, nf_start=4, nf_max=8, n_latent_scales=2,
                  bottleneck_factor=2, variant="org")
    vgg = LaplacianPyramidFeatures()
    vgg_vars = vgg.init(jax.random.PRNGKey(1), jnp.zeros((1, S, S, 3)))
    rng = np.random.RandomState(3)
    # app != pose != stickman so an input-order swap changes the grads
    batch = {
        "app_img": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
        "pose_img": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
        "stickman": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
    }
    config = Config({
        "architecture": {},
        "training": {"ll_weight": 1.0, "grad_accum": ACC},
    })
    txs = {"vunet": optax.adam(5e-4)}
    key = jax.random.PRNGKey(0)
    state0 = create_vunet_state(key, vunet, None, vgg, txs, batch)
    # put the step inside the kl ramp so the KL term is live
    state0 = state0.replace(step=jnp.asarray(3, jnp.int32))
    step = jax.jit(make_org_vunet_train_step(vunet, vgg, vgg_vars, txs,
                                             config, total_steps=TOTAL))
    step_key = jax.random.PRNGKey(11)
    state1, metrics = step(state0, batch, step_key)

    k_s, k_d = jax.random.split(step_key)
    kl_w = kl_ramp(state0.step, TOTAL)

    def manual_loss(params, a, s, t, ks, kd):
        out, q_means, _, p_means, _ = vunet.apply(
            {"params": params}, a, s, rngs={"sample": ks, "dropout": kd},
            train=True)
        ll = sum(vgg_loss(vgg.apply(vgg_vars, t),
                          vgg.apply(vgg_vars, out.astype(t.dtype)),
                          [1.0] * 6).values())
        return ll + kl_w * compute_kl_loss(p_means, q_means)

    msz = B // ACC
    g_acc = None
    for i in range(ACC):
        sl = slice(i * msz, (i + 1) * msz)
        g_i = jax.grad(manual_loss)(
            state0.vunet.params, batch["app_img"][sl],
            batch["stickman"][sl], batch["pose_img"][sl],
            jax.random.fold_in(k_s, i), jax.random.fold_in(k_d, i))
        g_acc = g_i if g_acc is None else jax.tree_util.tree_map(
            jnp.add, g_acc, g_i)
    g_avg = jax.tree_util.tree_map(lambda g: g / ACC, g_acc)
    updates, _ = txs["vunet"].update(
        g_avg, state0.vunet.opt_state, state0.vunet.params)
    want = optax.apply_updates(state0.vunet.params, updates)

    def _close(a, b):
        a, b = np.asarray(a), np.asarray(b)
        atol = 1e-6 * max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=atol)

    jax.tree_util.tree_map(_close, state1.vunet.params, want)
    assert np.isfinite(float(metrics["loss"]))
