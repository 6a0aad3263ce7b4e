"""int8 dynamically-quantized serving path (ops/nn._conv_int8).

The quantized VUNet uses the SAME f32 weight-norm params as the full-precision
model — quantization happens at apply time (per-tensor activation scale,
per-output-channel weight scale, int8 MXU conv, dequant in the epilogue) — so
any trained checkpoint serves quantized with no conversion step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from behavior_driven_video_synthesis_tpu.ops.nn import (
    NormConv2d,
    _conv,
    _conv_int8,
)
from behavior_driven_video_synthesis_tpu.models.vunet import VUNet


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


class TestConvInt8:
    def test_matches_f32_conv(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 16, 16, 8), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 8, 12), jnp.float32)
        b = jnp.asarray(rng.randn(12), jnp.float32)
        y8 = _conv_int8(x, w, b, 1, 1, jnp.float32)
        yf = _conv(x, w, b, 1, 1, jnp.float32)
        assert y8.shape == yf.shape
        assert _rel_err(y8, yf) < 0.03

    def test_strided(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 16, 16, 8), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 8, 8), jnp.float32)
        y8 = _conv_int8(x, w, None, 2, 1, jnp.float32)
        yf = _conv(x, w, None, 2, 1, jnp.float32)
        assert y8.shape == yf.shape == (2, 8, 8, 8)
        assert _rel_err(y8, yf) < 0.03

    def test_scale_invariance(self):
        """Dynamic per-tensor scaling: grossly rescaled inputs quantize
        equally well (the classic failure of a static-scale path)."""
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 4, 4), jnp.float32)
        for s in (1e-3, 1.0, 1e3):
            y8 = _conv_int8(x * s, w, None, 1, 1, jnp.float32)
            yf = _conv(x * s, w, None, 1, 1, jnp.float32)
            assert _rel_err(y8, yf) < 0.03, s

    def test_norm_conv_quant_param_tree_identical(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)
        key = jax.random.PRNGKey(0)
        m_f = NormConv2d(8, kernel_size=3, padding=1)
        m_q = NormConv2d(8, kernel_size=3, padding=1, quant="int8")
        vf = m_f.init(key, x)
        vq = m_q.init(key, x)
        assert jax.tree_util.tree_structure(vf) == \
            jax.tree_util.tree_structure(vq)
        for a, b in zip(jax.tree_util.tree_leaves(vf),
                        jax.tree_util.tree_leaves(vq)):
            np.testing.assert_array_equal(a, b)
        yq = m_q.apply(vf, x)
        yf = m_f.apply(vf, x)
        assert _rel_err(yq, yf) < 0.05

    def test_1x1_and_tiny_fanout_stay_full_precision(self):
        """1x1 convs and small heads (features < 8) bypass quantization —
        bit-identical to the f32 path."""
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)
        key = jax.random.PRNGKey(0)
        for kw in (dict(features=8, kernel_size=1),
                   dict(features=3, kernel_size=3, padding=1)):
            m_f = NormConv2d(**kw)
            m_q = NormConv2d(**kw, quant="int8")
            v = m_f.init(key, x)
            np.testing.assert_array_equal(m_q.apply(v, x), m_f.apply(v, x))

    def test_aux_split_path(self):
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)
        a = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)
        key = jax.random.PRNGKey(0)
        m_f = NormConv2d(8, kernel_size=3, padding=1)
        m_q = NormConv2d(8, kernel_size=3, padding=1, quant="int8")
        v = m_f.init(key, x, aux=a)
        yq = m_q.apply(v, x, aux=a)
        yf = m_f.apply(v, x, aux=a)
        assert _rel_err(yq, yf) < 0.05


class TestVUNetQuant:
    @pytest.fixture(scope="class")
    def models(self):
        kw = dict(spatial_size=32, nf_start=8, nf_max=16, variant="alter")
        m_f = VUNet(**kw)
        m_q = VUNet(**kw, quant="int8")
        key = jax.random.PRNGKey(0)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3) * 0.3,
                        jnp.float32)
        c = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3) * 0.3,
                        jnp.float32)
        variables = m_f.init({"params": key, "sample": key}, x, c)
        return m_f, m_q, variables, x, c

    def test_param_tree_shared(self, models):
        m_f, m_q, variables, x, c = models
        key = jax.random.PRNGKey(0)
        vq = m_q.init({"params": key, "sample": key}, x, c)
        assert jax.tree_util.tree_structure(vq) == \
            jax.tree_util.tree_structure(variables)

    def test_transfer_close_to_full_precision(self, models):
        m_f, m_q, variables, x, c = models
        rngs = {"sample": jax.random.PRNGKey(3)}
        yf = m_f.apply(variables, x, c, rngs=rngs, method=m_f.transfer)
        yq = m_q.apply(variables, x, c, rngs=rngs, method=m_q.transfer)
        assert yq.shape == yf.shape
        # per-conv error ~1%; across the full 32px net it stays small
        assert _rel_err(yq, yf) < 0.2

    def test_transfer_cached_quant(self, models):
        m_f, m_q, variables, x, c = models
        means, _ = m_f.apply(variables, x,
                             rngs={"sample": jax.random.PRNGKey(2)},
                             method=m_f.encode_means)
        yf = m_f.apply(variables, means, c, method=m_f.transfer_cached)
        yq = m_q.apply(variables, means, c, method=m_q.transfer_cached)
        assert _rel_err(yq, yf) < 0.2

    def test_encode_path_stays_full_precision(self, models):
        """Only the per-frame path (du + dd) is quantized; encode_means
        (eu + ed) must be bit-identical between quant and none."""
        m_f, m_q, variables, x, c = models
        rngs = {"sample": jax.random.PRNGKey(2)}
        mf, _ = m_f.apply(variables, x, rngs=rngs,
                          method=m_f.encode_means)
        mq, _ = m_q.apply(variables, x, rngs=rngs,
                          method=m_q.encode_means)
        for a, b in zip(mf, mq):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_quant_requires_normconv(self):
        m = VUNet(spatial_size=32, nf_start=8, nf_max=16,
                  conv_layer_type="l2", quant="int8")
        with pytest.raises(AssertionError):
            m.init({"params": jax.random.PRNGKey(0),
                    "sample": jax.random.PRNGKey(1)},
                   jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3)))


class TestVUNetQuantStatic:
    """quant="int8_static": PTQ-calibrated scales in the "quant" collection
    (the serving mode — no per-conv max-reduce, quantize fuses into its
    producer)."""

    @pytest.fixture(scope="class")
    def setup(self):
        kw = dict(spatial_size=32, nf_start=8, nf_max=16, variant="alter")
        m_f = VUNet(**kw)
        m_s = VUNet(**kw, quant="int8_static")
        key = jax.random.PRNGKey(0)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3) * 0.3,
                        jnp.float32)
        c = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3) * 0.3,
                        jnp.float32)
        variables = m_f.init({"params": key, "sample": key}, x, c)
        means, _ = m_f.apply(variables, x,
                             rngs={"sample": jax.random.PRNGKey(2)},
                             method=m_f.encode_means)
        return m_f, m_s, variables, means, c

    def test_calibrate_then_serve_matches_f32(self, setup):
        from behavior_driven_video_synthesis_tpu.models.vunet import (
            calibrate_quant,
        )
        m_f, m_s, variables, means, c = setup
        vq = calibrate_quant(m_s, variables, means, c)
        assert "quant" in vq
        scales = jax.tree_util.tree_leaves(vq["quant"])
        assert scales and all(float(s) > 0 for s in scales)
        yf = m_f.apply(variables, means, c, method=m_f.transfer_cached)
        ys = m_s.apply(vq, means, c, method=m_s.transfer_cached)
        assert _rel_err(ys, yf) < 0.2

    def test_calibration_is_running_max(self, setup):
        from behavior_driven_video_synthesis_tpu.models.vunet import (
            calibrate_quant,
        )
        m_f, m_s, variables, means, c = setup
        vq1 = calibrate_quant(m_s, variables, means, c)
        # a second pass over a SMALLER batch must not shrink the scales
        vq2 = calibrate_quant(m_s, {**variables, "quant": vq1["quant"]},
                              [m * 0.5 for m in means], c * 0.5)
        for a, b in zip(jax.tree_util.tree_leaves(vq1["quant"]),
                        jax.tree_util.tree_leaves(vq2["quant"])):
            assert float(b) >= float(a) - 1e-7


def test_pipeline_calibrate_and_generate_quant():
    """End-to-end: BehaviorTransferPipeline.calibrate produces scales that
    generate() consumes via params["vunet_quant"], and the quantized
    pipeline's frames match the full-precision pipeline's."""
    from behavior_driven_video_synthesis_tpu.data.human36m import (
        detailed_joint_model,
    )
    from behavior_driven_video_synthesis_tpu.models import (
        ResidualBehaviorNet,
    )
    from behavior_driven_video_synthesis_tpu.pipeline import (
        BehaviorTransferPipeline,
    )

    S, T, B, HID, K_FULL, K_USE = 32, 5, 2, 16, 51, 48
    jm = detailed_joint_model(world_coords=True)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    mean = rng.randn(K_FULL).astype(np.float32)
    std = (np.abs(rng.rand(K_FULL)) + 0.5).astype(np.float32)
    dim_to_use = np.arange(K_FULL)[np.arange(K_FULL) % 17 != 0][:K_USE]

    behavior = ResidualBehaviorNet(n_kps=K_USE, dim_hidden_b=HID)
    x = jnp.zeros((B, T, K_USE))
    bp = behavior.init({"params": key, "sample": key}, x, x, T)["params"]
    app = jnp.asarray(rng.randn(B, S, S, 3) * 0.3, jnp.float32)

    outs = {}
    for quant in ("none", "int8_static"):
        vunet = VUNet(spatial_size=S, nf_start=8, nf_max=16,
                      variant="alter", quant=quant)
        vp = vunet.init({"params": key, "sample": key}, app, app)["params"]
        pipe = BehaviorTransferPipeline(vunet=vunet, behavior_model=behavior,
                                        joint_model=jm, norm_mean=mean,
                                        norm_std=std, dim_to_use=dim_to_use,
                                        spatial_size=S)
        params = {"behavior": bp, "vunet": vp}
        z = jax.random.normal(key, (B, HID))
        x_start = jnp.zeros((B, K_USE))
        extr = jnp.tile(jnp.asarray(
            np.hstack([np.eye(3), [[0], [0], [4.0]]]), jnp.float32),
            (B, 1, 1))
        intr = jnp.tile(jnp.asarray([1145.0, 500.0, 1143.0, 500.0]), (B, 1))
        imsize = jnp.full((B, 2), 1000.0)
        if quant == "int8_static":
            params["vunet_quant"] = pipe.calibrate(
                params, z, x_start, app, extr, intr, imsize, key, length=T,
                use_flow=False)
        outs[quant] = np.asarray(pipe.generate(
            params, z, x_start, app, extr, intr, imsize, key, length=T,
            use_flow=False)["frames"], np.float32)

    assert outs["int8_static"].shape == outs["none"].shape
    assert _rel_err(outs["int8_static"], outs["none"]) < 0.2


class TestQuantMaxHW:
    """quant_max_hw gates quantization by input spatial size: convs above
    the threshold are bit-identical to the unquantized path (profiled: at
    the top VUNet scale the quantize passes cost ~the int8 MXU saving)."""

    def _pair(self, hw, max_hw):
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(2, hw, hw, 8), jnp.float32)
        key = jax.random.PRNGKey(0)
        m_f = NormConv2d(16, kernel_size=3, padding=1)
        m_q = NormConv2d(16, kernel_size=3, padding=1, quant="int8",
                         quant_max_hw=max_hw)
        v = m_f.init(key, x)
        return np.asarray(m_q.apply(v, x)), np.asarray(m_f.apply(v, x))

    def test_above_threshold_bit_identical(self):
        yq, yf = self._pair(hw=16, max_hw=8)
        np.testing.assert_array_equal(yq, yf)

    def test_at_or_below_threshold_quantizes(self):
        yq, yf = self._pair(hw=8, max_hw=8)
        assert not np.array_equal(yq, yf)
        assert _rel_err(yq, yf) < 0.05

    def test_zero_means_no_limit(self):
        yq, yf = self._pair(hw=16, max_hw=0)
        assert not np.array_equal(yq, yf)

    def test_vunet_gated_quant_runs(self):
        """A VUNet with quant_max_hw set still calibrates + serves; the
        quant collection only holds scales for gated-in convs."""
        key = jax.random.PRNGKey(0)
        model = VUNet(spatial_size=32, nf_start=4, nf_max=8,
                      variant="alter", quant="int8_static", quant_max_hw=16)
        x = jnp.zeros((2, 32, 32, 3))
        variables = model.init({"params": key, "sample": key}, x, x)
        means, _ = model.apply(variables, x, rngs={"sample": key},
                               method=model.encode_means)
        from behavior_driven_video_synthesis_tpu.models.vunet import (
            calibrate_quant,
        )
        cal = calibrate_quant(model, variables, list(means), x)
        assert "quant" in cal
        out = model.apply(cal, list(means), x,
                          method=model.transfer_cached)
        assert out.shape == (2, 32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()


def test_quant_composes_with_upsample_transpose():
    """int8_static serving + transposed-conv upsamples compose: the
    upsample convs themselves stay full precision (d2s_transpose excludes
    them from quant), everything else calibrates and serves int8."""
    key = jax.random.PRNGKey(0)
    kw = dict(spatial_size=32, nf_start=4, nf_max=8, variant="alter")
    x = jnp.asarray(np.random.RandomState(3).randn(2, 32, 32, 3),
                    jnp.float32)
    m_ref = VUNet(**kw)
    v = m_ref.init({"params": key, "sample": key}, x, x)
    ref = np.asarray(m_ref.apply(v, x, x, rngs={"sample": key},
                                 method=m_ref.transfer))

    m_q = VUNet(**kw, quant="int8_static", upsample_transpose=True)
    means, _ = m_q.apply(v, x, rngs={"sample": key},
                         method=m_q.encode_means)
    from behavior_driven_video_synthesis_tpu.models.vunet import (
        calibrate_quant,
    )
    cal = calibrate_quant(m_q, v, list(means), x)
    out = np.asarray(m_q.apply(cal, x, x, rngs={"sample": key},
                               method=m_q.transfer))
    assert out.shape == ref.shape
    assert np.isfinite(out).all()
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.2, rel
