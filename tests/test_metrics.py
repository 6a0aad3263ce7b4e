"""Metric tests: sequence metrics vs a naive oracle mirroring the reference
torch loops; SSIM vs a scipy.ndimage oracle mirroring skimage's config; FID
on analytic gaussians; IS sanity."""
import numpy as np
from scipy import ndimage

import jax.numpy as jnp

from behavior_driven_video_synthesis_tpu.metrics import (
    sequence_sample_metrics,
    ssim,
    fid_from_features,
)
from behavior_driven_video_synthesis_tpu.metrics.fid import fid_from_stats
from behavior_driven_video_synthesis_tpu.metrics.inception_score import (
    inception_score_from_probs,
)


def naive_sequence_metrics(samples, gt):
    """Direct transcription of the reference's per-batch loops
    (lib/logging.py:2077-2101)."""
    B, S, T = samples.shape[:3]
    APD, ASD, FSD = [], [], []
    for b in range(B):
        s = samples[b]
        d_apd = d_asd = d_fsd = 0.0
        for q in range(S):
            dist = np.linalg.norm(
                (s[q] - s).reshape(S, -1), axis=1)
            d_apd += dist.sum() / (S - 1)
            dist_t = np.linalg.norm(
                (s[q] - s).reshape(S, T, -1), axis=2).mean(axis=1)
            d_asd += np.sort(dist_t)[1]
            dist_f = np.linalg.norm(
                (s[q, -1] - s[:, -1]).reshape(S, -1), axis=1)
            d_fsd += np.sort(dist_f)[1]
        APD.append(d_apd / S)
        ASD.append(d_asd / S)
        FSD.append(d_fsd / S)
    diff = samples - gt[:, None]
    ade = np.mean(np.min(np.mean(np.linalg.norm(
        diff.reshape(B, S, T, -1), axis=3), axis=2), axis=1))
    fde = np.mean(np.min(np.linalg.norm(
        (samples[:, :, -1] - gt[:, None, -1]).reshape(B, S, -1), axis=2),
        axis=1))
    return dict(APD=np.mean(APD), ASD=np.mean(ASD), FSD=np.mean(FSD),
                ADE=ade, FDE=fde)


class TestSequenceMetrics:
    def test_vs_naive_oracle(self, rng):
        B, S, T, K = 3, 6, 10, 13
        samples = rng.randn(B, S, T, K, 3).astype(np.float32)
        gt = rng.randn(B, T, K, 3).astype(np.float32)
        ours = {k: float(v) for k, v in
                sequence_sample_metrics(jnp.asarray(samples),
                                        jnp.asarray(gt)).items()}
        ref = naive_sequence_metrics(samples, gt)
        for k in ref:
            np.testing.assert_allclose(ours[k], ref[k], rtol=1e-4,
                                       err_msg=k)

    def test_identical_samples_zero_diversity(self, rng):
        B, S, T, K = 2, 4, 5, 6
        one = rng.randn(B, 1, T, K, 3).astype(np.float32)
        samples = np.repeat(one, S, axis=1)
        gt = rng.randn(B, T, K, 3).astype(np.float32)
        m = sequence_sample_metrics(jnp.asarray(samples), jnp.asarray(gt))
        assert float(m["ASD"]) == 0.0
        assert float(m["FSD"]) == 0.0
        assert float(m["APD"]) == 0.0


def naive_ssim(im1, im2, sigma=1.5, truncate=3.5, data_range=1.0):
    """skimage-equivalent per-channel SSIM (gaussian_weights=True,
    use_sample_covariance=False)."""
    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    pad = int(truncate * sigma + 0.5)
    vals = []
    for ch in range(im1.shape[-1]):
        x = im1[..., ch].astype(np.float64)
        y = im2[..., ch].astype(np.float64)
        f = lambda a: ndimage.gaussian_filter(a, sigma, truncate=truncate)
        ux, uy = f(x), f(y)
        uxx, uyy, uxy = f(x * x), f(y * y), f(x * y)
        vx = uxx - ux * ux
        vy = uyy - uy * uy
        vxy = uxy - ux * uy
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
            (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
        vals.append(s[pad:-pad, pad:-pad].mean())
    return np.mean(vals)


class TestSSIM:
    def test_vs_scipy_oracle(self, rng):
        im1 = rng.rand(2, 40, 40, 3).astype(np.float32)
        im2 = np.clip(im1 + 0.1 * rng.randn(2, 40, 40, 3), 0, 1).astype(
            np.float32)
        ours = np.asarray(ssim(jnp.asarray(im1), jnp.asarray(im2)))
        for b in range(2):
            ref = naive_ssim(im1[b], im2[b])
            np.testing.assert_allclose(ours[b], ref, atol=2e-4)

    def test_identity_is_one(self, rng):
        im = rng.rand(1, 32, 32, 3).astype(np.float32)
        val = float(ssim(jnp.asarray(im), jnp.asarray(im))[0])
        np.testing.assert_allclose(val, 1.0, atol=1e-5)


class TestFID:
    def test_identical_distributions_near_zero(self, rng):
        f = rng.randn(2000, 16).astype(np.float64)
        val = fid_from_features(f[:1000], f[1000:])
        assert val < 0.5

    def test_analytic_mean_shift(self):
        # same covariance (identity), mean shift d -> FID = ||d||^2
        mu1, mu2 = np.zeros(8), np.full(8, 0.5)
        cov = np.eye(8)
        val = fid_from_stats(mu1, cov, mu2, cov)
        np.testing.assert_allclose(val, 8 * 0.25, atol=1e-8)


class TestInceptionScore:
    def test_uniform_probs_score_one(self):
        probs = np.full((100, 10), 0.1)
        mean, std = inception_score_from_probs(probs)
        np.testing.assert_allclose(mean, 1.0, atol=1e-6)

    def test_confident_diverse_maximal(self):
        # each image deterministic on a distinct class, marginal uniform:
        # IS = n_classes
        probs = np.eye(10)[np.arange(100) % 10]
        probs = probs * (1 - 1e-9) + 1e-10
        mean, _ = inception_score_from_probs(probs)
        np.testing.assert_allclose(mean, 10.0, rtol=1e-3)


class TestMseEuler:
    def test_identical_zero_and_ordering(self, rng):
        from behavior_driven_video_synthesis_tpu.metrics.sequence import (
            mse_euler_per_action,
        )
        gt = rng.randn(6, 4, 99).astype(np.float32) * 0.3
        actions = np.array([0, 0, 1, 1, 2, 2])
        out = mse_euler_per_action(gt, gt, actions)
        for v in out.values():
            assert v < 1e-10
        noisy = gt + rng.randn(*gt.shape).astype(np.float32) * 0.05
        out2 = mse_euler_per_action(noisy, gt, actions)
        assert all(v > 0 for v in out2.values())


class TestEmbedding:
    def test_pca_fallback_and_hist(self, rng, tmp_path):
        from behavior_driven_video_synthesis_tpu.viz.embedding import (
            embed_2d,
            plot_embedding,
            make_hist,
        )
        lat = rng.randn(40, 16).astype(np.float32)
        emb = embed_2d(lat)
        assert emb.shape == (40, 2)
        img = plot_embedding(lat, labels=rng.randint(0, 3, 40),
                             out_path=str(tmp_path / "emb.png"))
        assert img.ndim == 3
        h = make_hist(rng.rand(100), out_path=str(tmp_path / "hist.png"))
        assert h.ndim == 3
