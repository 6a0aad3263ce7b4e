"""utils/ tests: bounding boxes, batched crops, sampling distributions."""
import numpy as np

import jax.numpy as jnp

from behavior_driven_video_synthesis_tpu.utils import (
    get_bounding_box,
    crop_with_bbox,
    bounding_box_batch,
    get_area_sampling_dist,
    get_pid_sampling_dist,
    parallel_data_prefetch,
    prepare_input,
    scale_img,
)


class TestBoxes:
    def test_square_and_padded(self, rng):
        pts = np.array([[10, 20], [50, 25], [30, 60]], np.float32)
        out = get_bounding_box(pts, (64, 64))
        x_tl, x_br, y_tl, y_br = out["bbox"]
        assert (x_br - x_tl) == (y_br - y_tl)  # square

    def test_crop_shape(self, rng):
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        kps = np.array([[10, 12], [40, 50], [25, 30]], np.float32)
        crop = crop_with_bbox(img, kps)
        assert crop.shape[0] == crop.shape[1]

    def test_batched_crop_resize(self, rng):
        imgs = jnp.asarray(rng.rand(3, 32, 32, 3).astype(np.float32))
        kps = jnp.asarray(rng.rand(3, 5, 2).astype(np.float32) * 20 + 5)
        out = bounding_box_batch(kps, imgs, 16)
        assert out.shape == (3, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestSampling:
    def test_area_dist_prefers_small_hulls(self, rng):
        big = rng.rand(10, 2) * 100
        small = rng.rand(10, 2) * 5
        w = get_area_sampling_dist(np.stack([big, small]))
        assert w[1] > w[0]

    def test_pid_dist_inverse_frequency(self):
        p_ids = np.array([0, 0, 0, 1])
        w = get_pid_sampling_dist(p_ids)
        assert w[3] > w[0]
        np.testing.assert_allclose(w.sum(), 1.0)

    def test_parallel_prefetch_order(self):
        out = parallel_data_prefetch(lambda x: x * 2, list(range(20)),
                                     n_proc=4)
        assert out == [2 * i for i in range(20)]


class TestMisc:
    def test_prepare_input(self, rng):
        x = np.arange(24).reshape(2, 4, 3)
        a, b = prepare_input(x)
        np.testing.assert_array_equal(a, x[:, :-1])
        np.testing.assert_array_equal(b, x[:, 1:])

    def test_scale_img(self):
        out = np.asarray(scale_img(jnp.asarray([-2.0, -1.0, 0.0, 1.0, 2.0])))
        np.testing.assert_allclose(out, [0, 0, 0.5, 1, 1])


def test_device_op_table_parses_cpu_trace(tmp_path):
    """The trace parser aggregates per-op time from a jax.profiler capture
    (CPU events here; device_substr selects the process)."""
    import jax
    import jax.numpy as jnp
    from behavior_driven_video_synthesis_tpu.core.profiling import (
        device_op_table,
        trace,
    )

    with trace(str(tmp_path)):
        x = jnp.ones((128, 128))
        float(jnp.sum(jax.jit(lambda a: a @ a)(x)))
    rows = device_op_table(str(tmp_path), runs=1, device_substr="")
    assert rows and all({"op", "us_per_run", "share"} <= set(r) for r in rows)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-6


def test_device_op_table_self_time_nesting(tmp_path):
    """Nested events (while umbrella over loop-body ops, jit_ over all)
    must not double-count: the parser reports SELF time, so the umbrella
    contributes only its non-child gap and totals equal wall span."""
    import gzip
    import json
    import os

    from behavior_driven_video_synthesis_tpu.core.profiling import (
        device_op_table,
    )

    d = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(d)
    events = [
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/device:TPU:0"}},
        # jit umbrella [0, 100)
        {"ph": "X", "pid": 1, "tid": 1, "ts": 0, "dur": 100, "name": "jit_f"},
        # while umbrella [10, 90) with two conv children per "iteration"
        {"ph": "X", "pid": 1, "tid": 1, "ts": 10, "dur": 80,
         "name": "while.1"},
        {"ph": "X", "pid": 1, "tid": 1, "ts": 10, "dur": 30, "name": "conv"},
        {"ph": "X", "pid": 1, "tid": 1, "ts": 40, "dur": 30, "name": "conv"},
        {"ph": "X", "pid": 1, "tid": 1, "ts": 70, "dur": 10, "name": "copy"},
        # sibling op after the loop
        {"ph": "X", "pid": 1, "tid": 1, "ts": 90, "dur": 10, "name": "add"},
    ]
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    rows = {r["op"]: r["us_per_run"]
            for r in device_op_table(str(tmp_path), runs=1)}
    assert rows["conv"] == 60
    assert rows["copy"] == 10
    assert rows["add"] == 10
    assert rows["while.1"] == 10  # 80 - 70 of children
    assert "jit_f" not in rows  # module umbrella skipped entirely
    assert sum(rows.values()) == 90  # leaf span only: no double count


class TestRbgKey:
    """core.rng.rbg_key: hardware-rng dropout keys (CVBAE_RECONCILE.json)."""

    def test_wraps_raw_and_typed_keys(self):
        import jax
        from behavior_driven_video_synthesis_tpu.core.rng import rbg_key

        for k in (jax.random.PRNGKey(0), jax.random.key(0)):
            rk = rbg_key(k)
            assert jax.dtypes.issubdtype(rk.dtype, jax.dtypes.prng_key)
            assert "rbg" in str(rk.dtype)
            # usable: bernoulli + fold_in (what flax Dropout needs)
            m = jax.random.bernoulli(jax.random.fold_in(rk, 3), 0.5, (64,))
            assert m.shape == (64,)

    def test_mask_rate_sane(self):
        import jax
        import jax.numpy as jnp
        from behavior_driven_video_synthesis_tpu.core.rng import rbg_key

        rk = rbg_key(jax.random.PRNGKey(7))
        m = jax.random.bernoulli(rk, 0.05, (200_000,))
        rate = float(jnp.mean(m.astype(jnp.float32)))
        assert 0.045 < rate < 0.055

    def test_distinct_keys_give_distinct_masks(self):
        import jax
        import jax.numpy as jnp
        from behavior_driven_video_synthesis_tpu.core.rng import rbg_key

        a = jax.random.bernoulli(rbg_key(jax.random.PRNGKey(1)), 0.5, (4096,))
        b = jax.random.bernoulli(rbg_key(jax.random.PRNGKey(2)), 0.5, (4096,))
        assert bool(jnp.any(a != b))

    def test_dropout_rng_threefry_matches_old_stream(self):
        """training.dropout_rng=threefry restores the pre-round-4 stream:
        the step's loss must equal the rbg arm's only in expectation, but
        the threefry arm must be deterministic across calls."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        import optax
        from behavior_driven_video_synthesis_tpu.core.config import Config
        from behavior_driven_video_synthesis_tpu.models.perceptual import (
            LaplacianPyramidFeatures,
        )
        from behavior_driven_video_synthesis_tpu.models.vunet import VUNet
        from behavior_driven_video_synthesis_tpu.train.vunet_exp import (
            create_vunet_state,
            make_cvbae_train_step,
        )

        rng = np.random.RandomState(0)
        batch = {k: jnp.asarray(rng.rand(2, 16, 16, 3) * 2 - 1, jnp.float32)
                 for k in ("app_img", "pose_img", "stickman")}
        vunet = VUNet(spatial_size=16, nf_start=4, nf_max=8,
                      variant="alter", dropout_prob=0.25)
        feat = LaplacianPyramidFeatures()
        key = jax.random.PRNGKey(0)
        fvars = feat.init(key, batch["pose_img"][:1])
        txs = {"vunet": optax.adam(1e-4)}
        losses = {}
        for mode in ("rbg", "threefry"):
            config = Config({
                "architecture": {"cvae": False},
                "training": {"ll_weight": 1.0, "vgg_weights": [1.0] * 6,
                             "train_regressor": False, "gamma_step": 0.0,
                             "information_max": 1.0, "n_init_batches": 1,
                             "dropout_rng": mode},
            })
            state = create_vunet_state(key, vunet, None, feat, txs, batch)
            step = jax.jit(make_cvbae_train_step(vunet, None, feat, fvars,
                                                 txs, config))
            _, m1 = step(state, batch, jax.random.PRNGKey(5))
            _, m2 = step(state, batch, jax.random.PRNGKey(5))
            assert float(m1["loss"]) == float(m2["loss"])  # deterministic
            losses[mode] = float(m1["loss"])
        # different streams -> (almost surely) different masks, but both
        # finite and the same order of magnitude
        assert np.isfinite(losses["rbg"]) and np.isfinite(losses["threefry"])
        assert losses["rbg"] != losses["threefry"]
