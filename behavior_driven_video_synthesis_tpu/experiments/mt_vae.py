"""MT-VAE baseline experiment driver (reference experiments/mt_vae.py)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..core.rng import KeySeq
from ..data.loader import prefetch_iter
from ..metrics import sequence_sample_metrics
from ..models.mtvae import MTVAE
from ..train.mtvae_exp import create_mtvae_state, make_mtvae_train_step
from ..train.state import torch_adam
from .base import Experiment
from .data_factory import build_sequence_data
from .eval_protocol import cross_transfer_metrics


class MTVAEExperiment(Experiment):
    def _build_model(self, n_kps: int) -> MTVAE:
        # training.bf16 (opt-in, default f32 = the reference's dtype and
        # the lockstep-verified path): bf16 compute measured +21% on the
        # chip (16,465 vs 13,555 seq/s at B=256) — params stay f32
        # (param_dtype), so the flag can be flipped on any checkpoint
        cfg = self.config
        return MTVAE(n_in=n_kps,
                     n_cond=int(cfg.training.get("n_cond", 10)),
                     dtype=jnp.bfloat16
                     if bool(cfg.training.get("bf16", False))
                     else jnp.float32)

    def _make_tx(self):
        # reference: torch Adam(lr_init, weight_decay) — L2-IN-GRAD decay
        # (mt_vae.py:261-263; the yaml's wd is 1e-12, numerically nil but
        # torch-Adam semantics, not decoupled AdamW)
        return torch_adam(float(self.config.training.get("lr_init", 1e-4)),
                          weight_decay=float(
                              self.config.training.get("weight_decay",
                                                       0.0)))

    def run_training(self):
        cfg = self.config
        train_loader, meta = build_sequence_data(cfg, "train")
        n_epochs = int(cfg.training.n_epochs)
        if self.debug:
            n_epochs = min(n_epochs, 2)
        steps = max(1, len(train_loader)) * max(1, n_epochs - 10)

        model = self._build_model(meta["n_kps"])
        tx = self._make_tx()
        ks = KeySeq(int(cfg.general.get("seed", 42)))
        sample = {k: jnp.asarray(v)
                  for k, v in next(iter(train_loader)).items()}
        state = create_mtvae_state(ks(), model, tx, sample)
        state, start, mgr = self.maybe_restore("reg_ckpt", state)
        state = self.place(state)

        step_fn = jax.jit(make_mtvae_train_step(model, tx, cfg, steps),
                          donate_argnums=(0,))
        steps_per_epoch = max(1, len(train_loader))
        for epoch in range(int(start) // steps_per_epoch, n_epochs):
            enable = jnp.asarray(epoch < n_epochs - 10 or n_epochs <= 10)
            def _prep(b):
                return self.place_batch({
                    "keypoints": np.asarray(b["keypoints"], np.float32),
                    "paired_keypoints": np.asarray(
                        b["paired_keypoints"], np.float32),
                })

            for batch in prefetch_iter(iter(train_loader), _prep):
                state, metrics = step_fn(state, batch, ks(), enable)
                self.collect(metrics)
            step = int(jax.device_get(state.step))
            self.logger.log(self.avg.averages(), step, prefix="train/")
            if bool(cfg.general.get("visualization", False)):
                from .visualize import visualize_mtvae

                visualize_mtvae(
                    model, state.net.params, batch,
                    self.dirs.get("generated", "./generated"), ks(),
                    norm_stats=meta.get("norm_stats"),
                    tag=f"e{epoch:03d}_")
            mgr.save(step, jax.device_get(state))
        mgr.flush()  # join in-flight async writes before returning
        return state

    def run_inference(self, n_samples: int = 50, max_batches: int = 20):
        cfg = self.config
        test_loader, meta = build_sequence_data(cfg, "test")
        model = self._build_model(meta["n_kps"])
        tx = self._make_tx()  # must match training for restore structure
        ks = KeySeq(int(cfg.general.get("seed", 42)))
        sample = {k: jnp.asarray(v)
                  for k, v in next(iter(test_loader)).items()}
        template = create_mtvae_state(ks(), model, tx, sample)
        restored = self.ckpt_manager("reg_ckpt").restore_latest(template)
        if restored is None:
            raise FileNotFoundError("no mtvae checkpoint to evaluate")
        state, _ = restored

        @jax.jit
        def sample_many(params, kps, cross, key):
            def one(k):
                out, *_ = model.apply(
                    {"params": params}, kps, cross, sample_prior=True,
                    rngs={"sample": k})
                return out
            keys = jax.random.split(key, n_samples)
            return jax.vmap(one)(keys)  # (S, B, T, K)

        @jax.jit
        def recon_and_cross(params, kps, cross, key):
            """Posterior self-reconstruction and cross-context transfer
            (reference logging_mtvae.eval_nets:36-: self_recon_eval_av MSE
            + the X_cross / ADE_c/FDE_c collections)."""
            k1, k2 = jax.random.split(key)
            self_out, *_ = model.apply(
                {"params": params}, kps, cross, rngs={"sample": k1})
            cross_out, *_ = model.apply(
                {"params": params}, kps, cross, transfer=True,
                rngs={"sample": k2})
            return self_out, cross_out

        rows = []
        caches = {"orig": [], "prior": [], "self": [], "cross": []}
        vis_done = False
        for i, batch in enumerate(test_loader):
            kps = jnp.asarray(batch["keypoints"], jnp.float32)
            cross = jnp.asarray(batch["paired_keypoints"], jnp.float32)
            samples = sample_many(state.net.params, kps, cross, ks())
            samples = jnp.swapaxes(samples, 0, 1)  # (B, S, T, K)
            gt = kps[:, model.n_cond:]
            s3 = samples.reshape(samples.shape[:3] + (-1, 3))
            g3 = gt.reshape(gt.shape[:2] + (-1, 3))
            row = {k: float(v) for k, v in
                   sequence_sample_metrics(s3, g3).items()}

            self_out, cross_out = recon_and_cross(
                state.net.params, kps, cross, ks())
            row["self_recon_mse"] = float(jnp.mean((self_out - gt) ** 2))
            c3 = cross_out.reshape(cross_out.shape[:2] + (-1, 3))
            row.update(cross_transfer_metrics(
                c3, cross[:, model.n_cond:].reshape(
                    cross.shape[0], -1, c3.shape[2], 3)))
            rows.append(row)
            caches["orig"].append(np.asarray(gt))
            caches["prior"].append(np.asarray(samples[:, 0]))
            caches["self"].append(np.asarray(self_out))
            caches["cross"].append(np.asarray(cross_out))

            if not vis_done and bool(cfg.general.get("visualization",
                                                     False)):
                self._write_eval_strips(samples, self_out, cross_out, gt,
                                        meta)
                vis_done = True
            if i + 1 >= max_batches or (self.debug and i >= 1):
                print(f"mtvae inference: capped at {i + 1} batches "
                      f"(max_batches={max_batches}, debug={self.debug})")
                break
        summary = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}

        # post-hoc real/fake classifiers per sample source (reference
        # lib/logging_mtvae.py eval_nets:36- mirrors behavior_net's
        # classifier protocol on the MTVAE's prior/self/cross rollouts)
        from .eval_protocol import train_posthoc_classifiers

        cat = {k: np.concatenate(v) for k, v in caches.items()}
        n_iters = 50 if self.debug else int(
            cfg.get("metrics", {}).get("posthoc_iters", 2000))
        summary.update(train_posthoc_classifiers(
            ks(), cat["orig"],
            {k: cat[k] for k in ("prior", "self", "cross")},
            n_iters=n_iters))
        self.logger.log(summary, 0, prefix="infer/")
        print("mtvae inference:", summary)
        return summary

    def _write_eval_strips(self, samples, self_out, cross_out, gt, meta,
                           n_vids: int = 2):
        """3D-skeleton filmstrips for prior samples / self-recon / transfer
        (reference logging_mtvae X_prior/X_self/X_cross video dumps)."""
        import os

        from ..geometry.normalization import unnormalize
        from ..viz.videos import create_video_3d
        from ..viz.figures import sample_examples_grid

        out_dir = self.dirs.get("generated", "./generated")
        os.makedirs(out_dir, exist_ok=True)
        stats = meta.get("norm_stats")

        def to_world(seq):  # (T, K*3) -> (T, K, 3)
            arr = np.asarray(seq, np.float32)
            if stats is not None:
                arr = np.asarray(unnormalize(arr, stats))
            return arr.reshape(arr.shape[0], -1, 3)

        try:
            import cv2
        except Exception:  # pragma: no cover
            return
        for b in range(min(n_vids, gt.shape[0])):
            strips = []
            for name, seq in (("prior", samples[b, 0]),
                              ("self", self_out[b]),
                              ("cross", cross_out[b]), ("gt", gt[b])):
                frames = create_video_3d(to_world(seq))
                strips.append(sample_examples_grid(frames[None],
                                                   n_frames=6))
            grid = np.concatenate(strips, axis=0)  # already uint8 RGB
            cv2.imwrite(os.path.join(out_dir, f"mtvae_eval_{b}.png"),
                        cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
