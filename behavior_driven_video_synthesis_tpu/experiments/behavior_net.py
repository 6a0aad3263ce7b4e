"""Behavior-cVAE experiment driver: two-stage training + inference protocol.

Re-design of /root/reference/experiments/behavior_net.py (1521 LoC):
  stage 1 — cVAE with adversarial regressor + probe classifiers + adaptive
            gamma (jitted step from train/behavior.py); net updates freeze
            for the last 10 epochs while probes keep training (ref :680).
  stage 2 — normalizing-flow prior over frozen posterior latents, 5 epochs
            (ref :108, :951-1014).
  inference — ADE/FDE/ASD/FSD/APD over n_samples prior AND flow rollouts.
            TPU-first change: the reference's 50-iteration python sampling
            loop (ref :1183-1232) becomes ONE batched rollout of B*S
            sequences through the scan decoder.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..core import schedules
from ..core.rng import KeySeq
from ..data.loader import prefetch_iter
from ..geometry.normalization import unnormalize
from ..metrics import sequence_sample_metrics
from ..models import (
    ClassifierAction,
    ClassifierActionBeta,
    ResidualBehaviorNet,
    RegressorFly,
)
from ..models.discriminators import SequenceDiscMichael
from ..models.flows import LatentFlow
from ..train.behavior import (
    create_behavior_state,
    make_behavior_eval_step,
    make_behavior_train_step,
)
from ..train.flow import create_flow_state, make_flow_train_step
from ..train.state import torch_adam
from .base import Experiment
from .data_factory import build_sequence_data, normalize_action_labels


class BehaviorNetExperiment(Experiment):
    def __init__(self, config, dirs):
        super().__init__(config, dirs)
        self.only_flow = bool(config.training.get("only_flow", False))
        self.n_flow_epochs = (int(config.training.n_epochs)
                              if self.only_flow else 5)

    # -- construction -------------------------------------------------------
    def _build_models(self, n_kps: int, n_actions: int, seq_len: int):
        arch = self.config.architecture
        # training.bf16 (opt-in, default f32 = the reference's dtype and
        # the lockstep-verified path): bf16 compute measured +19% on the
        # chip (10,388 vs 8,762 seq/s at B=64); params stay f32
        # (param_dtype), so the flag flips on any checkpoint
        dtype = (jnp.bfloat16
                 if bool(self.config.training.get("bf16", False))
                 else jnp.float32)
        model = ResidualBehaviorNet(
            n_kps=n_kps,
            dim_hidden_b=int(arch.get("dim_hidden_b", 1024)),
            decoder_arch=str(arch.get("decoder_arch", "lstm")),
            use_nin_dec=bool(arch.get("linear_in_decoder", False)),
            information_bottleneck=True,
            dtype=dtype,
        )
        regressor = RegressorFly(n_out=n_kps, seq_length=seq_len,
                                 dtype=dtype)
        cls_action = ClassifierAction(n_classes=n_actions, dim=512,
                                      dtype=dtype)
        cls_action2 = SequenceDiscMichael(layers=(2, 1, 1, 1),
                                          out_dim=n_actions, dtype=dtype)
        cls_beta = ClassifierActionBeta(n_classes=n_actions, dtype=dtype)
        return model, regressor, cls_action, cls_action2, cls_beta

    def _build_flow(self):
        arch = self.config.architecture
        hid = int(arch.get("dim_hidden_b", 1024))
        return LatentFlow(
            flow_in_channels=hid,
            flow_mid_channels=hid * int(arch.get("flow_mid_channels_factor",
                                                 2)),
            flow_hidden_depth=int(arch.get("flow_hidden_depth", 2)),
            n_flows=int(arch.get("n_flows", 15)),
        )

    def _make_txs(self, n_steps: int):
        tr = self.config.training
        lr = float(tr.get("lr_init", 1e-4))
        schedule = schedules.multistep_lr(
            lr, n_steps, list(tr.get("tau", [0.2, 0.45, 0.7])),
            float(tr.get("gamma", 0.3)))
        wd = float(tr.get("weight_decay", 0.0))
        # per-module optimizer hyperparameters are the reference's
        # (experiments/behavior_net.py:288-306,334): probe classifiers
        # carry torch-Adam L2 weight decay (1e-4 / 1e-5) and the beta
        # probe trains 10x hotter (lr 1e-3) — torch_adam reproduces
        # torch.optim.Adam's L2-in-grad semantics, NOT decoupled AdamW
        return {
            "net": torch_adam(schedule, weight_decay=wd),
            "regressor": torch_adam(1e-4),
            "cls_action": torch_adam(1e-4, weight_decay=1e-4),
            "cls_action2": torch_adam(1e-4, weight_decay=1e-5),
            "cls_beta": torch_adam(1e-3),
        }

    # -- training -----------------------------------------------------------
    def run_training(self):
        cfg = self.config
        train_loader, meta = build_sequence_data(cfg, "train")
        test_loader, _ = build_sequence_data(cfg, "test")
        seq_len = meta["seq_len"]
        n_epochs = int(cfg.training.n_epochs)
        if self.debug:
            n_epochs = min(n_epochs, 2)
        steps_per_epoch = max(1, len(train_loader))

        models = self._build_models(meta["n_kps"], meta["n_actions"],
                                    seq_len)
        model, regressor, cls_action, cls_action2, cls_beta = models
        txs = self._make_txs(n_epochs * steps_per_epoch)

        ks = KeySeq(int(cfg.general.get("seed", 42)))
        sample_batch = {k: jnp.asarray(v)
                        for k, v in next(iter(train_loader)).items()}
        state = create_behavior_state(
            ks(), model, regressor, cls_action, cls_action2, cls_beta,
            txs, sample_batch, seq_len,
            gamma_init=float(cfg.training.get("gamma_init", 0.0)))
        state, start_step, mgr = self.maybe_restore("reg_ckpt", state)
        if self.only_flow and start_step == 0:
            state = self._fallback_ckpt(state)
        state = self.place(state)

        # donate the train state: params+opt moments get reused in place
        # (the 630M-param flow stage does NOT fit HBM without donation)
        step_fn = jax.jit(
            make_behavior_train_step(
                model, regressor, cls_action, cls_action2, cls_beta, txs,
                cfg, seq_len,
                # adjust_imax span: (n_epochs - 10) * len(loader)
                # (reference behavior_net.py:418)
                total_steps=max(1, (n_epochs - 10) * steps_per_epoch)),
            donate_argnums=(0,),
        )
        eval_fn = jax.jit(make_behavior_eval_step(model, seq_len))

        start_epoch = int(start_step) // steps_per_epoch
        if not self.only_flow:
            for epoch in range(start_epoch, n_epochs):
                enable = jnp.asarray(epoch < n_epochs - 10 or n_epochs <= 10)
                # host prep + device placement run one batch ahead
                for batch in prefetch_iter(
                        iter(train_loader),
                        lambda b: self._prep_batch(b, meta)):
                    state, metrics = step_fn(state, batch, ks(), enable)
                    self.collect(metrics)
                step = int(jax.device_get(state.step))
                self.logger.log(self.avg.averages(), step, prefix="train/")
                if (epoch + 1) % int(cfg.get("logging", {}).get(
                        "n_epoch_eval", 1)) == 0:
                    self._run_eval(eval_fn, state, test_loader, meta, ks,
                                   step)
                    if bool(cfg.general.get("visualization", False)):
                        from .visualize import (
                            latent_interpolate_videos,
                            make_behavior_startpose_grid,
                            visualize_transfer3d,
                        )

                        vis_batch = next(iter(test_loader))
                        out_dir = self.dirs.get("generated", "./generated")
                        visualize_transfer3d(
                            model, state.net.params, vis_batch, out_dir,
                            ks(), seq_len=seq_len,
                            norm_stats=meta.get("norm_stats"),
                            n_vids=int(cfg.get("logging", {}).get(
                                "n_vid_to_generate", 2)),
                            tag=f"e{epoch:03d}_")
                        latent_interpolate_videos(
                            model, state.net.params, vis_batch, out_dir,
                            ks(), seq_len=seq_len,
                            norm_stats=meta.get("norm_stats"),
                            tag=f"e{epoch:03d}_")
                        make_behavior_startpose_grid(
                            model, state.net.params, vis_batch, out_dir,
                            ks(), seq_len=seq_len,
                            norm_stats=meta.get("norm_stats"),
                            tag=f"e{epoch:03d}_")
                        self._maybe_render_rgb(model, state, vis_batch,
                                               meta, ks, out_dir,
                                               tag=f"e{epoch:03d}_")
                mgr.save(step, jax.device_get(state))
            mgr.save(int(jax.device_get(state.step)),
                     jax.device_get(state), force=True)

        # ---- flow stage ---------------------------------------------------
        flow_model = self._build_flow()
        # reference flow optimizer: Adam(lr=flow_lr*batch, betas=(0.5,
        # 0.9), weight_decay=cfg) (experiments/behavior_net.py:384-391)
        flow_tx = torch_adam(
            float(cfg.training.get("flow_lr", 4.5e-7))
            * int(cfg.training.batch_size),
            b1=0.5, b2=0.9,
            weight_decay=float(cfg.training.get("weight_decay", 0.0)))
        sample_b = self._infer_b(model, state, sample_batch, ks())
        fstate = create_flow_state(ks(), flow_model, flow_tx, sample_b)
        fstate, fstart, fmgr = self.maybe_restore("flow_ckpt", fstate)
        # The production flow is the one model whose replicated train state
        # saturates a chip (630M params -> 2.5 GB params + 5 GB adam
        # moments); `training.fsdp` shards params AND moments over the data
        # axis (ZeRO-3), with out_shardings pinning the updated state to the
        # same layout so donation reuses the sharded buffers.
        if bool(cfg.training.get("fsdp", False)) and self.mesh is not None:
            from ..parallel import shard_module_state_fsdp, state_shardings
            from jax.sharding import NamedSharding, PartitionSpec

            fstate = shard_module_state_fsdp(
                fstate, self.mesh,
                min_size=int(cfg.training.get("fsdp_min_size", 1 << 14)))
            flow_out_sh = (state_shardings(fstate),
                           NamedSharding(self.mesh, PartitionSpec()))
            print("flow stage: FSDP sharding of flow params + optimizer "
                  f"moments over {self.mesh.shape['data']} devices")
        else:
            if bool(cfg.training.get("fsdp", False)):
                print("flow stage: training.fsdp requested but only one "
                      "device is visible — falling back to the replicated "
                      "layout")
            fstate = self.place(fstate)
            flow_out_sh = None
        flow_step = jax.jit(
            make_flow_train_step(model, flow_model, flow_tx, seq_len),
            donate_argnums=(0,), out_shardings=flow_out_sh)
        flow_spe = max(1, len(train_loader))  # steps per flow epoch
        flow_start_epoch = int(fstart) // flow_spe
        for epoch in range(flow_start_epoch,
                           self.n_flow_epochs if not self.debug else 1):
            for batch in prefetch_iter(
                    iter(train_loader),
                    lambda b: self._prep_batch(b, meta)):
                fstate, fmetrics = flow_step(fstate, state.net.params,
                                             batch, ks())
                self.collect(fmetrics)
            fstep = int(jax.device_get(fstate.step))
            flow_logs = self.avg.averages()
            # per-epoch KS gaussianity of the flow codes
            # (reference lib/logging.py:2549-2562 logs this during eval)
            try:
                from .eval_protocol import ks_test_flow_gaussianity

                b = self._infer_b(model, state, sample_batch, ks())
                z, _ = flow_model.apply(
                    {"params": fstate.flow.params,
                     "buffers": fstate.flow.buffers}, b)
                flow_logs["flow_ks_p"] = ks_test_flow_gaussianity(
                    np.asarray(z))
            except Exception as e:  # noqa: BLE001 — logging must not kill
                print(f"flow KS logging skipped: {e}")
            self.logger.log(flow_logs, fstep, prefix="flow/")
            fmgr.save(fstep, jax.device_get(fstate))
        mgr.flush()
        fmgr.flush()  # join in-flight async writes before returning
        return state, fstate

    # -- helpers ------------------------------------------------------------
    def _maybe_render_rgb(self, model, state, batch, meta, ks, out_dir,
                          tag: str = ""):
        """When --synth_model points at a trained synthesis run AND the
        dataset carries cameras, render RGB behavior videos through the
        compiled pipeline (reference behavior_net.py:84-99 +
        data_conversions_3d.py:1068-1228)."""
        synth_dir = self.config.get("logging", {}).get("synth_params")
        ds = meta.get("dataset")
        stats = meta.get("norm_stats")
        if not synth_dir or stats is None or \
                "extrinsics_univ" not in getattr(ds, "datadict", {}):
            return None
        try:
            from ..models.vunet import vunet_from_config
            from ..pipeline import BehaviorTransferPipeline
            from .visualize import (
                get_synth_input,
                load_synth_params,
                render_rgb_videos,
            )

            vunet_params, synth_cfg = load_synth_params(str(synth_dir))
            data_cfg = synth_cfg.data if synth_cfg else {}
            spatial = int(data_cfg.get("spatial_size", 64))
            s_exp = (str(synth_cfg.general.get("experiment", "cvbae"))
                     if synth_cfg else "cvbae")
            # the shared builder reconstructs the EXACT trained param tree
            # from the run's dumped config (driver defaults included)
            vunet = vunet_from_config(
                synth_cfg, "org" if s_exp == "vunet" else "alter")

            pipe = BehaviorTransferPipeline(
                model, vunet, ds.joint_model, stats.mean, stats.std,
                stats.dim_to_use, spatial_size=spatial,
                stickman_thickness=max(2.0, spatial / 64.0))

            n = min(2, batch["keypoints"].shape[0])
            kps = jnp.asarray(batch["keypoints"], jnp.float32)[:n]
            seq = kps[:, :-1]
            _, mu, _, _ = model.apply(
                {"params": state.net.params}, seq, sample=False,
                rngs={"sample": ks()}, method=model.infer_b)
            apps, extrs, intrs, sizes = [], [], [], []
            for i in range(n):
                try:
                    # get_synth_input resizes the appearance to `spatial`
                    app, extr, intr, imsize = get_synth_input(ds, i, spatial)
                except Exception:
                    app = np.zeros((spatial, spatial, 3), np.float32)
                    extr = np.asarray(ds.datadict["extrinsics_univ"][i],
                                      np.float32)
                    intr = np.asarray(ds.datadict["intrinsics_univ"][i],
                                      np.float32)
                    imsize = np.asarray(ds.datadict["image_size"][i],
                                        np.float32)
                apps.append(app)
                extrs.append(extr)
                intrs.append(intr)
                sizes.append(imsize)
            params = {"behavior": state.net.params,
                      "vunet": vunet_params, "flow": None}
            paths = render_rgb_videos(
                pipe, params, mu, kps[:, 0], jnp.asarray(np.stack(apps)),
                jnp.asarray(np.stack(extrs)), jnp.asarray(np.stack(intrs)),
                jnp.asarray(np.stack(sizes)), ks(), out_dir,
                length=meta["seq_len"], tag=tag + "rgb")
            paths.update(self._render_paper_figures(
                pipe, model, params, kps, np.stack(apps), np.stack(extrs),
                np.stack(intrs), np.stack(sizes), meta, ks, out_dir))
            return paths
        except Exception as e:  # noqa: BLE001 — rendering must not kill runs
            print(f"synth rendering skipped: {e}")
            return None

    def _render_paper_figures(self, pipe, model, params, kps, apps, extrs,
                              intrs, sizes, meta, ks, out_dir):
        """The reference's inference-time figure suite through the compiled
        pipeline: multi-camera enrollment (lib/figures.py:458), latent
        interpolation eval (:687), diverse-futures single-sid (:1810)."""
        from .visualize import (
            get_synth_input_all_cameras,
            latent_interpolate_eval_figures,
            make_enrollment_figures,
            sample_examples_single_figures,
        )

        fig_dir = os.path.join(out_dir, "figures")
        paths = {}
        seq_len = meta["seq_len"]
        kps = np.asarray(kps, np.float32)
        # enrollment rows = every DISTINCT camera when the dataset has them
        # (reference all_cameras=True); fall back to the sampled inputs
        try:
            cam_in = get_synth_input_all_cameras(
                meta.get("dataset"), spatial_size=apps.shape[1])
            apps_e, extrs_e, intrs_e, sizes_e = cam_in
        except Exception as e:  # noqa: BLE001 — figures must not kill runs
            print(f"all-camera synth input unavailable ({e}); enrollment "
                  f"figure falls back to the sampled inputs")
            apps_e, extrs_e, intrs_e, sizes_e = apps, extrs, intrs, sizes
        paths.update({f"enroll_{k}": v for k, v in make_enrollment_figures(
            pipe, params, kps[0, :-1], kps[min(1, len(kps) - 1), 0],
            apps_e, extrs_e, intrs_e, sizes_e, ks(), fig_dir,
            length=seq_len).items()})
        if len(kps) > 1:
            paths.update({f"interp_{k}": v
                          for k, v in latent_interpolate_eval_figures(
                              pipe, model, params, kps[0], kps[1], apps,
                              extrs, intrs, sizes, ks(), fig_dir,
                              length=seq_len).items()})
            paths.update({f"samples_{k}": v
                          for k, v in sample_examples_single_figures(
                              pipe, model, params, kps[0], kps[1],
                              apps[0], extrs[0], intrs[0], sizes[0],
                              ks(), fig_dir, length=seq_len,
                              use_flow=False).items()})
        return paths

    def _fallback_ckpt(self, template):
        """Flow-only training with no local cVAE checkpoint: search sibling
        run dirs under the same experiment for one (the reference matches by
        '@b{dim_hidden_b}' filename, behavior_net.py:117-131; we try every
        sibling reg_ckpt whose state restores into our template)."""
        import os

        from ..core.checkpoint import CheckpointManager

        ckpt_root = os.path.dirname(self.dirs["ckpt"])
        if not os.path.isdir(ckpt_root):
            return template
        for proj in sorted(os.listdir(ckpt_root)):
            cand = os.path.join(ckpt_root, proj, "reg_ckpt")
            if not os.path.isdir(cand):
                continue
            try:
                out = CheckpointManager(cand).restore_latest(template)
            except Exception:
                continue
            if out is not None:
                print(f"flow-only: using fallback cVAE checkpoint from "
                      f"{cand}")
                return out[0]
        return template

    def _prep_batch(self, batch, meta) -> Dict[str, jnp.ndarray]:
        out = {
            "keypoints": np.asarray(batch["keypoints"], np.float32),
            "paired_keypoints": np.asarray(
                batch.get("paired_keypoints", batch["keypoints"]),
                np.float32),
            "action": normalize_action_labels(
                np.asarray(batch["action"]), meta["action_offset"]),
        }
        return self.place_batch(out)

    def _infer_b(self, model, state, batch, key):
        seq_b = jnp.asarray(batch["keypoints"])[:, :-1]
        b, *_ = model.apply({"params": state.net.params}, seq_b,
                            sample=False, rngs={"sample": key},
                            method=model.infer_b)
        return jax.lax.stop_gradient(b)

    def _run_eval(self, eval_fn, state, test_loader, meta, ks, step,
                  n_sample_batches: int = 2):
        mets = []
        capped = False
        for i, batch in enumerate(test_loader):
            batch = self._prep_batch(batch, meta)
            m, _ = eval_fn(state.net.params, batch, ks())
            mets.append({k: float(v) for k, v in jax.device_get(m).items()})
            if i + 1 >= n_sample_batches:
                capped = True
                break
        if capped:
            print(f"eval: averaged over first {n_sample_batches} test "
                  f"batches (cap; remaining batches skipped)")
        if mets:
            avg = {k: float(np.mean([m[k] for m in mets]))
                   for k in mets[0]}
            self.logger.log(avg, step, prefix="eval/")

    # -- batched sampling (the TPU replacement of the 50x python loop) ------
    @partial(jax.jit, static_argnames=("self", "model", "seq_len",
                                       "n_samples", "b_dim", "flow_model"))
    def _sample_rollouts(self, model, net_params, seq_start, n_samples: int,
                         seq_len: int, key, b_dim: int,
                         flow_model=None, flow_variables=None):
        """seq_start: (B, K) start poses -> (B, S, T, K) rollouts."""
        B, K = seq_start.shape
        z = jax.random.normal(key, (B * n_samples, b_dim))
        if flow_model is not None:
            b = flow_model.apply(flow_variables, z, method=flow_model.reverse)
        else:
            b = z
        starts = jnp.repeat(seq_start, n_samples, axis=0)
        xs, _ = model.apply({"params": net_params}, b, starts[:, None],
                            seq_len, method=model.generate_seq)
        return xs.reshape(B, n_samples, seq_len, K)

    # -- inference protocol -------------------------------------------------
    def run_inference(self, n_samples: int = 50, max_batches: int = 50):
        cfg = self.config
        test_loader, meta = build_sequence_data(cfg, "test")
        seq_len = meta["seq_len"]
        models = self._build_models(meta["n_kps"], meta["n_actions"],
                                    seq_len)
        model = models[0]
        txs = self._make_txs(1000)

        ks = KeySeq(int(cfg.general.get("seed", 42)))
        sample_batch = {k: jnp.asarray(v)
                        for k, v in next(iter(test_loader)).items()}
        template = create_behavior_state(ks(), *models, txs, sample_batch,
                                         seq_len)
        restored = self.ckpt_manager("reg_ckpt").restore_latest(template)
        if restored is None:
            raise FileNotFoundError("no behavior checkpoint to evaluate")
        state, _ = restored
        state = self.place(state)  # replicate over the mesh (batches shard)

        flow_model = self._build_flow()
        flow_variables = None
        sample_b = self._infer_b(model, state, sample_batch, ks())
        ftemplate = create_flow_state(ks(), flow_model, optax.adam(1e-4),
                                      sample_b)
        frestored = self.ckpt_manager("flow_ckpt").restore_latest(ftemplate)
        if frestored is not None:
            fstate, _ = frestored
            fstate = self.place(fstate)
            flow_variables = {"params": fstate.flow.params,
                              "buffers": fstate.flow.buffers}

        stats = meta["norm_stats"]
        b_dim = int(cfg.architecture.get("dim_hidden_b", 1024))

        def to_3d(flat):
            arr = np.asarray(flat)
            if stats is not None:
                arr = np.asarray(unnormalize(arr, stats))
            return arr.reshape(arr.shape[:-1] + (-1, 3))

        results: Dict[str, list] = {"prior": [], "flow": []}
        recon_mse = []
        eval_fn = jax.jit(make_behavior_eval_step(model, seq_len))
        for i, batch in enumerate(test_loader):
            batch = self._prep_batch(batch, meta)
            m, _ = eval_fn(state.net.params, batch, ks())
            recon_mse.append(float(m["recon_mse"]))
            kps = batch["keypoints"]
            seq_start = kps[:, 0]
            gt = to_3d(kps[:, 1:])
            samples = self._sample_rollouts(
                model, state.net.params, seq_start, n_samples, seq_len,
                ks(), b_dim)
            results["prior"].append(
                {k: float(v) for k, v in sequence_sample_metrics(
                    jnp.asarray(to_3d(samples)), jnp.asarray(gt)).items()})
            if flow_variables is not None:
                fsamples = self._sample_rollouts(
                    model, state.net.params, seq_start, n_samples, seq_len,
                    ks(), b_dim, flow_model, flow_variables)
                results["flow"].append(
                    {k: float(v) for k, v in sequence_sample_metrics(
                        jnp.asarray(to_3d(fsamples)),
                        jnp.asarray(gt)).items()})
            if i + 1 >= max_batches or (self.debug and i >= 1):
                print(f"inference: sample-metric loop capped at "
                      f"{i + 1} batches (max_batches={max_batches}, "
                      f"debug={self.debug})")
                break

        summary = {"recon_mse": float(np.mean(recon_mse))}
        for src, rows in results.items():
            if rows:
                for k in rows[0]:
                    summary[f"{k}_{src}"] = float(
                        np.mean([r[k] for r in rows]))

        summary.update(self._run_posthoc_protocol(
            model, state, flow_model, flow_variables, test_loader, meta,
            ks, b_dim))
        self.logger.log(summary, 0, prefix="infer/")
        print("inference:", summary)
        return summary

    def _run_posthoc_protocol(self, model, state, flow_model,
                              flow_variables, test_loader, meta, ks,
                              b_dim, max_cache: Optional[int] = None):
        """Cache rollouts per source and run the full protocol: ADE_c/FDE_c,
        mu consistency, KS gaussianity of flow codes, per-start-frame
        post-hoc real/fake classifiers + start-pose regressor, CF
        action-transfer scores (reference behavior_net.py:1260-1522,
        lib/logging.py:2106-2226, :2549-2562).

        max_cache defaults to metrics.max_cache (25_000 — the reference's
        num_samples cap at behavior_net.py:1133); the applied cap is
        logged, never silent."""
        if max_cache is None:
            max_cache = int(self.config.get("metrics", {})
                            .get("max_cache", 25_000))
        from .eval_protocol import (
            action_transfer_scores,
            cross_transfer_metrics,
            ks_test_flow_gaussianity,
            mu_consistency_metrics,
            train_posthoc_classifiers,
        )

        seq_len = meta["seq_len"]

        @partial(jax.jit, static_argnames=())
        def forward_all(net_params, kps, kps_cross, key):
            seq_s, seq_t = kps[:, :-1], kps_cross[:, :-1]
            k1, k2, k3, k4 = jax.random.split(key, 4)
            # cross transfer: behavior of source onto target start pose
            xc, _, b, mu, logstd, _ = model.apply(
                {"params": net_params}, seq_s, seq_t, seq_len,
                rngs={"sample": k1})
            # self decode from mu
            x_self, _ = model.apply({"params": net_params}, mu, seq_s,
                                    seq_len, method=model.generate_seq)
            # prior sample rollout
            xp, _, bp, *_ = model.apply(
                {"params": net_params}, seq_s, seq_s, seq_len, sample=True,
                rngs={"sample": k2})
            # re-encode rollout + related sequence
            _, mu_re, *_ = model.apply(
                {"params": net_params}, xc, sample=False,
                rngs={"sample": k3}, method=model.infer_b)
            _, mu_rel, *_ = model.apply(
                {"params": net_params}, seq_t, sample=False,
                rngs={"sample": k4}, method=model.infer_b)
            return xc, x_self, xp, mu, mu_re, mu_rel, b

        caches = {k: [] for k in ["orig", "prior", "cross", "self",
                                  "flow", "mu", "z", "labels"]}
        n_cached = 0
        for batch in test_loader:
            batch = self._prep_batch(batch, meta)
            kps = batch["keypoints"]
            xc, x_self, xp, mu, mu_re, mu_rel, b = forward_all(
                state.net.params, kps, batch["paired_keypoints"], ks())
            caches["orig"].append(np.asarray(kps[:, 1:]))
            caches["cross"].append(np.asarray(xc))
            caches["self"].append(np.asarray(x_self))
            caches["prior"].append(np.asarray(xp))
            caches["mu"].append(np.asarray(mu))
            caches["labels"].append(np.asarray(batch["action"]))
            caches.setdefault("mu_re", []).append(np.asarray(mu_re))
            caches.setdefault("mu_rel", []).append(np.asarray(mu_rel))
            if flow_variables is not None:
                z, _ = flow_model.apply(flow_variables, b)
                caches["z"].append(np.asarray(z))
                zs = jax.random.normal(ks(), b.shape)
                bflow = flow_model.apply(flow_variables, zs,
                                         method=flow_model.reverse)
                xf, _ = model.apply({"params": state.net.params}, bflow,
                                    kps[:, :-1], seq_len,
                                    method=model.generate_seq)
                caches["flow"].append(np.asarray(xf))
            n_cached += kps.shape[0]
            if n_cached >= max_cache or self.debug:
                print(f"inference: rollout cache capped at {n_cached} "
                      f"samples (max_cache={max_cache}, "
                      f"debug={self.debug})")
                break

        cat = {k: np.concatenate(v) for k, v in caches.items() if v}
        out = {}
        out.update(cross_transfer_metrics(cat["cross"], cat["orig"]))
        out.update(mu_consistency_metrics(cat["mu"], cat["mu_re"],
                                          cat["mu_rel"]))
        if "z" in cat:
            out["flow_ks_p"] = ks_test_flow_gaussianity(cat["z"])
        fake_sets = {k: cat[k] for k in ("prior", "cross", "self", "flow")
                     if k in cat}
        # reference protocol: 2000 iterations per start frame
        # (behavior_net.py:1317); debug shrinks for CI
        n_iters = 50 if self.debug else int(
            self.config.get("metrics", {}).get("posthoc_iters", 2000))
        out.update(train_posthoc_classifiers(
            ks(), cat["orig"], fake_sets, mu=cat["mu"], n_iters=n_iters))

        # CF scores need the action classifier trained alongside the cVAE
        cls_action = self._build_models(meta["n_kps"], meta["n_actions"],
                                        seq_len)[2]

        def cls_apply(x):
            return cls_action.apply({"params": state.cls_action.params}, x)

        out.update(action_transfer_scores(cls_apply, cat["cross"],
                                          cat["orig"], cat["labels"]))

        # CF_action: does the action classifier recognize the action in
        # PRIOR-sample rollouts; CF_action_beta: accuracy of the
        # beta-classifier trained alongside the cVAE on inferred mu
        # (reference lib/logging.py:2115-2127, :2640)
        labels = jnp.asarray(cat["labels"]).reshape(len(cat["mu"]), -1)[:, 0]
        logits_p, _ = cls_apply(jnp.asarray(cat["prior"], jnp.float32))
        out["CF_action"] = float(jnp.mean(
            (jnp.argmax(logits_p, -1) == labels).astype(jnp.float32)))
        cls_beta = self._build_models(meta["n_kps"], meta["n_actions"],
                                      seq_len)[4]
        beta_logits = cls_beta.apply({"params": state.cls_beta.params},
                                     jnp.asarray(cat["mu"], jnp.float32))
        out["CF_action_beta"] = float(jnp.mean(
            (jnp.argmax(beta_logits, -1) == labels).astype(jnp.float32)))

        if bool(self.config.general.get("visualization", False)):
            # beta-space embedding colored by action (reference log_umap,
            # lib/logging.py:1366-1436; PCA fallback without umap) and the
            # per-sequence recon-error histogram (make_hist, :1347-1363)
            from ..viz.embedding import make_hist, plot_embedding

            out_dir = self.dirs.get("generated", "./generated")
            os.makedirs(out_dir, exist_ok=True)
            labels = cat["labels"]
            if labels.ndim > 1:
                labels = labels[:, 0]
            plot_embedding(cat["mu"], labels,
                           os.path.join(out_dir, "beta_embedding.png"))
            err = np.sqrt(((cat["self"] - cat["orig"]) ** 2).sum(-1))
            make_hist(err.mean(axis=-1),
                      os.path.join(out_dir, "recon_error_hist.png"))

            # nearest-neighbour retrieval figure in beta space (reference
            # lib/figures.py:23 nearest_neighbours)
            from ..viz.figures import nearest_neighbour_figure

            nearest_neighbour_figure(
                cat["mu"], cat["orig"], labels,
                os.path.join(out_dir, "beta_nearest_neighbours.png"))

            # RGB paper figures when a synthesis model is attached
            # (enrollment / interpolation / diverse futures)
            vis_batch = next(iter(test_loader))
            self._maybe_render_rgb(model, state, vis_batch, meta, ks,
                                   out_dir, tag="infer_")
        return out
