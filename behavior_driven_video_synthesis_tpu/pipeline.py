"""The end-to-end behavior-transfer video program — ONE compiled call.

North-star deliverable (BASELINE.json): sample a behavior latent (flow
inverse or posterior), roll out the residual decoder from a target start
posture, unnormalize to world coordinates, project through the camera,
rasterize stickmen ON DEVICE, and render RGB frames with the VUNet — all
inside a single jit so no intermediate ever leaves the chip.

The reference runs this as a per-frame host loop: python rollout ->
numpy unnormalize -> cv2 stickman -> torch VUNet per frame
(/root/reference/data/data_conversions_3d.py:1068-1228,
lib/logging.py:103-906).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

from .geometry.camera import apply_affine_transform, camera_projection
from .geometry.stickman import JointModel, render_stickman


class BehaviorTransferPipeline:
    """Bundles behavior net + flow + VUNet params into one jitted program.

    All shape-determining settings are fixed at construction; `generate`
    is jit-compiled once per (batch, length) signature.
    """

    def __init__(self, behavior_model, vunet, joint_model: JointModel,
                 norm_mean: np.ndarray, norm_std: np.ndarray,
                 dim_to_use: np.ndarray,
                 spatial_size: int = 256,
                 stickman_thickness: float = 5.0,
                 flow_model=None,
                 use_pallas_rollout: bool = True,
                 vunet_chunk: int = 128):
        self.behavior_model = behavior_model
        self.vunet = vunet
        self.flow_model = flow_model
        self.joint_model = joint_model
        self.spatial_size = spatial_size
        self.thickness = stickman_thickness
        # the Pallas VMEM-resident rollout kernel removes the per-step HBM
        # weight streaming of the serial decoder (the pipeline's largest
        # latency component at small batch); LSTM-without-nin decoders only
        self.use_pallas_rollout = (
            use_pallas_rollout
            and getattr(behavior_model, "decoder_arch", "lstm") == "lstm"
            and not getattr(behavior_model, "use_nin_dec", False)
            and jax.default_backend() == "tpu"
        )
        self.norm_mean = jnp.asarray(norm_mean)
        self.norm_std = jnp.asarray(norm_std)
        self.dim_to_use = jnp.asarray(np.asarray(dim_to_use))
        self.full_dim = int(norm_mean.shape[0])
        # B*T frames above this size run through the VUNet in lax.map
        # chunks: one giant batch spills HBM (activations at the 256^2
        # scales are ~4 MB/frame/tensor) and measures ~20% slower per
        # frame than ~128-frame chunks
        self.vunet_chunk = int(vunet_chunk)

    def _chunk_size(self, n: int) -> tuple:
        """Pick (chunk_size, padded_n) with chunk_size <= vunet_chunk.

        Prefers an exact divisor in (vunet_chunk/2, vunet_chunk] — no padded
        frames; otherwise pads n up to the next multiple of vunet_chunk so
        an awkward n (e.g. prime B*T) never collapses to tiny chunks and a
        silent throughput cliff."""
        if n <= self.vunet_chunk:
            return n, n
        for cs in range(self.vunet_chunk, self.vunet_chunk // 2, -1):
            if n % cs == 0:
                return cs, n
        cs = self.vunet_chunk
        return cs, ((n + cs - 1) // cs) * cs

    # -- stages (all pure, called inside jit) -------------------------------
    def _front_stages(self, params, z, x_start, app_img, extrinsics,
                      intrinsics, image_size, key, length, use_flow):
        """flow inverse -> decoder rollout -> unnormalize -> camera project
        -> device stickman raster -> appearance encode (once per video)."""
        B = z.shape[0]
        if use_flow and self.flow_model is not None:
            b = self.flow_model.apply(params["flow"], z,
                                      method=self.flow_model.reverse)
        else:
            b = z

        if self.use_pallas_rollout:
            from .models.behavior import decoder_rollout_kernel

            xs = decoder_rollout_kernel(
                params["behavior"]["decoder"], b.astype(jnp.float32),
                x_start.astype(jnp.float32), length)          # (B, T, Kn)
        else:
            xs, _ = self.behavior_model.apply(
                {"params": params["behavior"]}, b, x_start[:, None], length,
                method=self.behavior_model.generate_seq)      # (B, T, Kn)

        world = self._unnormalize(xs)
        world = world.reshape(B, length, -1, 3)               # (B, T, K, 3)
        px = self._project(world, extrinsics, intrinsics, image_size)

        stick = render_stickman(px, self.joint_model, self.spatial_size,
                                thickness=self.thickness)     # (B,T,S,S,3)
        # bf16 from here on: the VUNet computes in bf16 anyway, and at
        # B*T frames this tensor is the pipeline's largest intermediate
        stick = (stick / 127.5 - 1.0).astype(jnp.bfloat16)

        flat_stick = stick.reshape((B * length,) + stick.shape[2:])
        # appearance is fixed per video: encode ONCE (B), tile the posterior
        # means over T, and run only the shape encoder + generator per frame
        means, _ = self.vunet.apply(
            {"params": params["vunet"]}, app_img, rngs={"sample": key},
            method=self.vunet.encode_means)
        means_tiled = [jnp.repeat(m, length, axis=0) for m in means]
        return world, px, stick, flat_stick, means_tiled

    @partial(jax.jit, static_argnames=("self", "length", "use_flow"))
    def calibrate(self, params, z, x_start, app_img, extrinsics, intrinsics,
                  image_size, key, length: int = 50, use_flow: bool = True):
        """One PTQ calibration pass for a quant="int8_static" vunet: runs
        the real front stages so the per-conv activation scales see
        production-distribution stickmen and latents, then folds their amax
        into the "quant" collection.  Returns the calibrated collection —
        pass it as params["vunet_quant"] to generate()."""
        _, _, _, flat_stick, means_tiled = self._front_stages(
            params, z, x_start, app_img, extrinsics, intrinsics, image_size,
            key, length, use_flow)
        vv = {"params": params["vunet"]}
        if "vunet_quant" in params:
            vv["quant"] = params["vunet_quant"]
        _, mut = self.vunet.apply(vv, means_tiled, flat_stick,
                                  mutable=["quant"],
                                  method=self.vunet.transfer_cached)
        return mut["quant"]

    def _unnormalize(self, flat):
        out_shape = flat.shape[:-1] + (self.full_dim,)
        full = jnp.zeros(out_shape, flat.dtype)
        full = full.at[..., self.dim_to_use].set(flat)
        return full * self.norm_std + self.norm_mean

    def _project(self, world_kps, extrinsics, intrinsics, image_size):
        """world (B, T, K, 3) -> stickman-pixel coords (B, T, K, 2)."""
        cam = apply_affine_transform(world_kps,
                                     extrinsics[:, None, None, :, :])
        # camera_projection consumes (..., K, 3); its params broadcast over
        # the (B, T) batch dims, so intrinsics go in as (B, 1, 4)
        px = camera_projection(cam, intrinsics[:, None, :])
        scale = self.spatial_size / image_size  # (B, 2)
        return px * scale[:, None, None, :]

    @partial(jax.jit, static_argnames=("self", "length", "use_flow"))
    def generate(self, params: Dict[str, Any], z, x_start, app_img,
                 extrinsics, intrinsics, image_size, key,
                 length: int = 50, use_flow: bool = True):
        """Generate a behavior-transfer video.

        Args:
          params: {"behavior": net params, "vunet": vunet params,
                   "flow": flow variables (params+buffers) or None,
                   optional "vunet_quant": calibrated int8 scales for a
                   quant="int8_static" vunet (models.vunet.calibrate_quant
                   / BehaviorTransferPipeline.calibrate)}
          z: (B, H) base-gaussian codes (or behavior latents when not
             use_flow).
          x_start: (B, K_norm) start posture (normalized coords).
          app_img: (B, S, S, 3) appearance image in [-1, 1].
          extrinsics: (B, 3, 4); intrinsics: (B, 4); image_size: (B, 2).
          key: PRNG key for the VUNet encoder sampling.

        Returns:
          dict with "frames" (B, T, S, S, 3), "stickman", "poses_3d",
          "keypoints_2d".
        """
        (world, px, stick, flat_stick, means_tiled) = self._front_stages(
            params, z, x_start, app_img, extrinsics, intrinsics, image_size,
            key, length, use_flow)
        B = z.shape[0]

        vv = {"params": params["vunet"]}
        if "vunet_quant" in params:
            vv["quant"] = params["vunet_quant"]
        n = B * length
        cs, n_pad = self._chunk_size(n)
        if cs == n:
            frames = self.vunet.apply(
                vv, means_tiled, flat_stick,
                method=self.vunet.transfer_cached)
        else:
            pad = n_pad - n
            if pad:
                # zero-pad the tail so chunks tile evenly; sliced off below
                means_tiled = [
                    jnp.pad(m, ((0, pad),) + ((0, 0),) * (m.ndim - 1))
                    for m in means_tiled]
                flat_stick = jnp.pad(
                    flat_stick,
                    ((0, pad),) + ((0, 0),) * (flat_stick.ndim - 1))

            def synth_chunk(args):
                m_c, s_c = args
                return self.vunet.apply(vv, list(m_c), s_c,
                                        method=self.vunet.transfer_cached)

            m_chunked = tuple(
                m.reshape((n_pad // cs, cs) + m.shape[1:])
                for m in means_tiled)
            s_chunked = flat_stick.reshape((n_pad // cs, cs)
                                           + flat_stick.shape[1:])
            frames = jax.lax.map(synth_chunk, (m_chunked, s_chunked))
            frames = frames.reshape((n_pad,) + frames.shape[2:])[:n]
        frames = frames.reshape((B, length) + frames.shape[1:])
        return {"frames": frames, "stickman": stick, "poses_3d": world,
                "keypoints_2d": px}

    @partial(jax.jit, static_argnames=("self", "length"))
    def reenact(self, params, x_source, x_start, app_img, extrinsics,
                intrinsics, image_size, key, length: int = 50):
        """Transfer the behavior of x_source onto x_start's posture
        (posterior mean path, no flow)."""
        b, mu, logstd, _ = self.behavior_model.apply(
            {"params": params["behavior"]}, x_source, sample=False,
            rngs={"sample": key},
            method=self.behavior_model.infer_b)
        return self.generate(params, mu, x_start, app_img, extrinsics,
                             intrinsics, image_size,
                             jax.random.fold_in(key, 1), length=length,
                             use_flow=False)
