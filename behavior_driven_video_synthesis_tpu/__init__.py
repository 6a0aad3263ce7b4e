"""behavior_driven_video_synthesis_tpu — a TPU-native framework for behavior-driven
synthesis of human dynamics.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
CompVis/behavior-driven-video-synthesis ("Behavior-Driven Synthesis of Human
Dynamics", CVPR 2021): a recurrent cVAE that disentangles *behavior* from
posture in 3D human keypoint sequences, a normalizing-flow prior over the
behavior latent, and a VUNet-style appearance/shape image synthesizer that
renders generated poses into RGB video frames.

Layering (see SURVEY.md §7):
    core/       typed configs, RNG plumbing, checkpointing, schedules, logging
    geometry/   batched, jittable 3D rotation algebra, forward kinematics,
                camera projection, keypoint normalization, stickman raster
    data/       host-side dataset pipeline (column store, windows, samplers)
    ops/        NN primitives (weight-norm convs, recurrent scan cells) and
                Pallas TPU kernels for the hot ops
    models/     flax modules: behavior cVAE, normalizing flows, VUNet family,
                probes/discriminators, perceptual nets
    parallel/   mesh construction + sharding rules (SPMD data parallel over ICI)
    train/      pure jitted train/eval step factories per experiment
    metrics/    SSIM / IS / FID / sequence diversity metrics
    viz/        host-side video/figure generation
"""

__version__ = "0.1.0"
