"""Original-VUNet experiment (org variant) — re-export.

The driver shares ShapePoseExperiment's machinery with the org train step
(reference experiments/vunet.py differs from shape_and_pose_net.py mainly in
the KL term and LR schedule).
"""
from .shape_and_pose_net import VunetExperiment

__all__ = ["VunetExperiment"]
