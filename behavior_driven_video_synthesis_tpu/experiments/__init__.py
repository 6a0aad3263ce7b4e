"""Experiment registry (reference experiments/__init__.py:8-25)."""
from __future__ import annotations


def select_experiment(config, dirs, restart: bool = False):
    name = config.general.experiment
    if name == "behavior_net":
        from .behavior_net import BehaviorNetExperiment as cls
    elif name == "cvbae":
        from .shape_and_pose_net import ShapePoseExperiment as cls
    elif name == "vunet":
        from .vunet import VunetExperiment as cls
    elif name == "mtvae":
        from .mt_vae import MTVAEExperiment as cls
    else:
        raise ValueError(f"unknown experiment: {name}")
    if restart:
        print(f"+++ Restarting experiment {name} +++")
    return cls(config, dirs)


__experiments__ = ["behavior_net", "cvbae", "vunet", "mtvae"]
