"""CLI entry point — mirrors the reference's public surface
(/root/reference/main.py:76-132):

    python -m behavior_driven_video_synthesis_tpu.main \
        --config configs/behavior_net.yaml [--restart] [--flow] \
        [--mode train|infer] [--debug] [--synth_model DIR] \
        [--pretrained_model DIR]

Semantics preserved: dir structure ``{ckpt,config,generated,log}/<project>``
under ``base_dir/experiment``; the config is dumped on first run and
RELOADED from the run dir on --restart so hyperparameters are immutable;
``--flow`` switches the behavior experiment to flow-only training;
``DATAPATH`` env var re-roots base_dir/datapath.  ``--gpu`` is accepted and
ignored (device selection is the JAX mesh).
"""
from __future__ import annotations

import argparse
import os
from os import path

from .core.config import Config, load_config, save_config


def create_dir_structure(config: Config, model_name: str):
    subdirs = ["ckpt", "config", "generated", "log"]
    base = path.join(config.general.base_dir, config.general.experiment)
    return {d: path.join(base, d, model_name) for d in subdirs}


def load_parameters(config_name: str, restart: bool, debug: bool,
                    pretrained_model: str = None):
    config = load_config(config_name)
    if debug:
        config.general["debug"] = True
        config.general["project_name"] = "debug"
    if "DATAPATH" in os.environ:
        dp = os.environ["DATAPATH"]
        config.general["base_dir"] = path.join(
            dp, config.general.base_dir.lstrip("/"))
        if config.data.get("datapath"):
            config.data["datapath"] = path.join(
                dp, str(config.data.datapath).lstrip("/"))
    dirs = create_dir_structure(config, config.general.project_name)
    saved_cfg = path.join(dirs["config"], "config.yaml")
    if restart and path.exists(saved_cfg):
        config = load_config(saved_cfg)
        if debug:
            config.general["debug"] = True
    elif pretrained_model:
        # warm start (reference main.py:32-47): adopt the pretrained run's
        # config and copy its checkpoints into this run's ckpt dir, then
        # train/infer as usual from there
        config, dirs = _adopt_pretrained(pretrained_model, debug)
    else:
        os.makedirs(dirs["config"], exist_ok=True)
        if path.isfile(saved_cfg) and not debug:
            # the run dir already exists: the reference prompts
            # "Resume training (y/n)?" (main.py:52-66).  Only prompt on a
            # real terminal — non-interactive runs (tests, schedulers)
            # keep the overwrite behavior instead of blocking on stdin.
            import sys as _sys

            if _sys.stdin is not None and _sys.stdin.isatty():
                while True:
                    answer = input(
                        "WARNING: run was started earlier: resume "
                        "training (y/n)? ").strip().lower()
                    if answer in ("y", "yes"):
                        config = load_config(saved_cfg)
                        restart = True
                        break
                    if answer in ("n", "no"):
                        save_config(config, saved_cfg)
                        # honor the 'start over' choice: drivers restore
                        # the latest checkpoint unconditionally, so flag
                        # the run to clear stale checkpoints instead
                        config.general["fresh_start"] = True
                        break
                    print("Invalid answer! Try again! (y/n)")
            else:
                save_config(config, saved_cfg)
        else:
            save_config(config, saved_cfg)
    config.general["restart"] = restart
    return config, dirs


def _adopt_pretrained(pretrained_model: str, debug: bool):
    """Warm start from a pretrained run (reference main.py:32-47).

    Accepts either the experiment root ``<base>/<experiment>`` (sole
    project) or the project's config dir
    ``<base>/<experiment>/config/<project>``; loads its config.yaml and
    copies the run's orbax checkpoint role dirs into the new run's ckpt
    dir (the reference copies the run's ``*.pth`` files)."""
    import glob as _glob
    import shutil

    direct = path.join(pretrained_model, "config.yaml")
    if path.isfile(direct):
        cfg_path = direct
        project = path.basename(path.normpath(pretrained_model))
        src_ckpt = path.join(path.dirname(path.dirname(
            path.normpath(pretrained_model))), "ckpt", project)
    else:
        found = sorted(_glob.glob(
            path.join(pretrained_model, "config", "*", "config.yaml")))
        if len(found) != 1:
            raise FileNotFoundError(
                f"--pretrained_model: expected exactly one "
                f"config/<project>/config.yaml under {pretrained_model}, "
                f"found {found}")
        cfg_path = found[0]
        project = path.basename(path.dirname(cfg_path))
        src_ckpt = path.join(pretrained_model, "ckpt", project)
    config = load_config(cfg_path)
    if debug:
        # same sandboxing as load_parameters: a --debug warm start writes
        # into the 'debug' project, never into the pretrained run itself
        config.general["debug"] = True
        config.general["project_name"] = "debug"
    dirs = create_dir_structure(config, config.general.project_name)
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    save_config(config, path.join(dirs["config"], "config.yaml"))
    if path.isdir(src_ckpt):
        if path.abspath(src_ckpt) == path.abspath(dirs["ckpt"]):
            # the pretrained run still lives at its original base_dir, so
            # the adopted config reproduces its own dirs: this degenerates
            # to an IN-PLACE continuation (the reference behaves the same,
            # main.py:40-47 — it copies *.pth onto themselves).  Warn: new
            # saves will rotate out the run's older checkpoints.
            print("WARNING: --pretrained_model points at a run whose "
                  "config resolves to the same run directory; continuing "
                  "IN PLACE (new checkpoints rotate out old ones there). "
                  "Move/copy the pretrained run elsewhere to warm-start "
                  "a fresh run.")
        else:
            for role in os.listdir(src_ckpt):
                s = path.join(src_ckpt, role)
                t = path.join(dirs["ckpt"], role)
                if path.isdir(s) and not path.exists(t):
                    shutil.copytree(s, t)
    return config, dirs


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="behavior_driven_video_synthesis_tpu")
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-r", "--restart", action="store_true")
    parser.add_argument("-f", "--flow", action="store_true",
                        help="train only the flow stage of behavior_net")
    parser.add_argument("--gpu", type=int, nargs="*", default=None,
                        help="accepted for CLI parity; devices come from "
                             "the JAX mesh")
    parser.add_argument("-m", "--mode", type=str, default="train",
                        choices=["train", "infer"])
    parser.add_argument("-d", "--debug", action="store_true")
    parser.add_argument("-v", "--visualization", action="store_true")
    parser.add_argument("-s", "--synth_model", type=str, default=None,
                        help="pretrained synthesis run dir for video "
                             "rendering")
    parser.add_argument("-p", "--pretrained_model", type=str, default=None)
    args = parser.parse_args(argv)

    config, dirs = load_parameters(args.config, args.restart, args.debug,
                                   args.pretrained_model)
    if args.flow:
        config.training["only_flow"] = True
    if args.visualization:
        config.general["visualization"] = True
    if args.synth_model:
        config.setdefault("logging", Config())
        config.logging["synth_params"] = args.synth_model
    if args.pretrained_model:
        config.general["pretrained_model"] = args.pretrained_model

    from .experiments import select_experiment

    experiment = select_experiment(config, dirs, args.restart)
    if args.mode == "train":
        experiment.run_training()
    else:
        experiment.run_inference()


if __name__ == "__main__":
    main()
