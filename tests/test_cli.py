"""CLI load_parameters semantics that don't need a training run: the
interactive resume prompt (reference main.py:52-66) and its non-TTY
fallback."""
import os

import yaml

from behavior_driven_video_synthesis_tpu.main import load_parameters


def _write_cfg(tmp_path, seed):
    cfg = {
        "general": {"base_dir": os.path.join(str(tmp_path), "runs"),
                    "project_name": "p", "experiment": "behavior_net",
                    "seed": seed},
        "data": {"dataset": "synthetic"},
        "training": {},
    }
    p = os.path.join(str(tmp_path), "c.yaml")
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    return p


class _FakeTty:
    def isatty(self):
        return True


def test_existing_run_non_tty_overwrites(tmp_path):
    """Without a terminal the saved config is overwritten (never blocks)."""
    p = _write_cfg(tmp_path, seed=1)
    cfg1, dirs = load_parameters(p, restart=False, debug=False)
    assert cfg1.general.seed == 1
    p2 = _write_cfg(tmp_path, seed=2)
    cfg2, _ = load_parameters(p2, restart=False, debug=False)
    assert cfg2.general.seed == 2  # overwrote, not resumed
    saved = os.path.join(dirs["config"], "config.yaml")
    with open(saved) as f:
        assert yaml.safe_load(f)["general"]["seed"] == 2


def test_existing_run_tty_prompt_resume(tmp_path, monkeypatch):
    """On a terminal, answering 'y' reloads the run's dumped config and
    flips restart on (reference 'Resume training (y/n)?')."""
    import behavior_driven_video_synthesis_tpu.main as main_mod

    p = _write_cfg(tmp_path, seed=1)
    load_parameters(p, restart=False, debug=False)
    p2 = _write_cfg(tmp_path, seed=2)
    monkeypatch.setattr("sys.stdin", _FakeTty())
    answers = iter(["bogus", "y"])  # invalid answer re-prompts first
    monkeypatch.setattr("builtins.input", lambda *a: next(answers))
    cfg, _ = load_parameters(p2, restart=False, debug=False)
    assert cfg.general.seed == 1  # resumed the dumped config
    assert cfg.general.restart is True


def test_existing_run_tty_prompt_overwrite(tmp_path, monkeypatch):
    p = _write_cfg(tmp_path, seed=1)
    load_parameters(p, restart=False, debug=False)
    p2 = _write_cfg(tmp_path, seed=2)
    monkeypatch.setattr("sys.stdin", _FakeTty())
    monkeypatch.setattr("builtins.input", lambda *a: "n")
    cfg, dirs = load_parameters(p2, restart=False, debug=False)
    assert cfg.general.seed == 2
    assert cfg.general.restart is False
    # 'n' = start over: drivers must clear stale checkpoints, not resume
    assert cfg.general.fresh_start is True
    saved = os.path.join(dirs["config"], "config.yaml")
    with open(saved) as f:
        assert yaml.safe_load(f)["general"]["seed"] == 2


def test_generate_preset_tpu_serving_expansion():
    """--preset tpu-serving expands to the documented serving preset
    (int8_static + quant_max_hw 128, SERVING_GAP.json) without overriding
    explicitly passed quant flags."""
    from behavior_driven_video_synthesis_tpu.generate import parse_args

    base = ["--behavior_model", "b", "--synth_model", "s"]
    a = parse_args(base + ["--preset", "tpu-serving"])
    assert a.quant == "int8_static" and a.quant_max_hw == 128

    a = parse_args(base + ["--preset", "tpu-serving", "--quant", "none"])
    assert a.quant == "none" and a.quant_max_hw == 128

    a = parse_args(base + ["--preset", "tpu-serving",
                           "--quant_max_hw=64"])
    assert a.quant == "int8_static" and a.quant_max_hw == 64

    a = parse_args(base)
    assert a.quant == "none" and a.quant_max_hw == 0
