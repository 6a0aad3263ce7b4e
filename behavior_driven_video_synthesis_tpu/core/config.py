"""Typed-ish configuration system mirroring the reference's YAML surface.

The reference (main.py:15-72) loads a plain YAML into a nested dict with
sections ``general/data/architecture/training/metrics/logging`` and passes
``**config["data"], **config["training"]`` straight into constructors, which
tolerate arbitrary extra keys.  We keep the same YAML surface and section
names, but wrap the nested dict in an attribute-access `Config` that

  * supports dotted access (``cfg.training.batch_size``),
  * supports ``.get(key, default)`` like a dict,
  * deep-merges CLI/runtime overrides,
  * round-trips to YAML so a run's hyperparameters are immutable on restart
    (reference main.py:24-70 reloads the dumped config).
"""
from __future__ import annotations

import copy
import os
from typing import Any, Iterator, Mapping

import yaml


class Config(dict):
    """Nested dict with attribute access. Missing keys raise AttributeError."""

    def __init__(self, data: Mapping[str, Any] | None = None, **kwargs):
        super().__init__()
        merged = dict(data or {})
        merged.update(kwargs)
        for k, v in merged.items():
            self[k] = _wrap(v)

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def __delattr__(self, name: str) -> None:
        del self[name]

    # -- conveniences -------------------------------------------------------
    def to_dict(self) -> dict:
        return _unwrap(self)

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))

    def merged(self, other: Mapping[str, Any]) -> "Config":
        return Config(deep_merge(self.to_dict(), _unwrap(other)))

    def flat_items(self, prefix: str = "") -> Iterator[tuple[str, Any]]:
        for k, v in self.items():
            key = f"{prefix}{k}"
            if isinstance(v, Config):
                yield from v.flat_items(prefix=key + ".")
            else:
                yield key, v


def _wrap(v: Any) -> Any:
    if isinstance(v, Config):
        return v
    if isinstance(v, Mapping):
        return Config(v)
    if isinstance(v, (list, tuple)):
        return type(v)(_wrap(e) for e in v)
    return v


def _unwrap(v: Any) -> Any:
    if isinstance(v, Mapping):
        return {k: _unwrap(e) for k, e in v.items()}
    if isinstance(v, (list, tuple)):
        return [_unwrap(e) for e in v]
    return v


def deep_merge(base: Mapping[str, Any], override: Mapping[str, Any]) -> dict:
    """Recursively merge ``override`` into ``base`` (override wins)."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = _unwrap(v)
    return out


class _TupleSafeLoader(yaml.SafeLoader):
    """SafeLoader that also understands the ``!!python/tuple`` tags the
    reference configs use (config/behavior_net.yaml:13)."""


_TupleSafeLoader.add_constructor(
    "tag:yaml.org,2002:python/tuple",
    lambda loader, node: tuple(loader.construct_sequence(node)),
)


def load_config(path: str | os.PathLike) -> Config:
    with open(path, "r") as f:
        raw = yaml.load(f, Loader=_TupleSafeLoader)
    return Config(raw or {})


def save_config(cfg: Config | Mapping[str, Any], path: str | os.PathLike) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(_unwrap(cfg), f, default_flow_style=False, sort_keys=False)


def loads_config(text: str) -> Config:
    return Config(yaml.load(text, Loader=_TupleSafeLoader) or {})
