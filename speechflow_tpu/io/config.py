"""Declarative YAML config system.

Capability parity with the reference config layer
(speechflow/io/config_io.py:23, speechflow/io/yaml_io.py:13-25):

* ``!join`` YAML tag composing filesystem paths from parts,
* ``value_select`` multiplexing: any mapping whose keys include ``default``
  (e.g. ``{default: 48, debug: 4}``) collapses to a single value chosen by the
  active selector list (``value_select=["debug"]``); first matching selector
  wins, otherwise ``default``,
* section access / trimming helpers used to route sub-configs to subsystems,
* stable content hashing (config identity for feature caches),
* file round-trip and in-place mutation (``change_config_file``) used by CLI
  overrides.

Implemented on plain PyYAML + dict (no omegaconf dependency).
"""

from __future__ import annotations

import copy
import hashlib
import json
import os
from pathlib import Path
import typing as tp

import yaml

__all__ = ["Config", "yaml_load", "yaml_dump", "change_config_file"]


def _join_tag(loader: yaml.Loader, node: yaml.Node) -> str:
    parts = loader.construct_sequence(node)
    return os.path.join(*[str(p) for p in parts])


class _SFLoader(yaml.SafeLoader):
    pass


_SFLoader.add_constructor("!join", _join_tag)


def yaml_load(text: str) -> dict:
    """Parse YAML text with the ``!join`` tag enabled."""
    out = yaml.load(text, Loader=_SFLoader)
    return {} if out is None else out


def yaml_dump(data: tp.Any) -> str:
    return yaml.safe_dump(_plain(data), sort_keys=False, allow_unicode=True)


def _plain(obj: tp.Any) -> tp.Any:
    """Recursively convert Config/Path objects to plain YAML-safe types."""
    if isinstance(obj, Config):
        obj = obj.to_dict()
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    if isinstance(obj, Path):
        return str(obj)
    return obj


def _apply_value_select(node: tp.Any, selectors: tp.Sequence[str]) -> tp.Any:
    """Collapse ``{default: X, sel: Y, ...}`` mappings bottom-up."""
    if isinstance(node, dict):
        node = {k: _apply_value_select(v, selectors) for k, v in node.items()}
        if "default" in node:
            for sel in selectors:
                if sel in node:
                    return node[sel]
            return node["default"]
        return node
    if isinstance(node, list):
        return [_apply_value_select(v, selectors) for v in node]
    return node


class Config(dict):
    """A nested dict with section helpers, value_select and hashing."""

    def __init__(self, data: tp.Optional[dict] = None, **kwargs):
        super().__init__()
        data = dict(data or {})
        data.update(kwargs)
        for k, v in data.items():
            self[k] = self._wrap(v)

    # -- construction ------------------------------------------------------

    @staticmethod
    def _wrap(v: tp.Any) -> tp.Any:
        if isinstance(v, Config):
            return v
        if isinstance(v, dict):
            return Config(v)
        return v

    @classmethod
    def create_from_file(
        cls,
        path: tp.Union[str, Path],
        value_select: tp.Optional[tp.Sequence[str]] = None,
    ) -> "Config":
        text = Path(path).read_text(encoding="utf-8")
        return cls.create_from_yaml(text, value_select=value_select)

    @classmethod
    def create_from_yaml(
        cls,
        text: str,
        value_select: tp.Optional[tp.Sequence[str]] = None,
    ) -> "Config":
        data = yaml_load(text)
        if value_select is not None:
            data = _apply_value_select(data, list(value_select))
        else:
            data = _apply_value_select(data, [])
        return cls(data)

    # -- dict-style access -------------------------------------------------

    def __getattr__(self, name: str) -> tp.Any:
        try:
            return self[name]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(name) from e

    def __setitem__(self, key, value):
        super().__setitem__(key, self._wrap(value))

    def setdefault(self, key, default=None):
        if key not in self:
            self[key] = default
        return self[key]

    # -- sections ----------------------------------------------------------

    def section(self, name: str, default: tp.Optional[dict] = None) -> "Config":
        val = self.get(name)
        if val is None:
            return Config(default or {})
        if not isinstance(val, Config):
            return Config({name: val})
        return val

    def trim(self, keep: tp.Sequence[str]) -> "Config":
        """Return a copy containing only the listed top-level sections."""
        return Config({k: v for k, v in self.items() if k in keep})

    def drop(self, remove: tp.Sequence[str]) -> "Config":
        return Config({k: v for k, v in self.items() if k not in remove})

    # -- deep access -------------------------------------------------------

    def find(self, key: str) -> tp.Any:
        """Depth-first search for the first occurrence of ``key``."""
        if key in self:
            return self[key]
        for v in self.values():
            if isinstance(v, Config):
                found = v.find(key)
                if found is not None:
                    return found
        return None

    def set_path(self, dotted: str, value: tp.Any) -> None:
        """Set ``a.b.c`` style nested key, creating intermediate sections."""
        keys = dotted.split(".")
        node = self
        for k in keys[:-1]:
            if not isinstance(node.get(k), Config):
                node[k] = Config()
            node = node[k]
        node[keys[-1]] = value

    def get_path(self, dotted: str, default: tp.Any = None) -> tp.Any:
        node: tp.Any = self
        for k in dotted.split("."):
            if not isinstance(node, dict) or k not in node:
                return default
            node = node[k]
        return node

    # -- serialization -----------------------------------------------------

    def to_dict(self) -> dict:
        out = {}
        for k, v in self.items():
            out[k] = v.to_dict() if isinstance(v, Config) else copy.deepcopy(v)
        return out

    def to_yaml(self) -> str:
        return yaml_dump(self.to_dict())

    def to_file(self, path: tp.Union[str, Path]) -> None:
        Path(path).write_text(self.to_yaml(), encoding="utf-8")

    def copy(self) -> "Config":
        return Config(self.to_dict())

    @property
    def hash(self) -> str:
        blob = json.dumps(_plain(self), sort_keys=True, default=str)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]


def change_config_file(
    path: tp.Union[str, Path],
    updates: tp.Dict[str, tp.Any],
    value_select: tp.Optional[tp.Sequence[str]] = None,
) -> Config:
    """Apply dotted-key overrides to a config file in place and return it.

    Mirrors the reference CLI-override behavior
    (speechflow/training/utils/config_prepare.py:161-163).
    """
    cfg = Config.create_from_file(path, value_select=value_select)
    for dotted, value in updates.items():
        cfg.set_path(dotted, value)
    cfg.to_file(path)
    return cfg
