"""ExperimentSaver: orbax checkpoints carrying their full context.

Capability parity with the reference ExperimentSaver
(speechflow/training/saver.py:29): an experiment directory holding raw
data/model config text, periodic checkpoints (model + optimizer state + step)
that embed the config payload, alphabet, speaker/lang id maps, library
versions, git commit and (optionally) a snapshot of all repo sources —
everything an eval interface needs to rebuild the data pipeline from the
checkpoint alone. Plus ``get_last_checkpoint`` and finetune/warmstart loads
(prefix-filtered weight restore, reference training/utils/finetuning.py:18,66).
"""

from __future__ import annotations

import json
import pickle
import re
import subprocess
import sys
import time
import typing as tp
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["ExperimentSaver"]


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


class ExperimentSaver:
    def __init__(self, experiment_path: tp.Union[str, Path],
                 expr_suffix: str = "", dump_sources: bool = False,
                 source_root: tp.Optional[Path] = None):
        stamp = time.strftime("%Y%m%d_%H%M%S")
        name = f"{stamp}{('_' + expr_suffix) if expr_suffix else ''}"
        self.expr_path = Path(experiment_path) / name
        self.ckpt_dir = self.expr_path / "checkpoints"
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.to_save: tp.Dict[str, tp.Any] = {
            "versions": self._versions(),
            "git_commit": self._git_commit(),
        }
        if dump_sources:
            self.to_save["sources"] = self._dump_sources(source_root or Path.cwd())
        self._checkpointer = ocp.PyTreeCheckpointer()

    # -- payload ---------------------------------------------------------------

    @staticmethod
    def _versions() -> dict:
        out = {"python": sys.version.split()[0]}
        for mod in ("jax", "flax", "optax", "numpy"):
            try:
                out[mod] = __import__(mod).__version__
            except Exception:
                pass
        return out

    @staticmethod
    def _git_commit() -> tp.Optional[str]:
        try:
            return subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True, text=True, timeout=5
            ).stdout.strip() or None
        except Exception:
            return None

    @staticmethod
    def _dump_sources(root: Path) -> tp.Dict[str, str]:
        out = {}
        for ext in ("*.py", "*.yml", "*.md"):
            for p in root.rglob(ext):
                if any(part.startswith(".") or part in ("__pycache__", "experiments")
                       for part in p.parts):
                    continue
                try:
                    out[str(p.relative_to(root))] = p.read_text(encoding="utf-8")
                except Exception:
                    pass
        return out

    def save_configs(self, data_cfg_text: tp.Optional[str] = None,
                     model_cfg_text: tp.Optional[str] = None) -> None:
        if data_cfg_text is not None:
            (self.expr_path / "data.yml").write_text(data_cfg_text)
            self.to_save["data_config_text"] = data_cfg_text
        if model_cfg_text is not None:
            (self.expr_path / "model.yml").write_text(model_cfg_text)
            self.to_save["model_config_text"] = model_cfg_text

    # -- checkpoint IO ---------------------------------------------------------

    def save(self, step: int, model_state: tp.Any,
             opt_state: tp.Optional[tp.Any] = None,
             extra: tp.Optional[dict] = None) -> Path:
        path = self.ckpt_dir / f"step_{step:09d}"
        if path.exists():
            return path  # idempotent: same step == same state
        tree = {"model": _to_numpy(model_state), "step": np.asarray(step)}
        if opt_state is not None:
            tree["opt"] = _to_numpy(opt_state)
        self._checkpointer.save(path.absolute(), tree)
        payload = dict(self.to_save)
        if extra:
            payload.update(extra)
        (path / "payload.pkl").write_bytes(pickle.dumps(payload, protocol=5))
        return path

    @staticmethod
    def get_last_checkpoint(expr_or_ckpt_dir: tp.Union[str, Path]) -> tp.Optional[Path]:
        d = Path(expr_or_ckpt_dir)
        if (d / "checkpoints").is_dir():
            d = d / "checkpoints"
        cands = [p for p in d.glob("step_*") if p.is_dir()]
        if not cands:
            return None

        def step_of(p: Path) -> int:
            m = re.match(r"step_(\d+)", p.name)
            return int(m.group(1)) if m else -1

        return max(cands, key=step_of)

    @staticmethod
    def load_checkpoint(path: tp.Union[str, Path]) -> tp.Tuple[dict, dict]:
        """Returns (state_tree, payload)."""
        path = Path(path)
        tree = ocp.PyTreeCheckpointer().restore(path.absolute())
        payload_file = path / "payload.pkl"
        payload = pickle.loads(payload_file.read_bytes()) if payload_file.exists() else {}
        if isinstance(tree, dict) and "model" in tree:
            tree["model"] = ExperimentSaver._remap_legacy_keys(tree["model"])
        return tree, payload

    @staticmethod
    def _remap_legacy_keys(model: dict) -> dict:
        """Migrate checkpoints saved before two round-3 refactors changed nnx
        pure-dict paths (resume/warm-start would otherwise fail
        replace_by_pure_dict):

        - NeuralCodec's inline decoder (``dec_pre``/``dec``/``dec_post``)
          became a nested ``decoder`` CodecDecoder (models/codec/rvq.py:69);
        - SnakeUpsampleHead resblocks gained an MRF nesting level
          (``resblocks.N`` -> ``resblocks.N.M``).
        """
        if not isinstance(model, dict):
            return model

        def fix_codec(node):
            if not isinstance(node, dict):
                return node
            for k, v in list(node.items()):
                node[k] = fix_codec(v)
            # a legacy NeuralCodec root carries dec_* NEXT TO other submodules
            # (enc/quantizer); a CodecDecoder itself is dec_*-only — don't
            # wrap that, or the recursion never terminates
            has_dec = {"dec_pre", "dec", "dec_post"} & set(node)
            has_others = bool(set(node) - {"dec_pre", "dec", "dec_post"})
            if has_dec and has_others and "decoder" not in node:
                node["decoder"] = {k: node.pop(k)
                                   for k in ("dec_pre", "dec", "dec_post")
                                   if k in node}
            return node

        def fix_resblocks(node):
            if not isinstance(node, dict):
                return node
            if "resblocks" in node and isinstance(node["resblocks"], dict):
                rb = node["resblocks"]
                # pre-MRF blocks are ResBlock dicts directly ({convs, acts});
                # post-MRF they are {M: ResBlock} groups with digit keys
                flat = rb and all(isinstance(v, dict)
                                  and {"convs", "acts"} <= set(v)
                                  for v in rb.values())
                if flat:
                    node["resblocks"] = {k: {"0": v} for k, v in rb.items()}
            for k, v in list(node.items()):
                if k != "resblocks":
                    node[k] = fix_resblocks(v)
            return node

        return fix_resblocks(fix_codec(model))

    # -- warmstart / finetune ---------------------------------------------------

    @staticmethod
    def filter_state_by_prefix(state: dict, include: tp.Sequence[str] = (),
                               exclude: tp.Sequence[str] = ()) -> dict:
        """Prefix-filtered weight subset for warmstart (reference finetuning.py:18)."""

        def walk(node, path=""):
            if isinstance(node, dict):
                return {k: walk(v, f"{path}/{k}" if path else k) for k, v in node.items()}
            keep = (not include or any(path.startswith(p) or p in path for p in include))
            if exclude and any(path.startswith(p) or p in path for p in exclude):
                keep = False
            return node if keep else None

        return walk(state)

    @staticmethod
    def merge_states(target: dict, source: dict) -> dict:
        """Overlay non-None source leaves onto target (shape-checked)."""
        def merge(t, s):
            if isinstance(t, dict) and isinstance(s, dict):
                return {k: merge(t[k], s[k]) if k in s else t[k] for k in t}
            if s is None:
                return t
            if hasattr(t, "shape") and hasattr(s, "shape") and t.shape != s.shape:
                return t  # incompatible: keep target (logged by caller)
            return s

        return merge(target, source)
