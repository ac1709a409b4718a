"""Packaging parity (reference setup.py + requirements.txt): the repo is an
installable package with console entry points for every reference CLI."""

import os
import subprocess
import sys
import tomllib
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _entry_points() -> dict:
    with open(REPO / "pyproject.toml", "rb") as f:
        return tomllib.load(f)["project"]["scripts"]


def test_entry_points_resolve_to_callables():
    import importlib

    eps = _entry_points()
    assert len(eps) >= 10  # train x5, eval, dump, annotate, check, export...
    for name, target in eps.items():
        mod, _, fn = target.partition(":")
        obj = getattr(importlib.import_module(mod), fn)
        assert callable(obj), f"{name} -> {target} not callable"


def test_pyproject_declares_runtime_deps():
    with open(REPO / "pyproject.toml", "rb") as f:
        proj = tomllib.load(f)["project"]
    deps = " ".join(proj["dependencies"])
    for need in ("jax", "flax", "optax", "orbax", "numpy", "scipy",
                 "pydantic", "PyYAML", "pyzmq"):
        assert need in deps, f"missing runtime dep {need}"
    assert proj["requires-python"] >= ">=3.10"


@pytest.mark.slow
def test_fresh_venv_editable_install_and_cli_smoke(tmp_path):
    """`pip install -e .` into a fresh venv, then drive the console scripts
    (the reference documents `pip install -e .` + `pytest tests` as install
    verification, reference README.md:59-61). The ambient interpreter is
    itself a venv, so the child venv gets a .pth link to its site-packages
    (offline env: build isolation / dep resolution would need a network)."""
    venv = tmp_path / "venv"
    subprocess.run([sys.executable, "-m", "venv", "--system-site-packages",
                    str(venv)], check=True)
    site = venv / "lib" / f"python{sys.version_info.major}.{sys.version_info.minor}" / "site-packages"
    parent_site = Path([p for p in sys.path if p.endswith("site-packages")][0])
    (site / "_parent.pth").write_text(str(parent_site) + "\n")

    r = subprocess.run([str(venv / "bin" / "pip"), "install", "--no-deps",
                        "--no-build-isolation", "-q", "-e", str(REPO)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    for script in ("speechflow-tpu-train", "speechflow-tpu-eval",
                   "speechflow-tpu-export", "speechflow-tpu-annotate"):
        r = subprocess.run([str(venv / "bin" / script), "--help"],
                           capture_output=True, text=True, env=env, timeout=120)
        assert r.returncode == 0, f"{script} --help failed: {r.stderr[-1500:]}"
        assert "usage:" in r.stdout
