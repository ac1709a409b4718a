"""Reflection-based construction from config.

Capability parity with the reference init helpers (speechflow/utils/init.py):
``init_class_from_config(cls, cfg)`` returns a constructor closure whose kwargs
are filtered to the callable's signature; unknown keys produce a warning
instead of a crash (configs travel across versions). ``check_params`` disables
filtering for strict construction.
"""

from __future__ import annotations

import inspect
import logging
import typing as tp

LOGGER = logging.getLogger("speechflow_tpu")

__all__ = ["init_class_from_config", "init_method_from_config", "filter_kwargs"]


def filter_kwargs(fn: tp.Callable, cfg: tp.Mapping, warn: bool = True) -> dict:
    sig = inspect.signature(fn)
    params = sig.parameters
    accepts_var_kw = any(p.kind == inspect.Parameter.VAR_KEYWORD for p in params.values())
    if accepts_var_kw:
        return dict(cfg)
    known = {k: v for k, v in cfg.items() if k in params}
    unknown = [k for k in cfg if k not in params]
    if unknown and warn:
        LOGGER.warning("%s: ignoring unknown config keys %s", getattr(fn, "__name__", fn), unknown)
    return known


def init_class_from_config(cls: type, cfg: tp.Mapping, check_params: bool = True) -> tp.Callable:
    def ctor(**overrides):
        kwargs = dict(cfg)
        kwargs.update(overrides)
        if check_params:
            kwargs = filter_kwargs(cls.__init__, kwargs)
        return cls(**kwargs)

    return ctor


def init_method_from_config(fn: tp.Callable, cfg: tp.Mapping, check_params: bool = True) -> tp.Callable:
    def call(*args, **overrides):
        kwargs = dict(cfg)
        kwargs.update(overrides)
        if check_params:
            kwargs = filter_kwargs(fn, kwargs)
        return fn(*args, **kwargs)

    return call
