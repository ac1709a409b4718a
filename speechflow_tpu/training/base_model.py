"""Model base: pydantic params + flax.nnx module conventions.

Capability parity with the reference BaseTorchModelParams/BaseTorchModel
(speechflow/training/base_model.py:18,117): strict, validated, versionable
hyperparameter objects that travel inside checkpoints (`params.to_dict()` is
embedded by ExperimentSaver and re-validated on load, with deprecated-field
migration); models are flax.nnx Modules built from a params object + nnx.Rngs.
"""

from __future__ import annotations

import typing as tp

import pydantic
from flax import nnx

__all__ = ["BaseModelParams", "BaseModel"]


class BaseModelParams(pydantic.BaseModel):
    model_config = pydantic.ConfigDict(extra="forbid", validate_assignment=True)

    #: bump when fields change; used for deprecation migration on load
    version: str = "1.0"

    @classmethod
    def deprecated_fields(cls) -> tp.Dict[str, str]:
        """old_name -> new_name migrations applied in create()."""
        return {}

    @classmethod
    def create(cls, cfg: tp.Optional[tp.Mapping] = None, **kwargs) -> "BaseModelParams":
        data = dict(cfg or {})
        data.update(kwargs)
        for old, new in cls.deprecated_fields().items():
            if old in data:
                val = data.pop(old)
                if new and new not in data:
                    data[new] = val
        known = set(cls.model_fields)
        unknown = [k for k in data if k not in known]
        if unknown:
            import logging

            logging.getLogger("speechflow_tpu").warning(
                "%s: dropping unknown params %s", cls.__name__, unknown)
            data = {k: v for k, v in data.items() if k in known}
        return cls(**data)

    def to_dict(self) -> dict:
        return self.model_dump()

    def init_from_parent_params(self, parent: "BaseModelParams",
                                only_missing: bool = True) -> "BaseModelParams":
        for name in type(self).model_fields:
            if name in type(parent).model_fields:
                if not only_missing or name not in self.model_fields_set:
                    setattr(self, name, getattr(parent, name))
        return self


class BaseModel(nnx.Module):
    """Convention: __init__(params, rngs); forward via __call__(inputs, ...)."""

    def __init__(self, params: BaseModelParams):
        self.params_dict = params.to_dict()

    @property
    def n_parameters(self) -> int:
        state = nnx.state(self, nnx.Param)
        import jax

        return sum(x.size for x in jax.tree_util.tree_leaves(state))
