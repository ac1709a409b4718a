"""IO-typed handler registry.

Capability parity with the reference PipeRegistry
(speechflow/data_pipeline/core/registry.py:11): handlers declare their
dataflow contract (``inputs``/``outputs``/``optional`` DataSample fields) via a
decorator; ``check()`` validates an ordered pipe's dataflow; ``filter()``
performs the eval-time pipeline surgery (drop handlers by name or by produced
field, cut before/after a handler) used when rebuilding pipelines from
checkpoints for inference.
"""

from __future__ import annotations

import typing as tp

__all__ = ["PipeRegistry"]


class PipeRegistry:
    _registry: tp.Dict[str, dict] = {}

    @classmethod
    def registry(
        cls,
        inputs: tp.Optional[tp.Set[str]] = None,
        outputs: tp.Optional[tp.Set[str]] = None,
        optional: tp.Optional[tp.Set[str]] = None,
    ):
        def deco(fn):
            meta = {
                "fn": fn,
                "name": fn.__name__,
                "inputs": set(inputs or ()),
                "outputs": set(outputs or ()),
                "optional": set(optional or ()),
            }
            cls._registry[fn.__qualname__] = meta
            fn.__pipe_meta__ = meta
            return fn

        return deco

    @staticmethod
    def meta(fn: tp.Callable) -> dict:
        m = getattr(fn, "__pipe_meta__", None)
        if m is None:
            # unwrap bound methods / partials
            inner = getattr(fn, "__func__", None) or getattr(fn, "func", None)
            if inner is not None:
                return PipeRegistry.meta(inner)
            return {"fn": fn, "name": getattr(fn, "__name__", str(fn)),
                    "inputs": set(), "outputs": set(), "optional": set()}
        return m

    @classmethod
    def check(cls, pipe: tp.Sequence[tp.Callable],
              initial_fields: tp.Optional[tp.Set[str]] = None) -> bool:
        """Validate that every handler's inputs are produced upstream."""
        available = set(initial_fields or ())
        for fn in pipe:
            m = cls.meta(fn)
            missing = m["inputs"] - available
            if missing:
                raise ValueError(
                    f"handler '{m['name']}' requires fields {sorted(missing)} "
                    f"not produced upstream (have {sorted(available)})"
                )
            available |= m["outputs"]
        return True

    @classmethod
    def filter(
        cls,
        pipe: tp.Sequence[tp.Callable],
        drop_names: tp.Optional[tp.Set[str]] = None,
        drop_fields: tp.Optional[tp.Set[str]] = None,
        before: tp.Optional[str] = None,
        after: tp.Optional[str] = None,
    ) -> tp.List[tp.Callable]:
        """Eval-time surgery: remove handlers by name/output-field, or keep only
        the segment before/after a named handler."""
        out = list(pipe)
        names = [cls.meta(f)["name"] for f in out]
        if before is not None:
            if before in names:
                out = out[: names.index(before)]
                names = names[: len(out)]
        if after is not None:
            if after in names:
                out = out[names.index(after) + 1 :]
                names = [cls.meta(f)["name"] for f in out]
        if drop_names:
            keep = [i for i, n in enumerate(names) if n not in drop_names]
            out = [out[i] for i in keep]
        if drop_fields:
            out = [f for f in out if not (cls.meta(f)["outputs"] & drop_fields)]
        return out
