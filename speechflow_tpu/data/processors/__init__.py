"""Domain processors: named, IO-typed handlers over DataSamples.

The reference registers handlers on processor classes
(speechflow/data_pipeline/datasample_processors/); here handlers are plain
functions in a module-level name registry (plus stateful classes for the
alphabet/text frontend and dataset-level singletons), resolved by
PipelineComponents from the ``preproc.pipe`` config list.
"""

import typing as tp

__all__ = ["HANDLERS", "handler", "get_handler"]

HANDLERS: tp.Dict[str, tp.Callable] = {}


def handler(inputs: tp.Optional[set] = None, outputs: tp.Optional[set] = None,
            optional: tp.Optional[set] = None):
    from speechflow_tpu.data.core.registry import PipeRegistry

    def deco(fn):
        fn = PipeRegistry.registry(inputs=inputs, outputs=outputs, optional=optional)(fn)
        HANDLERS[fn.__name__] = fn
        return fn

    return deco


def get_handler(name: str) -> tp.Callable:
    # import handler modules lazily so registration happens on first lookup
    from speechflow_tpu.data.processors import (  # noqa: F401
        audio, spectral, text, tts, augment, embeddings, ling, signal1d,
    )

    if name not in HANDLERS:
        raise KeyError(f"unknown handler '{name}'; known: {sorted(HANDLERS)}")
    return HANDLERS[name]
