from speechflow_tpu.data.core.datasample import (
    DataSample,
    AudioDataSample,
    SpectrogramDataSample,
    TTSDataSample,
    ImageDataSample,
)
from speechflow_tpu.data.core.batch import Batch
from speechflow_tpu.data.core.dataset import Dataset, DatasetItem
from speechflow_tpu.data.core.registry import PipeRegistry
from speechflow_tpu.data.core.singleton import Singleton
from speechflow_tpu.data.core.parser import BaseDSParser, Metadata
from speechflow_tpu.data.core.processor import DataProcessor, DumpProcessor


def __getattr__(name):
    # lazy: components pulls in collate/parsers/samplers, which import this
    # package's submodules — a direct import here would be circular
    if name in ("PipelineComponents", "DataPipeline"):
        from speechflow_tpu.data.core import components

        return getattr(components, name)
    raise AttributeError(name)

__all__ = [
    "DataSample", "AudioDataSample", "SpectrogramDataSample", "TTSDataSample", "ImageDataSample",
    "Batch", "Dataset", "DatasetItem", "PipeRegistry", "Singleton",
    "BaseDSParser", "Metadata", "DataProcessor", "DumpProcessor",
    "PipelineComponents", "DataPipeline",
]
