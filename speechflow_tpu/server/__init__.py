from speechflow_tpu.server.server import DataServer
from speechflow_tpu.server.worker import BatchWorker, WorkerPool
from speechflow_tpu.server.loader import DataLoader
from speechflow_tpu.server.proxy import Proxy
from speechflow_tpu.server.helpers import (init_data_loader, init_data_loader_distributed,
    get_dataset_iterator, LoaderBundle)
from speechflow_tpu.server.client import DataClient

__all__ = ["DataServer", "BatchWorker", "WorkerPool", "DataLoader", "Proxy", "DataClient",
           "init_data_loader", "init_data_loader_distributed", "get_dataset_iterator", "LoaderBundle"]
