from speechflow_tpu.concurrency.process_worker import ProcessWorker

__all__ = ["ProcessWorker"]
