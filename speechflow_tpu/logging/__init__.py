from speechflow_tpu.logging.server import LoggingServer, attach_zmq_handler
from speechflow_tpu.logging.utils import trace, log_to_file

__all__ = ["LoggingServer", "attach_zmq_handler", "trace", "log_to_file"]
