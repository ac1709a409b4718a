from speechflow_tpu.utils.init import init_class_from_config, init_method_from_config
from speechflow_tpu.utils.profiler import Profiler
from speechflow_tpu.utils.seed import set_seed

__all__ = ["init_class_from_config", "init_method_from_config", "Profiler", "set_seed"]
