from speechflow_tpu.training.base_model import BaseModelParams, BaseModel
from speechflow_tpu.training.optimizer import build_optimizer, OptimizerConfig
from speechflow_tpu.training.lr_schedulers import build_lr_schedule
from speechflow_tpu.training.saver import ExperimentSaver
from speechflow_tpu.training.trainer import Trainer, TrainerConfig
from speechflow_tpu.training.gan_trainer import GANTrainer

__all__ = [
    "BaseModelParams", "BaseModel",
    "build_optimizer", "OptimizerConfig", "build_lr_schedule",
    "ExperimentSaver", "Trainer", "TrainerConfig", "GANTrainer",
]
