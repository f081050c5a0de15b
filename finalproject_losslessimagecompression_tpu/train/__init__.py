from . import optim  # registers optimizers/schedulers
from .checkpoint import load_checkpoint, load_raw, save_checkpoint
from .metrics import MetricsWriter
from .optim import build_optimizer, warmup_exp_schedule
from .trainer import Trainer, make_forward, make_train_step
from .vqvae_trainer import VQVAETrainer
from .residual_trainer import ResidualTrainer
from .twolevel_trainer import TwoLevelTrainer
from .finetuner import Finetuner

__all__ = [
    "load_checkpoint",
    "load_raw",
    "save_checkpoint",
    "MetricsWriter",
    "build_optimizer",
    "warmup_exp_schedule",
    "Trainer",
    "make_forward",
    "make_train_step",
    "VQVAETrainer",
    "ResidualTrainer",
    "TwoLevelTrainer",
    "Finetuner",
]
