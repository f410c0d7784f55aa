from .config import (TrainConfig, CurriculumConfig, curriculum_iterations,
                     resolve_pack_passages)
from .optim import make_optimizer, linear_warmup_schedule
from .checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint
from .trainer import Trainer, TrainState, batch_mrr_recall, make_loss_fn, make_train_step
from .curriculum import run_curriculum

__all__ = [
    "run_curriculum",
    "make_loss_fn",
    "make_train_step",
    "TrainConfig",
    "CurriculumConfig",
    "curriculum_iterations",
    "resolve_pack_passages",
    "make_optimizer",
    "linear_warmup_schedule",
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
    "Trainer",
    "TrainState",
    "batch_mrr_recall",
]
