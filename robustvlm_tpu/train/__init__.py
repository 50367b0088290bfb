from robustvlm_tpu.train.schedules import cosine_warmup_lr
from robustvlm_tpu.train.trainer import TrainConfig, make_train_step, make_optimizer

__all__ = ["cosine_warmup_lr", "TrainConfig", "make_train_step", "make_optimizer"]
