from robustvlm_tpu.utils.meters import AverageMeter
from robustvlm_tpu.utils.logging import MetricLogger

__all__ = ["AverageMeter", "MetricLogger"]
