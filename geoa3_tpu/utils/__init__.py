"""Shared utilities: meters, experiment naming, checkpoints, records."""

from geoa3_tpu.utils.meters import AverageMeter, StepTimer, format_time, natural_sort
from geoa3_tpu.utils.naming import attack_exp_dirname
from geoa3_tpu.utils.records import ConvergeIterRecorder, LossIterRecorder

__all__ = [
    "AverageMeter",
    "StepTimer",
    "format_time",
    "natural_sort",
    "attack_exp_dirname",
    "ConvergeIterRecorder",
    "LossIterRecorder",
]
