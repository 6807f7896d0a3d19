"""Shared utilities: logging, metrics, checkpointing."""

from .logging_utils import get_logger
from .metrics import StepMeter
from .checkpoint import save_checkpoint, load_checkpoint

__all__ = ["get_logger", "StepMeter", "save_checkpoint", "load_checkpoint"]
