"""Shared utilities: logging, metrics, checkpointing, compile cache."""

from .cache import enable_compilation_cache
from .logging_utils import get_logger
from .metrics import StepMeter
from .checkpoint import (load_checkpoint, load_checkpoint_orbax,
                         save_checkpoint, save_checkpoint_orbax)

__all__ = ["get_logger", "StepMeter", "save_checkpoint", "load_checkpoint",
           "save_checkpoint_orbax", "load_checkpoint_orbax",
           "enable_compilation_cache"]
